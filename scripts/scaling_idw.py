"""N->4N scaling evidence for idw_surface (round-4m op).

Protocol identical to scaling_dist_join.py (fresh JVM per level,
constant shuffle partitions, warm-up + best-of-2). idw_surface is an
explode -> hash-aggregate shape, so its single-box bound is the shared
memory bandwidth measured by the agg_ceiling rows of the round-4k/4l
legs (0.276-0.313); interpret efficiency against that ceiling, as for
hll_distinct/bloom_probe.

Usage: python scripts/scaling_idw.py [n_samples] [radius]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osmium_tool_spark.session import get_spark

cpus = {cpus}
spark = get_spark("scale-idw", master=f"local[{cpus}]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

from osmium_tool_spark.operators.tiles import idw_surface

n = {n}
samples = spark.range(1, n + 1).select(
    ((F.col("id") * 2654435761) % 3600000000 - 1800000000).alias("lon"),
    ((F.col("id") * 2246822519) % 1800000000 - 900000000).alias("lat"),
    (F.col("id") % 1000).alias("val"),
)

def run():
    t0 = time.time()
    cnt = idw_surface(samples, {radius}).count()
    return time.time() - t0, cnt

run()  # warm-up
times = []
for _ in range(2):
    dt, cnt = run()
    times.append(dt)
print(json.dumps({{"cpus": cpus, "sec": min(times), "cells": cnt}}))
"""


def level(cpus: int, n: int, radius: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, cpus=cpus, n=n,
                                            radius=radius)],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 1_800_000
    try:
        la = os.getloadavg()[0]
    except OSError:
        la = -1.0
    r2 = level(2, n, radius)
    r8 = level(8, n, radius)
    eff = (r2["sec"] / r8["sec"]) / 4.0
    print(json.dumps({
        "op": "idw_surface", "n_samples": n, "radius": radius,
        "loadavg1_start": la,
        "sec_n2": r2["sec"], "sec_n8": r8["sec"],
        "cells": r2["cells"], "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
