"""N->4N scaling evidence for dist_join (round-4m op).

Same protocol as scaling_bench_ops.py: fresh JVM per parallelism level
(local[2] vs local[8] as the sandbox proxy for N vs 4N executor
clusters), shuffle partition COUNT held constant across levels (a real
cluster's partitioning does not change when executors are added),
warm-up + best-of-2 timed runs, efficiency = (t_N / t_4N) / 4.

The sf0.1 gate input (2k points) is fixed-overhead-bound; here the
operator runs over a large synthetic world-spread point set whose
radius is sized so the candidate volume (cells x ring occupancy) is
the dominant cost — the join-bound region where scaling is a property
of the engine, not the scheduler.

Usage: python scripts/scaling_dist_join.py [n_points] [radius]
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
spark = get_spark("scale-distjoin", master=f"local[{cpus}]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

from osmium_tool_spark.operators.spatial_join import dist_join

n = {n}
pts = spark.range(1, n + 1).select(
    F.col("id"),
    ((F.col("id") * 2654435761) % 3600000000 - 1800000000).alias("lon"),
    ((F.col("id") * 2246822519) % 1800000000 - 900000000).alias("lat"),
)

def run():
    t0 = time.time()
    cnt = dist_join(pts, {radius}).count()
    return time.time() - t0, cnt

run()  # warm-up
times = []
for _ in range(2):
    dt, cnt = run()
    times.append(dt)
print(json.dumps({{"cpus": cpus, "sec": min(times), "pairs": cnt}}))
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 1_800_000
    try:
        la = os.getloadavg()[0]
    except OSError:
        la = -1.0
    r2 = level(2, n, radius)
    r8 = level(8, n, radius)
    eff = (r2["sec"] / r8["sec"]) / 4.0
    print(json.dumps({
        "op": "dist_join", "n_points": n, "radius": radius,
        "loadavg1_start": la,
        "sec_n2": r2["sec"], "sec_n8": r8["sec"],
        "pairs": r2["pairs"], "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
