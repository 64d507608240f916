"""N->4N scaling evidence for the distributed GeoJSONL reader.

Protocol identical to scaling_dist_join.py. The input file is
generated ONCE (Spark text write of synthetic Point features), then
each level runs read_geojsonl -> aggregate over the parsed geometry —
a scan + JVM-JSON-parse bound shape (no shuffle beyond the final
count), i.e. the embarrassingly parallel end of the engine; expected
to scale near-linearly.

Usage: python scripts/scaling_geojsonl.py [n_features]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osmium_tool_spark.session import get_spark
spark = get_spark("gen-gjl", master="local[8]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
n = {n}
lon = ((F.col("id") * 2654435761) % 3600000000 - 1800000000) / 10000000.0
lat = ((F.col("id") * 2246822519) % 1800000000 - 900000000) / 10000000.0
line = F.format_string(
    '{{"type":"Feature","id":"%d","geometry":{{"type":"Point","coordinates":[%.7f,%.7f]}},"properties":{{"k":"%d"}}}}',
    F.col("id"), lon, lat, F.col("id") % 97)
spark.range(1, n + 1).select(line.alias("value")).write.mode("overwrite").text({path!r})
print("GENOK")
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osmium_tool_spark.session import get_spark
cpus = {cpus}
spark = get_spark("scale-gjl", master=f"local[{cpus}]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from osmium_tool_spark.sources.geojsonl import read_geojsonl

def run():
    t0 = time.time()
    df = read_geojsonl(spark, {path!r})
    cnt = df.select(F.sum(F.get(F.get("rings", 0), 0)["lon"]).alias("s"),
                    F.count("*").alias("n")).collect()[0]
    return time.time() - t0, cnt["n"]

run()  # warm-up
times = []
for _ in range(2):
    dt, n = run()
    times.append(dt)
print(json.dumps({{"cpus": cpus, "sec": min(times), "rows": n}}))
"""


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    path = tempfile.mkdtemp(prefix="scale-gjl-")
    try:
        la = os.getloadavg()[0]
    except OSError:
        la = -1.0
    try:
        gen = subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO, n=n, path=path)],
            capture_output=True, text=True, timeout=1800,
        )
        assert "GENOK" in gen.stdout, gen.stderr[-2000:]

        def level(cpus: int) -> dict:
            out = subprocess.run(
                [sys.executable, "-c",
                 CHILD.format(repo=REPO, cpus=cpus, path=path)],
                capture_output=True, text=True, timeout=1800,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            return json.loads(line)

        r2 = level(2)
        r8 = level(8)
        eff = (r2["sec"] / r8["sec"]) / 4.0
        print(json.dumps({
            "op": "read_geojsonl", "n_features": n,
            "loadavg1_start": la,
            "sec_n2": r2["sec"], "sec_n8": r8["sec"],
            "rows": r2["rows"], "efficiency": round(eff, 3),
            "pass": eff >= 0.8,
        }))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
