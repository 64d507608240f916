"""North-rule launch path: the package zips into a --py-files artifact
(scripts/package_pyfiles.py) and a spark-submit driver that imports
osmium_tool_spark ONLY from that zip (cwd and PYTHONPATH point away
from the repo) runs a real operator over the testdata parquet."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[2]")
         .appName("pyfiles-smoke")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import osmium_tool_spark
assert "osmium_tool_spark.zip" in osmium_tool_spark.__file__, osmium_tool_spark.__file__

from osmium_tool_spark.operators.sketches import bloom_build, bloom_probe

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
state = bloom_build(docs, "doc_id", k=4, m_bits=4096, hash="portable")
probed = bloom_probe(state, docs, "doc_id", k=4, m_bits=4096, hash="portable")
n = probed.filter(F.col("maybe_present") == 1).count()
print(f"PYFILES_SMOKE_OK rows={n}")
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "osmium_tool_spark.zip")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py"), zip_path],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(zip_path) > 100_000

    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    r = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path, str(driver)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the zip is the only import source
        env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "PYFILES_SMOKE_OK rows=500" in r.stdout, r.stdout[-2000:]
