"""Build the --py-files artifact for cluster submission (north rule:
"launched via spark-submit --py-files").

Usage:
    python scripts/package_pyfiles.py [dist/osmium_tool_spark.zip]
    spark-submit --py-files dist/osmium_tool_spark.zip \\
        -- python -m osmium_tool_spark extract --bbox ... s3://in -o s3://out

The zip contains only the package (no tests/bench); executors import it
from the distributed cache.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "osmium_tool_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "osmium_tool_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
