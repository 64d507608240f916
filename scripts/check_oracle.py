"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same parquet tables; compare row count + sorted-column value
multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (floats via repr of rounded double), sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from osmium_tool_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failed.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        sc, dc = canon(srows, scols), canon(drows, dcols)
        ok = ok_cols and sc == dc
        msg = f"rows={len(srows)}/{len(drows)} cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
        if ok:
            print(f"PASS {name}: {msg} [{time.time()-t0:.1f}s]")
        else:
            failed.append(name)
            print(f"FAIL {name}: {msg}")
            sonly = [r for r in sc if r not in set(map(tuple, dc))][:3]
            donly = [r for r in dc if r not in set(map(tuple, sc))][:3]
            print(f"  spark-only: {sonly}")
            print(f"  duck-only:  {donly}")
    print(f"\n{'ALL PASS' if not failed else 'FAILED: ' + ', '.join(failed)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
