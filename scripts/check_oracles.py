"""Local replica of the driver's correctness harness: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf dir,
compare row count, column names, and the order-insensitive multiset of
row values. Usage: python scripts/check_oracles.py [sf_dir] [query ...]
(trailing args restrict the run to the named queries)"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry
from gbif_data_validator_spark.session import build_session

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main(sf_dir: str, only: list[str] | None = None) -> int:
    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = [tuple(norm(v) for v in r) for r in cur.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        # compare on column-name-sorted tuples (driver semantics)
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sset = sorted(tuple(r[i] for i in sidx) for r in srows)
        oset = sorted(tuple(r[i] for i in oidx) for r in orows)
        ok_vals = sset == oset
        status = "OK  " if (ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{status}  {name}: rows {len(srows)}/{len(orows)} cols_ok={ok_cols} vals_ok={ok_vals}")
            if not ok_cols:
                print(f"      spark cols: {scols}\n      duck  cols: {ocols}")
            if not ok_vals:
                diff_s = [r for r in sset if r not in oset][:3]
                diff_o = [r for r in oset if r not in sset][:3]
                print(f"      spark-only: {diff_s}\n      duck-only : {diff_o}")
        else:
            print(f"{status}  {name}: {len(srows)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
            sys.argv[2:] or None,
        )
    )
