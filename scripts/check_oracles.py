"""Local replica of the driver's correctness harness: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf dir and
compare row count, column names, and a canonicalized value hash.

The comparison deliberately mimics the driver's pandas canonicalizer:
both sides are fetched INTO PANDAS (``toPandas()`` / duckdb ``.df()``),
columns sorted by name, rows lexsorted, and every cell serialized
**dtype-sensitively** (``int:1`` != ``float:1.0``). This catches the
class of round-1 failures where values were numerically equal but
DuckDB's HUGEINT (sum of integers) surfaced as float64 while Spark
returned int64 — rows/schema matched, hash didn't. It also crashes (and
therefore flags) unhashable array-typed cells unless they were
serialized with to_json, exactly like the driver's canonicalizer.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
(trailing args restrict the run to the named queries)
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entry
from gbif_data_validator_spark.session import build_session

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell(v) -> str:
    """Dtype-sensitive canonical serialization of one cell."""
    if v is None:
        return "null"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "null" if math.isnan(f) else f"float:{f!r}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"int:{int(v)}"
    if isinstance(v, (np.bool_, bool)):
        return f"bool:{bool(v)}"
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # the driver's canonicalizer raises on these (unhashable) —
        # surface them loudly instead of silently comparing
        raise TypeError(f"array/map-typed cell reaches canonicalizer: {v!r}")
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


def canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows)


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
            spdf = fn(spark, sf_dir).toPandas()
            scols, srows = canon(spdf)
        except Exception as e:
            print(f"FAIL  {name}: spark/canon error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
            ocols, orows = canon(odf)
        except Exception as e:
            print(f"FAIL  {name}: duckdb/canon error: {e}")
            failures += 1
            continue
        ok_cols = scols == ocols
        ok_vals = srows == orows
        if ok_cols and ok_vals:
            print(f"OK    {name}: {len(srows)} rows")
            continue
        failures += 1
        print(f"FAIL  {name}: rows {len(srows)}/{len(orows)} cols_ok={ok_cols} vals_ok={ok_vals}")
        if not ok_cols:
            print(f"      spark cols: {scols}\n      duck  cols: {ocols}")
        if not ok_vals:
            sset, oset = set(srows), set(orows)
            diff_s = [r for r in srows if r not in oset][:3]
            diff_o = [r for r in orows if r not in sset][:3]
            print(f"      spark-only: {diff_s}\n      duck-only : {diff_o}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
            sys.argv[2:] or None,
        )
    )
