"""Schema-evolution-aware union: read N crawl months whose schemas
drifted (columns added/dropped, integers widened) as ONE DataFrame with
deterministic type reconciliation — the reader-side half of the
preflight schema-diff (plans/preflight.py ``--diff-schema``), and the
behavior an Iceberg table gives natively, emulated over raw parquet
paths so multi-epoch corpora validate as one table.

Reconciliation rules (fixed, documented, tested — never silent):
- a column missing from a snapshot reads as NULL of the reconciled type;
- numeric types widen up the ladder byte→short→int→long and
  float→double; any integer meeting any float widens to double
  (the parquet/Iceberg promotion set);
- decimals widen to the max (precision, scale) pair when one fits 38,
  else double;
- string absorbs any ATOMIC type (cast to string) — but only when
  ``allow_stringify=True``; by default a string-vs-numeric conflict is
  an error, because silently stringifying a measure column corrupts
  every downstream aggregate;
- non-atomic conflicts (array vs long, struct vs string) always raise —
  there is no lossless reconciliation.

Every reconciliation that changes a column's type or fills a missing
column is reported in the returned findings list (a finding, never a
silent cast — the engine's house contract).

Scale: pure metadata work on the driver (schemas only) + per-input
``select`` projections with casts; no shuffle is introduced — the union
is a plan-level concatenation and partition counts add.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["evolving_union", "reconcile_schemas"]

#: widening ladder rank for exact integers / floats
_INT_RANK = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4}
_FLOAT_RANK = {T.FloatType: 1, T.DoubleType: 2}


def _widen(a: T.DataType, b: T.DataType, allow_stringify: bool) -> T.DataType:
    """Least common type of two column types under the documented ladder;
    raises on irreconcilable pairs."""
    if a == b:
        return a
    ta, tb = type(a), type(b)
    if ta in _INT_RANK and tb in _INT_RANK:
        return a if _INT_RANK[ta] >= _INT_RANK[tb] else b
    if ta in _FLOAT_RANK and tb in _FLOAT_RANK:
        return a if _FLOAT_RANK[ta] >= _FLOAT_RANK[tb] else b
    if (ta in _INT_RANK and tb in _FLOAT_RANK) or (
        ta in _FLOAT_RANK and tb in _INT_RANK
    ):
        return T.DoubleType()
    if ta is T.DecimalType and tb is T.DecimalType:
        prec = max(a.precision - a.scale, b.precision - b.scale) + max(
            a.scale, b.scale
        )
        scale = max(a.scale, b.scale)
        if prec <= 38:
            return T.DecimalType(prec, scale)
        return T.DoubleType()
    if ta is T.DecimalType and tb in _INT_RANK or tb is T.DecimalType and ta in _INT_RANK:
        dec = a if ta is T.DecimalType else b
        if dec.precision - dec.scale >= 19:
            return dec
        return T.DecimalType(min(19 + dec.scale, 38), dec.scale)
    atomic = (
        T.StringType, T.BooleanType, T.DateType, T.TimestampType,
        T.TimestampNTZType, T.BinaryType,
    ) + tuple(_INT_RANK) + tuple(_FLOAT_RANK) + (T.DecimalType,)
    if T.StringType in (ta, tb) and isinstance(a, atomic) and isinstance(b, atomic):
        if not allow_stringify:
            raise ValueError(
                f"string vs {a if tb is T.StringType else b} needs "
                "allow_stringify=True (stringifying a measure column "
                "corrupts downstream aggregates)"
            )
        return T.StringType()
    raise ValueError(f"irreconcilable column types: {a} vs {b}")


def reconcile_schemas(
    schemas: "list[T.StructType]", allow_stringify: bool = False
) -> "tuple[T.StructType, list[dict]]":
    """Union of field names (first-seen order) with widened types →
    ``(schema, findings)``; findings itemize every widening and every
    snapshot-missing column."""
    order: list[str] = []
    seen: dict[str, T.DataType] = {}
    findings: list[dict] = []
    for i, sch in enumerate(schemas):
        for f in sch.fields:
            if f.name not in seen:
                order.append(f.name)
                seen[f.name] = f.dataType
                if i > 0:
                    findings.append(
                        {"column": f.name, "kind": "ADDED_LATER",
                         "detail": f"first appears in input {i}"}
                    )
            else:
                w = _widen(seen[f.name], f.dataType, allow_stringify)
                if w != seen[f.name] or w != f.dataType:
                    findings.append(
                        {"column": f.name, "kind": "TYPE_WIDENED",
                         "detail": f"{seen[f.name].simpleString()} + "
                                   f"{f.dataType.simpleString()} -> "
                                   f"{w.simpleString()}"}
                    )
                seen[f.name] = w
    names = set.union(*[{f.name for f in s.fields} for s in schemas])
    for i, sch in enumerate(schemas):
        missing = names - {f.name for f in sch.fields}
        for m in sorted(missing):
            findings.append(
                {"column": m, "kind": "MISSING_IN_INPUT",
                 "detail": f"input {i} reads NULL"}
            )
    return T.StructType([T.StructField(n, seen[n]) for n in order]), findings


def evolving_union(
    dfs: "list[DataFrame]", allow_stringify: bool = False
) -> "tuple[DataFrame, list[dict]]":
    """Union N drifted snapshots under the reconciled schema →
    ``(DataFrame, findings)``. Plan-level only: each input gets one
    projection of casts/NULL-fills, then unionByName — no shuffle."""
    if not dfs:
        raise ValueError("evolving_union: at least one input required")
    target, findings = reconcile_schemas(
        [d.schema for d in dfs], allow_stringify
    )
    parts = []
    for d in dfs:
        have = {f.name: f.dataType for f in d.schema.fields}
        cols = []
        for f in target.fields:
            if f.name not in have:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif have[f.name] != f.dataType:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.col(f.name))
        parts.append(d.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, findings
