"""Snapshot-over-snapshot table diff: crawl churn classification.

No reference analog (the reference validates one archive at a time); this
is the operator a recurring crawl pipeline runs between consecutive
snapshots of the same table — "how much of last month's corpus survived,
what changed, what's new" — the table-level complement to the
findings-level ``plans/compare.py`` (which diffs validation REPORTS, not
the data itself).

Scale shape:
- each snapshot collapses to its key grain in one pass: the scan projects
  ONLY ``(key, fingerprint_col)``, the fingerprint is md5'd map-side, and
  a groupBy(key) with map-side partial aggregation yields one
  ``(key, fp, n)`` row per key — nothing wider than 2 strings + a long
  ever shuffles, regardless of how wide the snapshot rows are.
- the diff itself is ONE full-outer equi-join on the key. Snapshots
  written bucketed by the key (sources/tables.py bucketing helpers) make
  it zero-shuffle; otherwise it is the canonical co-partitioned join AQE
  already handles, with no skew risk beyond the key's own distribution.
- the summary variant reduces the join output to ≤4 rows before the
  driver sees anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: classification values, in report order
STATUSES = ("added", "changed", "removed", "unchanged")


def _snapshot_grain(df: DataFrame, key_col: str, fingerprint_col: str) -> DataFrame:
    """One row per non-null key: ``(key, fp, n)`` where ``fp`` is the
    MINIMUM md5 over the key's non-null fingerprint values (deterministic
    under duplicate keys; all-null → null fp) and ``n`` the row count.
    Null keys are excluded by contract — key emptiness is the engine's
    KEY_EMPTY check's job, not the diff's."""
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.md5(F.col(fingerprint_col).cast("string")).alias("_fp"),
        )
        .groupBy("key")
        .agg(F.min("_fp").alias("fp"), F.count(F.lit(1)).alias("n"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "text",
) -> DataFrame:
    """→ one row per key in either snapshot: ``(<key_col>, status, n_old,
    n_new)`` with ``status`` ∈ ``added`` (new only) / ``removed`` (old
    only) / ``unchanged`` (both, same content fingerprint, null-safe) /
    ``changed`` (both, different fingerprint). ``n_old``/``n_new`` are the
    key's row counts per snapshot (0 on the absent side), so duplicate-key
    drift is visible even when the fingerprint is stable."""
    o = _snapshot_grain(old, key_col, fingerprint_col).select(
        "key", F.col("fp").alias("fp_old"), F.col("n").alias("n_old")
    )
    n = _snapshot_grain(new, key_col, fingerprint_col).select(
        "key", F.col("fp").alias("fp_new"), F.col("n").alias("n_new")
    )
    joined = o.join(n, "key", "full")
    status = (
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("key").alias(key_col),
        status.alias("status"),
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "url",
    op_col: str = "op",
    broadcast_threshold: int = 10_000_000,
) -> DataFrame:
    """Apply a CDC changeset to a snapshot → the next snapshot, without a
    table format's MERGE INTO: ``changes`` carries the base's schema plus
    ``op_col`` ∈ {'upsert', 'delete'}; an upsert replaces the key's base
    row (or inserts it), a delete drops it, keys the changeset doesn't
    mention pass through untouched. The relational core of Iceberg/Delta
    ``MERGE WHEN MATCHED``, usable on plain parquet snapshots — the write
    path a recurring-crawl pipeline needs between ``snapshot_diff`` runs.

    Contract: at most one change row per key (the caller collapses
    multi-event CDC streams to final state first — e.g. max_by(event,
    seq)); violated keys raise. Null-key change rows are rejected too:
    silently dropping them would hide data loss.

    Plan: survivors = base LEFT ANTI changes (one equi-join on the key,
    removing both delete and to-be-replaced keys) ∪ the changeset's
    upsert rows. The changeset is typically ≪ base (a day's crawl vs the
    corpus): when its row count is under ``broadcast_threshold`` the anti
    join broadcasts it — a map-side filter, zero shuffle of the 10^12-row
    base; past the threshold it falls back to a shuffle join rather than
    OOM the executors (the bloom module's guard discipline). The union is
    read-time only — no rewrite of untouched data beyond the scan."""
    ops = changes.select(F.col(op_col).alias("_op"), "*").drop(op_col)
    # contract checks in ONE bounded agg action over the (small) changeset
    chk = ops.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(~F.col("_op").isin("upsert", "delete"), 1)
        ).alias("bad_ops"),
        F.count(F.when(F.col(key_col).isNull(), 1)).alias("null_keys"),
        F.countDistinct(key_col).alias("n_keys"),
    ).first()
    if chk.bad_ops:
        raise ValueError(
            f"apply_changeset: {chk.bad_ops} change rows with an op other "
            f"than upsert|delete"
        )
    if chk.null_keys:
        raise ValueError(
            f"apply_changeset: {chk.null_keys} NULL-key change rows"
        )
    if chk.n_keys != chk.n:
        raise ValueError(
            f"apply_changeset: {chk.n - chk.n_keys} duplicate-key change "
            f"rows — collapse the CDC stream to final state per key first"
        )
    n_changes = chk.n
    keys = ops.select(key_col)
    if n_changes <= broadcast_threshold:
        keys = F.broadcast(keys)
    survivors = base.join(keys, key_col, "left_anti")
    upserts = ops.where(F.col("_op") == "upsert").drop("_op").select(
        *base.columns
    )
    return survivors.unionByName(upserts)


def extract_changeset(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    op_col: str = "op",
) -> DataFrame:
    """Derive the CDC changeset that turns snapshot ``old`` into snapshot
    ``new`` — the inverse of ``apply_changeset``, with the roundtrip law
    ``apply_changeset(old, extract_changeset(old, new)) ≡ new`` (tested).
    Output: ``new``'s schema plus ``op_col`` — one ``upsert`` row (the
    full new row) per added-or-changed key, one ``delete`` row (key +
    NULL payload) per removed key; unchanged keys emit nothing. This is
    what a recurring-crawl pipeline ships downstream instead of the whole
    snapshot: consumers replay deltas, not 10^12 rows.

    Change detection covers EVERY non-key column (md5 over the JSON of
    the full payload struct), unlike ``snapshot_diff``'s single
    ``fingerprint_col`` proxy — an extracted changeset must be exact or
    the roundtrip silently drops edits. Contract: unique non-NULL keys
    per snapshot (``apply_changeset``'s precondition; duplicate or NULL
    keys raise loudly with counts, one bounded agg per side).

    Plan: each snapshot collapses map-side to ``(key, fp)`` — old's
    payload NEVER shuffles regardless of row width; one full-outer
    equi-join of the two key-grain tables classifies keys; upsert rows
    come from ONE equi-join of the changed/added keys back to ``new``
    (the only place full rows move, and only the rows that actually
    changed); deletes are synthesized key + NULL payload. Snapshots
    bucketed by key make all three joins zero-shuffle."""
    payload = [c for c in new.columns if c != key_col]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"extract_changeset: snapshot schemas differ "
            f"({sorted(old.columns)} vs {sorted(new.columns)})"
        )

    def grain(df: DataFrame, side: str) -> DataFrame:
        chk = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col(key_col).isNull(), 1)).alias("null_keys"),
            F.countDistinct(key_col).alias("n_keys"),
        ).first()
        if chk.null_keys:
            raise ValueError(
                f"extract_changeset: {chk.null_keys} NULL-key rows in "
                f"{side} snapshot"
            )
        if chk.n_keys != chk.n:
            raise ValueError(
                f"extract_changeset: {chk.n - chk.n_keys} duplicate-key "
                f"rows in {side} snapshot — apply_changeset's contract "
                f"needs one row per key"
            )
        fp = (
            F.md5(F.to_json(F.struct(*payload)))
            if payload
            else F.lit("")  # key-only snapshot: adds/deletes only
        )
        return df.select(F.col(key_col), fp.alias(f"fp_{side}"))

    st = grain(old, "old").join(grain(new, "new"), key_col, "full")
    upsert_keys = st.where(
        F.col("fp_old").isNull()  # added
        | (
            F.col("fp_new").isNotNull()
            & (F.col("fp_old") != F.col("fp_new"))  # changed
        )
    ).select(key_col)
    upserts = upsert_keys.join(new, key_col, "inner").select(
        F.lit("upsert").alias(op_col), key_col, *payload
    )
    deletes = st.where(F.col("fp_new").isNull()).select(
        F.lit("delete").alias(op_col),
        F.col(key_col),
        *[F.lit(None).cast(new.schema[c].dataType).alias(c) for c in payload],
    )
    return upserts.unionByName(deletes)


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "text",
) -> DataFrame:
    """→ ≤4 rows ``(status, n_keys, n_rows_old, n_rows_new)`` — the
    bounded-output face for CLI/report use (the driver collects at most
    one row per status)."""
    return (
        snapshot_diff(old, new, key_col, fingerprint_col)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_old").alias("n_rows_old"),
            F.sum("n_new").alias("n_rows_new"),
        )
    )


def snapshot_as_of(
    log: DataFrame,
    key_col: str,
    ts_col: str,
    as_of,
    op_col: str = "op",
    delete_op: str = "delete",
    seq_col: str | None = None,
) -> DataFrame:
    """Time travel without a table format: reconstruct the table state AT
    ``as_of`` from a CDC log of ``(key, ts, op, payload...)`` rows — the
    event-sourcing replay that closes the snapshot family
    (`extract_changeset` derives the log, `apply_changeset` rolls it
    forward, this reads out ANY past state). Returns the payload rows of
    every key whose latest event at or before ``as_of`` is not a
    ``delete_op``; keys never seen by then, or deleted, emit nothing.

    Determinism under same-timestamp events: pass ``seq_col`` (a
    monotonic sequence/LSN) and the latest (ts, seq) wins; without one,
    ties break on ``op_col`` DESCENDING — with the default vocabulary
    'upsert' > 'delete', so an upsert and delete carrying the same
    timestamp resolve to the upsert, documented rather than
    partition-dependent.

    Plan: the ``ts <= as_of`` predicate is on the RAW log column, so it
    reaches the scan (parquet row-group skip / Iceberg partition prune —
    reading "state as of last March" never touches events after March);
    then ONE key-grain window (row_number over the shrunken log) and a
    filter. One shuffle total, log-partitioned by key if the log is
    bucketed."""
    order = [F.col(ts_col).desc()]
    order.append(
        F.col(seq_col).desc() if seq_col else F.col(op_col).desc()
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    latest = (
        log.where(F.col(ts_col) <= F.lit(as_of))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    drop = ["_rn", op_col, ts_col] + ([seq_col] if seq_col else [])
    return latest.where(F.col(op_col) != delete_op).drop(*drop)
