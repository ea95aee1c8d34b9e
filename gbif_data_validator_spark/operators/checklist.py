"""Checklist-graph checks and backbone taxon matching — the reference's two
external-service evaluators, re-expressed self-contained on DataFrames.

Reference analogs:
- ``ChecklistEvaluator`` (evaluator/ChecklistEvaluator.java:74-130) loads
  the taxon file into an embedded neo4j via ChecklistBank's Normalizer and
  reads back per-usage issues. The graph issues it surfaces
  (api/model/EvaluationType.java:84-96: PARENT_NAME_USAGE_ID_INVALID,
  ACCEPTED_NAME_USAGE_ID_INVALID, CHAINED_SYNOYM, PARENT_CYCLE,
  CLASSIFICATION_RANK_ORDER_INVALID) are plain relational properties of the
  (node, parent, accepted, rank) edge list — no graph database needed:
  orphan pointers are anti-joins, chained synonyms a self-join, and parent
  cycles fall out of pointer doubling (log2(depth) self-joins, each a
  shuffle of narrow key pairs — the 10^9-node-safe formulation).
- ``TaxonomyInterpreter`` (evaluator/EvaluatorFactory.java:200-207) matches
  names against the GBIF backbone over HTTP, yielding
  TAXON_MATCH_NONE/FUZZY/HIGHERRANK (EvaluationType.java:61-63). Here the
  backbone is a broadcast dimension and the three tiers are three broadcast
  joins with COALESCE priority: exact name → canonical-form fuzzy → first
  token against the higher-rank dim.

Cycle semantics: ``PARENT_CYCLE`` flags every node whose ancestor chain
fails to reach a root (null parent) within ``max_depth`` hops — cycle
members AND their descendants, plus pathologically deep chains. The
reference's normalizer similarly refuses to classify anything under a
cycle (CLASSIFICATION_NOT_APPLIED); we fold both into one finding and
document the depth bound instead of hiding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECK_PARENT_ID_INVALID = "PARENT_ID_INVALID"
CHECK_ACCEPTED_ID_INVALID = "ACCEPTED_ID_INVALID"
CHECK_CHAINED_SYNONYM = "CHAINED_SYNONYM"
CHECK_PARENT_CYCLE = "PARENT_CYCLE"
CHECK_RANK_ORDER = "CLASSIFICATION_RANK_ORDER_INVALID"


def unresolved_ancestors(
    nodes: DataFrame, id_col: str = "node_id", parent_col: str = "parent_id",
    max_depth: int = 64, truncate_lineage: bool = True,
) -> DataFrame:
    """Nodes whose parent chain does NOT reach a root within ``max_depth``
    hops (cycle members, their descendants, and over-deep chains).

    Pointer doubling: after k rounds each node carries parent^(2^k); a
    chain that terminates goes NULL, a cycle never does. log2(max_depth)
    self-joins of (id, ptr) pairs — at 10^9 nodes that is ~6 shuffles of
    two longs, vs. the sequential walk's max_depth joins or a driver-side
    graph. Returns (id_col,) of flagged nodes.

    ``truncate_lineage`` (default on) lazily ``localCheckpoint``s the
    frontier each round: a self-join's lineage is a TREE, so without
    truncation Catalyst sees 2^rounds-1 join nodes (exponential optimize
    time; only partially deduped by ReusedExchange at execution).
    Checkpointing makes each round one join over a materialized frontier —
    the plan stays linear and the frontier (two longs per live node,
    shrinking every round) is the only thing stored."""
    if max_depth < 2 or (max_depth & (max_depth - 1)) != 0:
        raise ValueError("max_depth must be a power of two >= 2")
    ptr = nodes.select(F.col(id_col).alias("_id"), F.col(parent_col).alias("_ptr"))
    rounds = max_depth.bit_length() - 1  # 2^rounds = max_depth
    for _ in range(rounds):
        if truncate_lineage:
            ptr = ptr.localCheckpoint(eager=False)
        # ptr_{2d}(x) = ptr_d(ptr_d(x)); NULL propagates (chain ended) and
        # the live frontier shrinks each round — terminated chains drop out
        hop = ptr.select(F.col("_id").alias("_jid"), F.col("_ptr").alias("_jptr"))
        ptr = (
            ptr.where(F.col("_ptr").isNotNull())
            .join(hop, F.col("_ptr") == F.col("_jid"), "left")
            .select("_id", F.col("_jptr").alias("_ptr"))
        )
    return ptr.where(F.col("_ptr").isNotNull()).select(F.col("_id").alias(id_col))


def checklist_graph_checks(
    nodes: DataFrame,
    id_col: str = "node_id",
    parent_col: str = "parent_id",
    accepted_col: str = "accepted_id",
    rank_col: str = "rank",
    rank_order: list[str] | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """All checklist-graph findings over an edge list ``(node_id,
    parent_id, accepted_id, rank)`` → rows ``(node_id, check_id, expected,
    found)``. A node may appear once per violated check.

    Every check starts from a key-column reduction (only the four narrow
    columns are ever shuffled); reference-dataset membership checks are
    anti-joins like the referential operator (J1)."""
    rank_order = rank_order or ["kingdom", "phylum", "class", "order",
                                "family", "genus", "species"]
    rank_idx = F.create_map(
        *[F.lit(x) for pair in enumerate(rank_order) for x in (pair[1], pair[0])]
    )
    n = nodes.select(
        F.col(id_col).alias("node_id"),
        F.col(parent_col).cast("long").alias("parent_id"),
        F.col(accepted_col).cast("long").alias("accepted_id"),
        F.col(rank_col).alias("rank"),
    )
    ids = n.select(F.col("node_id").alias("_ref_id"))

    def _orphans(col: str, check_id: str) -> DataFrame:
        return (
            n.where(F.col(col).isNotNull())
            .join(ids, F.col(col) == F.col("_ref_id"), "left_anti")
            .select(
                "node_id",
                F.lit(check_id).alias("check_id"),
                F.lit("existing node id").alias("expected"),
                F.col(col).cast("string").alias("found"),
            )
        )

    parent_orphans = _orphans("parent_id", CHECK_PARENT_ID_INVALID)
    accepted_orphans = _orphans("accepted_id", CHECK_ACCEPTED_ID_INVALID)

    # synonym (accepted_id set) whose accepted target is itself a synonym
    tgt = n.select(
        F.col("node_id").alias("_tid"), F.col("accepted_id").alias("_tacc")
    )
    chained = (
        n.where(F.col("accepted_id").isNotNull())
        .join(tgt, F.col("accepted_id") == F.col("_tid"), "inner")
        .where(F.col("_tacc").isNotNull())
        .select(
            "node_id",
            F.lit(CHECK_CHAINED_SYNONYM).alias("check_id"),
            F.lit("accepted usage that is not itself a synonym").alias("expected"),
            F.concat_ws("->", F.col("accepted_id"), F.col("_tacc")).alias("found"),
        )
    )

    cycles = unresolved_ancestors(n, "node_id", "parent_id", max_depth).select(
        "node_id",
        F.lit(CHECK_PARENT_CYCLE).alias("check_id"),
        F.lit(f"ancestor chain reaching a root within {max_depth} hops").alias("expected"),
        F.lit("unterminated parent chain").alias("found"),
    )

    # parent's rank must be strictly higher (smaller index); unknown ranks
    # are skipped (rank vocabulary membership is a different check)
    parent_rank = n.select(
        F.col("node_id").alias("_pid"), F.col("rank").alias("_prank")
    )
    rank_bad = (
        n.where(F.col("parent_id").isNotNull())
        .join(parent_rank, F.col("parent_id") == F.col("_pid"), "inner")
        .where(
            rank_idx[F.col("_prank")].isNotNull()
            & rank_idx[F.col("rank")].isNotNull()
            & (rank_idx[F.col("_prank")] >= rank_idx[F.col("rank")])
        )
        .select(
            "node_id",
            F.lit(CHECK_RANK_ORDER).alias("check_id"),
            F.lit("parent of strictly higher rank").alias("expected"),
            F.concat_ws("<=", F.col("_prank"), F.col("rank")).alias("found"),
        )
    )

    return (
        parent_orphans.unionByName(accepted_orphans)
        .unionByName(chained)
        .unionByName(cycles)
        .unionByName(rank_bad)
    )


def canonical_name(col: F.Column) -> F.Column:
    """Fuzzy-match canonical form: lowercase, non-alphanumerics collapsed
    to single spaces, trimmed — the deterministic stand-in for the
    backbone's name normalization."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


#: backbone rows above which the three tier dims stop being force-broadcast
#: and fall back to shuffle joins — the real GBIF backbone is ~7M names, and
#: three forced broadcasts of hundreds of MB would pin every executor
MAX_BROADCAST_BACKBONE_ROWS = 2_000_000


def taxon_match(
    records: DataFrame,
    backbone: DataFrame,
    rec_id_col: str = "rec_id",
    rec_name_col: str = "name",
    bb_id_col: str = "taxon_id",
    bb_name_col: str = "name",
    max_broadcast_rows: int = MAX_BROADCAST_BACKBONE_ROWS,
) -> DataFrame:
    """Three-tier backbone match → ``(rec_id, name, match_type,
    matched_id)`` with match_type ∈ EXACT | FUZZY | HIGHERRANK | NONE
    (EvaluationType.java:61-63). Ties inside the backbone (several taxa
    sharing a canonical form or first token) resolve to the smallest
    taxon_id so the result is deterministic.

    Plan: the backbone and its two derived dims (canonical form, first
    token) are BROADCAST when the backbone fits (one cheap count, same
    guard discipline as operators/bloom.py) — record side scanned once
    with three broadcast left joins, no record-side shuffle. Past
    ``max_broadcast_rows`` the tier joins become plain shuffle joins
    instead of pinning every executor with a multi-hundred-MB build side
    ×3; Catalyst/AQE still picks the physical strategy from there."""
    bb = backbone.select(
        F.col(bb_id_col).alias("_bb_id"), F.col(bb_name_col).alias("_bb_name")
    )
    n_bb = bb.count()  # one cheap key-column-only agg, driver sees a scalar
    hint = F.broadcast if n_bb <= max_broadcast_rows else (lambda d: d)
    exact_dim = bb.groupBy(F.col("_bb_name").alias("_ex_name")).agg(
        F.min("_bb_id").alias("_ex_id")
    )
    canon_dim = bb.groupBy(canonical_name(F.col("_bb_name")).alias("_cn_name")).agg(
        F.min("_bb_id").alias("_cn_id")
    )
    token_dim = bb.groupBy(
        F.get(F.split(canonical_name(F.col("_bb_name")), " "), 0).alias("_tk_name")
    ).agg(F.min("_bb_id").alias("_tk_id"))

    r = records.select(
        F.col(rec_id_col).alias("rec_id"), F.col(rec_name_col).alias("name")
    )
    canon = canonical_name(F.col("name"))
    out = (
        r.join(hint(exact_dim), F.col("name") == F.col("_ex_name"), "left")
        .join(hint(canon_dim), canon == F.col("_cn_name"), "left")
        .join(
            hint(token_dim),
            F.get(F.split(canon, " "), 0) == F.col("_tk_name"),
            "left",
        )
    )
    match_type = (
        F.when(F.col("_ex_id").isNotNull(), F.lit("EXACT"))
        .when(F.col("_cn_id").isNotNull(), F.lit("FUZZY"))
        .when(F.col("_tk_id").isNotNull(), F.lit("HIGHERRANK"))
        .otherwise(F.lit("NONE"))
    )
    return out.select(
        "rec_id",
        "name",
        match_type.alias("match_type"),
        F.coalesce("_ex_id", "_cn_id", "_tk_id").alias("matched_id"),
    )
