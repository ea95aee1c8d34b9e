"""Checklist graph checks + backbone taxon matching (the reference's
ChecklistEvaluator / TaxonomyInterpreter shapes, self-contained).
Exercises the semantics a neo4j normalizer gives for free: non-power-of-two
cycles, cycle descendants, orphan-terminated chains, the exact max_depth
boundary, synonym chains, rank order, and the three match tiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.checklist import (
    checklist_graph_checks,
    taxon_match,
    unresolved_ancestors,
)

NODE_SCHEMA = "node_id long, parent_id long, accepted_id long, rank string"


def _nodes(spark, rows):
    return spark.createDataFrame(rows, NODE_SCHEMA)


def test_unresolved_ancestors_cycles_and_chains(spark):
    rows = [
        (1, None, None, "kingdom"),      # root
        (2, 1, None, "family"),          # fine
        (3, 3, None, "family"),          # self-cycle
        (4, 5, None, "family"),          # 3-cycle (not a power of two)
        (5, 6, None, "family"),
        (6, 4, None, "family"),
        (7, 4, None, "species"),         # descendant of a cycle
        (8, 999, None, "family"),        # orphan parent → chain ends, no cycle
        (9, 8, None, "species"),         # under the orphan chain — also ends
    ]
    flagged = {
        r.node_id
        for r in unresolved_ancestors(_nodes(spark, rows), max_depth=8).collect()
    }
    assert flagged == {3, 4, 5, 6, 7}


def test_unresolved_ancestors_depth_boundary(spark):
    # chain of height h: node i's parent is i-1, node 0 is root.
    # max_depth=4 → flagged iff h >= 4.
    rows = [(i, i - 1 if i > 0 else None, None, "x") for i in range(6)]
    flagged = {
        r.node_id
        for r in unresolved_ancestors(_nodes(spark, rows), max_depth=4).collect()
    }
    assert flagged == {4, 5}  # h(4)=4, h(5)=5; h(3)=3 stays clean


def test_graph_checks_all_kinds(spark):
    rows = [
        (1, None, None, "kingdom"),
        (2, 1, None, "family"),
        (3, 2, None, "species"),          # clean
        (4, 2, 3, "species"),             # synonym → accepted ok (3 not a synonym)
        (5, 2, 4, "species"),             # synonym → accepted IS a synonym → chained
        (6, 777, None, "species"),        # parent orphan
        (7, 2, 888, "species"),           # accepted orphan
        (8, 3, None, "family"),           # family under species → rank order
        (9, 9, None, "species"),          # self-cycle (also rank order: species<=species)
    ]
    out = checklist_graph_checks(
        _nodes(spark, rows), rank_order=["kingdom", "family", "species"], max_depth=8
    )
    got = {(r.node_id, r.check_id) for r in out.collect()}
    assert got == {
        (5, "CHAINED_SYNONYM"),
        (6, "PARENT_ID_INVALID"),
        (7, "ACCEPTED_ID_INVALID"),
        (8, "CLASSIFICATION_RANK_ORDER_INVALID"),
        (9, "PARENT_CYCLE"),
        (9, "CLASSIFICATION_RANK_ORDER_INVALID"),
    }
    chained = next(r for r in out.collect() if r.check_id == "CHAINED_SYNONYM")
    assert chained.found == "4->3"


def test_taxon_match_tiers_and_determinism(spark):
    backbone = spark.createDataFrame(
        [(10, "puma concolor"), (11, "puma concolor"), (12, "felis catus"),
         (13, "puma yagouaroundi")],
        "taxon_id long, name string",
    )
    records = spark.createDataFrame(
        [
            (1, "puma concolor"),        # EXACT → min id 10
            (2, "Puma,  CONCOLOR"),      # FUZZY (canonical form equal)
            (3, "puma nosuch"),          # HIGHERRANK via first token → min 10
            (4, "lynx lynx"),            # NONE
        ],
        "rec_id long, name string",
    )
    out = {r.rec_id: (r.match_type, r.matched_id) for r in taxon_match(records, backbone).collect()}
    assert out == {
        1: ("EXACT", 10),
        2: ("FUZZY", 10),
        3: ("HIGHERRANK", 10),
        4: ("NONE", None),
    }


def test_taxon_match_plan_is_broadcast_only(spark):
    backbone = spark.createDataFrame([(1, "a b")], "taxon_id long, name string")
    records = spark.createDataFrame([(1, "a b")], "rec_id long, name string")
    plan = (
        taxon_match(records, backbone)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 3, plan


def test_unresolved_ancestors_plan_stays_linear(spark):
    """With lineage truncation (default), the final round is ONE join over
    a checkpointed frontier — not the exponential 2^rounds-1 self-join
    tree a naive doubling produces."""
    df = _nodes(spark, [(1, None, None, "x")])
    plan = (
        unresolved_ancestors(df, max_depth=64)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Join") == 1, plan
    # and the untruncated variant really is the tree (the thing we avoid)
    tree = (
        unresolved_ancestors(df, max_depth=8, truncate_lineage=False)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert tree.count("Join") == 7, tree


def test_taxon_match_broadcast_guard(spark):
    """Past max_broadcast_rows the three tier joins must NOT carry a
    broadcast hint (an unguarded ~7M-name backbone would force three
    multi-hundred-MB broadcasts); results are identical either way."""
    from gbif_data_validator_spark.operators.checklist import taxon_match

    backbone = spark.createDataFrame(
        [(i, f"Genus species{i}") for i in range(1, 40)],
        "taxon_id long, name string",
    )
    records = spark.createDataFrame(
        [(1, "Genus species1"), (2, "genus SPECIES2!"), (3, "Genus unknownx"), (4, "Nope")],
        "rec_id long, name string",
    )
    small = taxon_match(records, backbone)
    big = taxon_match(records, backbone, max_broadcast_rows=10)
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in small._jdf.queryExecution().analyzed().toString()
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(small) == key(big)
    got = {r.rec_id: r.match_type for r in small.collect()}
    assert got == {1: "EXACT", 2: "FUZZY", 3: "HIGHERRANK", 4: "NONE"}
