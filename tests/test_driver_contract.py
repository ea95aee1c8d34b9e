"""Driver-contract shape guards: every oracle has a query, names are
stable identifiers, and the flagship entry() is wired to a real query."""

import __spark_entry__ as entry


def test_oracles_subset_of_queries():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"


def test_query_names_are_stable_identifiers():
    for name in entry.queries():
        assert name.replace("_", "").isalnum() and name == name.lower(), name


def test_contract_counts():
    """Keep an explicit floor so a refactor can't silently drop coverage."""
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 85, len(qs)
    assert len(oracles) >= 75, len(oracles)


def test_entry_is_a_registered_query(spark):
    df = entry.entry(spark)
    assert df.columns == ["check_id", "n"]
