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
    assert len(qs) >= 224, len(qs)
    assert len(oracles) >= 211, len(oracles)


def test_driver_window_fully_oracled():
    """The driver hash-checks only the FIRST 50 queries() entries — every
    one of those slots must carry a SQL oracle (rows-only queries belong
    past the window; see the ordering comments in queries())."""
    qs, oracles = entry.queries(), entry.oracle_sql()
    window = list(qs)[:50]
    unoracled = [n for n in window if n not in oracles]
    assert not unoracled, f"window entries without oracle: {unoracled}"


def test_entry_is_a_registered_query(spark):
    df = entry.entry(spark)
    assert df.columns == ["check_id", "n"]
