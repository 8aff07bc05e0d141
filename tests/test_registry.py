"""Driver-contract registry invariants: every oracle belongs to a query,
every query is callable with (spark, sf_dir), and the entry point serves
the flagship query."""

from __future__ import annotations

import inspect


def test_registry_invariants():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    queries = E.queries()
    oracles = E.oracle_sql()
    assert queries, "registry must not be empty"
    # every oracle key must have a query; rows-only queries may lack oracles
    assert set(oracles) <= set(queries)
    missing_oracles = set(queries) - set(oracles)
    # only the documented approximate/nondeterministic ops are rows-only
    assert missing_oracles == {"ann_ivf", "approx_distinct"}
    for name, fn in queries.items():
        assert callable(fn), name
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
