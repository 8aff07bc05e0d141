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
    extras = E.extra_queries()
    extra_oracles = E.extra_oracle_sql()
    assert queries, "registry must not be empty"
    # the driver's correctness gate records exactly the first 50
    # registration-order entries — the gated tier must fit it EXACTLY so
    # every entry gets a driver row
    assert len(queries) == 50, len(queries)
    # every oracle key must have a query; rows-only queries may lack oracles
    assert set(oracles) <= set(queries)
    assert set(extra_oracles) <= set(extras)
    assert not (set(extras) & set(queries)), "a query lives in ONE tier"
    missing_oracles = set(queries) - set(oracles)
    # only the documented approximate/nondeterministic ops are rows-only
    assert missing_oracles == {"ann_ivf"}
    assert set(extras) - set(extra_oracles) == {"approx_distinct"}
    for name, fn in {**queries, **extras}.items():
        assert callable(fn), name
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
    for name, sql in {**oracles, **extra_oracles}.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
