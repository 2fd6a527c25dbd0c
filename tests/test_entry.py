"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() agree."""

import __spark_entry__ as entrymod

from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"event_type", "n_events", "n_readmit", "readmit_rate"} <= cols


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 45


def test_queries_runnable_at_smoke_scale(spark):
    # every registered query must at least build a plan and return a schema
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.schema is not None, name
