"""Driver-contract parity: a fast subset of __spark_entry__ queries
compared against their DuckDB oracles at sf0.001 (the full sweep runs
via tools/check_correctness.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR
from tools.check_correctness import TABLES, compare

FAST_QUERIES = [
    "agg_year", "agg_point_cut", "agg_range_cut", "agg_snowflake",
    "agg_expression", "agg_order_page", "agg_avg_var", "agg_split",
    "calc_sma", "calc_smvar", "rollup_ym", "crosstab",
    "events_hourly", "doc_lang_quality", "doc_fingerprint", "emb_topk",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = oracle_con.execute(entrymod.oracle_sql()[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "price_sum" in df.columns
