"""Multi-format store sources (sources/workspace.py ParquetStore
EXTENSIONS): ORC / CSV / TSV / JSON-lines tables resolve through the
same catalog as parquet, with parquet shadowing row formats."""

import os

import pytest

from cubes_spark.errors import StoreError
from cubes_spark.sources.workspace import ParquetStore
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fmt_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fmtstore"))
    src = ParquetStore(spark, SF_DIR)
    nation = src.table("nation")
    nation.coalesce(1).write.mode("overwrite") \
        .option("header", "true").csv(os.path.join(base, "nation.csv"))
    src.table("region").coalesce(1).write.mode("overwrite") \
        .json(os.path.join(base, "region.jsonl"))
    events = src.table("events").limit(200)
    events.coalesce(1).write.mode("overwrite") \
        .orc(os.path.join(base, "events.orc"))
    nation.coalesce(1).write.mode("overwrite") \
        .option("header", "true").option("sep", "\t") \
        .csv(os.path.join(base, "supplier.tsv"))
    return base


def test_list_tables_all_formats(spark, fmt_dir):
    store = ParquetStore(spark, fmt_dir)
    assert store.list_tables() == ["events", "nation", "region",
                                   "supplier"]
    assert "nation" in store and "nope" not in store
    with pytest.raises(StoreError):
        store.table("nope")


def test_csv_roundtrip_values(spark, fmt_dir):
    src = ParquetStore(spark, SF_DIR).table("nation")
    got = ParquetStore(spark, fmt_dir).table("nation")
    assert sorted(got.columns) == sorted(src.columns)
    want = {(r.n_nationkey, r.n_name, r.n_regionkey)
            for r in src.collect()}
    have = {(r.n_nationkey, r.n_name, r.n_regionkey)
            for r in got.collect()}
    assert have == want


def test_tsv_separator(spark, fmt_dir):
    got = ParquetStore(spark, fmt_dir).table("supplier")
    assert "n_name" in got.columns
    assert got.count() == 25


def test_jsonl_roundtrip(spark, fmt_dir):
    src = ParquetStore(spark, SF_DIR).table("region")
    got = ParquetStore(spark, fmt_dir).table("region")
    assert {(r.r_regionkey, r.r_name) for r in got.collect()} == \
        {(r.r_regionkey, r.r_name) for r in src.collect()}


def test_orc_preserves_timestamps(spark, fmt_dir):
    got = ParquetStore(spark, fmt_dir).table("events")
    field = dict(got.dtypes)["ts"]
    assert field == "timestamp"
    assert got.count() == 200


def test_parquet_shadows_row_formats(spark, fmt_dir):
    store = ParquetStore(spark, fmt_dir)
    src = ParquetStore(spark, SF_DIR)
    src.table("nation").write.mode("overwrite").parquet(
        os.path.join(fmt_dir, "nation.parquet"))
    fresh = ParquetStore(spark, fmt_dir)
    loc, ext = fresh._locate("nation")
    assert ext == ".parquet"
    assert store.table("nation") is not None  # cached CSV still fine
