"""Sink round-trips (SURVEY §2.2 sinks note) and multimodal plumbing."""

import pytest

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.sources import FORMATS, read_table, write_table
from mapreduce_machine_learning_spark.sources.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_features,
    media_stats,
    synth_media,
)
from tests.conftest import SF_DIR


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "orders").limit(500)
    # CSV/JSON have no native timestamp fidelity guarantee across writers —
    # serialize the timestamp explicitly for those formats
    src = src.withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert _canon(back, src.columns) == _canon(src, src.columns)


def test_partitioned_write_prunes(spark, tmp_path):
    src = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_part")
    write_table(src, path, "parquet", partition_by=["o_orderstatus"])
    back = read_table(spark, path, "parquet").filter(F.col("o_orderstatus") == "F")
    # partition pruning: the scan must carry a partition filter on the dir column
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    expected = src.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_multimodal_pipeline(spark):
    media = synth_media(spark, n=64).repartition(8)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    # deterministic across partitionings
    feats2 = extract_features(synth_media(spark, n=64).repartition(3))
    assert sorted((r["media_id"], tuple(r["features"])) for r in rows) == sorted(
        (r["media_id"], tuple(r["features"])) for r in feats2.collect()
    )
    stats = media_stats(feats).collect()
    assert {r["kind"] for r in stats} == {"image", "audio", "video"}


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00")
    f = fake_features(b"same-bytes")
    assert list(f) == list(fake_features(b"same-bytes"))
