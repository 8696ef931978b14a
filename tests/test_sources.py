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
    resize_media,
    sample_frames,
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


def test_resize_media_shapes_and_determinism(spark):
    media = synth_media(spark, 30)
    out = resize_media(media, 32, 24)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 30
    for r in rows.values():
        if r.kind == "audio":
            assert r.height == 48 + r.media_id  # untouched
        else:
            assert (r.width, r.height) == (32, 24)
            assert len(r.payload) == (32 * 24 // 16) * 16
    again = {r.media_id: r for r in resize_media(media, 32, 24).collect()}
    assert all(bytes(again[i].payload) == bytes(rows[i].payload) for i in rows)


def test_sample_frames_fanout(spark):
    media = synth_media(spark, 30)
    frames = sample_frames(media, n_frames=3)
    rows = frames.collect()
    n_videos = sum(1 for r in media.collect() if r.kind == "video")
    assert len(rows) == 3 * n_videos
    assert {r.frame_idx for r in rows} == {0, 1, 2}
    # frames chain into the declarative plan: count per media over the
    # binary column works without Python
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per)


def test_resize_then_frames_compose(spark):
    media = synth_media(spark, 12)
    frames = sample_frames(resize_media(media, 16, 16), n_frames=2)
    assert frames.count() == 2 * sum(
        1 for r in media.collect() if r.kind == "video"
    )


def test_lines_roundtrip(spark, tmp_path):
    from mapreduce_machine_learning_spark.sources import read_lines, write_lines

    src = load_table(spark, SF_DIR, "documents").limit(200).select("text")
    path = str(tmp_path / "docs_lines")
    write_lines(src, path)
    back = read_lines(spark, path)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["text"] for r in src.collect()
    )
    # parse back into columns JVM-side (the reference's split-the-line idiom)
    parsed = back.select(F.split("value", " ").alias("toks"))
    assert parsed.filter(F.size("toks") < 1).count() == 0


def test_media_neardup_pipeline(spark):
    """Perceptual-dedup shape over the multimodal plumbing: payload →
    feature vector (stubbed codec, deterministic) → exact-feature bucket →
    duplicate groups. Duplicated payloads MUST collide into one bucket and
    distinct payloads must not — proving the media dedup pipeline works
    end to end around the codec seam (swap fake_features for a CLIP/pHash
    model and nothing else changes)."""
    from pyspark.sql import functions as F

    base = synth_media(spark, 48)
    # re-ingest 12 of the payloads under new media ids (the duplicates)
    dups = (
        base.filter(F.col("media_id") < 12)
        .withColumn("media_id", F.col("media_id") + 1000)
    )
    media = base.unionByName(dups)
    feats = extract_features(media)
    # bucket by the full feature signature (md5-derived ⇒ exact dedup;
    # a real perceptual feature would LSH-band these instead)
    sig = F.md5(F.concat_ws(",", F.col("features").cast("array<string>")))
    groups = (
        feats.withColumn("sig", sig)
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("media_id").alias("survivor"),
        )
    )
    rows = groups.collect()
    assert sum(1 for r in rows if r.n > 1) == 12  # exactly the re-ingested
    assert sum(r.n for r in rows) == 60
    # survivor policy: the original (lowest id) wins in every dup group
    assert all(r.survivor < 1000 for r in rows if r.n > 1)
    # plumbing stays Arrow-vectorized: no row-pickled Python
    plan = groups._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
