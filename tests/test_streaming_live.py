"""Batch ↔ stream equivalence (SURVEY §5.2 item 5): the live Structured
Streaming twins must reproduce the §2.7 batch results."""

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.streaming.live import (
    events_stream,
    run_foreach_batch,
    run_to_memory,
    tumbling_agg,
)
from tests.conftest import SF_DIR


def _batch_tumble(spark):
    ev = load_table(spark, SF_DIR, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_complete_mode_equals_batch(spark):
    live = run_to_memory(
        spark,
        tumbling_agg(events_stream(spark, SF_DIR), watermark=None),
        "tumble_complete",
        "complete",
    )
    assert _rows(live) == _rows(_batch_tumble(spark))


def test_append_mode_is_closed_window_prefix(spark):
    live = run_to_memory(
        spark,
        tumbling_agg(events_stream(spark, SF_DIR), watermark="1 hour"),
        "tumble_append",
        "append",
    )
    batch = _batch_tumble(spark)
    live_rows = _rows(live)
    batch_rows = _rows(batch)
    # append emits exactly the windows closed by the final watermark
    # (bounded stream: watermark ends at max(ts) - 1h)
    assert set(live_rows) <= set(batch_rows)
    max_ts = load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    closed = [r for r in batch_rows if r[1] is not None]
    import datetime

    wm = max_ts - datetime.timedelta(hours=1)
    expected = [r for r in closed if r[1] <= wm]
    assert live_rows == sorted(expected)


def test_foreach_batch_sees_all_rows(spark):
    ev = events_stream(spark, SF_DIR)
    seen = run_foreach_batch(spark, ev)
    total = sum(n for _, n in seen)
    assert total == load_table(spark, SF_DIR, "events").count()


def test_update_mode_final_state_equals_batch(spark):
    # update mode re-emits a window row each time it changes; with one
    # availableNow batch there is exactly one emission per window, which
    # must equal the batch aggregate
    live_raw = run_to_memory(
        spark,
        tumbling_agg(events_stream(spark, SF_DIR), watermark="1 hour"),
        "tumble_update",
        "update",
    )
    # single availableNow batch → one emission per changed window
    assert _rows(live_raw) == _rows(_batch_tumble(spark))


def test_sliding_window_live_equals_batch(spark):
    ev = events_stream(spark, SF_DIR)
    live = run_to_memory(
        spark,
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w")).agg(
            F.count(F.lit(1)).alias("cnt")
        ),
        "slide_complete",
        "complete",
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _rows(live) == _rows(batch)


def test_stream_stream_range_join_equals_batch(spark):
    from mapreduce_machine_learning_spark.streaming.live import range_join_stream

    # stream-stream joins emit only in append mode; fold counts driver-side
    live_pairs = run_to_memory(
        spark,
        range_join_stream(spark, SF_DIR),
        "range_join_live",
        "append",
    )
    from collections import Counter

    live_counts = Counter(r["u1"] for r in live_pairs.collect())
    ev = load_table(spark, SF_DIR, "events")
    e1 = ev.select(F.col("user_id").alias("u1"), F.col("ts").alias("ts1"))
    e2 = ev.select(F.col("user_id").alias("u2"), F.col("ts").alias("ts2"))
    batch = (
        e1.join(
            e2,
            (F.col("u1") == F.col("u2"))
            & (F.col("ts2") > F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy("u1")
        .count()
    )
    batch_counts = {r["u1"]: r["count"] for r in batch.collect()}
    assert dict(live_counts) == batch_counts


def test_streaming_dedup_keeps_one_row_per_user(spark):
    from mapreduce_machine_learning_spark.streaming.live import dedup_users_stream

    live = run_to_memory(
        spark,
        dedup_users_stream(spark, SF_DIR).select("user_id"),
        "dedup_live",
        "append",
    )
    got = sorted(r["user_id"] for r in live.collect())
    want = sorted(
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    )
    assert got == want


def test_trending_live_equals_batch(spark):
    """q_stream_trending's live twin: windowed counts stream in complete
    mode, the per-window top-3 rank runs over the materialized state —
    the foreachBatch/downstream-rank pattern for rank-over-stream."""
    from pyspark.sql import Window

    from mapreduce_machine_learning_spark.operators.streaming_batch import (
        q_stream_trending,
    )

    sdf = (
        events_stream(spark, SF_DIR)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    live = run_to_memory(spark, sdf, "trending_complete", "complete")
    w = Window.partitionBy("window_start").orderBy(F.desc("cnt"), "event_type")
    ranked = (
        live.select(F.col("w.start").alias("window_start"), "event_type", "cnt")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )
    assert _rows(ranked) == _rows(q_stream_trending(spark, SF_DIR))


def test_streaming_dedup_within_watermark_bounded_state(spark):
    """dropDuplicatesWithinWatermark: with a horizon covering the replayed
    dataset, one surviving row per user — same result as unbounded dedup,
    but with watermark-evicted (bounded) state, the production path."""
    from mapreduce_machine_learning_spark.streaming.live import (
        dedup_users_stream_bounded,
    )

    live = run_to_memory(
        spark,
        dedup_users_stream_bounded(spark, SF_DIR).select("user_id"),
        "dedup_wm_live",
        "append",
    )
    got = sorted(r["user_id"] for r in live.collect())
    want = sorted(
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .collect()
    )
    assert got == want


def test_session_window_live_equals_batch(spark):
    from mapreduce_machine_learning_spark.streaming.live import session_agg

    live = run_to_memory(
        spark,
        session_agg(events_stream(spark, SF_DIR)),
        "session_append",
        "append",
    )
    # batch twin: same session_window aggregation on the static frame
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    live_rows = _rows(live)
    batch_rows = _rows(batch)
    assert set(live_rows) <= set(batch_rows)
    # append emits exactly the sessions closed by the final watermark
    # (bounded replay: watermark ends at max(ts) - 30min)
    import datetime

    max_ts = load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    wm = max_ts - datetime.timedelta(minutes=30)
    expected = [r for r in batch_rows if r[1] <= wm]
    assert live_rows == sorted(expected)
    assert len(live_rows) > 0


def test_incremental_dedup_probe_stream_equals_batch(spark):
    """Streaming ingest-dedup: the stream-static LSH band probe must flag
    exactly the candidate (incoming, existing) pairs the batch incremental
    dedup derives — including that the row-wise stateless MinHash
    signature (array_min over transform) equals the batch explode→MIN
    aggregation."""
    from mapreduce_machine_learning_spark.operators.llm import _bands
    from mapreduce_machine_learning_spark.streaming.live import (
        incremental_dedup_probe_stream,
    )

    live = run_to_memory(
        spark,
        incremental_dedup_probe_stream(spark, SF_DIR),
        "inc_dedup_probe",
        "append",
    )
    got = {(r.inc_id, r.ex_id) for r in live.collect()}

    bands = _bands(spark, SF_DIR)
    bi = bands.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("inc_id"), "band_id", "band_key"
    )
    be = bands.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("ex_id"), "band_id", "band_key"
    )
    want = {
        (r.inc_id, r.ex_id)
        for r in bi.join(be, ["band_id", "band_key"])
        .select("inc_id", "ex_id")
        .distinct()
        .collect()
    }
    # live emits one row per matching band; the distinct pair sets must
    # agree exactly
    assert got == want


def test_probe_stream_full_index_drops_self_pairs(spark):
    """Supplying the FULL band table (the obvious 'probe the session
    index' call — it covers the in-flight slice too) must not make every
    streamed doc collide with its own band rows: the probe drops
    inc_id == ex_id pairs, and against existing-side ids it reports
    exactly what the filtered default index reports."""
    from mapreduce_machine_learning_spark.operators.llm import _bands
    from mapreduce_machine_learning_spark.streaming.live import (
        incremental_dedup_probe_stream,
    )

    live = run_to_memory(
        spark,
        incremental_dedup_probe_stream(
            spark, SF_DIR, ex_bands=_bands(spark, SF_DIR)
        ),
        "inc_dedup_probe_full_index",
        "append",
    )
    got = {(r.inc_id, r.ex_id) for r in live.collect()}
    assert all(i != e for i, e in got)
    # restricted to existing-side ids, the full-index probe agrees with
    # the default (% 10 != 0) index
    default = run_to_memory(
        spark,
        incremental_dedup_probe_stream(spark, SF_DIR),
        "inc_dedup_probe_default_again",
        "append",
    )
    want = {(r.inc_id, r.ex_id) for r in default.collect()}
    assert {(i, e) for i, e in got if e % 10 != 0} == want


def test_ann_probe_stream_equals_batch(spark):
    """Streaming ANN lookup: the in-stream LSH signatures (Arrow
    mapInPandas per micro-batch) probing the static band index must flag
    exactly the candidate pairs the batch index derives."""
    from mapreduce_machine_learning_spark.operators.ann import _bands
    from mapreduce_machine_learning_spark.streaming.live import (
        ann_probe_stream,
    )

    live = run_to_memory(
        spark, ann_probe_stream(spark, SF_DIR), "ann_probe", "append"
    )
    got = {(r.query_id, r.cand_id) for r in live.collect()}

    bands = _bands(spark, SF_DIR)
    q = bands.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "band_id", "band_key"
    )
    c = bands.select(F.col("vec_id").alias("cand_id"), "band_id", "band_key")
    want = {
        (r.query_id, r.cand_id)
        for r in q.join(c, ["band_id", "band_key"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
        .collect()
    }
    assert got == want and len(want) > 0


def test_ivf_probe_stream_equals_batch(spark, tmp_path):
    """Streaming IVF retrieval: the in-stream cell assignment (Arrow
    kernel closed over the 16-row centroid metadata) must probe exactly
    the cells the batch JVM-expression ranking picks, and the stream-
    static join against BOTH index forms — the session cell frame and the
    at-rest cell-partitioned parquet — must emit the identical candidate
    set."""
    from pyspark.sql import Window

    from mapreduce_machine_learning_spark.functions import cosine
    from mapreduce_machine_learning_spark.operators import ann
    from mapreduce_machine_learning_spark.streaming.live import (
        ivf_probe_stream,
    )

    # batch expectation: per query, top-nprobe cells by (r6 cos desc, cid)
    # — the q_llm_ann_ivf_knn probe generalized to every streamed query —
    # then all members of those cells minus self
    cells = ann._ivf_cells(spark, SF_DIR).select("vec_id", "cid")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = ann.centroid_frame(emb).select("cid", "ce")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine("qe", "ce"), 6)), "cid"
    )
    probe_cells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ann._IVF_NPROBE)
        .select("query_id", "cid")
    )
    want = {
        (r.query_id, r.cand_id)
        for r in probe_cells.join(
            cells.select(F.col("vec_id").alias("cand_id"), "cid"), "cid"
        )
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .collect()
    }

    live = run_to_memory(
        spark, ivf_probe_stream(spark, SF_DIR), "ivf_probe", "append"
    )
    got = {(r.query_id, r.cand_id) for r in live.collect()}
    assert got == want and len(want) > 0

    # and against the PERSISTED cell-partitioned layout (the appended-index
    # contract of test_ivf_index_append_delta)
    path = str(tmp_path / "ivf_at_rest")
    emb.join(cells, "vec_id").write.partitionBy("cid").parquet(path)
    live2 = run_to_memory(
        spark,
        ivf_probe_stream(spark, SF_DIR, index=spark.read.parquet(path)),
        "ivf_probe_persisted",
        "append",
    )
    assert {(r.query_id, r.cand_id) for r in live2.collect()} == want
