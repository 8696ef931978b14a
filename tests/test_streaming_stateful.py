"""applyInPandasWithState sessionization vs the batch gaps-and-islands truth.

The events table is re-staged as three time-ranged files streamed one per
microbatch (maxFilesPerTrigger=1), so sessions genuinely span state updates
across batches. Sessions still open at end-of-stream remain in state, so the
expected set is the batch sessions minus each user's final session.
"""

import os
import tempfile
import time

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.streaming.stateful import sessionize_stateful
from tests.conftest import SF_DIR


def _stage_time_ranged_files(spark, n_files=3):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    out = tempfile.mkdtemp(prefix="events_ranged_")
    bounds = ev.approxQuantile(
        "ts_us", [i / n_files for i in range(1, n_files)], 0.001
    )
    lo = None
    for i in range(n_files):
        hi = bounds[i] if i < n_files - 1 else None
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts_us") > lo)
        if hi is not None:
            part = part.filter(F.col("ts_us") <= hi)
        part = part.select("user_id", "ts")
        path = os.path.join(out, f"chunk_{i}")
        part.coalesce(1).write.parquet(path)
        lo = hi
        time.sleep(1.1)  # file-source orders batches by modification time
    return out, ev


def _batch_sessions(ev):
    per = ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("events"),
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    return [
        (r["user_id"], r["s_us"], r["e_us"], r["events"]) for r in per.collect()
    ]


def test_stateful_sessions_match_batch(spark):
    stage, ev = _stage_time_ranged_files(spark)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(stage, "*"))
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["events"])
        for r in spark.table("stateful_sessions").collect()
    )

    batch = _batch_sessions(ev)
    # drop each user's final (still-open) session
    last_per_user = {}
    for row in batch:
        if row[0] not in last_per_user or row[1] > last_per_user[row[0]][1]:
            last_per_user[row[0]] = row
    expected = sorted(r for r in batch if r != last_per_user[r[0]])
    assert got == expected
    assert len(got) > 0


def test_stateful_ewma_matches_batch_closed_form(spark):
    """The O(1)-state streaming EWMA must reproduce the batch telescoped
    closed form (q_stream_ewma) exactly: stage the daily-mean series as 3
    day-ranged files (days strictly ordered across batches — the replay
    contract), stream them one file per microbatch, and compare each
    type's final emitted EWMA."""
    from mapreduce_machine_learning_spark.registry import all_queries
    from mapreduce_machine_learning_spark.streaming.stateful import ewma_stateful

    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.avg("value").alias("m"))
        .select(
            "event_type",
            F.unix_micros(F.col("day").cast("timestamp")).alias("day_us"),
            "m",
        )
    )
    days = sorted(r["day_us"] for r in daily.select("day_us").distinct().collect())
    cuts = [days[len(days) // 3], days[2 * len(days) // 3]]
    stage = tempfile.mkdtemp(prefix="ewma_ranged_")
    lo = None
    for i, hi in enumerate(cuts + [None]):
        part = daily
        if lo is not None:
            part = part.filter(F.col("day_us") > lo)
        if hi is not None:
            part = part.filter(F.col("day_us") <= hi)
        part.coalesce(1).write.parquet(os.path.join(stage, f"chunk_{i}"))
        lo = hi
        time.sleep(1.1)  # file-source orders batches by modification time

    stream = (
        spark.readStream.schema("event_type string, day_us long, m double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(stage, "*"))
    )
    q = (
        ewma_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_ewma")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ewma_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("stateful_ewma").collect()
    assert rows
    final = {}
    for r in rows:
        if r["event_type"] not in final or r["day_us"] > final[r["event_type"]][0]:
            final[r["event_type"]] = (r["day_us"], r["ewma"])
    batch = {
        r["event_type"]: r["ewma"]
        for r in all_queries()["q_stream_ewma"](spark, SF_DIR).collect()
    }
    assert set(final) == set(batch)
    for et, (_, s) in final.items():
        assert abs(s - batch[et]) < 1e-6, (et, s, batch[et])
