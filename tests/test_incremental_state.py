"""Persisted incremental-dedup state (VERDICT round 3 #5).

q_llm_dedup_incremental's docstring claims a production deployment keeps the
two corpus-side structures — the md5-key table and the MinHash band table —
as PERSISTED, APPEND-ONLY state, so a daily delta probes an index instead of
recomputing signatures over the whole corpus. This file turns that claim
into evidence:

1. both tables round-trip as BUCKETED parquet (bucketBy = the at-rest
   layout lever from ARCHITECTURE.md);
2. appending a second ingest batch touches ZERO existing files (append-only
   under ingest — the reason LSH is the industry-standard incremental dedup
   index);
3. the delta probe joins read the state WITHOUT re-shuffling it (no
   Exchange over the state columns: the bucket layout IS the partitioning,
   so probe cost scales with the delta, not the corpus);
4. the state-backed probe returns exactly the same exact-dup ids and band
   candidates as recomputing from the raw documents table.
"""

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.operators.llm import _bands
from tests.conftest import SF_DIR

H_TABLE = "incstate_hashes"
B_TABLE = "incstate_bands"
# ingest slices: initial corpus (80%), first appended batch (10%), probe
# delta (10%) — the probe split matches q_llm_dedup_incremental's, so after
# the append the state covers exactly that query's "existing" 90%
IS_CORPUS = lambda: F.col("doc_id") % 10 >= 2  # noqa: E731 — column exprs
IS_BATCH1 = lambda: F.col("doc_id") % 10 == 1  # noqa: E731 — need an active
IS_DELTA = lambda: F.col("doc_id") % 10 == 0  # noqa: E731 — session (PySpark 4)


def _table_files(spark, table):
    loc = (
        spark.sql(f"DESCRIBE FORMATTED {table}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    return path, {
        f: (os.path.getsize(os.path.join(path, f)), os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        # data files only: _SUCCESS and .*.crc are job markers/checksums
        # that every write refreshes by design
        if not f.startswith(("_", "."))
    }


@pytest.fixture(scope="module")
def state(spark):
    docs = load_table(spark, SF_DIR, "documents")
    bands = _bands(spark, SF_DIR)

    def write(pred, mode):
        (
            docs.filter(pred)
            .select(F.md5("text").alias("h"), "doc_id")
            .write.mode(mode)
            .bucketBy(8, "h")
            .sortBy("h")
            .saveAsTable(H_TABLE)
        )
        (
            bands.join(docs.filter(pred).select("doc_id"), "doc_id", "left_semi")
            .write.mode(mode)
            .bucketBy(8, "band_id", "band_key")
            .saveAsTable(B_TABLE)
        )

    write(IS_CORPUS(), "overwrite")
    before = {t: _table_files(spark, t)[1] for t in (H_TABLE, B_TABLE)}
    write(IS_BATCH1(), "append")  # second ingest batch
    after = {t: _table_files(spark, t)[1] for t in (H_TABLE, B_TABLE)}
    yield docs, bands, before, after
    spark.sql(f"DROP TABLE IF EXISTS {H_TABLE}")
    spark.sql(f"DROP TABLE IF EXISTS {B_TABLE}")


def test_warehouse_is_isolated_per_run(spark):
    """VERDICT r7 #3: these fixtures saveAsTable, and a repo-local
    warehouse lets an orphaned table directory from ANOTHER process (a
    killed session, a driver run) fail every test here with
    LOCATION_ALREADY_EXISTS — DROP TABLE IF EXISTS can't see a location
    with no catalog entry. The session must point warehouse.dir at a
    per-run temp dir (tests/conftest.py), never inside the repo."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wd = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert not os.path.abspath(wd).startswith(repo + os.sep), wd


def test_append_leaves_existing_state_untouched(state):
    _, _, before, after = state
    for t in (H_TABLE, B_TABLE):
        missing = set(before[t]) - set(after[t])
        assert not missing, f"{t}: append removed files {missing}"
        changed = {
            f for f in before[t] if after[t][f] != before[t][f]
        }
        assert not changed, f"{t}: append rewrote files {changed}"
        assert len(after[t]) > len(before[t])  # batch really landed


def test_probe_joins_do_not_reshuffle_state(spark, state):
    docs, bands, _, _ = state
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # exact-dup probe: delta md5 keys vs the persisted key table
        delta_h = docs.filter(IS_DELTA()).select(
            F.md5("text").alias("dh"), F.col("doc_id").alias("inc_id")
        )
        exact = delta_h.join(
            spark.table(H_TABLE), F.col("h") == F.col("dh"), "left_semi"
        )
        exact.collect()
        plan = exact._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(h#" not in plan, (
            "probe re-shuffled the persisted key table"
        )
        assert "Exchange hashpartitioning(dh#" in plan  # delta-sized shuffle

        # near-dup candidate probe: delta bands vs the persisted band table
        delta_b = bands.join(
            docs.filter(IS_DELTA()).select("doc_id"), "doc_id", "left_semi"
        ).select(
            F.col("doc_id").alias("inc_id"),
            F.col("band_id").alias("d_band_id"),
            F.col("band_key").alias("d_band_key"),
        )
        cand = delta_b.join(
            spark.table(B_TABLE),
            (F.col("band_id") == F.col("d_band_id"))
            & (F.col("band_key") == F.col("d_band_key")),
        ).select("inc_id", F.col("doc_id").alias("ex_id"))
        cand.collect()
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(band_id#" not in plan, (
            "probe re-shuffled the persisted band table"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_streaming_probe_reads_persisted_state(spark, state):
    """The capstone marriage: the LIVE ingest stream (row-wise stateless
    MinHash signatures, streaming/live.py) probes the PERSISTED bucketed
    band table via a stream-static join — the full production ingest-dedup
    shape (stream in, at-rest index, no recompute) — and must flag exactly
    the candidate pairs the batch derivation finds against the same 90%
    corpus."""
    from mapreduce_machine_learning_spark.streaming.live import (
        incremental_dedup_probe_stream,
        run_to_memory,
    )

    docs, bands, _, _ = state
    live = run_to_memory(
        spark,
        incremental_dedup_probe_stream(
            spark, SF_DIR, ex_bands=spark.table(B_TABLE)
        ),
        "inc_dedup_probe_persisted",
        "append",
    )
    got = {(r.inc_id, r.ex_id) for r in live.collect()}
    delta_b = bands.join(
        docs.filter(IS_DELTA()).select("doc_id"), "doc_id", "left_semi"
    ).select(F.col("doc_id").alias("inc_id"), "band_id", "band_key")
    ex_b = bands.join(
        docs.filter(~IS_DELTA()).select("doc_id"), "doc_id", "left_semi"
    ).select(F.col("doc_id").alias("ex_id"), "band_id", "band_key")
    want = {
        (r.inc_id, r.ex_id)
        for r in delta_b.join(ex_b, ["band_id", "band_key"])
        .select("inc_id", "ex_id")
        .distinct()
        .collect()
    }
    assert got == want and got


def test_state_probe_matches_recompute(spark, state):
    docs, bands, _, _ = state
    # after the append the state holds doc_id % 10 != 0 — identical to
    # q_llm_dedup_incremental's "existing" side, recomputed here from raw.
    # The synthetic corpus has no cross-split exact duplicates (verified at
    # sf0.001 and sf0.01), so the probe batch also carries re-keyed COPIES
    # of a few existing docs — a realistic re-crawl — to make the exact-dup
    # branch non-vacuous.
    recrawl = (
        docs.filter(~IS_DELTA())
        .orderBy("doc_id")
        .limit(5)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    delta_h = (
        docs.filter(IS_DELTA())
        .select("doc_id", "text")
        .unionByName(recrawl)
        .select(F.md5("text").alias("dh"), F.col("doc_id").alias("inc_id"))
    )
    got_exact = {
        r["inc_id"]
        for r in delta_h.join(
            spark.table(H_TABLE), F.col("h") == F.col("dh"), "left_semi"
        ).collect()
    }
    want_exact = {
        r["inc_id"]
        for r in delta_h.join(
            docs.filter(~IS_DELTA()).select(F.md5("text").alias("h")),
            F.col("h") == F.col("dh"),
            "left_semi",
        ).collect()
    }
    assert got_exact == want_exact and got_exact

    delta_b = bands.join(
        docs.filter(IS_DELTA()).select("doc_id"), "doc_id", "left_semi"
    ).select(
        F.col("doc_id").alias("inc_id"),
        F.col("band_id").alias("d_band_id"),
        F.col("band_key").alias("d_band_key"),
    )
    got_cand = {
        (r["inc_id"], r["ex_id"])
        for r in delta_b.join(
            spark.table(B_TABLE),
            (F.col("band_id") == F.col("d_band_id"))
            & (F.col("band_key") == F.col("d_band_key")),
        )
        .select("inc_id", F.col("doc_id").alias("ex_id"))
        .collect()
    }
    ex_bands = bands.join(
        docs.filter(~IS_DELTA()).select("doc_id"), "doc_id", "left_semi"
    ).select(
        F.col("doc_id").alias("ex_id"),
        F.col("band_id").alias("e_band_id"),
        F.col("band_key").alias("e_band_key"),
    )
    want_cand = {
        (r["inc_id"], r["ex_id"])
        for r in delta_b.join(
            ex_bands,
            (F.col("e_band_id") == F.col("d_band_id"))
            & (F.col("e_band_key") == F.col("d_band_key")),
        ).collect()
    }
    assert got_cand == want_cand and got_cand
