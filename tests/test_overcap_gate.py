"""The near-dup verify-join broadcast cap trips NATURALLY (VERDICT r7 #6).

Round 7 pinned both join regimes of the verify stage, but the over-cap
shuffle regime was only reachable through the SPARK_GRAFT_VERIFY_BCAST_CAP_B
override: every available corpus estimated under the 256 MiB cap, so the
production gate itself never said "no". This file generates the corpus where
it genuinely does — 64 near-identical documents sharing a 220,000-token
vocabulary plus one unique token each (the LSH-degenerate extreme: every doc
collides in every band) — and pins that, with ZERO env knobs and ZERO session
conf overrides:

  * the gate's own plan-time estimate exceeds the default cap
    (2 x (12 B/token + 64 B/doc) ≈ 338 MB vs 256 MiB — the x2 is the ADVICE
    r7 both-copies accounting, which is load-bearing here);
  * the broadcast hint is withheld and the token-array joins run as
    SortMergeJoin (a small-side broadcast of the PAIR stream chosen by
    Catalyst stats is fine and expected — the ceiling risk is the array
    frame, not the pairs);
  * the hint-free plan still returns the exact Jaccard values.

The corpus is written to parquet and read back so Catalyst sees honest
file-relation stats (a createDataFrame literal would carry bogus tiny
estimates and stats, not the gate, would decide the join). It is cached at a
fixed /tmp path across runs — deterministic content, ~25 s to regenerate.
"""

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.operators import llm
from mapreduce_machine_learning_spark.plans import explain_str
from tools.gen_overcap_corpus import N_DOCS, SHARED_TOKENS, write_corpus

CORPUS_DIR = "/tmp/mrml_overcap_corpus"


@pytest.fixture(scope="module")
def overcap_docs(spark):
    write_corpus(spark, CORPUS_DIR)
    return spark.read.parquet(os.path.join(CORPUS_DIR, "documents.parquet"))


def test_gate_flips_naturally_on_overcap_corpus(spark, overcap_docs):
    assert "SPARK_GRAFT_VERIFY_BCAST_CAP_B" not in os.environ
    # chain pairs (i, i+1) cover every doc, so the candidate-doc semi-join
    # bounds nothing away and the token-array frame is the full corpus —
    # exactly what LSH banding emits on near-identical docs, without
    # paying for the 16-hash signature pipeline in a unit test
    cand = spark.createDataFrame(
        [(i, i + 1) for i in range(N_DOCS - 1)], "doc_a bigint, doc_b bigint"
    )
    df = llm._verified_jaccard(overcap_docs, cand, "doc_a", "doc_b")

    gate = dict(llm._LAST_VERIFY_GATE)
    assert gate["fits"] is False, gate
    assert gate["explicit_cap"] is False and gate["audit_skip"] is False
    assert gate["cap_b"] == llm._VERIFY_BROADCAST_CAP_B
    assert gate["est_b"] > gate["cap_b"], gate
    # the estimate prices both broadcast copies of the real token count
    expect = 2 * (12 * N_DOCS * (SHARED_TOKENS + 1) + 64 * N_DOCS)
    assert gate["est_b"] == expect

    # hint withheld -> the array joins sort-merge; nothing the size of the
    # array frame is broadcast (Catalyst may still broadcast the tiny pair
    # stream from honest stats — that is the correct plan, not a leak)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan, plan

    # and the hint-free regime computes the right values: doc i and i+1
    # share SHARED_TOKENS of their SHARED_TOKENS+1 distinct tokens
    rows = sorted(df.collect(), key=lambda r: r[0])
    assert [(r.doc_a, r.doc_b) for r in rows] == [
        (i, i + 1) for i in range(N_DOCS - 1)
    ]
    want = SHARED_TOKENS / (SHARED_TOKENS + 2)
    assert all(abs(r.jac - want) < 1e-9 for r in rows)


def test_overcap_artifact():
    """SHUFFLE_neardup_overcap_r8.json (tools/overcap_probe.py): the FULL
    production query `q_llm_neardup_pairs` on the over-cap corpus — gate
    flipped naturally, array frame never broadcast (total broadcast bytes
    are pair-stream-sized, two orders under the gate estimate), and the
    hint-free output byte-identical to the forced-broadcast regime."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SHUFFLE_neardup_overcap_r8.json")) as fh:
        art = json.load(fh)
    g = art["gate_natural"]
    assert g["fits"] is False
    assert g["explicit_cap"] is False and g["audit_skip"] is False
    assert g["cap_b"] == llm._VERIFY_BROADCAST_CAP_B
    assert g["est_b"] > g["cap_b"]
    assert art["plan_natural_has_sort_merge_join"] is True
    assert art["array_frame_stayed_off_broadcast"] is True
    assert art["regimes_identical_output"] is True
    assert art["output_rows"] > 0
    # the no-ceiling regime's memory story: per-task peak stays bounded
    # (sort buffers, < 1 GiB) while the rest SPILLS — this corpus reaches
    # the spill path naturally under the tool's fixed 12g/16-thread
    # session (round 7 needed an artificial memory.fraction squeeze),
    # and the output above is still byte-identical across regimes
    assert 0 < art["memory_natural"]["peak_task_memory_bytes"] < (1 << 30)
    assert art["memory_natural"]["spill_bytes"] > 0
    gb = art["gate_forced_broadcast"]
    assert gb["fits"] is True and gb["explicit_cap"] is True


def test_forced_fit_restores_broadcast_hint_on_same_corpus(
    spark, overcap_docs
):
    """Control: a huge explicit cap on the SAME corpus re-fits the frame
    and the hint forces BroadcastHashJoin even with auto-broadcast
    disabled — so the natural SMJ above is the GATE's doing, not an
    artifact of the corpus or session."""
    cand = spark.createDataFrame(
        [(i, i + 1) for i in range(N_DOCS - 1)], "doc_a bigint, doc_b bigint"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = llm._verified_jaccard(
            overcap_docs, cand, "doc_a", "doc_b", broadcast_cap_b=1 << 40
        )
        gate = dict(llm._LAST_VERIFY_GATE)
        assert gate["fits"] is True and gate["explicit_cap"] is True
        assert "BroadcastHashJoin" in explain_str(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
