"""Positive evidence for the PPJoin prefix filter on a REALISTIC vocabulary.

The shipped documents corpus has a 31-word vocabulary, so every doc's
smallest-hash tokens are corpus-universal and the prefix filter cannot
prune there (round-4 A/B, see BASELINE.md). This test builds what the
filter was written for — a corpus whose vocabulary (20k tokens) dwarfs
the per-doc prefix — and shows, through the operator's own public entry
point and the exact same column expressions it uses, that:

1. losslessness holds end to end: _verified_jaccard returns exactly the
   planted near-duplicate pairs;
2. the prefix filter prunes the overwhelming majority (≥ 90%) of
   non-qualifying candidate pairs BEFORE the full intersect, which is
   the property that makes verification scale with surviving pairs.
"""

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.operators.llm import _verified_jaccard

N_DOCS = 120
DOC_LEN = 30
VOCAB = 20_000
THRESHOLD = 0.5


def _token(doc, slot):
    # deterministic pseudo-random draw from the big vocabulary — md5, not
    # a linear congruence, so distinct docs don't share structured runs
    import hashlib

    h = hashlib.md5(f"{doc}-{slot}".encode()).hexdigest()
    return f"w{int(h[:8], 16) % VOCAB}"


def _build_docs(spark):
    rows = []
    for d in range(N_DOCS):
        toks = [_token(d, s) for s in range(DOC_LEN)]
        rows.append((d, " ".join(toks)))
    # planted near-dups: doc 1000+d = doc d with 3 of 30 tokens replaced
    # → Jaccard = 27/33 ≈ 0.818 ≥ 0.5
    for d in range(10):
        toks = [_token(d, s) for s in range(DOC_LEN)]
        for s in range(3):
            toks[s] = f"alt{d}_{s}"
        rows.append((1000 + d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lossless_and_prunes_on_large_vocab(spark):
    docs = _build_docs(spark)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    cand = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in _verified_jaccard(
            docs, cand, "doc_a", "doc_b", THRESHOLD
        ).collect()
    }
    assert got == {(d, 1000 + d) for d in range(10)}

    # same expressions as the operator: sorted xxhash64 token sets,
    # FP-safe prefix length, length + prefix-overlap prefilters
    pref_len = (
        F.size("toks")
        - F.ceil(F.lit(THRESHOLD) * F.size("toks") - F.lit(1e-9))
        + 1
    ).cast("int")
    tok = (
        docs.select(
            "doc_id",
            F.array_sort(
                F.transform(
                    F.array_distinct(F.split("text", " ")),
                    lambda t: F.xxhash64(t),
                )
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks").cast("double"))
        .withColumn("pref", F.slice("toks", F.lit(1), pref_len))
    )
    ta = tok.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("a_n"),
        F.col("pref").alias("a_pref"),
    )
    tb = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("b_n"),
        F.col("pref").alias("b_pref"),
    )
    joined = cand.join(F.broadcast(ta), "doc_a").join(
        F.broadcast(tb), "doc_b"
    )
    n_all = joined.count()
    n_surviving = (
        joined.filter(
            (1.0 + 1.0 / THRESHOLD) * F.least("a_n", "b_n")
            >= F.col("a_n") + F.col("b_n")
        )
        .filter(F.arrays_overlap("a_pref", "b_pref"))
        .count()
    )
    # ≥90% of the candidate stream never reaches the full intersect
    assert n_surviving >= 10  # the planted dups all survive (losslessness)
    assert n_surviving <= 0.1 * n_all, (
        f"prefix+length filters kept {n_surviving}/{n_all} pairs — "
        "expected <=10% on a 20k-token vocabulary"
    )
