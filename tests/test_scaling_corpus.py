"""tools/gen_scaling_corpus.py determinism — SCALING.md's reproducibility
claim rests on every scale regenerating bit-identically (md5-drawn tokens,
seeded numpy), and on the structural invariants the curves interpret:
linear planted-dup count and one fixed IVF centroid id per cluster."""

from __future__ import annotations

from tools.gen_scaling_corpus import (
    BASE_DOCS,
    DUP_EVERY,
    N_CLUSTERS,
    gen_documents,
    gen_embeddings,
)


def test_documents_regenerate_identically():
    a, b = gen_documents(1), gen_documents(1)
    assert a.equals(b)
    assert a.num_rows == BASE_DOCS + BASE_DOCS // DUP_EVERY


def test_planted_dups_scale_linearly_and_overlap_base():
    docs = gen_documents(1)
    texts = docs.column("text").to_pylist()
    n_planted = BASE_DOCS // DUP_EVERY
    # doc BASE+k is doc 50k with 3 tokens replaced -> high token overlap
    for k in range(0, n_planted, 17):
        base = set(texts[DUP_EVERY * k].split())
        dup = set(texts[BASE_DOCS + k].split())
        jac = len(base & dup) / len(base | dup)
        assert jac >= 0.5, f"planted pair {k} under threshold: {jac}"


def test_embeddings_regenerate_identically_and_cluster_centroids():
    a, b = gen_embeddings(1), gen_embeddings(1)
    assert a.equals(b)
    labels = a.column("label").to_pylist()
    # one fixed centroid id per cluster: ids 0..15 carry labels 0..15
    assert labels[:N_CLUSTERS] == list(range(N_CLUSTERS))


def test_tpch_tables_regenerate_identically_and_join_keys_close():
    """The join-curve tables (round 6): bit-identical regeneration, sizes
    exactly s x the sf0.1 bench corpus, and referentially closed keys --
    every o_custkey resolves to a customer and every l_orderkey to an
    order, so the join's selectivity (and therefore its scaling slope) is
    a property of the sizes, not of dangling keys."""
    from tools.gen_scaling_corpus import (
        BASE_CUST,
        BASE_LINEITEM,
        BASE_ORDERS,
        gen_tpch,
    )

    c1, o1, l1 = gen_tpch(1)
    c2, o2, l2 = gen_tpch(1)
    assert c1.equals(c2) and o1.equals(o2) and l1.equals(l2)
    assert (c1.num_rows, o1.num_rows, l1.num_rows) == (
        BASE_CUST,
        BASE_ORDERS,
        BASE_LINEITEM,
    )
    import numpy as np

    assert np.asarray(o1.column("o_custkey")).max() < BASE_CUST
    assert np.asarray(l1.column("l_orderkey")).max() < BASE_ORDERS
    assert np.asarray(l1.column("l_discount")).max() <= 0.10
    # the group-by keys span their full domains at every scale
    assert len(set(c1.column("c_mktsegment").to_pylist())) == 5
    assert len(set(o1.column("o_orderpriority").to_pylist())) == 5


def test_join_curve_corpus_drives_unmodified_q_join_multi(spark, tmp_path):
    """End-to-end pin of the join scaling harness: the generated TPC-H-ish
    tables must drive the UNMODIFIED q_join_multi (that is the whole point
    of matching the bench schemas) and produce the full top-10 -- the
    round-6 generator bug this guards against collapsed the 25 group-by
    combinations to 5 via a key correlation, which silently shrank the
    result to 5 rows while timings kept looking plausible."""
    import os

    import pyarrow.parquet as pq

    from mapreduce_machine_learning_spark.operators import relational
    from tools.gen_scaling_corpus import generate_tpch

    d = str(tmp_path / "x1")
    generate_tpch(1, d)
    rows = relational.q_join_multi(spark, d).collect()
    assert len(rows) == 10
    got_cols = list(rows[0].asDict())
    assert got_cols == ["c_mktsegment", "o_orderpriority", "revenue"]
    # deterministic top-10: revenue strictly ordered desc with tie-break
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # both group keys span their domains in the result's source tables
    seg = pq.read_table(os.path.join(d, "customer.parquet"))
    assert len(set(seg.column("c_mktsegment").to_pylist())) == 5
