"""Deterministic realistic-vocabulary corpus generator for scaling runs.

The shipped testdata's 31-word vocabulary makes near-dup pair counts grow
quadratically (VERDICT r4), which is the wrong regime for measuring how the
minhash→verify pipeline scales: on a real corpus LSH prunes and work tracks
the PLANTED near-dup rate. This generator produces the real regime, at sizes
1x/4x/16x the sf0.1 corpus, with the same schemas the engine's `T()` reader
expects — so the scaling harness runs the UNMODIFIED production operators
(`q_llm_neardup_pairs`, `_ivf_cells`, `q_llm_ann_ivf_knn`) by passing the
generated directory as `sf_dir`.

Documents (extends tests/test_prefix_filter_vocab.py's builder):
  * 5000*s base docs, 30-60 tokens drawn md5-deterministically from a
    20k-token vocabulary (distinct docs share almost no tokens → LSH band
    collisions are essentially only the planted ones);
  * 2% planted near-dups: doc BASE+k is doc 50*k with 3 tokens replaced
    (Jaccard ≈ 0.8 ≥ the 0.5 threshold) → true-pair count scales LINEARLY.

Embeddings: 2000*s unit vectors in 16 Gaussian clusters (dim 64, matching
_RP_DIM), cluster = vec_id % 16 so the fixed IVF centroid ids 0,31,…,465
land one per cluster and the index stays balanced at every scale. Seeded
numpy; float32 like the shipped corpus.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 20_000
BASE_DOCS = 5_000
BASE_VECS = 2_000
DUP_EVERY = 50  # 2% planted near-dup rate
DIM = 64
N_CLUSTERS = 16

# TPC-H-ish relational tables for the q_join_multi scaling curve
# (VERDICT r5 #4): base sizes match sf0.1 exactly (FIXTURES.md), so
# "scale s" means s× the bench corpus. Only the columns the flagship
# join touches plus one numeric filler each, to keep generation and IO
# proportional to the real tables.
BASE_CUST = 15_000
BASE_ORDERS = 150_000
BASE_LINEITEM = 600_000
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _token(doc: int, slot: int) -> str:
    h = hashlib.md5(f"{doc}-{slot}".encode()).hexdigest()
    return f"w{int(h[:8], 16) % VOCAB}"


def gen_documents(scale: int):
    n = BASE_DOCS * scale
    ids, texts = [], []
    for d in range(n):
        toks = [_token(d, s) for s in range(30 + d % 31)]
        ids.append(d)
        texts.append(" ".join(toks))
    # planted near-dups, ids disjoint from the base range
    for k in range(n // DUP_EVERY):
        src = k * DUP_EVERY
        toks = [_token(src, s) for s in range(30 + src % 31)]
        for s in range(3):
            toks[s] = f"alt{k}_{s}"
        ids.append(n + k)
        texts.append(" ".join(toks))
    langs = [("en", "de", "fr", "es")[i % 4] for i in ids]
    sources = [("web", "wiki", "code", "news", "books")[i % 5] for i in ids]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(scale: int):
    m = BASE_VECS * scale
    rng = np.random.default_rng(1234)  # fixed across scales: centers first
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids = np.arange(m, dtype=np.int64)
    labels = (ids % N_CLUSTERS).astype(np.int32)
    noise = np.random.default_rng(5678 + scale).normal(
        scale=0.25, size=(m, DIM)
    )
    vecs = centers[labels] + noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def _dict_col(indices: np.ndarray, values: list[str]) -> pa.Array:
    """Low-cardinality string column as a dictionary array — parquet keeps
    the dictionary encoding, so a 38M-row string column costs int32s."""
    return pa.DictionaryArray.from_arrays(
        pa.array(indices.astype(np.int32)), pa.array(values, pa.string())
    )


def gen_tpch(scale: int):
    """customer/orders/lineitem at s× the sf0.1 bench corpus, fully
    vectorized (64× lineitem = 38.4M rows generates in seconds).
    Deterministic per scale; key distribution uniform (o_custkey round-
    robin over customers, l_orderkey uniform over orders → mean fan-out 4,
    same as the bench corpus)."""
    n_c = BASE_CUST * scale
    n_o = BASE_ORDERS * scale
    n_l = BASE_LINEITEM * scale
    rng = np.random.default_rng(97)

    ck = np.arange(n_c, dtype=np.int64)
    customer = pa.table(
        {
            "c_custkey": pa.array(ck),
            "c_mktsegment": _dict_col(ck % len(SEGMENTS), SEGMENTS),
            "c_acctbal": pa.array(rng.uniform(-999, 9999, n_c).round(2)),
        }
    )

    ok = np.arange(n_o, dtype=np.int64)
    orders = pa.table(
        {
            "o_orderkey": pa.array(ok),
            "o_custkey": pa.array(ok % n_c),
            # rng, NOT an affine function of o_orderkey: any (a*ok+b) % 5
            # is a bijection of ok % 5 and therefore perfectly correlated
            # with c_mktsegment = o_custkey % 5 — which collapsed the
            # 5×5 = 25 group-by combinations to 5 on the first cut
            "o_orderpriority": _dict_col(
                rng.integers(0, len(PRIORITIES), n_o), PRIORITIES
            ),
            "o_totalprice": pa.array(rng.uniform(900, 500000, n_o).round(2)),
        }
    )

    lineitem = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_o, n_l, dtype=np.int64)),
            "l_extendedprice": pa.array(
                rng.uniform(900, 105000, n_l).round(2)
            ),
            "l_discount": pa.array(
                rng.integers(0, 11, n_l).astype(np.float64) / 100.0
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, n_l).astype(np.float64)
            ),
        }
    )
    return customer, orders, lineitem


def generate_tpch(scale: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    customer, orders, lineitem = gen_tpch(scale)
    for name, t in (
        ("customer", customer),
        ("orders", orders),
        ("lineitem", lineitem),
    ):
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    print(
        f"scale {scale}: {customer.num_rows} cust, {orders.num_rows} orders, "
        f"{lineitem.num_rows} lineitem -> {out_dir}",
        flush=True,
    )


def generate(scale: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = gen_documents(scale)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    emb = gen_embeddings(scale)
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    print(
        f"scale {scale}: {docs.num_rows} docs, {emb.num_rows} vecs -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    scale = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else f".scaling/x{scale}"
    generate(scale, out)
