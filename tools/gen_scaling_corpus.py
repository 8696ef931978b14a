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
