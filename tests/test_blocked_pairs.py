"""Sub-blocked gram-matrix scorer (_blocked_cosine_pairs): a synthetically
hot block must produce exactly the brute-force pair set even when split
across many chunk-pair tasks, with every pair emitted exactly once."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.operators.llm import (
    _BLOCK_CAP,
    _blocked_cosine_pairs,
)
from tests.conftest import SF_DIR_T2


def _synthetic_hot_block(spark, n=40, dim=8):
    """One hot label with n vectors (deterministic values, no RNG), plus a
    small second label to prove blocks stay independent."""
    rows = []
    for i in range(n):
        vec = [math.sin(0.7 * i + 0.3 * d) for d in range(dim)]
        rows.append(Row(blk=1, vid=i, vec=vec))
    for i in range(3):
        vec = [math.cos(0.5 * i + 0.2 * d) for d in range(dim)]
        rows.append(Row(blk=2, vid=1000 + i, vec=vec))
    return rows


def _brute_pairs(rows, min_cos):
    by_blk = {}
    for r in rows:
        by_blk.setdefault(r.blk, []).append(r)
    out = set()
    for blk, rs in by_blk.items():
        for i in range(len(rs)):
            for j in range(i + 1, len(rs)):
                a, b = rs[i], rs[j]
                dot = sum(x * y for x, y in zip(a.vec, b.vec))
                na = math.sqrt(sum(x * x for x in a.vec))
                nb = math.sqrt(sum(x * x for x in b.vec))
                if dot / (na * nb) > min_cos:
                    out.add((blk, min(a.vid, b.vid), max(a.vid, b.vid)))
    return out


def test_hot_block_splits_into_chunk_pairs(spark):
    """cap=8 over a 40-vector label → 5 chunks, 15 chunk-pair tasks; the
    union of their outputs must equal brute force, each pair exactly once."""
    rows = _synthetic_hot_block(spark)
    df = spark.createDataFrame(rows)
    got = _blocked_cosine_pairs(df, min_cos=0.5, cap=8).collect()
    keys = [(r.blk, r.ia, r.ib) for r in got]
    assert len(keys) == len(set(keys)), "pair emitted from >1 chunk-pair task"
    assert set(keys) == _brute_pairs(rows, 0.5)
    assert all(r.ia < r.ib for r in got)


def test_chunked_matches_single_block(spark):
    """Identical output with cap=8 (many tasks) and cap=10**6 (one task):
    chunking must not change values, only memory layout."""
    df = spark.createDataFrame(_synthetic_hot_block(spark))
    small = {
        (r.blk, r.ia, r.ib, round(r.cos, 9))
        for r in _blocked_cosine_pairs(df, min_cos=-2.0, cap=8).collect()
    }
    big = {
        (r.blk, r.ia, r.ib, round(r.cos, 9))
        for r in _blocked_cosine_pairs(df, min_cos=-2.0, cap=10**6).collect()
    }
    assert small == big


def test_default_cap_is_single_chunk_at_t2_scale(spark):
    """At sf0.01 every label is under _BLOCK_CAP, so the sub-blocked plan
    degenerates to one chunk per label — the round-1 results must be
    bit-identical (this is the 'identical results at sf0.01' gate)."""
    emb = spark.read.parquet(f"{SF_DIR_T2}/embeddings.parquet")
    max_label = (
        emb.groupBy("label").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_label <= _BLOCK_CAP
