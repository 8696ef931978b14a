#!/usr/bin/env python
"""Similarity-search example: the vector-index surface end to end — build
the LSH and IVF indexes over the embedding column, answer a top-10 query
through each, audit recall against the exact brute-force scan, and run the
ANN-blocked semantic dedup. The "switching user's" smoke test for the
embedding path of a training-data pipeline.

    python examples/similarity_search.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.registry import all_queries  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("similarity-search")
    qs = all_queries()

    exact = qs["q_ml_knn"](spark, sf_dir).collect()
    print("exact top-10 (brute force):")
    for r in exact[:5]:
        print(f"  vec {r.vec_id:>5}  cos {r.cos_sim:.6f}")

    exact_ids = {r.vec_id for r in exact}
    for name, label in (
        ("q_llm_ann_knn", "LSH (12 bands × 4 sign bits)"),
        ("q_llm_ann_ivf_knn", "IVF (probe 4 of 16 sampled cells)"),
    ):
        approx = qs[name](spark, sf_dir).collect()
        hit = len({r.vec_id for r in approx} & exact_ids)
        print(f"{label}: recall@10 = {hit}/10")

    buckets = qs["q_llm_ann_buckets"](spark, sf_dir).collect()
    sizes = sorted((r.bucket_size for r in buckets), reverse=True)
    print(
        f"LSH index: {len(buckets)} multi-occupant buckets, "
        f"largest {sizes[:3]}"
    )
    cells = qs["q_llm_ann_ivf_cells"](spark, sf_dir).collect()
    print(
        f"IVF index: {len(cells)} cells, sizes "
        f"{sorted(r.cell_size for r in cells)}"
    )

    dedup = qs["q_llm_dedup_semantic_ann"](spark, sf_dir).collect()[0]
    print(
        f"ANN-blocked semantic dedup: {dedup.vectors} vectors, "
        f"{dedup.n_edges} verified near-dup edges → "
        f"{dedup.survivors} survivors ({dedup.dropped} dropped)"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
