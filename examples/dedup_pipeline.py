#!/usr/bin/env python
"""Training-data dedup example: MinHash-LSH candidates → exact Jaccard →
connected components → survivor set, written to parquet.

    python examples/dedup_pipeline.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.functions.graph import dedup_survivors  # noqa: E402
from mapreduce_machine_learning_spark.io import load_table  # noqa: E402
from mapreduce_machine_learning_spark.operators.llm import (  # noqa: E402
    q_llm_neardup_pairs,
)
from mapreduce_machine_learning_spark.sources import write_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001", out_dir: str | None = None) -> None:
    spark = example_session("dedup-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    pairs = q_llm_neardup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    survivors = dedup_survivors(docs, "doc_id", pairs)
    kept = survivors.count()
    total = docs.count()
    print(f"{total} docs → {kept} survivors ({total - kept} near-dups removed)")
    out = out_dir or os.path.join(tempfile.mkdtemp(), "survivors")
    write_table(docs.join(survivors, "doc_id"), out, "parquet")
    print(f"deduplicated corpus written to {out}")

    from mapreduce_machine_learning_spark.registry import all_queries

    qs = all_queries()
    sample = qs["q_llm_sample_weighted"](spark, sf_dir).collect()
    print(
        f"length-weighted sample of survivably-long docs: "
        f"{[r['doc_id'] for r in sample[:8]]}…"
    )
    fuzz = qs["q_text_symspell"](spark, sf_dir).collect()
    print(
        f"vocab typo-pairs within edit distance 1 (SymSpell join): "
        f"{[(r['tok_a'], r['tok_b']) for r in fuzz[:5]]}"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
