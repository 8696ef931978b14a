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
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
