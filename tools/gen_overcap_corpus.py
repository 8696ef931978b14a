"""Degenerate OVER-CAP corpus for the near-dup verify-join gate (VERDICT r7 #6).

Round 7 could only reach the verify stage's shuffle regime via the
SPARK_GRAFT_VERIFY_BCAST_CAP_B override: every available corpus estimated
under the 256 MiB broadcast cap, so the production gate itself never said
"no". This generator builds the corpus where it genuinely does:

  * N_DOCS near-identical documents — every doc shares one SHARED_TOKENS-word
    vocabulary and adds a single unique token, so every MinHash band of every
    doc collides (the LSH-degenerate extreme: candidate docs = all docs);
  * sum(n_tok) = N_DOCS x (SHARED_TOKENS + 1) distinct tokens, which the
    production estimator (operators/llm.py _verify_arrays_fit_broadcast)
    prices at 2 x (12 B/token + 64 B/doc) — both pair sides ship the frame —
    comfortably OVER _VERIFY_BROADCAST_CAP_B with no knob touched.

Schema matches /root/testdata documents.parquet (doc_id, text, lang, source,
n_chars) so the unmodified production operators run against the directory as
a drop-in sf_dir. Generation is all JVM-side expressions (sequence →
format_string → concat_ws): no Python row loop, deterministic, ~100 MB text.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 64
SHARED_TOKENS = 220_000
# estimator price: 2 * (12 * 64 * 220_001 + 64 * 64) B ≈ 338 MB, 1.26x the
# 256 MiB default cap — over it on the ACTUAL two-copy shipment accounting
# (ADVICE r7), with enough margin that rounding drift can't flip the gate


def write_corpus(spark, out_dir: str) -> str:
    """Write documents.parquet under out_dir; returns the directory. The
    frame goes to PARQUET and is read back by callers so Catalyst sees
    honest file-relation stats (a createDataFrame literal would carry
    bogus tiny estimates and let stats, not the gate, pick the join)."""
    from pyspark.sql import functions as F

    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return out_dir
    shared = F.transform(
        F.sequence(F.lit(0), F.lit(SHARED_TOKENS - 1)),
        lambda i: F.format_string("t%06d", i),
    )
    text = F.concat_ws(
        " ",
        F.concat(
            F.array(F.format_string("u%03d", F.col("doc_id"))), shared
        ),
    )
    (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.lit("overcap-gen").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        # 8 files: the 64 giant rows spread across tasks on read
        .repartition(8)
        .write.mode("overwrite")
        .parquet(path)
    )
    return out_dir


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/mrml_overcap_corpus")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("mrml-gen-overcap")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    write_corpus(spark, args.dir)
    print(f"wrote {args.dir}/documents.parquet", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
