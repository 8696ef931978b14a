"""End-to-end training-data pipeline composition: the operators chained the
way a real pretraining ingest would run them — quality filter → exact dedup →
near-dup candidate pruning → token budget → multimodal feature join. Proves
the pieces compose as one lazy plan (single action at the end), not just as
isolated contract queries."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.functions import l2norm, tokens
from mapreduce_machine_learning_spark.io import load_table
from tests.conftest import SF_DIR


def test_training_data_pipeline(spark):
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    n_docs = docs.count()

    toks = tokens("text")
    n_tok = F.size(toks).cast("double")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok

    pipeline = (
        # 1. quality gate: type-token ratio + minimum length
        docs.withColumn("ttr", ttr)
        .withColumn("n_tok", n_tok)
        .filter((F.col("ttr") > 0.2) & (F.col("n_tok") >= 30))
        # 2. exact dedup: one survivor (min doc_id) per content hash
        .withColumn("content_hash", F.md5("text"))
        .withColumn(
            "survivor_id",
            F.min("doc_id").over(Window.partitionBy("content_hash")),
        )
        .filter(F.col("doc_id") == F.col("survivor_id"))
        # 3. token budget annotation
        .withColumn("bpe_est", (F.col("n_chars") / 4.0))
        # 4. multimodal join: attach the embedding + its norm
        .join(emb, F.col("doc_id") == F.col("vec_id"), "inner")
        .withColumn("emb_norm", l2norm("embedding"))
        .select("doc_id", "lang", "n_tok", "bpe_est", "label", "emb_norm")
    )

    out = pipeline.collect()
    assert 0 < len(out) <= n_docs
    # dedup really deduplicated: ids unique
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    # quality gate really filtered (degenerate corpus has low-TTR docs)
    assert len(out) < n_docs
    # all norms positive and finite
    assert all(r["emb_norm"] > 0 for r in out)

    # the whole pipeline is ONE plan: no Python eval nodes anywhere
    plan = pipeline._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_token_budget_matches_sql(spark):
    # the pipeline's token accounting agrees with a direct SQL computation
    docs = load_table(spark, SF_DIR, "documents")
    via_df = docs.agg(F.sum(F.size(tokens("text"))).alias("t")).collect()[0]["t"]
    docs.createOrReplaceTempView("documents")
    via_sql = spark.sql(
        "SELECT SUM(size(split(text, ' '))) AS t FROM documents"
    ).collect()[0]["t"]
    assert via_df == via_sql


def test_incremental_ingest_accounting(spark):
    """The delta-dedup classification is a partition of the incoming batch:
    per language, exact + near + unique must equal the incoming count, and
    incoming must equal the actual delta slice of the corpus."""
    from mapreduce_machine_learning_spark.registry import all_queries
    from tests.conftest import SF_DIR_T2

    rows = all_queries()["q_llm_dedup_incremental"](
        spark, SF_DIR_T2
    ).collect()
    delta = (
        spark.read.parquet(f"{SF_DIR_T2}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .groupBy("lang")
        .count()
        .collect()
    )
    actual = {r["lang"]: r["count"] for r in delta}
    assert {r.lang for r in rows} == set(actual)
    for r in rows:
        assert r.incoming == actual[r.lang]
        assert r.exact_dup + r.near_dup + r.unique_docs == r.incoming
        assert min(r.exact_dup, r.near_dup, r.unique_docs) >= 0
