"""PySpark-native analytics engine with the query/data-processing capabilities
of the reference repo ``AmazaspShumik/MapReduce-Machine-Learning``.

The reference (per SURVEY.md §1, reconstructed — /root/reference is empty) is a
set of Hadoop-Streaming/mrjob MapReduce implementations of classical ML
algorithms (linear/logistic regression in summation form, naive Bayes/GDA,
k-means, GMM-EM, k-NN). This engine re-expresses that capability surface —
plus a full relational/window/streaming/LLM-data-pipeline operator set —
Spark-first: declarative DataFrame plans optimized by Catalyst, executed by
Tungsten, with Arrow-batched Pandas UDFs only where built-ins can't express
the semantics (SURVEY.md §2.10).

Layout:
    io.py          — parquet loaders (ns-timestamp recipe), DuckDB oracle views
    registry.py    — query registry backing __spark_entry__.py
    determinism.py — cross-engine determinism helpers (round-6, casts)
    operators/     — the §2 contract queries (relational, agg, window, set,
                     ml, streaming-batch, llm, udf)
    streaming/     — live Structured Streaming twins of §2.7
    sources/       — read/write round-trip surface (parquet/csv/json)
    functions/     — vector/text helper expressions (dot, cosine, tokenize)
    plans/         — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
