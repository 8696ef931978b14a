"""Registry-wide repeat-scan gate (round 4).

A derived frame consumed by several downstream branches without a
persist makes Catalyst replay the whole upstream per consumer — at
100 TB that is N reads of a base table for one query. Round 4 swept the
registry with this exact walker, found 17 queries scanning the same
table 4–14×, and fixed them by checkpointing the shared derivation
point. This test keeps the property: NO query may scan the same base
table ≥ 4 times per execution. (≤ 3 stays allowed: some algorithms
genuinely need multiple passes — MAD's deviation percentile, gradient
passes, two-round boosting.)

The walker recurses ``children()`` only, which excludes InMemoryRelation
build plans — a cached subtree's scan executes once at fill time, so
counting it per consumer (as a naive plan-string grep does) would be
wrong in both directions.
"""

import re
from collections import Counter

from mapreduce_machine_learning_spark import runtime
from mapreduce_machine_learning_spark.registry import all_queries
from tests.conftest import SF_DIR

MAX_SAME_TABLE_SCANS = 3


def _walk(node, tables):
    name = node.nodeName()
    if "Scan parquet" in node.simpleStringWithNodeId() or name == "FileSourceScan":
        m = re.search(r"/(\w+)\.parquet", node.verboseString(1000))
        tables[m.group(1) if m else "?"] += 1
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), tables)
    if name == "AdaptiveSparkPlan":
        _walk(node.executedPlan(), tables)
    elif "QueryStage" in name:
        _walk(node.plan(), tables)


def test_no_query_rescans_a_base_table(spark):
    offenders = {}
    for name, fn in all_queries().items():
        tables = Counter()
        _walk(fn(spark, SF_DIR)._jdf.queryExecution().executedPlan(), tables)
        worst = {
            t: c for t, c in tables.items() if c > MAX_SAME_TABLE_SCANS
        }
        if worst:
            offenders[name] = worst
        runtime.release_all()
    assert not offenders, (
        f"queries re-scan a base table > {MAX_SAME_TABLE_SCANS}x — "
        f"checkpoint the shared derived frame: {offenders}"
    )
