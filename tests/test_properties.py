"""Property-based invariants (SURVEY §5.2 item 4) over generated frames.

Generation is capped small (the cost per example is a Spark job); deadlines
are disabled because JVM scheduling jitter breaks wall-clock assumptions.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=30,
)


@given(data=rows)
@SETTINGS
def test_dedup_idempotent(spark, data):
    df = spark.createDataFrame(data, "k int, v int")
    once = df.distinct()
    twice = once.distinct()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == len(set(data))


@given(a=rows, b=rows)
@SETTINGS
def test_unionall_count_additive(spark, a, b):
    da = spark.createDataFrame(a, "k int, v int")
    db = spark.createDataFrame(b, "k int, v int")
    assert da.unionByName(db).count() == len(a) + len(b)


@given(data=rows)
@SETTINGS
def test_topk_pergroup_subset_of_full_sort(spark, data):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)], "k int, v int, uid int"
    )
    w = Window.partitionBy("k").orderBy(F.desc("v"), "uid")
    top2 = df.withColumn("rn", F.row_number().over(w)).filter("rn <= 2")
    all_rows = set(map(tuple, df.collect()))
    assert all(t[:3] in all_rows for t in map(tuple, top2.collect()))
    # per-group count bound
    sizes = {r["k"]: r["cnt"] for r in top2.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert all(c <= 2 for c in sizes.values())


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=20)
)
@SETTINGS
def test_session_count_bounds(spark, gaps):
    # one user, events separated by the generated gaps (seconds)
    ts, t = [], 1_700_000_000
    for g in gaps:
        t += g
        ts.append(t)
    df = spark.createDataFrame(
        [(1, x) for x in ts], "user_id int, epoch long"
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().count()
    )
    n = len(ts)
    expected = 1 + sum(1 for g in gaps[1:] if g > 1800)
    assert 1 <= sessions <= n
    assert sessions == expected


@given(data=rows)
@SETTINGS
def test_running_sum_last_equals_group_total(spark, data):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)], "k int, v int, uid int"
    )
    w = (
        Window.partitionBy("k")
        .orderBy("uid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = df.withColumn("rs", F.sum("v").over(w))
    last = run.groupBy("k").agg(F.max_by("rs", "uid").alias("final"))
    totals = df.groupBy("k").agg(F.sum("v").alias("total"))
    j = {r["k"]: r["final"] for r in last.collect()}
    for r in totals.collect():
        assert j[r["k"]] == r["total"]


@given(
    tokens=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    drop=st.integers(min_value=1, max_value=3),
)
@SETTINGS
def test_minhash_signature_monotone_under_token_removal(spark, tokens, drop):
    # removing tokens from a document can only raise (or keep) each MinHash
    # signature: min over a subset >= min over the superset, element-wise.
    from mapreduce_machine_learning_spark.operators.llm import SEEDS

    keep = tokens[: max(1, len(tokens) - drop)]
    df = spark.createDataFrame(
        [(0, " ".join(tokens)), (1, " ".join(keep))], "doc_id long, text string"
    )
    toks = df.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(s + "|"), F.col("token")))).alias(f"sig{i}")
        for i, s in enumerate(SEEDS)
    ]
    sigs = {r["doc_id"]: r for r in toks.groupBy("doc_id").agg(*aggs).collect()}
    full, sub = sigs[0], sigs[1]
    for i in range(len(SEEDS)):
        assert sub[f"sig{i}"] >= full[f"sig{i}"]


@given(data=rows)
@SETTINGS
def test_skyline_window_equals_bruteforce(spark, data):
    """The per-price-collapse + running-max skyline must equal the O(n²)
    dominance definition on arbitrary (price, size) point sets."""
    from pyspark.sql import Window

    pts = [(float(k), v) for k, v in data]
    df = spark.createDataFrame(pts, "price double, size int")
    per_price = df.groupBy("price").agg(F.max("size").alias("best"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        per_price.withColumn("cheaper_best", F.max("best").over(w))
        .filter(
            F.col("cheaper_best").isNull()
            | (F.col("best") > F.col("cheaper_best"))
        )
        .select("price", "best")
        .collect()
    )
    got = {(r["price"], r["best"]) for r in sky}
    expected = {
        (p, s)
        for (p, s) in pts
        if not any(
            (q <= p and t >= s and (q < p or t > s)) for (q, t) in pts
        )
    }
    assert got == expected


@given(
    starts=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=25
    ),
    dur=st.integers(min_value=1, max_value=50),
)
@SETTINGS
def test_concurrency_sweep_equals_bruteforce(spark, starts, dur):
    """±1 sweep-line max concurrency == max over open points of the count
    of half-open intervals [s, s+dur) containing that point."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(s,) for s in starts], "s bigint")
    opens = df.select(F.col("s").alias("t"), F.lit(1).alias("d"))
    closes = df.select((F.col("s") + dur).alias("t"), F.lit(-1).alias("d"))
    w = Window.orderBy("t", "d")
    got = (
        opens.unionByName(closes)
        .select(F.sum("d").over(w).alias("live"))
        .agg(F.max("live"))
        .collect()[0][0]
    )
    expected = max(
        sum(1 for s2 in starts if s2 <= s < s2 + dur) for s in starts
    )
    assert got == expected


@given(
    day_sets=st.lists(
        st.sets(st.integers(min_value=0, max_value=20), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_streaks_islands_equal_bruteforce(spark, day_sets):
    """day−row_number islands must reproduce the plain-python consecutive
    run lengths for every user's day set."""
    from pyspark.sql import Window

    rows_in = [(u, d) for u, days in enumerate(day_sets) for d in days]
    df = spark.createDataFrame(rows_in, "u int, d int")
    w = Window.partitionBy("u").orderBy("d")
    got = sorted(
        (r["u"], r["n"])
        for r in df.select(
            "u", (F.col("d") - F.row_number().over(w)).alias("island")
        )
        .groupBy("u", "island")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = []
    for u, days in enumerate(day_sets):
        ds = sorted(days)
        run = 1
        for prev, cur in zip(ds, ds[1:]):
            if cur == prev + 1:
                run += 1
            else:
                expected.append((u, run))
                run = 1
        expected.append((u, run))
    assert got == sorted(expected)


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=25
    )
)
@SETTINGS
def test_drawdown_window_equals_bruteforce(spark, vals):
    """running-peak-minus-cum drawdown == python running max difference."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i int, v double"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    curve = df.select("i", F.sum("v").over(w).alias("cum"))
    got_dd = (
        curve.withColumn(
            "peak",
            F.max("cum").over(
                Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .agg(F.max(F.col("peak") - F.col("cum")))
        .collect()[0][0]
    )
    cum, peak, dd = 0.0, float("-inf"), 0.0
    for v in vals:
        cum += v
        peak = max(peak, cum)
        dd = max(dd, peak - cum)
    assert abs(got_dd - dd) < 1e-9


@given(
    a=st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    b=st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    t=st.sampled_from([0.3, 0.5, 0.55, 0.7, 0.75, 0.9, 0.95]),
)
@settings(max_examples=500, deadline=None)
def test_prefix_filter_lossless(a, b, t):
    """The PPJoin positional prefix filter in llm._verified_jaccard must
    never prune a qualifying pair: whenever J(A,B) ≥ t EXACTLY (Fraction
    arithmetic — the reference must not inherit the operator's FP), the
    sorted prefixes of length n − ⌈t·n − 1e-9⌉ + 1 (the exact FP-safe
    formula the operator computes with F.ceil, ADVICE round 3) must share
    an element. Thresholds include 0.55/0.9, whose double products land an
    ulp ABOVE exact integers (0.55·20 → 11.000000000000002) — the case a
    naive ceil gets wrong by one. Pure-python mirror of the column
    expressions — no Spark job per example, so hypothesis can hammer the
    boundary cases (tiny sets, J exactly at t, disjoint prefixes)."""
    import math
    from fractions import Fraction

    inter = len(a & b)
    t_exact = Fraction(str(t))
    jac_exact = Fraction(inter, len(a) + len(b) - inter)
    if jac_exact < t_exact:
        return  # filter only must keep qualifying pairs
    pa = sorted(a)[: len(a) - math.ceil(t * len(a) - 1e-9) + 1]
    pb = sorted(b)[: len(b) - math.ceil(t * len(b) - 1e-9) + 1]
    assert set(pa) & set(pb), (sorted(a), sorted(b), t, jac_exact)
    # the PPJoin LENGTH filter (the operator's first gate) must also keep
    # the qualifying pair — mirror of the guarded column expression. The
    # raw product is FP-hazardous the OTHER way: (1+1/0.75)·3 lands an ulp
    # BELOW the exact 7, so without the +1e-9 a J = t pair is pruned.
    na, nb = len(a), len(b)
    assert (1.0 + 1.0 / t) * min(na, nb) + 1e-9 >= na + nb, (na, nb, t)


def test_length_filter_fp_boundary_exact():
    """(1+1/0.75)·3 in doubles is 6.999999999999999 — a naive length
    filter drops |A|=3 ⊂ |B|=4 at exactly J = 3/4 = t. The +1e-9 absorber
    keeps it; a genuinely failing pair sits ≥ 1/k ≥ 1e-6 past the boundary
    for t = k/10^d so it cannot be pulled in. Deterministic regression for
    the same hazard class as the prefix-length ceil (both directions of
    the FP-vs-exact-rational boundary are now pinned)."""
    for t, na, nb in [(0.75, 3, 4), (0.95, 19, 20)]:
        # J_max = min/(na+nb-min) is exactly t for these shapes
        m = min(na, nb)
        assert m / (na + nb - m) == t
        assert (1.0 + 1.0 / t) * m < na + nb  # the naive filter is lossy
        assert (1.0 + 1.0 / t) * m + 1e-9 >= na + nb  # guarded keeps it


def test_prefix_length_fp_boundary_exact():
    """0.55·100 in doubles is 55.00000000000001; a naive ceil makes the
    required overlap 56 and the prefix one short, pruning a pair at
    exactly J = 0.55 (|A|=100, |B|=55, I=55). The −1e-9 guard restores
    the exact ⌈t·n⌉. Deterministic regression for the ADVICE-round-3
    hazard class — the hypothesis sampler caps sets at 40 elements, so it
    cannot construct this (the smallest offending n for t=0.55 is 100)."""
    import math

    t, n = 0.55, 100
    assert math.ceil(t * n) == 56  # the FP hazard is real on this platform
    assert math.ceil(t * n - 1e-9) == 55  # guard recovers exact ⌈t·n⌉
    # worked pair: |A|=100, |B|=55, A∩B=B → J = 55/100 = 0.55 exactly
    a = list(range(100))
    b = list(range(45, 100))
    inter = len(set(a) & set(b))
    assert inter / (len(a) + len(b) - inter) == 0.55
    pa = sorted(a)[: len(a) - math.ceil(t * len(a) - 1e-9) + 1]
    pb = sorted(b)[: len(b) - math.ceil(t * len(b) - 1e-9) + 1]
    assert set(pa) & set(pb)  # guarded prefix keeps the qualifying pair
    # the naive formula would have pruned it:
    pa_naive = sorted(a)[: len(a) - math.ceil(t * len(a)) + 1]
    assert not (set(pa_naive) & set(pb))
