"""Behavioral tests for functions/sketches.py: Bloom filter (no false
negatives, bounded false positives, bitmap stays broadcastable) and
Misra-Gries heavy hitters (exactness vs brute force, superset guarantee,
bounded candidate set, validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.functions.sketches import (
    bloom_build,
    bloom_might_contain,
    heavy_hitters,
    misra_gries_candidates,
)
from tests.conftest import SF_SMOKE


def _skewed_keys(spark, n=20000, hot_share_mod=5, hot_below=2):
    """n rows, 40% on key -1, the tail uniform over 200 organic keys."""
    return spark.range(n).select(
        F.when(F.pmod(F.col("id"), F.lit(hot_share_mod)) < hot_below, F.lit(-1))
        .otherwise(F.pmod(F.col("id"), F.lit(200)) + 100)
        .cast("long")
        .alias("k")
    )


def test_bloom_no_false_negatives(spark):
    members = spark.range(500).select(F.concat(F.lit("doc-"), F.col("id")).alias("v"))
    bitmap = bloom_build(members, "v", num_bits=1 << 16)
    probed = bloom_might_contain(
        members, "v", bitmap, num_bits=1 << 16, result_col="hit"
    )
    assert probed.filter(~F.col("hit")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    members = spark.range(500).select(F.concat(F.lit("in-"), F.col("id")).alias("v"))
    novel = spark.range(2000).select(F.concat(F.lit("out-"), F.col("id")).alias("v"))
    bitmap = bloom_build(members, "v", num_bits=1 << 16)
    probed = bloom_might_contain(novel, "v", bitmap, num_bits=1 << 16, result_col="hit")
    fp = probed.filter(F.col("hit")).count() / 2000
    # expected fp at n=500, m=65536, k=4 is ~1e-5; 2% is a hard ceiling
    assert fp <= 0.02, f"false-positive rate too high: {fp}"


def test_bloom_bitmap_bounded_and_null_probe_false(spark):
    members = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    bitmap = bloom_build(members, "v", num_bits=1 << 14)
    # at most num_bits/64 word rows regardless of member count
    assert bitmap.count() <= (1 << 14) // 64
    probes = spark.range(3).select(
        F.when(F.col("id") == 0, F.lit(None).cast("string"))
        .otherwise(F.col("id").cast("string"))
        .alias("v")
    )
    out = bloom_might_contain(probes, "v", bitmap, num_bits=1 << 14, result_col="hit")
    null_row = out.filter(F.col("v").isNull()).collect()
    assert len(null_row) == 1 and null_row[0]["hit"] is False


def test_heavy_hitters_exact_vs_bruteforce(spark):
    df = _skewed_keys(spark)
    got = {
        (r.k, r.cnt, r.n_total)
        for r in heavy_hitters(df, "k", min_freq_ratio=0.004).collect()
    }
    total = df.count()
    expected = {
        (r.k, r.cnt, total)
        for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()
        if r.cnt >= 0.004 * total
    }
    assert got == expected
    # the skew construction must actually discriminate: hot key present,
    # and not every organic key qualifies
    assert any(k == -1 for k, _, _ in got)
    assert len(got) < 201


def test_misra_gries_superset_and_bounded(spark):
    df = _skewed_keys(spark).repartition(8)
    cap = 250
    cands = misra_gries_candidates(df, "k", cap)
    keys = {r.k for r in cands.distinct().collect()}
    # superset guarantee: every key with freq > n/(cap+1) survives
    total = df.count()
    heavy = {
        r.k
        for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()
        if r.c > total / (cap + 1)
    }
    assert heavy <= keys
    # bounded output: at most partitions * capacity candidates
    # (misra_gries_candidates may widen to defaultParallelism via
    # ensure_parallelism before the narrow pass)
    max_parts = max(8, spark.sparkContext.defaultParallelism)
    assert cands.count() <= max_parts * cap


def test_heavy_hitters_on_fixture_strings(spark):
    """String keys work through the Arrow path too (lang column)."""
    d = load_table(spark, SF_SMOKE, "documents")
    got = {r.lang for r in heavy_hitters(d, "lang", min_freq_ratio=0.05).collect()}
    total = d.count()
    expected = {
        r.lang
        for r in d.groupBy("lang").agg(F.count("*").alias("c")).collect()
        if r.c >= 0.05 * total
    }
    assert got == expected and got


def test_sketch_validation():
    with pytest.raises(ValueError):
        heavy_hitters(None, "k", min_freq_ratio=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(None, "k", min_freq_ratio=1.5)


def test_bloom_probe_broadcasts_bitmap(spark):
    """The probe-side join must broadcast the bitmap — a shuffle join on
    the word index would shuffle the probe stream at scale."""
    members = spark.range(100).select(F.col("id").cast("string").alias("v"))
    bitmap = bloom_build(members, "v", num_bits=1 << 14)
    out = bloom_might_contain(members, "v", bitmap, num_bits=1 << 14)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topk_prereduced_matches_window_form(spark):
    """The shuffle-bounded top-k must agree with the window form exactly,
    including on ties (tiebreak ascending) and across partitions."""
    from etl_apache_kafka_python_doker_aws_spark.operators.windows import (
        top_k_per_group,
        top_k_per_group_prereduced,
    )

    df = (
        spark.range(5000)
        .select(
            F.pmod(F.col("id"), F.lit(7)).alias("g"),
            # coarse value → many ties per group, exercising the tiebreak
            F.pmod(F.xxhash64("id"), F.lit(20)).cast("double").alias("v"),
            F.col("id"),
        )
        .repartition(11)
    )
    a = {
        tuple(r)
        for r in top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id").asc()], 4
        ).collect()
    }
    b = {
        tuple(r)
        for r in top_k_per_group_prereduced(
            df, ["g"], "v", 4, tiebreak_col="id"
        ).collect()
    }
    assert a == b and len(a) == 7 * 4

    with pytest.raises(ValueError):
        top_k_per_group_prereduced(df, ["g"], "v", 0, tiebreak_col="id")


# --- pure-logic property tests (no Spark) -----------------------------

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_apache_kafka_python_doker_aws_spark.functions.sketches import _mg_merge

_stream = st.lists(st.integers(min_value=0, max_value=40), max_size=400)


@given(stream=_stream, capacity=st.integers(min_value=1, max_value=12),
       n_batches=st.integers(min_value=1, max_value=5))
@settings(max_examples=200, deadline=None)
def test_mg_merge_superset_guarantee(stream, capacity, n_batches):
    """Misra-Gries invariant: after merging any batching of the stream,
    every key with true count > n/(capacity+1) survives, the summary
    never exceeds capacity, and no surviving counter overestimates."""
    true = Counter(stream)
    counters: dict = {}
    step = max(1, len(stream) // n_batches)
    for i in range(0, len(stream), step):
        counters = _mg_merge(counters, Counter(stream[i : i + step]), capacity)
    assert len(counters) <= capacity
    n = len(stream)
    for k, c in true.items():
        if c > n / (capacity + 1):
            assert k in counters, (k, c, n, capacity, counters)
    for k, c in counters.items():
        assert 0 < c <= true[k]


def test_topk_prereduced_keeps_null_group(spark):
    """Regression: pandas groupby drops NaN keys by default; the
    pre-reduction must keep NULL-group rows like the window form does."""
    from etl_apache_kafka_python_doker_aws_spark.operators.windows import (
        top_k_per_group,
        top_k_per_group_prereduced,
    )

    df = spark.createDataFrame(
        [(None, 9.0, 1), (None, 5.0, 2), ("g", 7.0, 3), ("g", 1.0, 4)],
        "g string, v double, id long",
    ).repartition(3)
    a = {
        tuple(r)
        for r in top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id").asc()], 1
        ).collect()
    }
    b = {
        tuple(r)
        for r in top_k_per_group_prereduced(
            df, ["g"], "v", 1, tiebreak_col="id"
        ).collect()
    }
    assert a == b and (None, 9.0, 1, 1) in b


def test_misra_gries_null_keys_do_not_corrupt_large_keys(spark):
    """Regression: a null in a BIGINT batch coerces pandas to float64,
    mangling keys above 2^53 — nulls must be filtered JVM-side."""
    big = (1 << 60) + 1
    rows = [(big,)] * 50 + [(None,)] * 5 + [(i,) for i in range(20)]
    df = spark.createDataFrame(rows, "k long").repartition(2)
    keys = {r.k for r in misra_gries_candidates(df, "k", 8).collect()}
    assert big in keys and None not in keys
    got = {(r.k, r.cnt) for r in heavy_hitters(df, "k", min_freq_ratio=0.5).collect()}
    assert got == {(big, 50)}


def test_bloom_merge_equals_build_of_union(spark):
    """Bloom is an OR-fold: merging two independently built bitmaps must
    be bit-for-bit identical to building over the unioned members."""
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import bloom_merge

    a = spark.range(300).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(200).select(F.concat(F.lit("b"), F.col("id")).alias("v"))
    m = 1 << 15
    merged = {
        (r.word, r.bits)
        for r in bloom_merge(
            bloom_build(a, "v", num_bits=m), bloom_build(b, "v", num_bits=m)
        ).collect()
    }
    direct = {
        (r.word, r.bits)
        for r in bloom_build(a.unionByName(b), "v", num_bits=m).collect()
    }
    assert merged == direct and merged

    with pytest.raises(ValueError):
        bloom_merge()


def test_heavy_hitters_null_and_nan_keys_match_groupby(spark):
    """Regression: a plain groupBy reports NULL and NaN groups; the
    sketch path must too. Both are counted JVM-side (the Arrow bridge
    converts a yielded NaN back to NULL, so neither may cross it) and
    unioned back when they clear the threshold."""
    rows = (
        [(None,)] * 40 + [(float("nan"),)] * 30 + [(1.5,)] * 20 + [(2.5,)] * 10
    )
    df = spark.createDataFrame(rows, "k double").repartition(3)
    got = {
        (("null" if r.k is None else ("nan" if r.k != r.k else r.k)), r.cnt)
        for r in heavy_hitters(df, "k", min_freq_ratio=0.2).collect()
    }
    assert got == {("null", 40), ("nan", 30), (1.5, 20)}


def test_topk_prereduced_rejects_nan_order(spark):
    """Regression: Spark ranks NaN as the LARGEST double but a NaN
    candidate cannot round-trip the Arrow bridge (it returns as NULL
    and the final window mis-ranks it) — the pre-reduced form must fail
    LOUDLY on NaN order values instead of silently diverging from the
    window form."""
    from etl_apache_kafka_python_doker_aws_spark.operators.windows import (
        top_k_per_group_prereduced,
    )

    df = spark.createDataFrame(
        [("a", float("nan"), 1), ("a", 7.0, 2), ("a", 5.0, 3), ("a", 1.0, 4)],
        "g string, v double, id long",
    ).repartition(2)
    with pytest.raises(Exception) as exc:
        top_k_per_group_prereduced(df, ["g"], "v", 2, tiebreak_col="id").collect()
    assert "NULL/NaN order" in str(exc.value)


def test_salted_join_salt_on_and_map_columns(spark):
    """Regression: default salt must skip MapType columns (xxhash64
    rejects maps) and salt_on must be honored."""
    from etl_apache_kafka_python_doker_aws_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, {"a": "b"}, 10), (1, {"c": "d"}, 20), (2, {"e": "f"}, 30)],
        "k long, attrs map<string,string>, payload long",
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, dim string")
    out = salted_join(left, right, "k", salt_factor=4).collect()
    assert len(out) == 3
    out2 = salted_join(left, right, "k", salt_factor=4, salt_on=["payload"]).collect()
    assert {(r.k, r.payload, r.dim) for r in out2} == {
        (1, 10, "x"), (1, 20, "x"), (2, 30, "y"),
    }


def test_bloom_probe_groupby_derived_probes_deterministic(spark):
    """Regression (r6, found via cms_estimate's impossible undercounts):
    probe results must pair correctly even when the probe frame's row
    order is non-deterministic (a groupBy output) — the old surrogate
    monotonically_increasing_id fold could mispair rows between the two
    evaluations of the same plan. Results are now keyed by the value."""
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.createDataFrame([(i % 200,) for i in range(2000)], "v long")
    bitmap = bloom_build(members, "v", num_bits=1 << 16)
    # groupBy-derived probes: hash-agg output order is not contractual
    probes = members.groupBy("v").count().withColumn(
        "v2", F.col("v") + 1000  # 1000+ are provably novel
    )
    out = bloom_might_contain(probes, "v", bitmap, num_bits=1 << 16)
    assert out.filter(~F.col("might_contain")).count() == 0
    novel = probes.select(F.col("v2").alias("v"))
    out2 = bloom_might_contain(novel, "v", bitmap, num_bits=1 << 16)
    # false-positive rate on novel keys stays tiny; a mispairing bug
    # would instead flip large blocks of rows
    assert out2.filter(F.col("might_contain")).count() <= 5

    # a probe row with a NULL value reads false, never true
    with_null = spark.createDataFrame([(None,), (5,)], "v long")
    got = {r.v: r.might_contain for r in
           bloom_might_contain(with_null, "v", bitmap, num_bits=1 << 16).collect()}
    assert got == {None: False, 5: True}


def test_prereduced_topk_null_int_group_key_raises(spark):
    """ADVICE r5: a NULL key in an integer GROUP column coerces the whole
    pandas column to float64 (keys above 2^53 would silently merge) —
    must fail loudly like the order/tiebreak guard."""
    import pytest as _pytest

    from etl_apache_kafka_python_doker_aws_spark.operators.windows import (
        top_k_per_group_prereduced,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 1), (None, 2.0, 2), (1, 3.0, 3)],
        "g long, v double, id long",
    )
    with _pytest.raises(Exception, match="integer group"):
        top_k_per_group_prereduced(df, ["g"], "v", 2, tiebreak_col="id").collect()


def test_prereduced_topk_string_group_null_ok(spark):
    """NULL keys in a STRING group column remain a regular partition
    (pandas dropna=False) — only integer group columns are rejected."""
    from etl_apache_kafka_python_doker_aws_spark.operators.windows import (
        top_k_per_group_prereduced,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1), (None, 2.0, 2), (None, 3.0, 3), ("a", 4.0, 4)],
        "g string, v double, id long",
    )
    rows = top_k_per_group_prereduced(df, ["g"], "v", 1, tiebreak_col="id").collect()
    got = {r.g: r.v for r in rows}
    assert got == {"a": 4.0, None: 3.0}


def test_cms_estimate_one_sided_and_merge_lossless(spark):
    """CMS invariants: estimates NEVER undercount (even for probes
    derived from a groupBy — the r6 mispairing regression), novel keys
    estimate >= 0, NULL probes estimate 0, and merging two half-builds
    equals the whole build cell-for-cell (linearity)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    df = spark.createDataFrame([(i % 100,) for i in range(5000)], "v long")
    sk = cms_build(df, "v", depth=4, width=256)
    true = df.groupBy("v").count()
    est = cms_estimate(true, "v", sk, depth=4, width=256)
    bad = est.filter(F.col("est_count") < F.col("count")).count()
    assert bad == 0

    with_null = spark.createDataFrame([(None,), (7,)], "v long")
    got = {r.v: r.est_count for r in
           cms_estimate(with_null, "v", sk, depth=4, width=256).collect()}
    assert got[None] == 0 and got[7] >= 50

    keyed = spark.createDataFrame([(i, i % 100) for i in range(5000)], "i long, v long")
    a = cms_build(keyed.filter(F.col("i") % 2 == 0), "v", depth=4, width=256)
    b = cms_build(keyed.filter(F.col("i") % 2 == 1), "v", depth=4, width=256)
    merged = cms_merge(a, b)
    assert merged.exceptAll(sk).count() == 0
    assert sk.exceptAll(merged).count() == 0
