"""Modern SQL-surface operators — round-2 widening of SURVEY.md §2.4/§2.6:
LISTAGG, deterministic MODE, UNPIVOT/melt, LATERAL correlated subquery,
recursive CTE, null-safe join, and STACK row generation.

The reference (a 157-LoC Airflow/Kafka tutorial) has no SQL engine; these
rows are part of the declared north-star surface. Everything here is
expressed declaratively so Catalyst plans it (no UDFs, no collect):
LISTAGG/MODE become single hash aggregates, UNPIVOT/STACK expand
map-side (narrow, no shuffle), LATERAL decorrelates to a ranked window,
and the recursive CTE (Spark 4 UnionLoop) seeds a 12-row spine that
joins against a pre-aggregated fact — at 100 TB the recursion depth
stays 12 while the fact aggregation is the usual two-phase hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.money import money, money_sum
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "a11_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           CAST(COUNT(*) AS BIGINT)                AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def a11_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: ordered string aggregation (LISTAGG ... WITHIN GROUP).

    WITHIN GROUP ordering makes the concatenation deterministic across
    engines and partitionings — unordered listagg/collect_list is not
    reproducible on a cluster (partial-agg arrival order).
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    r.createOrReplaceTempView("region_la")
    n.createOrReplaceTempView("nation_la")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations_csv,
               COUNT(*) AS n_nations
        FROM region_la JOIN nation_la ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "a12_mode",
    oracle="""
    WITH counted AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    ), ranked AS (
        SELECT o_orderstatus, o_orderpriority,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY c DESC, o_orderpriority ASC) AS rn
        FROM counted
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority
    FROM ranked WHERE rn = 1
    """,
)
def a12_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: deterministic MODE — ``mode(x, true)`` breaks frequency
    ties by taking the smallest value, so the result is reproducible
    (plain ``mode()`` is partitioning-dependent on ties; the sf0.001
    fixture really does tie: status P has two priorities at count 111).
    The oracle mirrors the tie-break with an explicit (count DESC, value
    ASC) ranking.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("mode(o_orderpriority, true)").alias("mode_priority")
    )


@query(
    "o6_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey <= 200
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part WHERE p_partkey <= 200
    """,
)
def o6_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-family: UNPIVOT / melt — wide columns to (metric, value) rows.

    ``df.unpivot`` is a map-side Expand (narrow: no shuffle, row count
    multiplies by the number of melted columns); the oracle spells the
    same semantics as UNION ALL.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.unpivot(
        ids=["p_partkey"],
        values=[F.col("p_size").cast("double").alias("p_size"), "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "f_stack",
    oracle="""
    SELECT o_orderkey, 'status' AS attr, o_orderstatus AS val
    FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT o_orderkey, 'priority' AS attr, o_orderpriority AS val
    FROM orders WHERE o_orderkey <= 500
    """,
)
def f_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: STACK(n, ...) row generator — the SQL-native way to emit
    k rows per input row without a join; same Expand node as unpivot."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'status', o_orderstatus, 'priority', o_orderpriority) AS (attr, val)"
        ),
    )


@query(
    "q_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2
    ) c
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-family: LATERAL correlated derived table (top-2 customers by
    balance per nation). Catalyst decorrelates the lateral subquery into
    a ranked window over one shuffle by ``c_nationkey`` — no per-nation
    rescan, so the plan is scale-safe (the naive reading would be 25
    separate top-k scans). Tie-break on c_custkey keeps both engines
    deterministic.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation_lat n, LATERAL (
            SELECT c_custkey, c_acctbal
            FROM customer_lat
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 2
        ) c
        """
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
    ), monthly AS (
        SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY 1
    )
    SELECT months.m AS month,
           COALESCE(monthly.revenue, CAST(0 AS DOUBLE)) AS revenue,
           COALESCE(monthly.n_orders, 0) AS n_orders
    FROM months LEFT JOIN monthly ON monthly.m = months.m
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-family: WITH RECURSIVE (Spark 4 UnionLoop) — a 12-row month
    spine generated by real recursion, left-joined to pre-aggregated
    monthly revenue so months with no orders still appear. Month
    extraction is plain month(o_orderdate): the fixtures load as
    TIMESTAMP_NTZ, whose field extraction is wall-time-only — the old
    convert_timezone('UTC', ...) guard would now SHIFT wall time in
    non-UTC sessions instead of protecting against them. The recursion
    is driver-cheap (depth 12, one row per step); the fact side is the
    usual two-phase decimal-sum aggregate, so the pattern scales: spine
    size is calendar-bound, not data-bound.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT 1
            UNION ALL
            SELECT m + 1 FROM months WHERE m < 12
        ), monthly AS (
            SELECT CAST(month(o_orderdate) AS INT) AS m,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                        AS DOUBLE) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders_rec
            GROUP BY 1
        )
        SELECT months.m AS month,
               COALESCE(monthly.revenue, CAST(0 AS DOUBLE)) AS revenue,
               COALESCE(monthly.n_orders, CAST(0 AS BIGINT)) AS n_orders
        FROM months LEFT JOIN monthly ON monthly.m = months.m
        """
    )


@query(
    "j11_nullsafe_join",
    oracle="""
    WITH l AS (
        SELECT NULLIF(o_orderstatus, 'O') AS k, COUNT(*) AS n_left
        FROM orders GROUP BY 1
    ), r AS (
        SELECT NULLIF(o_orderstatus, 'O') AS k,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_right
        FROM orders GROUP BY 1
    )
    SELECT l.k, l.n_left, r.total_right
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def j11_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family: null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM) —
    NULL keys match each other instead of vanishing. Catalyst treats
    ``eqNullSafe`` as an equi-join condition, so it still hash-partitions
    both sides (NULLs hash to one partition — bounded here because the
    key domain is tiny; for high-NULL fact joins prefer a COALESCE
    sentinel plus salting, see operators/skew.py).
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k")
    left = o.select(k).groupBy("k").agg(F.count("*").alias("n_left"))
    right = (
        o.select(k, F.col("o_totalprice"))
        .groupBy("k")
        .agg(money_sum(money("o_totalprice"), "total_right"))
    )
    return left.join(right, left["k"].eqNullSafe(right["k"])).select(
        left["k"], "n_left", "total_right"
    )


@query(
    "a13_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_exact,
           PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_exact,
           TRUE AS median_within_tol,
           TRUE AS p90_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a13_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: approx_percentile (Greenwald-Khanna sketch) validated
    in-query against the exact percentile — the a4 pattern: the sketch's
    error bound becomes a deterministic boolean column, so the sketch
    result is oracle-checkable without demanding bit-equality. At 100 TB
    the exact percentile needs a full sort per group; the GK sketch is
    one pass with bounded state — this query demonstrates the accuracy
    contract that justifies the swap."""
    li = load_table(spark, sf_dir, "lineitem")
    exact_med = F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)")
    exact_p90 = F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)")
    apx_med = F.expr("approx_percentile(l_quantity, 0.5, 10000)")
    apx_p90 = F.expr("approx_percentile(l_quantity, 0.9, 10000)")
    return li.groupBy("l_returnflag").agg(
        exact_med.alias("median_exact"),
        exact_p90.alias("p90_exact"),
        # quantity domain is 1..50; accuracy 10000 ⇒ rank error ~1e-4·n,
        # comfortably within one quantity step
        (F.abs(apx_med - exact_med) <= F.lit(1.0)).alias("median_within_tol"),
        (F.abs(apx_p90 - exact_p90) <= F.lit(1.0)).alias("p90_within_tol"),
    )


@query(
    "j12_fuzzy_join",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey <= 500 AND b.p_partkey <= 500
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def j12_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family: fuzzy (edit-distance) self-join with blocking — the
    classic entity-resolution shape. The equi-join on the block key
    (brand) bounds the candidate set to within-block pairs; levenshtein
    verifies only those. At 100 TB the block key is the whole game:
    blocking turns O(n²) into Σ(block²) — same principle as the LSH
    band join in functions/dedup.py, with an exact verifier."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .withColumn("edit_dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .filter(F.col("edit_dist") <= 3)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("edit_dist").cast("int").alias("edit_dist"),
        )
    )


@query(
    "f_url",
    oracle="""
    WITH urls AS (
        SELECT p_partkey,
               'https://catalog.example.com/' || replace(p_brand, '#', '-')
                   || '/item?id=' || p_partkey || '&size=' || p_size AS url
        FROM part WHERE p_partkey <= 300
    )
    SELECT p_partkey,
           url,
           regexp_extract(url, '^https?://([^/]+)', 1)  AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]id=([^&]*)', 1)     AS id_param
    FROM urls
    """,
)
def f_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: URL parsing (parse_url HOST/PATH/QUERY-key) over URLs
    synthesized deterministically from part attributes — the web-corpus
    curation primitive (per-domain stats, URL dedup keys). The oracle
    mirrors each component with anchored regexes; both engines see the
    identical url column, so extraction must agree exactly."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    url = F.concat(
        F.lit("https://catalog.example.com/"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")),
        F.lit("/item?id="),
        F.col("p_partkey"),
        F.lit("&size="),
        F.col("p_size"),
    )
    return p.select(
        "p_partkey",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "a14_hll_merge",
    oracle="""
    WITH per_nation AS (
        SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS exact_nation
        FROM customer GROUP BY c_nationkey
    )
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_nations,
           CAST(SUM(exact_nation) AS BIGINT)   AS exact_total,
           TRUE                                AS union_within_5pct
    FROM per_nation
    """,
)
def a14_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: mergeable HLL sketches (Apache DataSketches, Spark 4) —
    per-nation sketches built in one pass, merged with hll_union_agg to
    a global distinct estimate. THE scale pattern for distinct counts:
    partial sketches are tiny (KB), merge is associative, so a 1000-node
    rollup never reshuffles raw keys (c_custkey is unique per customer,
    so the exact total is the plain sum of per-nation counts). The
    sketch's accuracy contract (±5%) is emitted as a boolean, a4-style,
    so the result stays deterministic and oracle-comparable."""
    c = load_table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_nation"),
    )
    return per_nation.agg(
        F.count("*").alias("n_nations"),
        F.sum("exact_nation").alias("exact_total"),
        (
            F.abs(
                F.hll_sketch_estimate(F.hll_union_agg("sk"))
                - F.sum("exact_nation")
            )
            <= 0.05 * F.sum("exact_nation")
        ).alias("union_within_5pct"),
    )


@query(
    "f_xml",
    oracle="""
    WITH x AS (
        SELECT o_orderkey,
               '<order><key>' || o_orderkey || '</key><status>' || o_orderstatus
                   || '</status><total>' || CAST(o_totalprice AS VARCHAR)
                   || '</total></order>' AS xml
        FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           CAST(regexp_extract(xml, '<key>([^<]*)</key>', 1) AS BIGINT)   AS xml_key,
           regexp_extract(xml, '<status>([^<]*)</status>', 1)             AS xml_status,
           CAST(regexp_extract(xml, '<total>([^<]*)</total>', 1) AS DOUBLE) AS xml_total
    FROM x
    """,
)
def f_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: XML parsing (Spark 4 native from_xml + schema'd struct
    extraction) over XML synthesized deterministically from order
    attributes — the legacy-feed ingestion shape. The oracle mirrors the
    field extraction with anchored regexes on the identical XML strings;
    the double round-trips through a Spark-formatted string cast, which
    both engines re-parse to the same IEEE value."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    xml = F.concat(
        F.lit("<order><key>"), F.col("o_orderkey"),
        F.lit("</key><status>"), F.col("o_orderstatus"),
        F.lit("</status><total>"), F.col("o_totalprice").cast("string"),
        F.lit("</total></order>"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_xml(xml, "key BIGINT, status STRING, total DOUBLE").alias("s"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("s.key").alias("xml_key"),
        F.col("s.status").alias("xml_status"),
        F.col("s.total").alias("xml_total"),
    )


@query(
    "w6_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           quantile_cont(value, 0.5)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS rolling_median_value
    FROM events WHERE user_id <= 30
    """,
)
def w6_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family: rolling median (exact percentile as a WINDOW aggregate,
    7-row trailing frame) — the robust-smoothing counterpart of w5's
    moving average. Exact windowed percentiles re-sort each frame, so at
    100 TB prefer approx_percentile in the frame or t-digest pre-agg;
    this query is the exactness anchor those approximations are tested
    against. Even-count frames interpolate midpoints of exact 2-dp
    doubles — identical IEEE arithmetic in both engines (DuckDB mirror:
    quantile_cont, NOT median, whose windowed form is discrete)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    return e.selectExpr(
        "event_id",
        "user_id",
        """percentile(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median_value""",
    )


@query(
    "a15_predicate_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity >= 25) AS BIGINT) AS n_bulk,
           bool_and(l_extendedprice > 0)              AS all_positive,
           bool_or(l_discount >= 0.09)                AS any_deep_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a15_predicate_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: predicate aggregates (count_if / bool_and / bool_or) —
    the SQL-native form of flag rollups; all three fold into one
    two-phase hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("count_if(l_quantity >= 25)").alias("n_bulk"),
        F.expr("bool_and(l_extendedprice > 0)").alias("all_positive"),
        F.expr("bool_or(l_discount >= 0.09)").alias("any_deep_discount"),
    )


@query(
    "a16_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a16_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: linear-regression aggregates (regr_slope / intercept /
    r2 / count) — one-pass least squares per group, the same two-phase
    hash-aggregate shape as a7's corr/stddev (rounded to 6 digits for
    cross-engine float stability, the a7 house rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
    )


@query(
    "a17_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_custs
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a17_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: EXACT distinct counting via bitmaps (Spark 3.5 bitmap
    family) — keys bucket into 32k-bit bitmap segments
    (bitmap_bucket_number / bitmap_bit_position), each segment ORs
    map-side into one binary value, and the distinct count is the sum of
    per-segment popcounts. Unlike count(DISTINCT) this never expands
    rows (no Expand node, no second shuffle of raw keys) and unlike HLL
    (a4/a14) it is exact — the right pattern for high-cardinality
    distinct rollups at 100 TB. The oracle is plain COUNT(DISTINCT):
    results must be identical."""
    o = load_table(spark, sf_dir, "orders")
    segments = o.groupBy(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("_bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("_bm"))
    return segments.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(_bm)")).alias("n_distinct_custs")
    )


@query(
    "a18_salted_hot_key_agg",
    scale_form="bounded",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)                       AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(MIN(l_quantity) AS BIGINT)                AS min_qty,
           CAST(MAX(l_quantity) AS BIGINT)                AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a18_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: LOSSLESS salted two-phase aggregation on a pathologically
    hot key (operators/skew.salted_agg; VERDICT r4 #5). l_returnflag has
    3 values over the whole fact table — the degenerate skew case where
    a plain groupBy funnels ~half the table through one reducer. The
    salted form partial-aggregates on (flag, xxhash64-salt) bounding
    every first-stage group at ~1/16 of the hot key, then merges; being
    algebraic it must equal DuckDB's direct GROUP BY bit-for-bit (unlike
    the dedup band guard's max_bucket_size drop, nothing is discarded).
    Plan shape (two hash exchanges, no Expand) pinned in test_plans."""
    from etl_apache_kafka_python_doker_aws_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_qty_long", F.col("l_quantity").cast("long")
    )
    return salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("count", "*"),
            "sum_qty": ("sum", "_qty_long"),
            "min_qty": ("min", "_qty_long"),
            "max_qty": ("max", "_qty_long"),
        },
        salt_factor=16,
        salt_on=["l_orderkey", "l_linenumber"],
    )


@query(
    "f_crypto_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS decrypted,
           CAST((length(o_orderpriority) // 16) * 16 + 16 AS BIGINT) AS ct_len
    FROM orders WHERE o_orderkey <= 300
    """,
)
def f_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: column-level encryption round-trip (aes_encrypt/
    aes_decrypt, AES-128-ECB for determinism — GCM's random IV is the
    production mode but cannot round-trip-compare; the reference's
    clave.py generates a Fernet key for the same at-rest purpose,
    /root/reference/clave.py:1-4). The oracle pins the decrypted
    plaintext and the PKCS7-padded ciphertext length."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    key = F.lit("0123456789abcdef")
    ct = F.expr("aes_encrypt(o_orderpriority, '0123456789abcdef', 'ECB')")
    return o.select(
        "o_orderkey",
        F.expr(
            "CAST(aes_decrypt(aes_encrypt(o_orderpriority, '0123456789abcdef', 'ECB'),"
            " '0123456789abcdef', 'ECB') AS STRING)"
        ).alias("decrypted"),
        F.length(ct).cast("long").alias("ct_len"),
    )


@query(
    "sk4_count_min",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_probes,
           TRUE AS no_undercount,
           TRUE AS overcount_bounded,
           TRUE AS merge_lossless
    FROM orders
    """,
)
def sk4_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SK4: COUNT-MIN SKETCH point-frequency estimates over orders'
    o_custkey (functions/sketches.cms_build/cms_estimate — 4x2048
    counters, fixed memory regardless of key cardinality). Contract
    row, every leg engine-computed distributed (the bloom/a4 pattern):
    every distinct custkey probed (exact n_probes), NO undercount
    (est >= true always — the CMS one-sided guarantee; an undercount
    can only mean a bug, which is exactly how the r6 surrogate-id
    mispairing was caught), overcount bounded by the SCALE-RELATIVE
    form 4·N/width (N = probed rows; the expected per-row collision
    mass is ~N/width and the min-of-depth estimate concentrates
    Poisson-tight below it — measured max overcount 0 / 15 / 119 at
    sf0.001/0.01/0.1 vs bounds 2.9 / 29 / 293; a CONSTANT bound held
    only below sf0.1, review r6), and
    MERGE LOSSLESSNESS: the sketch is linear, so cms_merge of the two
    order-parity halves must equal the whole-corpus sketch
    cell-for-cell (symmetric exceptAll folded to a boolean — the d6
    partial-aggregate-state argument, proved on the sketch itself)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    o = load_table(spark, sf_dir, "orders")
    sk = cms_build(o, "o_custkey", depth=4, width=2048)
    true_counts = o.groupBy("o_custkey").agg(F.count("*").alias("_true"))
    est = cms_estimate(true_counts, "o_custkey", sk, depth=4, width=2048)
    checks = est.agg(
        F.count("*").alias("n_probes"),
        F.expr("bool_and(est_count >= _true)").alias("no_undercount"),
        (
            F.max(F.col("est_count") - F.col("_true"))
            <= F.lit(4.0) * F.sum("_true") / F.lit(2048)
        ).alias("overcount_bounded"),
    )
    halves = cms_merge(
        cms_build(o.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0),
                  "o_custkey", depth=4, width=2048),
        cms_build(o.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1),
                  "o_custkey", depth=4, width=2048),
    )
    d1 = halves.exceptAll(sk).agg(F.count("*").alias("_d1"))
    d2 = sk.exceptAll(halves).agg(F.count("*").alias("_d2"))
    lossless = (
        d1.crossJoin(d2)
        .select(((F.col("_d1") == 0) & (F.col("_d2") == 0)).alias("merge_lossless"))
    )
    return checks.crossJoin(F.broadcast(lossless)).select(
        "n_probes", "no_undercount", "overcount_bounded", "merge_lossless"
    )


@query(
    "a19_heavy_hitters",
    scale_form="bounded",
    oracle="""
    WITH t AS (
        SELECT CASE WHEN l_orderkey % 5 < 2 THEN CAST(-1 AS BIGINT)
                    ELSE l_suppkey END AS hh_key
        FROM lineitem
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t)
    SELECT hh_key,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           n_total,
           CAST(COUNT(*) AS DOUBLE) / n_total AS freq
    FROM t, tot
    GROUP BY hh_key, n_total
    HAVING COUNT(*) >= 0.004 * n_total
    """,
)
def a19_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family: EXACT heavy hitters in bounded memory via per-partition
    Misra-Gries candidates + exact verify (functions/sketches.py). The
    key is synthesized skewed the same way the salted-agg fixture is:
    40% of lineitem lands on one hot key (-1), the tail spreads over
    l_suppkey — at sf0.01 each organic suppkey holds ~0.6% of rows so
    the 0.4% threshold genuinely discriminates. Because phase 2
    exact-counts the candidate superset and filters on the true total,
    the output is EXACT and a plain GROUP BY/HAVING oracle checks it —
    the sketch only bounds memory/shuffle, never changes the answer.
    Scale story: groupBy on a high-cardinality key shuffles every
    distinct key; this shuffles only candidate rows (≤ partitions ·
    ceil(1/ratio) keys) and streams the rest through an O(capacity)
    summary per partition."""
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import heavy_hitters

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.pmod(F.col("l_orderkey"), F.lit(5)) < 2, F.lit(-1).cast("long"))
        .otherwise(F.col("l_suppkey"))
        .alias("hh_key")
    )
    return heavy_hitters(li, "hh_key", min_freq_ratio=0.004)
