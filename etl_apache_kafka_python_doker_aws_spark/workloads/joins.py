"""Join queries — SURVEY.md §2.3 (J1-J8; J9/J10 are streaming, see
streaming/). The reference has no joins (it moves exactly one table
end-to-end, /root/reference/dags/etl_dags.py:13,47,56) — this is declared
engine surface.

Join-strategy notes (verified via .explain in tests): dimension tables
(region/nation/supplier/customer at fixture scale) are broadcast; the
lineitem⋈orders fact-fact join shuffles on the key and is the plan that
must hold at 100 TB — sort-merge with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.util import tiny_rows_df

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.operators.joins import asof_join, interval_join
from etl_apache_kafka_python_doker_aws_spark.workloads.money import money, money_sum, one_minus
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "j1_inner_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(8,2)))), 2)
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact⋈fact (lineitem⋈orders): the shuffle join that
    must scale — Catalyst picks SMJ/shuffle-hash; AQE splits skewed keys."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            money_sum(money("l_extendedprice") * one_minus("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "j2_broadcast_join",
    oracle="""
    SELECT n_name, r_name,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def j2_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicitly broadcast dimensions — no shuffle of the
    fact side for the join itself (only the final small agg shuffles)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            money_sum(money("c_acctbal"), "total_bal"),
            F.count("*").alias("n_customers"),
        )
    )


@query(
    "j3_left_outer_join",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0), 2)
                AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def j3_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders
    (COUNT of a right column skips NULLs in both engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum(money("o_totalprice")), F.lit(0)), 2)
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "j3_full_outer_join",
    oracle="""
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(cn.n_cust, 0) AS n_cust,
           COALESCE(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
          FROM supplier GROUP BY s_nationkey) sn
    ON cn.nk = sn.nk
    """,
)
def j3_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregates (nations with only customers
    or only suppliers survive on their side)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@query(
    "j4_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers having at least one big order.
    Semi joins shuffle only the keys of the right side — no payload."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "j4_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "j5_cross_join",
    oracle="""
    SELECT r.r_name AS region_a, r2.r_name AS region_b
    FROM region r CROSS JOIN region r2
    WHERE r.r_regionkey < r2.r_regionkey
    """,
)
def j5_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (bounded inputs only — unordered region pairs)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("region_a"), F.col("r_regionkey").alias("ka"))
    b = r.select(F.col("r_name").alias("region_b"), F.col("r_regionkey").alias("kb"))
    return a.crossJoin(b).filter(F.col("ka") < F.col("kb")).select("region_a", "region_b")


@query(
    "j6_range_join",
    oracle="""
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS tier_total
    FROM orders
    JOIN (VALUES ('low', 0, 100000),
                 ('mid', 100000, 300000),
                 ('high', 300000, 1000000)) AS t(tier, lo, hi)
      ON o_totalprice >= t.lo AND o_totalprice < t.hi
    GROUP BY t.tier
    """,
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/non-equi range join against a broadcast tier table —
    BroadcastNestedLoopJoin is fine exactly because the build side is
    3 rows; a large keyless range join would be bucketized instead."""
    o = load_table(spark, sf_dir, "orders")
    tiers = tiny_rows_df(
        spark,
        [("low", 0, 100000), ("mid", 100000, 300000), ("high", 300000, 1000000)],
        "tier string, lo int, hi int",
    )
    return interval_join(o, tiers, key=None, ts_col="o_totalprice", lo_col="lo", hi_col="hi") \
        .groupBy("tier") \
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(money("o_totalprice"), "tier_total"),
        )


@query(
    "j7_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           c.value AS asof_value,
           CAST(c.event_id AS DOUBLE) AS asof_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        -- one row per (user, ts): max-event_id wins, mirroring the
        -- engine's tiebreak — DuckDB ASOF picks an ARBITRARY row among
        -- equal-ts matches otherwise (review r6; current fixtures have
        -- no such ties, this pins the semantics rather than the luck)
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                                       ORDER BY event_id DESC) AS tie_rn
          FROM events WHERE event_type = 'click'
        ) WHERE tie_rn = 1
    ) c
      ON p.user_id = c.user_id
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the engine's union+window operator: each purchase is
    annotated with the latest same-user click at-or-before it. The DuckDB
    oracle is its native ASOF JOIN. asof_event_id is DOUBLE on both sides:
    a nullable BIGINT comes back float64 from the driver's pandas fetch
    ('108.0' vs Spark's '108'), so any outer-join integer payload must be
    cast to double (or coalesced) in BOTH engines."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("value"), F.col("event_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["value", "event_id"],
        # deterministic tie resolution if two same-user clicks ever share a
        # timestamp (ADVICE r1): without it the forward-fill payload would
        # be partition-order-dependent
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_value"),
        F.col("asof_event_id").cast("double"),
    )


@query(
    "j7b_asof_join_multikey",
    oracle="""
    SELECT p.event_id, p.user_id,
           c.value AS asof_value,
           CAST(c.event_id AS DOUBLE) AS asof_event_id
    FROM (SELECT *, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        -- tie-robust view side: max-event_id per (user, day, ts), see j7
        SELECT * FROM (
          SELECT *, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                 ROW_NUMBER() OVER (PARTITION BY user_id,
                                    DATE_TRUNC('day', CAST(ts AS TIMESTAMP)),
                                    CAST(ts AS TIMESTAMP)
                                    ORDER BY event_id DESC) AS tie_rn
          FROM events WHERE event_type = 'view'
        ) WHERE tie_rn = 1
    ) c
      ON p.user_id = c.user_id
     AND p.d = c.d
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
    """,
)
def j7b_asof_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7b (VERDICT r5 #4): COMPOSITE-key as-of join — each purchase is
    annotated with the latest same-user SAME-DAY view at-or-before it
    (the (custkey, region)-style alignment ask). Exercises the
    ``key=[...]`` form of operators/joins.asof_join: one hash shuffle on
    (user_id, day), identical union+window plan shape as j7. The day
    bucket is util.day_bucket (NTZ→DATE→NTZ — no session-zone coercion);
    DuckDB's ASOF JOIN takes the extra day equality as a second ON
    conjunct. asof_event_id is DOUBLE on both sides (nullable-int
    pandas-fetch rule)."""
    from etl_apache_kafka_python_doker_aws_spark.util import day_bucket

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", day_bucket("ts").alias("d")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", day_bucket("ts").alias("d"), "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        views,
        key=["user_id", "d"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["value", "event_id"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_value"),
        F.col("asof_event_id").cast("double"),
    )


@query(
    "j8_interval_join",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             MIN(CAST(ts AS TIMESTAMP)) AS lo,
             MIN(CAST(ts AS TIMESTAMP)) + INTERVAL 7 DAY AS hi
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_first_week
    FROM events e
    JOIN iv ON e.user_id = iv.user_id
    WHERE CAST(e.ts AS TIMESTAMP) >= iv.lo AND CAST(e.ts AS TIMESTAMP) < iv.hi
    GROUP BY e.user_id
    """,
)
def j8_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events falling in each user's first activity week.
    Equi key (user_id) + range filter → plain shuffle join, no BNLJ."""
    e = load_table(spark, sf_dir, "events")
    iv = e.groupBy("user_id").agg(
        F.min("ts").alias("lo"),
        (F.min("ts") + F.expr("INTERVAL 7 DAYS")).alias("hi"),
    )
    joined = interval_join(
        e.select("user_id", "ts"), iv, key="user_id", ts_col="ts", lo_col="lo", hi_col="hi"
    )
    return joined.groupBy("user_id").agg(F.count("*").alias("n_first_week"))


@query(
    "j13_binned_range_join",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS p_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t_lo,
               epoch_us(CAST(ts AS TIMESTAMP)) + 7200000000 AS t_hi
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT event_id AS c_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t
        FROM events WHERE event_type = 'click'
    )
    SELECT p.p_id, CAST(COUNT(c.c_id) AS BIGINT) AS n_clicks_2h
    FROM purchases p LEFT JOIN clicks c
      ON c.user_id = p.user_id AND c.t >= p.t_lo AND c.t < p.t_hi
    GROUP BY p.p_id
    """,
)
def j13_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: the SCALABLE large-×-large range join — j6's broadcast
    nested-loop is right for a 3-row build side; when both sides are
    fact-sized, bucketize instead (operators/joins.binned_range_join):
    intervals explode to hour bins, points hash to one bin, candidates
    come from a plain equi-join on (user, bin) and exact containment
    verifies. Here: clicks within 2 hours after each purchase, counted
    per purchase (left join via re-join on the purchase ids so empty
    windows stay visible). Epochs via util.epoch_us — unix_micros rejects
    the fixtures' TIMESTAMP_NTZ."""
    from etl_apache_kafka_python_doker_aws_spark.operators.joins import binned_range_join
    from etl_apache_kafka_python_doker_aws_spark.util import epoch_us

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        epoch_us("ts").alias("t_lo"),
        (epoch_us("ts") + F.lit(7_200_000_000)).alias("t_hi"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", epoch_us("ts").alias("t")
    )
    hits = binned_range_join(
        clicks, purchases, key="user_id", point_col="t",
        lo_col="t_lo", hi_col="t_hi", bin_width=3_600_000_000,
    )
    counts = hits.groupBy("p_id").agg(F.count("*").alias("n_clicks_2h"))
    return (
        purchases.select("p_id")
        .join(counts, "p_id", "left")
        .select("p_id", F.coalesce("n_clicks_2h", F.lit(0)).alias("n_clicks_2h"))
    )
