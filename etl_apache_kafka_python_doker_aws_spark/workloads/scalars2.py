"""Scalar families, second batch — string similarity, extended date
arithmetic, unpivot, series generation (SURVEY.md §2.7 long tail)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "f_string_similarity",
    oracle="""
    SELECT r.r_name AS name_a, r2.r_name AS name_b,
           CAST(LEVENSHTEIN(r.r_name, r2.r_name) AS INTEGER) AS edit_dist,
           LEFT(r.r_name, 3)     AS prefix3,
           RIGHT(r2.r_name, 3)   AS suffix3,
           REVERSE(r.r_name)     AS name_rev,
           REPEAT(r.r_name, 2)   AS name_doubled
    FROM region r CROSS JOIN region r2
    WHERE r.r_regionkey < r2.r_regionkey
    """,
)
def f_string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance + left/right/reverse/repeat over region-name pairs —
    levenshtein is the scalar backing fuzzy string matching (L2 adjacent)."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("name_a"), F.col("r_regionkey").alias("ka"))
    b = r.select(F.col("r_name").alias("name_b"), F.col("r_regionkey").alias("kb"))
    return (
        a.crossJoin(b)
        .filter(F.col("ka") < F.col("kb"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
            F.substring("name_a", 1, 3).alias("prefix3"),
            F.substring(F.col("name_b"), -3, 3).alias("suffix3"),
            F.reverse("name_a").alias("name_rev"),
            F.repeat("name_a", 2).alias("name_doubled"),
        )
    )


@query(
    "f_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           DATE_TRUNC('day', o_orderdate) + INTERVAL 3 MONTH AS plus_3m,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(QUARTER(o_orderdate) AS INTEGER)         AS qtr,
           CAST(DATE_DIFF('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
             AS months_since_start
    FROM orders WHERE o_orderkey < 300
    """,
)
def f_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_months / last_day / quarter / whole-month difference.
    (Spark months_between is fractional — the oracle-comparable form is
    the integer month delta via year*12+month arithmetic.) Date-valued
    results are TIMESTAMP_NTZ, not DATE (pandas-fetched oracles render
    DATE as midnight timestamps)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.quarter(d).alias("qtr"),
        ((F.year(d) - 1995) * 12 + F.month(d) - 1).alias("months_since_start"),
    )


@query(
    "f_unpivot",
    oracle="""
    SELECT l_returnflag, status, qty FROM (
      SELECT l_returnflag,
             SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_open,
             SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_fin
      FROM lineitem GROUP BY l_returnflag
    )
    UNPIVOT (qty FOR status IN (qty_open AS 'O', qty_fin AS 'F'))
    """,
)
def f_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): pivoted quantities back to long form — the inverse
    of A10, via DataFrame.unpivot (ids/values/variable/value)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_fin")
    )
    long = wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_open", "qty_fin"],
        variableColumnName="status",
        valueColumnName="qty",
    )
    return long.withColumn(
        "status", F.when(F.col("status") == "qty_open", "O").otherwise("F")
    )


@query(
    "f_date_series",
    oracle="""
    SELECT user_id, UNNEST(GENERATE_SERIES(
             DATE_TRUNC('day', MIN(CAST(ts AS TIMESTAMP))),
             DATE_TRUNC('day', MAX(CAST(ts AS TIMESTAMP))),
             INTERVAL 7 DAY)) AS week_start
    FROM events
    GROUP BY user_id
    """,
)
def f_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series generation: per-user weekly date spine from first to last
    event (sequence + explode) — the scaffold for gap-filling joins.

    Day extraction is the TZ-independent NTZ truncation (util.day_bucket);
    the old date_trunc-on-instant followed spark.sql.session.timeZone and
    a non-UTC session shifted every midnight-valued fixture instant to the
    previous day (found by the hostile-TZ probe in
    .claude/skills/verify/SKILL.md). week_start stays TIMESTAMP_NTZ."""
    from etl_apache_kafka_python_doker_aws_spark.util import day_bucket

    e = load_table(spark, sf_dir, "events")
    spans = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .select("user_id", day_bucket("mn").alias("lo"), day_bucket("mx").alias("hi"))
    )
    return spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 7 DAYS"))
        ).alias("week_start"),
    )


@query(
    "f_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255                    AS low_byte,
           event_id | 4096                   AS with_flag,
           xor(event_id, 255)                AS flipped,
           event_id << 2                     AS shifted_l,
           event_id >> 1                     AS shifted_r,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events WHERE event_id < 500
    """,
)
def f_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount (the primitives under
    SimHash banding and bitmap indexes)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    c = F.col("event_id")
    return e.select(
        "event_id",
        c.bitwiseAND(255).alias("low_byte"),
        c.bitwiseOR(4096).alias("with_flag"),
        c.bitwiseXOR(255).alias("flipped"),
        F.shiftleft(c, 2).alias("shifted_l"),
        F.shiftright(c, 1).alias("shifted_r"),
        F.bit_count(c).alias("popcount"),
    )


@query(
    "f_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS BIGINT) IS NULL AS k_missing
    FROM events WHERE event_id < 300
    """,
)
def f_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4 binary JSON): parse_json once, then typed path
    access via try_variant_get. At scale this beats per-access
    get_json_object — the string parses once into the binary encoding
    instead of once per extracted path. Parity with the reference's
    json.loads consume path (/root/reference/dags/etl_dags.py:32)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "bigint").isNull().alias("k_missing"),
    )
