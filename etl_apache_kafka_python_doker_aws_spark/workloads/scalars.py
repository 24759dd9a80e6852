"""Scalar function family queries — SURVEY.md §2.7.

The reference's entire scalar surface is JSON encode/decode
(/root/reference/dags/etl_dags.py:15,32,60), decimal→float cast (:23-24),
and rounding (/root/reference/data_full.py:24-25) — covered by f_json and
f_math; the rest is declared engine surface. Everything here is built-in
`pyspark.sql.functions` (JVM-side, whole-stage codegen) — zero Python in
the hot path.

Oracle alignment traps handled here: DuckDB `log` is base-10 (Spark's is
natural → use `ln` in oracles); DuckDB cast double→int rounds while Spark
truncates (avoid); both engines' md5/sha256 produce lowercase hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "f_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS name_upper,
           LOWER(c_mktsegment)                             AS seg_lower,
           LENGTH(c_name)                                  AS name_len,
           SUBSTRING(c_name, 1, 8)                         AS name_prefix,
           CONCAT(c_name, '|', c_mktsegment)               AS name_seg,
           CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           TRIM(CONCAT(' ', c_name, ' '))                  AS name_trim,
           REPLACE(c_name, '#', '_')                       AS name_repl,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0')        AS key_pad,
           INSTR(c_name, '0')                              AS pos_zero,
           SPLIT_PART(c_name, '#', 1)                      AS name_head
    FROM customer
    """,
)
def f_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: upper/lower/length/substring/concat/
    concat_ws/trim/replace/lpad/instr/split."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).alias("name_seg"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_replace("c_name", "#", "_").alias("name_repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.instr(F.col("c_name"), "0").alias("pos_zero"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_head"),
    )


@query(
    "f_regexp",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_brand, '[0-9]+')               AS brand_num,
           REGEXP_REPLACE(p_type, '[aeiou]', '*', 'g')     AS type_devowel,
           CAST(REGEXP_MATCHES(p_name, '^[a-m]') AS BOOLEAN) AS starts_early
    FROM part
    """,
)
def f_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract / replace / match. Spark regexp_replace is
    global by default; DuckDB needs the 'g' flag."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("type_devowel"),
        F.col("p_name").rlike("^[a-m]").alias("starts_early"),
    )


@query(
    "f_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER)          AS yr,
           CAST(MONTH(o_orderdate) AS INTEGER)         AS mo,
           CAST(DAY(o_orderdate) AS INTEGER)           AS dom,
           CAST(DAYOFWEEK(o_orderdate) AS INTEGER) % 7 + 1 AS dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           DATE_TRUNC('day', o_orderdate) + INTERVAL 30 DAY AS due_date,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
           CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT)   AS unix_ts,
           STRFTIME(o_orderdate, '%Y-%m')              AS ym
    FROM orders
    """,
)
def f_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/day/dayofweek/trunc/date_add/
    datediff/epoch/date_format. Date-valued results are emitted as
    TIMESTAMP_NTZ, not DATE (DateType outputs mismatch the driver's
    pandas-fetched oracle rendering), and the epoch comes from the
    TZ-independent util.epoch_us — unix_timestamp would follow the
    session zone and shift against the oracle's wall-time EPOCH()."""
    from etl_apache_kafka_python_doker_aws_spark.util import epoch_us

    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.trunc(d, "month").cast("timestamp_ntz").alias("month_start"),
        F.date_add(d, 30).cast("timestamp_ntz").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.floor(epoch_us("o_orderdate") / F.lit(1_000_000)).cast("long").alias("unix_ts"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "f_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)            AS price_r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_quantity) AS BIGINT)       AS qty_ceil,
           ABS(l_discount - 0.05)               AS disc_dev,
           ROUND(SQRT(l_extendedprice), 4)      AS price_sqrt,
           ROUND(POW(l_quantity, 2), 2)         AS qty_sq,
           ROUND(LN(l_extendedprice + 1), 6)    AS price_ln,
           ROUND(EXP(l_discount), 6)            AS disc_exp,
           CAST(l_orderkey % 7 AS BIGINT)       AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def f_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/sqrt/pow/ln/exp/pmod — round
    parity with the reference generator (/root/reference/data_full.py:24-25).
    Note DuckDB `log` = log10; natural log is `ln` in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod"),
    )


@query(
    "f_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.k')           AS k_str
    FROM events
    """,
)
def f_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — direct parity with the reference's json.dumps/loads
    wire format (/root/reference/dags/etl_dags.py:15,32,60). from_json with
    explicit schema (never inference) + get_json_object path extraction."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return e.select(
        "event_id",
        F.from_json(F.col("props"), schema).getField("k").alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
    )


@query(
    "f_json_roundtrip",
    oracle="""
    SELECT c_custkey,
           c_name    AS name2,
           ROUND(c_acctbal, 2) AS bal2
    FROM customer
    """,
)
def f_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json → from_json round-trip identity — the reference's
    produce/consume wire cycle (/root/reference/dags/etl_dags.py:15,32)
    as a single plan. The oracle is the identity projection."""
    c = load_table(spark, sf_dir, "customer")
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("name2", T.StringType()),
            T.StructField("bal2", T.DoubleType()),
        ]
    )
    wire = c.select(
        F.to_json(
            F.struct(
                F.col("c_custkey"),
                F.col("c_name").alias("name2"),
                F.round("c_acctbal", 2).alias("bal2"),
            )
        ).alias("value")
    )
    parsed = wire.select(F.from_json("value", schema).alias("m"))
    return parsed.select("m.c_custkey", "m.name2", "m.bal2")


@query(
    "f_conditional",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open')  AS status_or_open,
           NULLIF(o_orderpriority, '3-MEDIUM')           AS prio_nulled,
           IFNULL(NULLIF(o_orderstatus, o_orderstatus), 'all-null') AS always_default
    FROM orders
    """,
)
def f_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: coalesce / nullif / nvl(ifnull)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio_nulled"),
        F.nvl(F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")), F.lit("all-null")).alias(
            "always_default"
        ),
    )


@query(
    "f_hash",
    oracle="""
    SELECT doc_id,
           md5(text)            AS text_md5,
           sha256(text)         AS text_sha256
    FROM documents
    """,
)
def f_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2-256 (both lowercase hex in both engines).
    Spark-only xxhash64/hash are exercised in tests (no DuckDB analog)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "f_json_tuple",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events WHERE event_id < 100
    """,
)
def f_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple multi-path extraction + validity probe (schema_of_json
    is exercised implicitly: the parse schema it would infer is what
    from_json uses in f_json)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return e.select(
        "event_id",
        F.json_tuple(F.col("props"), "k").alias("k_str"),
        F.from_json("props", "map<string,int>").isNotNull().alias("is_valid"),
    )
