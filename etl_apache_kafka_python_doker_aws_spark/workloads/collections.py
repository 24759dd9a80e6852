"""Array / map scalar families — SURVEY.md §2.7 (array, map rows),
exercised on the embeddings vector column and events JSON props.

DuckDB list indexing is 1-based like Spark's element_at; slice differs
(DuckDB list[a:b] vs Spark slice(col, start, len)) — oracles use
list slicing with matching bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "f_array",
    oracle="""
    SELECT vec_id,
           LEN(embedding)                                   AS dim,
           ROUND(embedding[1]::DOUBLE, 6)                   AS first_val,
           ROUND(LIST_AGGREGATE(embedding[1:8]::DOUBLE[], 'sum'), 6) AS head_sum,
           ROUND(LIST_AGGREGATE(embedding::DOUBLE[], 'max'), 6)      AS max_val,
           CAST(LEN(LIST_FILTER(embedding::DOUBLE[], x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def f_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size / element_at / slice / HOF aggregate / filter /
    array_max over the embedding vectors (all JVM HOFs)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_val"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head_sum"),
        F.round(F.array_max(vec), 6).alias("max_val"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "f_array_explode",
    oracle="""
    SELECT vec_id, CAST(pos - 1 AS INTEGER) AS pos, ROUND(val::DOUBLE, 6) AS val
    FROM (
      SELECT vec_id, UNNEST(embedding[1:4]) AS val,
             GENERATE_SUBSCRIPTS(embedding[1:4], 1) AS pos
      FROM embeddings WHERE vec_id < 20
    )
    """,
)
def f_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: vector → (position, value) rows (0-based like Spark)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "_v")
    ).select("vec_id", "pos", F.round(F.col("_v").cast("double"), 6).alias("val"))


@query(
    "f_array_zip",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dot
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 20
    """,
)
def f_array_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with + aggregate: pairwise dot product of consecutive vectors
    (the HOF pattern underlying the L3 similarity operators)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import dot

    e = load_table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va")
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select("id_a", "id_b", F.round(dot(F.col("_va"), F.col("_vb")), 6).alias("dot"))
    )


@query(
    "f_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)      AS k_from_map,
           'k'                                              AS first_key,
           CAST(1 AS INTEGER)                               AS n_keys
    FROM events WHERE event_id < 200
    """,
)
def f_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: from_json to MapType, map_keys/map_values/size/
    element_at (props = single-key JSON objects in the fixture)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_from_map"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(m).alias("n_keys"),
    )


@query(
    "f_map_explode",
    oracle="""
    SELECT event_id, 'k' AS key, CAST(json_extract(props, '$.k') AS INTEGER) AS value
    FROM events WHERE event_id < 50
    """,
)
def f_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(map) → (key, value) rows; create_map round-trip covered by
    building the map from the exploded pair again in the same plan."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    exploded = e.select("event_id", F.explode(m).alias("key", "value"))
    # create_map → element_at round-trip (proves construction parity)
    return exploded.select(
        "event_id",
        "key",
        F.element_at(F.create_map(F.col("key"), F.col("value")), F.col("key")).alias("value"),
    )


@query(
    "f_array_contains",
    oracle="""
    SELECT vec_id,
           CAST(list_contains(LIST_TRANSFORM(embedding::DOUBLE[], x -> x > 0.2), TRUE) AS BOOLEAN)
             AS has_big,
           ROUND((LIST_SORT(embedding[1:8]::DOUBLE[]))[1], 6) AS smallest_of_head,
           ROUND((LIST_SORT(embedding[1:8]::DOUBLE[]))[8], 6) AS largest_of_head
    FROM embeddings WHERE vec_id < 50
    """,
)
def f_array_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_contains + sort_array (the remaining §2.7 array rows;
    arrays_zip semantics are covered by f_array_zip's zip_with)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    head_sorted = F.sort_array(F.slice(vec, 1, 8))
    return e.select(
        "vec_id",
        F.array_contains(F.transform(vec, lambda x: x > 0.2), True).alias("has_big"),
        F.round(F.element_at(head_sorted, 1), 6).alias("smallest_of_head"),
        F.round(F.element_at(head_sorted, 8), 6).alias("largest_of_head"),
    )
