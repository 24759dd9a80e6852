"""etl_apache_kafka_python_doker_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL repo (dperco/ETL_APACHE_KAFKA_PYTHON_DOKER_AWS,
surveyed in SURVEY.md): batch relational operators, streaming ingest with
exactly-once semantics, JSON wire parity, plus the LLM-data-pipeline
operator surface (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout:
    session    — tuned SparkSession builder (AQE, Arrow, UTC)
    catalog    — fixture-table loader (TESTDATA.md parquet star schema)
    operators/ — relational operator library (SURVEY.md §2.2-2.6)
    functions/ — scalar/text/dedup/similarity function library (§2.7, §2.11)
    sources/   — source & sink connectors (§2.1)
    plans/     — reference-parity pipeline runner (§2.10)
    streaming/ — Structured Streaming operators (§2.8)
"""

from etl_apache_kafka_python_doker_aws_spark.session import get_spark
from etl_apache_kafka_python_doker_aws_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"
