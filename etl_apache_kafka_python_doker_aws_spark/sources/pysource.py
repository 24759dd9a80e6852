"""S7: the reference's synthetic-customer generator as a Spark Python
DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference generates 100,000 Faker rows in a single-process loop with
row-at-a-time INSERTs (/root/reference/data_full.py:16-31; 100-row
variant README.md:160-168; amounts `round(random.uniform(0,100000),2)`
at data_full.py:24-25). This port makes generation a first-class,
PARALLEL source: `spark.read.format("synthetic_customers")` splits the
row range into input partitions, each executor generates its slice, and
every row is derived from a per-row seeded RNG — so the dataset is
deterministic and independent of partitioning (same rows whether read
with 1 or 1000 partitions, which also makes retried tasks exactly
reproducible).

No Faker dependency: names/streets come from small pools chosen by the
per-row RNG, matching the reference's column shapes (Spanish schema,
dags/etl_dags.py:36-44) including the DECIMAL(10,2)-as-double amounts.
"""

from __future__ import annotations

import random
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_FIRST = ("maria", "jose", "ana", "luis", "carmen", "juan", "lucia", "pedro",
          "sofia", "diego", "elena", "pablo", "marta", "raul", "irene", "oscar")
_LAST = ("garcia", "rodriguez", "lopez", "martinez", "perez", "gomez",
         "fernandez", "diaz", "torres", "ruiz", "ramos", "vargas")
_STREET = ("calle mayor", "av. libertador", "calle luna", "av. del sol",
           "camino real", "calle rio", "paseo verde", "av. central")

SCHEMA = (
    "id bigint, nombre string, apellido string, direccion string, "
    "telefono string, caja_ahorro_pesos double, caja_ahorro_dolares double"
)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row(seed: int, i: int) -> tuple:
    rng = random.Random((seed << 32) ^ i)
    nombre = rng.choice(_FIRST)
    apellido = rng.choice(_LAST)
    direccion = f"{rng.choice(_STREET)} {rng.randint(1, 9999)}"
    telefono = f"+54 11 {rng.randint(1000, 9999)}-{rng.randint(1000, 9999)}"
    pesos = round(rng.uniform(0, 100000), 2)
    dolares = round(rng.uniform(0, 100000), 2)
    return (i, nombre, apellido, direccion, telefono, pesos, dolares)


class SyntheticCustomersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> list[InputPartition]:
        step = -(-self.rows // self.num_partitions)  # ceil div
        return [
            _Slice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i)


class SyntheticCustomersStreamReader(SimpleDataSourceStreamReader):
    """S7b: the same deterministic generator as a STREAMING source
    (Spark 4 SimpleDataSourceStreamReader). Offsets are plain row
    counts; each micro-batch emits ``batchrows`` rows until ``rows`` is
    reached, after which read() returns an empty batch at the same
    offset — availableNow then terminates. readBetweenOffsets replays
    any committed range exactly (per-row seeded RNG ⇒ replay-identical,
    the exactly-once property the reference's consumer lacked)."""

    def __init__(self, options: dict):
        self.max_rows = int(options.get("rows", 1000))
        self.batch_rows = max(1, int(options.get("batchrows", 250)))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.batch_rows, self.max_rows)
        return (iter([_row(self.seed, i) for i in range(lo, hi)]), {"offset": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_row(self.seed, i) for i in range(int(start["offset"]), int(end["offset"]))]
        )


class SyntheticCustomersDataSource(DataSource):
    """Usage::

        spark.dataSource.register(SyntheticCustomersDataSource)
        df = (spark.read.format("synthetic_customers")
              .option("rows", 100_000).option("partitions", 32).load())
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_customers"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticCustomersReader:
        return SyntheticCustomersReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticCustomersStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthetic source on a session."""
    spark.dataSource.register(SyntheticCustomersDataSource)
