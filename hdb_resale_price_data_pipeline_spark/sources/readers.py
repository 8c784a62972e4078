"""Source readers.

Reference equivalents (SURVEY.md §2.1):

- S1/S2: per-file CSV read + manual unionByName fold
  (historical_data_transformation.py:13-27). Spark-first: one directory
  read with an explicit schema — Spark parallelizes file listing and
  reading natively; the manual fold exists in the reference only because
  CSV vintages carry extra columns, which an explicit column projection
  handles.
- S3: multiline-JSON listing scan (propnex_transformation.py:110) — ours
  pins an explicit StructType instead of inferring.
- S4: parquet scans (merge_dedup.py:52-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import RAW_HISTORICAL_COLUMNS, RAW_HISTORICAL_SCHEMA

# Tables the driver generates under /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver-generated table (S4).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
    default ([PARQUET_TYPE_ILLEGAL]). We read nanos as LONG and truncate
    to microseconds — exactly what DuckDB's parquet reader does when it
    maps the column to its µs TIMESTAMP, so both engines see identical
    values. Integer ``div`` (not ``/``): epoch-nanos ≈ 1.7e18 exceeds
    double's 2^53 integer range.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable in this session; the read will fail loudly if needed
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_historical_csv_dir(spark: SparkSession, path: str) -> DataFrame:
    """All historical-transaction CSVs under ``path`` in one scan (S1+S2).

    Column projection conforms mixed vintages to the canonical 10 columns
    (the reference does this per-file then folds with unionByName;
    Catalyst prunes to the same scan from a single read).
    """
    df = spark.read.csv(path, header=True, schema=None, inferSchema=False)
    return df.select(*RAW_HISTORICAL_COLUMNS)


def read_historical_csv_dir_strict(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned variant: all-string declared schema, no inference."""
    df = spark.read.csv(path, header=True, schema=RAW_HISTORICAL_SCHEMA)
    return df


def read_historical_csv_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Per-file read + name-based projection + unionByName fold — the
    reference's vintage-conform strategy (historical_data_transformation.py:
    13-27), for vintages whose columns are REORDERED or renamed (a single
    positional directory read would misparse those).

    Still fully parallel: each ``read.csv`` is a distributed scan and the
    union is a plan-level concat (no shuffle); only the file *listing* is
    driver-side, same as the reference's bucket listing.
    """
    out: DataFrame | None = None
    for p in paths:
        part = spark.read.csv(p, header=True).select(*RAW_HISTORICAL_COLUMNS)
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("no CSV files given")
    return out


def read_listing_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Multiline row-array JSON of scraped listings, explicit schema (S3)."""
    return spark.read.option("multiline", "true").schema(schema).json(path)
