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
from pyspark.sql.types import StringType, StructField, StructType

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


def _peek_csv_header(spark: SparkSession, path: str) -> list[str]:
    """Column names from the first line of the first CSV under ``path``,
    read driver-side via the Hadoop FS (one line, any scheme).

    ``spark.read.csv(header=True)`` without a schema runs a whole Spark
    job just to read that same line — and lists the directory a second
    time for it, which on an object store with 100k files is the actual
    cost (measured locally: ~0.18s plan time vs ~0.02s schema-pinned,
    before any data is read)."""
    import csv
    import io

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, False)
    first = None
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".csv") and not name.startswith((".", "_")):
            if first is None or name < first.getName():
                first = f.getPath()
    if first is None:
        raise FileNotFoundError(f"no CSV files under {path}")
    stream = fs.open(first)
    try:
        buf = bytearray()
        while len(buf) < 1 << 20:
            b = stream.read()
            if b < 0 or b == 0x0A:  # EOF or \n
                break
            buf.append(b if b >= 0 else 0)
    finally:
        stream.close()
    line = buf.decode("utf-8").rstrip("\r")
    return next(csv.reader(io.StringIO(line)))


def read_historical_csv_dir(spark: SparkSession, path: str) -> DataFrame:
    """All historical-transaction CSVs under ``path`` in one scan (S1+S2).

    Column projection conforms mixed vintages to the canonical 10 columns
    (the reference does this per-file then folds with unionByName;
    Catalyst prunes to the same scan from a single read). The header is
    peeked driver-side (one line) and pinned as an all-string schema —
    same semantics as ``header=True`` schema inference, which applies
    the FIRST file's header to every file in the directory anyway
    (per-file reordered vintages need ``read_historical_csv_files``),
    without the extra listing + Spark job inference costs.
    """
    cols = _peek_csv_header(spark, path)
    schema = StructType([StructField(c, StringType(), True) for c in cols])
    df = spark.read.csv(path, header=True, schema=schema)
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
