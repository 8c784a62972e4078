"""Quarantine readers: PERMISSIVE ingestion that SPLITS malformed
records instead of silently nulling or dropping them.

At 100 TB of crawler/scraper output, malformed records are a
certainty, and each of Spark's stock modes is wrong for a pipeline
that must account for every input record: FAILFAST kills a day-long
job on row one, DROPMALFORMED silently loses data, bare PERMISSIVE
nulls fields without a trace. The production shape is PERMISSIVE +
``columnNameOfCorruptRecord``: good rows flow to the pipeline,
malformed rows land in a QUARANTINE frame carrying the raw record
text for replay/debugging — same scan, no second read.

Engine caveat (pinned in tests/test_sources.py): Spark REFUSES any
JSON/CSV-scan query whose column-pruned reference set is only the
internal corrupt-record column — and column pruning reduces innocent
downstream queries (``good.count()``) to exactly that. The documented
engine workaround is materializing the parsed scan, so ``_split``
CACHES it: sound here because these readers ingest LANDING BATCHES
(today's arrivals — bounded by construction), not the corpus; both
split frames then read from the one cached parse (single pass over
the input). Callers that want the storage back after the batch lands
call ``QuarantineBatch.release()``.

Granularity: CSV and line-delimited JSON quarantine per RECORD. The
multiline row-array JSON shape (the scraper landing format) parses
per FILE, so a malformed file quarantines as ONE row holding the
file's text — the correct unit, since a truncated array makes every
element unparseable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already contains {CORRUPT_COL}")
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


class QuarantineBatch:
    """The split landing batch: ``good`` (pipeline-ready, schema
    columns), ``quarantine`` (raw record + half-parsed fields), and
    ``release()`` to drop the shared cached parse once both sides have
    been written. Iterable as ``good, bad = batch`` for the common
    two-frame use."""

    def __init__(self, parsed: DataFrame, schema: StructType) -> None:
        self._parsed = parsed
        self.good = parsed.filter(col(CORRUPT_COL).isNull()).select(
            *schema.fieldNames()
        )
        self.quarantine = parsed.filter(col(CORRUPT_COL).isNotNull()).select(
            col(CORRUPT_COL).alias("raw_record"), *schema.fieldNames()
        )

    def __iter__(self):
        return iter((self.good, self.quarantine))

    def release(self) -> None:
        self._parsed.unpersist()


def _split(df: DataFrame, schema: StructType) -> QuarantineBatch:
    """Cache the parsed scan and split it (see module docstring: the
    engine forbids corrupt-column-only pruned scans, and the input is
    a bounded landing batch)."""
    return QuarantineBatch(df.cache(), schema)


def read_csv_quarantined(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> QuarantineBatch:
    """CSV scan that routes structurally-malformed rows (type-cast
    failures, broken quoting, wrong arity) to a quarantine frame."""
    df = spark.read.csv(
        path,
        header=header,
        schema=_with_corrupt(schema),
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    )
    return _split(df, schema)


def read_json_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
) -> QuarantineBatch:
    """JSON scan with record-level (line-delimited) or file-level
    (``multiline`` row-array) quarantine."""
    df = (
        spark.read.option("multiline", str(multiline).lower())
        .schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(df, schema)
