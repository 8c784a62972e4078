"""Deduplication operator family.

Reference parity:

- ``least_nulls_survivor`` — the reference's merge-dedup (A2 horizontal
  null-count + A3 grouped argmin via W1 window, merge_dedup.py:14-29),
  with the deterministic tiebreaker the reference lacks (SURVEY.md §2.7
  hazard).

Beyond-reference (LLM-data-pipeline scale family, SURVEY.md §7 phase 4):

- ``dedup_exact`` — hash-groupBy exact dedup.
- ``minhash_band_pairs`` / ``verify_jaccard_pairs`` — MinHash+LSH
  near-dup candidate generation (shingle → minhash → band → bucket
  join) and exact-Jaccard verification.
- ``simhash_buckets`` — SimHash fingerprints / collision clusters.
- ``ngram_jaccard_pairs`` — blocked n-gram Jaccard (inverted index).

Scale design: every candidate generator is a *bucket join* (shuffle on a
short key), never a cross join. At 100 TB the pairwise verification only
touches rows that collided in some band/bucket; skewed mega-buckets are
handled by AQE skew-join splitting (enabled in session.py).

All hashes come from ``functions.hashing`` — deterministic and
bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from ..functions import hashing as H


def horizontal_null_count(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Per-row count of NULLs across ``cols`` (A2; merge_dedup.py:21-22).

    A scalar expression composition, not an aggregation — stays inside
    whole-stage codegen.
    """
    names = cols if cols is not None else df.columns
    return reduce(add, [F.when(col(c).isNull(), 1).otherwise(0) for c in names])


def least_nulls_survivor(
    df: DataFrame,
    partition_cols: list[str],
    tiebreakers: list[str],
    null_count_cols: list[str] | None = None,
) -> DataFrame:
    """Keep, per duplicate group, the row with the fewest NULLs (A3+W1;
    merge_dedup.py:20-29).

    The reference orders only by ``null_count`` — ties make the survivor
    nondeterministic. We append explicit ``tiebreakers`` (documented
    deviation, SURVEY.md §4 hazard 1).
    """
    tagged = df.withColumn("null_count", horizontal_null_count(df, null_count_cols))
    order = [col("null_count"), *[col(c) for c in tiebreakers]]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        tagged.withColumn("row_num", F.row_number().over(w))
        .filter(col("row_num") == 1)
        .drop("null_count", "row_num")
    )


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one survivor (min id) per key group, with the
    duplicate count. A plain hash-groupBy — map-side partial aggregation,
    one shuffle on the key hash; the canonical 100 TB exact-dedup plan."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _expr(pair: tuple[str, str]) -> Column:
    """Spark side of a cross-engine expression pair."""
    return F.expr(pair[0])


from .util import widen as _widen


def with_band_keys(
    df: DataFrame,
    text_col: str,
    shingle_len: int = 3,
    num_bands: int = 4,
    rows_per_band: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """Append LSH band-key columns ``band_0..band_{B-1}`` from a MinHash
    signature over word shingles.

    The signature is computed in ONE Arrow pass
    (``arrow_text.band_keys_udf``): Spark's higher-order functions don't
    participate in whole-stage codegen, so the per-char fold that
    dominates MinHash runs ~100× slower interpreted than the vectorized
    numpy congruence — which is value-identical (tests/test_arrow_text)
    so the DuckDB oracle (the expression spec in functions/hashing.py)
    is unchanged. At 100 TB this is a shuffle-free map either way; the
    Arrow path just prices the map correctly.
    """
    from ..functions.arrow_text import band_keys_udf
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    keep = [id_col] if id_col else df.columns
    bands_udf = band_keys_udf(shingle_len, num_bands, rows_per_band)
    staged = df.select(*keep, bands_udf(col(text_col)).alias("_bands"))
    return staged.select(
        *keep,
        *[F.element_at("_bands", i + 1).alias(f"band_{i}") for i in range(num_bands)],
    )


def minhash_band_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    num_bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs: documents colliding on ≥1 LSH band.

    Plan shape: melt band columns → ONE shuffle on (band_id, band_key)
    → collect the (band-bounded, small by construction) doc-id bucket →
    explode its i<j pairs → distinct. Cost is Σ bucket² over actual
    collisions only, same as a bucket self-join — but each document is
    hashed exactly ONCE. (The previous self-join relied on
    ReusedExchange to dedupe the two sides; PythonUDF projections don't
    canonicalize equal, so the Arrow banding pass ran twice — measured
    2× the banding cost at sf0.1.) A pathological hot bucket (thousands
    of identical docs) would bloat its collected list; at that point the
    bucket IS the duplicate set and the pair explosion, not the list,
    is the quadratic term either way.
    """
    banded = with_band_keys(
        _widen(df), text_col, shingle_len, num_bands, rows_per_band, id_col=id_col
    )
    stack_args = ", ".join(f"{i}, band_{i}" for i in range(num_bands))
    melted = banded.selectExpr(
        f"{id_col} AS doc_id",
        f"stack({num_bands}, {stack_args}) AS (band_id, band_key)",
    )
    buckets = (
        melted.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def jaccard_expr(tokens_a: str, tokens_b: str) -> Column:
    """Exact Jaccard over two *distinct* token-array columns; formulated
    as |I| / (|A| + |B| - |I|) so the DuckDB oracle (which lacks
    list_union) matches term for term."""
    inter = F.size(F.array_intersect(col(tokens_a), col(tokens_b))).cast("double")
    union = (
        F.size(col(tokens_a)) + F.size(col(tokens_b))
    ).cast("double") - F.size(F.array_intersect(col(tokens_a), col(tokens_b)))
    # repr-free floor(q*1e4 + 0.5)/1e4: |I|/|U| is an integer ratio that
    # lands on exact 5th-decimal ties whenever |U| is 2^a*5^b (40, 50,
    # 64 ... are common union sizes), where Spark's repr-round and
    # DuckDB's binary-round can split.
    return F.floor(inter / union * 10000 + F.lit(0.5)).cast("double") / 10000


def verify_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """Join candidate pairs back to distinct-token sets and keep pairs
    with exact Jaccard ≥ threshold."""
    toks = docs.select(
        col(id_col).alias("tok_id"),
        _expr(H.distinct_tokens(text_col)).alias("toks"),
    )
    return (
        pairs.join(toks.withColumnRenamed("tok_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(toks.withColumnRenamed("tok_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        .withColumn("jaccard", jaccard_expr("toks_a", "toks_b"))
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_buckets(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """SimHash fingerprint per document, grouped into collision buckets.

    Identical fingerprints ⇒ near-identical token distributions; at
    scale, follow with in-bucket verification exactly like MinHash.

    Plan: token hashes (ONE Arrow pass — the vectorized twin of the
    interpreted per-token char-fold, value-identical per
    tests/test_arrow_text) → explode → ONE codegen hash-aggregate
    computing all ``bits`` sign-sums as conditional SUMs → assemble the
    fingerprint. The integer sums are identical to the nested-fold
    formulation, so the oracle values don't move."""
    from ..functions.arrow_text import token_hashes_udf
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    # explode_outer + null-guard: a zero-token document must still emit
    # fingerprint 0 (as the nested-fold formulation did), not vanish
    exploded = _widen(df).select(
        col(id_col).alias("doc_id"),
        F.explode_outer(token_hashes_udf()(col(text_col))).alias("h"),
    )
    bit_sums = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(col("h").isNull(), 0)
                .when(F.expr(f"(h >> {j}) & 1") == 1, 1)
                .otherwise(-1)
            ).alias(f"_b{j}")
            for j in range(bits)
        ]
    )
    assemble = " + ".join(
        f"IF(_b{j} > 0, CAST({1 << j} AS BIGINT), CAST(0 AS BIGINT))" for j in range(bits)
    )
    return (
        bit_sums.select("doc_id", F.expr(assemble).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_len: int,
    threshold: float,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Blocked n-gram Jaccard via an INVERTED INDEX, not all-pairs:
    explode distinct grams to (gram, doc) postings, self-join postings
    on (block, gram) to count common grams per candidate pair, then
    exact Jaccard from the per-doc gram counts.

    Result-identical to the pairwise-``array_intersect`` formulation for
    any ``threshold > 0`` (pairs sharing zero grams have Jaccard 0 and
    are generated by neither), but the work is Σ_g c_g² over per-gram
    posting counts instead of |block|² array intersections — with
    distinctive shingles c_g ≈ 1 and the plan is join + count, entirely
    codegen. At 100 TB the posting join shuffles on the gram key, so
    skew = hot shingles; AQE skew-join splits those, and the
    ``max_doc_freq`` cap drops pathological stop-grams entirely
    (Jaccard then measured over the distinctive-gram space)."""
    assert threshold > 0.0, "inverted-index formulation requires threshold > 0"
    from ..functions.arrow_text import distinct_grams_udf
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    base = df.select(
        col(id_col).alias("doc_id"),
        col(block_col).alias("block"),
        distinct_grams_udf(shingle_len)(col(text_col)).alias("grams"),
    )
    # The shingle table is used three times (both join sides + counts):
    # materialize it once via LAZY localCheckpoint. Not .persist():
    # Spark's CacheManager holds persisted plans by strong reference, so
    # an operator-internal persist with no unpersist hook leaks executor
    # storage per invocation; checkpoint blocks are released by the
    # ContextCleaner when the frame is GC'd. At 100 TB this is the
    # materialized intermediate a pipeline would land as a table anyway.
    postings = base.select(
        "doc_id", "block", F.explode("grams").alias("gram")
    ).localCheckpoint(eager=False)
    if max_doc_freq is not None:
        # Document-frequency cap — the relief valve for hot shingles:
        # a gram in c docs contributes c^2 join rows, so one boilerplate
        # shingle shared by 1M docs is a 10^12-row posting join. Capping
        # drops grams with within-block df > cap from BOTH numerator and
        # denominator (standard stopword-removal semantics: Jaccard over
        # the distinctive-gram space). The df agg shuffles on the same
        # (block, gram) key the posting self-join uses, so the capped
        # postings arrive at the join already co-partitioned.
        keep = (
            postings.groupBy("block", "gram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(col("_df") <= max_doc_freq)
            .select("block", "gram")
        )
        postings = postings.join(keep, ["block", "gram"], "left_semi").localCheckpoint(
            eager=False
        )
    counts = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (col("a.block") == col("b.block"))
            & (col("a.gram") == col("b.gram"))
            & (col("a.doc_id") < col("b.doc_id")),
        )
        .groupBy(col("a.doc_id").alias("doc_a"), col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(counts.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_grams", "na")
        .join(counts.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_grams", "nb")
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    col("n_common").cast("double")
                    / ((col("na") + col("nb")).cast("double") - col("n_common"))
                    * 10000
                    + F.lit(0.5)
                ).cast("double")
                / 10000
            ).alias("jaccard"),
        )
        .filter(col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_len: int,
    threshold: float,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Blocked n-gram CONTAINMENT |A∩B| / min(|A|, |B|) — the subset-
    duplication detector symmetric Jaccard structurally misses: a short
    doc pasted inside a long one has Jaccard ≈ |A|/|B| (arbitrarily
    small) but containment ≈ 1. This is also why the candidates come
    from the inverted-index posting join rather than MinHash banding —
    a symmetric-MinHash band collision has probability ~Jaccard^r, so
    LSH is blind to exactly the pairs containment exists to find, while
    the posting join generates every pair sharing ≥1 distinctive gram.

    Same plan shape (and 100 TB story) as ``ngram_jaccard_pairs``: one
    posting explode, one (block, gram) self-join, gram-count
    denominators; the contained side is reported explicitly."""
    assert threshold > 0.0, "inverted-index formulation requires threshold > 0"
    from ..functions.arrow_text import distinct_grams_udf
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    base = df.select(
        col(id_col).alias("doc_id"),
        col(block_col).alias("block"),
        distinct_grams_udf(shingle_len)(col(text_col)).alias("grams"),
    )
    postings = base.select(
        "doc_id", "block", F.explode("grams").alias("gram")
    ).localCheckpoint(eager=False)
    if max_doc_freq is not None:
        # same hot-shingle relief valve as ngram_jaccard_pairs, same
        # semantics shift: containment measured over the
        # distinctive-gram space
        keep = (
            postings.groupBy("block", "gram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(col("_df") <= max_doc_freq)
            .select("block", "gram")
        )
        postings = postings.join(
            keep, ["block", "gram"], "left_semi"
        ).localCheckpoint(eager=False)
    counts = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (col("a.block") == col("b.block"))
            & (col("a.gram") == col("b.gram"))
            & (col("a.doc_id") < col("b.doc_id")),
        )
        .groupBy(col("a.doc_id").alias("doc_a"), col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(counts.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_grams", "na")
        .join(counts.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_grams", "nb")
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    col("n_common").cast("double")
                    / F.least("na", "nb").cast("double")
                    * 10000
                    + F.lit(0.5)
                ).cast("double")
                / 10000
            ).alias("containment"),
            F.when(col("na") <= col("nb"), col("doc_a"))
            .otherwise(col("doc_b"))
            .alias("contained_id"),
        )
        .filter(col("containment") >= threshold)
    )
