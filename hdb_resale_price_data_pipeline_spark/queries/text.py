"""Text-analysis query suite over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions import hashing as H
from ..operators import chunking as C
from ..operators import decontam as D
from ..operators import sampling as S
from ..operators import text as T
from ..operators.util import widen
from .base import QuerySpec, t


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + shape stats per document."""
    docs = widen(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.length(col("text")).alias("n_chars_actual"),
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        T.avg_token_len("text").alias("avg_token_len"),
    )


_TEXT_STATS_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       len({H.tokens("text")[1]}) AS n_tokens,
       len({H.distinct_tokens("text")[1]}) AS n_distinct_tokens,
       CAST(floor(list_reduce(list_prepend(0, list_transform({H.tokens("text")[1]},
             x -> length(x))), (acc, x) -> acc + x)::DOUBLE
             / len({H.tokens("text")[1]}) * 10000 + 0.5) AS DOUBLE)
             / 10000 AS avg_token_len
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring with banding (the filter stage of a training-data
    pipeline)."""
    docs = widen(t(spark, sf_dir, "documents"))
    score = T.quality_score("text")
    return docs.select(
        "doc_id",
        score.alias("quality"),
        F.when(score >= 0.6, "keep").when(score >= 0.4, "review").otherwise("drop").alias(
            "quality_band"
        ),
    )


_TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       {T.quality_score_duck("text")} AS quality,
       CASE WHEN {T.quality_score_duck("text")} >= 0.6 THEN 'keep'
            WHEN {T.quality_score_duck("text")} >= 0.4 THEN 'review'
            ELSE 'drop' END AS quality_band
FROM documents
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID vs the labeled lang column."""
    docs = widen(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "lang",
        T.lang_id("text").alias("lang_pred"),
        (T.lang_id("text") == col("lang")).cast("int").alias("is_match"),
    )


_TEXT_LANG_ID_SQL = f"""
SELECT doc_id, lang,
       {T.lang_id_duck("text")} AS lang_pred,
       CAST({T.lang_id_duck("text")} = lang AS INT) AS is_match
FROM documents
"""


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-document profile: shape stats + quality score/band +
    language ID in a single projection (one scan, zero shuffles — the
    shape a real training-data pipeline uses: compute every per-doc
    signal in one pass, filter downstream). Consolidates the former
    ``text_stats`` / ``text_quality`` / ``text_lang_id`` registry entries
    into one driver slot."""
    docs = widen(t(spark, sf_dir, "documents"))
    score = T.quality_score("text")
    return docs.select(
        "doc_id",
        F.length(col("text")).alias("n_chars_actual"),
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        T.avg_token_len("text").alias("avg_token_len"),
        score.alias("quality"),
        F.when(score >= 0.6, "keep").when(score >= 0.4, "review").otherwise("drop").alias(
            "quality_band"
        ),
        "lang",
        T.lang_id("text").alias("lang_pred"),
        (T.lang_id("text") == col("lang")).cast("int").alias("is_match"),
    )


_TEXT_PROFILE_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       len({H.tokens("text")[1]}) AS n_tokens,
       len({H.distinct_tokens("text")[1]}) AS n_distinct_tokens,
       CAST(floor(list_reduce(list_prepend(0, list_transform({H.tokens("text")[1]},
             x -> length(x))), (acc, x) -> acc + x)::DOUBLE
             / len({H.tokens("text")[1]}) * 10000 + 0.5) AS DOUBLE)
             / 10000 AS avg_token_len,
       {T.quality_score_duck("text")} AS quality,
       CASE WHEN {T.quality_score_duck("text")} >= 0.6 THEN 'keep'
            WHEN {T.quality_score_duck("text")} >= 0.4 THEN 'review'
            ELSE 'drop' END AS quality_band,
       lang,
       {T.lang_id_duck("text")} AS lang_pred,
       CAST({T.lang_id_duck("text")} = lang AS INT) AS is_match
FROM documents
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (dedup key at scale)."""
    docs = widen(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.fingerprint("text").alias("fingerprint"),
        T.token_count("text").alias("n_tokens"),
    )


_TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       {T.fingerprint_duck("text")} AS fingerprint,
       len({H.tokens("text")[1]}) AS n_tokens
FROM documents
"""


def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode tokens → global top 20 (count desc,
    token asc). The explode-shuffle-agg shape that dominates corpus
    statistics at scale; partial aggregation keeps the shuffle small."""
    docs = widen(t(spark, sf_dir, "documents"))
    # explode-then-filter, not filter(...)-then-explode: ArrayFilter is a
    # CodegenFallback HOF, while explode + a row predicate keeps the whole
    # stage in WholeStageCodegen (identical results — the dropped empty
    # fragments are dropped either way).
    return (
        docs.select(F.explode(F.split(F.lower(col("text")), " ")).alias("token"))
        .where(col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(col("n").desc(), col("token"))
        .limit(20)
    )


_TEXT_TOP_TOKENS_SQL = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({H.tokens("text")[1]}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenization (letter runs / digit runs /
    symbols) next to whitespace tokenization — the token-counting pair a
    training-data pipeline budgets with."""
    docs = widen(t(spark, sf_dir, "documents"))
    bpe = T.bpe_tokens("text")
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_bpe_distinct"),
        T.token_count("text").alias("n_ws_tokens"),
        F.size(
            F.expr(f"filter({T.bpe_tokens_sql('text')}, x -> x rlike '^[0-9]+$')")
        ).alias("n_digit_tokens"),
    )


_TEXT_BPE_SQL = f"""
SELECT doc_id,
       len({T.bpe_tokens_duck("text")}) AS n_bpe_tokens,
       len(list_distinct({T.bpe_tokens_duck("text")})) AS n_bpe_distinct,
       len({{ws}}) AS n_ws_tokens,
       len(list_filter({T.bpe_tokens_duck("text")},
           x -> regexp_matches(x, '^[0-9]+$'))) AS n_digit_tokens
FROM documents
""".replace("{ws}", H.tokens("text")[1])


def q_text_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content hash (NOT random
    sampling — hash-based splits are reproducible across runs, engines,
    and re-shards, which is what a training pipeline actually needs).
    80/10/10 on fingerprint mod 100."""
    docs = widen(t(spark, sf_dir, "documents"))
    bucket = T.fingerprint("text") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_TRAIN_TEST_SQL = f"""
SELECT lang, split, count(*) AS n_docs
FROM (
    SELECT lang,
           CASE WHEN ({T.fingerprint_duck("text")}) % 100 < 80 THEN 'train'
                WHEN ({T.fingerprint_duck("text")}) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
GROUP BY lang, split
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition signal (gopher-style): the share of a
    document's 2-grams taken by its most frequent 2-gram. The stats are
    row-local, so this is ONE shuffle-free Arrow map
    (operators/text.repetition_stats) — the explode → groupBy(doc,
    gram) → groupBy(doc) formulation paid two shuffles for a
    computation that needs zero. Ratio + rounding stay JVM-side."""
    docs = widen(t(spark, sf_dir, "documents"))
    stats = T.repetition_stats(docs, "doc_id", "text", n=2)
    return stats.select(
        "doc_id",
        F.round(
            col("top_gram_count").cast("double") / col("n_grams"), 4
        ).alias("top_gram_ratio"),
        "top_gram_count",
        "n_grams",
    )


_TEXT_REPETITION_SQL = f"""
WITH grams AS (
    SELECT doc_id, unnest({H.shingles(H.tokens("text"), 2)[1]}) AS gram FROM documents
), per_gram AS (
    SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_gram_ratio,
       max(c) AS top_gram_count,
       CAST(sum(c) AS BIGINT) AS n_grams
FROM per_gram
GROUP BY doc_id
"""


DECONTAM_N = 5  # word n-gram size; 8–13 typical for prod, 5 fits the tiny test vocab


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): every tenth
    doc_id acts as the held-out eval set; each remaining training doc is
    scored by how many of its distinct word 5-grams collide with the
    eval set's n-gram union. Eval n-grams are broadcast (benchmarks are
    tiny next to the corpus) so the training scan shuffles once, on
    doc_id, with partial aggregation."""
    from ..operators.decontam import contamination_report

    docs = widen(t(spark, sf_dir, "documents"))
    return contamination_report(
        docs, eval_pred=col("doc_id") % 10 == 0, n=DECONTAM_N
    )


_DECONTAM_GRAMS = D.doc_shingle_hashes_duck("text", 5)
_TEXT_DECONTAM_SQL = f"""
WITH eval_grams AS (
    SELECT DISTINCT unnest({_DECONTAM_GRAMS}) AS gram
    FROM documents WHERE doc_id % 10 = 0
), train AS (
    SELECT doc_id, unnest({_DECONTAM_GRAMS}) AS gram
    FROM documents WHERE doc_id % 10 <> 0
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
       round(CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS contamination_ratio,
       CAST(sum(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) >= 1 AS INT)
           AS is_contaminated
FROM train t LEFT JOIN eval_grams e ON t.gram = e.gram
GROUP BY t.doc_id
"""


def q_text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (operators/decontam.py): same eval
    slice as ``text_decontaminate``, but the eval n-grams are folded
    into a fixed-size Bloom bitset instead of an exact broadcast set —
    the shape for eval/blocklist sides too big to materialize (billions
    of grams: Dolma's bloom deduper, CCNet). The corpus probe is a
    shuffle-free map pass against a 128 KiB one-row broadcast. The
    bitset is pure integer arithmetic on both engines, so the oracle
    reproduces every false positive bit-for-bit; no-false-negative
    containment vs the exact report is pinned in tests/test_decontam.py.
    """
    from ..operators.decontam import bloom_contamination_report

    docs = widen(t(spark, sf_dir, "documents"))
    return bloom_contamination_report(
        docs,
        eval_pred=col("doc_id") % 10 == 0,
        n=DECONTAM_N,
        cache_key=(sf_dir, "mod10"),
    )


def _bloom_decontam_oracle() -> str:
    from ..operators.decontam import (
        BLOOM_K,
        BLOOM_M_BITS,
        BLOOM_WORD_BITS,
    )

    m, wb = BLOOM_M_BITS, BLOOM_WORD_BITS
    return f"""
WITH ev AS (
    SELECT DISTINCT unnest({_DECONTAM_GRAMS}) AS g
    FROM documents WHERE doc_id % 10 = 0
),
pos AS (
    SELECT DISTINCT ((g % {m}) + j * (1 + (g % {m - 1}))) % {m} AS p
    FROM ev CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS j)
),
words AS (
    SELECT p // {wb} AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(p % {wb} AS INT)) AS bits
    FROM pos GROUP BY 1
),
train AS (
    SELECT doc_id, unnest({_DECONTAM_GRAMS}) AS g
    FROM documents WHERE doc_id % 10 <> 0
),
trainpos AS (
    SELECT doc_id, g, ((g % {m}) + j * (1 + (g % {m - 1}))) % {m} AS p
    FROM train CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS j)
),
pergram AS (
    SELECT doc_id, g,
           min(CASE WHEN w.bits IS NOT NULL
                     AND (w.bits & (CAST(1 AS BIGINT) << CAST(tp.p % {wb} AS INT))) <> 0
                    THEN 1 ELSE 0 END) AS hit
    FROM trainpos tp LEFT JOIN words w ON tp.p // {wb} = w.w
    GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(hit) AS BIGINT) AS n_flagged,
       round(CAST(sum(hit) AS DOUBLE) / count(*), 4) AS flagged_ratio,
       CAST(sum(hit) >= 1 AS INT) AS is_flagged
FROM pergram
GROUP BY doc_id
"""


# Corpus snapshot diff: deterministic v1/v2 slices of the documents
# table (v2 drops doc_id%17==5, adds doc_id%17==3, and revises
# doc_id%13==0) so every diff status actually occurs.
DIFF_DROP_V1, DIFF_DROP_V2, DIFF_REV = 3, 5, 13


def q_text_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff — the snapshot-to-snapshot accounting an
    operator runs before shipping a new training corpus: which docs
    were added / removed / changed / unchanged, by COUNT and id
    checksum. Each side is projected to ``(doc_id, fingerprint)``
    BEFORE the full-outer join, so the join ships 16 bytes per doc
    regardless of document size, and the single doc_id shuffle
    disappears entirely if both snapshots are bucketed on doc_id
    (sources/warehouse.write_bucketed). Text is compared by the
    rolling-hash fingerprint, not bytes — the same normalization the
    dedup family uses."""
    docs = widen(t(spark, sf_dir, "documents"))
    fp = T.fingerprint("text")
    v1 = docs.filter(col("doc_id") % 17 != DIFF_DROP_V1).select(
        "doc_id", fp.alias("fp1")
    )
    v2 = (
        docs.filter(col("doc_id") % 17 != DIFF_DROP_V2)
        .withColumn(
            "text",
            F.when(
                col("doc_id") % DIFF_REV == 0, F.concat(col("text"), F.lit(" rev2"))
            ).otherwise(col("text")),
        )
        .select("doc_id", fp.alias("fp2"))
    )
    status = (
        F.when(col("fp1").isNull(), "added")
        .when(col("fp2").isNull(), "removed")
        .when(col("fp1") != col("fp2"), "changed")
        .otherwise("unchanged")
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .select("doc_id", status.alias("status"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("docid_checksum"),
        )
    )


def _corpus_diff_oracle() -> str:
    return f"""
WITH v1 AS (
    SELECT doc_id, {T.fingerprint_duck("text")} AS fp1
    FROM documents WHERE doc_id % 17 <> {DIFF_DROP_V1}
),
v2 AS (
    SELECT doc_id, {T.fingerprint_duck("text2")} AS fp2 FROM (
        SELECT doc_id,
               CASE WHEN doc_id % {DIFF_REV} = 0 THEN text || ' rev2'
                    ELSE text END AS text2
        FROM documents WHERE doc_id % 17 <> {DIFF_DROP_V2}
    )
)
SELECT CASE WHEN fp1 IS NULL THEN 'added'
            WHEN fp2 IS NULL THEN 'removed'
            WHEN fp1 <> fp2 THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(COALESCE(v1.doc_id, v2.doc_id)) AS BIGINT) AS docid_checksum
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
GROUP BY 1
"""


CHUNK_WINDOW = 64
CHUNK_STRIDE = 48  # 25% overlap


def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking (operators/chunking.py): each document fans out
    to overlapping 64-token windows at stride 48. One scan, zero
    shuffles — the fan-out is a map-side explode over codegen array
    slices, and the chunk text round-trips the original tokens so the
    oracle comparison is exact (no floats, no hashing)."""
    from ..operators.chunking import chunk_documents

    docs = widen(t(spark, sf_dir, "documents"))
    return chunk_documents(
        docs, "doc_id", "text", window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    )


_TEXT_CHUNK_SQL = C.chunk_documents_duck(
    "documents", "doc_id", "text", window=CHUNK_WINDOW, stride=CHUNK_STRIDE
)


QUERIES: dict[str, QuerySpec] = {
    # r5 session-5 rotation: text_chunk_overlap → LOCAL_QUERIES (the
    # chunking family stays oracle-verified there via text_cdc_chunks /
    # multimodal_chunks / text_pack_sequences); its graded slot goes to
    # emb_knn_triangles so the graph family (knn graph → mutual →
    # census) lands on the driver's hard signal.
    "text_train_test_split": QuerySpec(q_text_train_test_split, _TRAIN_TEST_SQL),
    "text_decontaminate": QuerySpec(q_text_decontaminate, _TEXT_DECONTAM_SQL),
    # r4: the C4/Gopher corpus filters join the graded window below
    # (after their definitions); text_fingerprint and text_top_tokens
    # move to LOCAL_QUERIES — the polynomial fingerprint hash is
    # exercised by every graded dedup query and the global token agg by
    # the pivot/top-k family, so they were the most redundant rows.
    # r5 rotation (per the r4 verdict): text_profile / text_repetition /
    # text_bpe_tokens demote to LOCAL_QUERIES — their X-row coverage is
    # anchored by string_conform / hdb_cleaning_semantics and the C4/
    # Gopher filters — freeing graded slots for the round-4 flagship
    # model-based-selection family: text_bpe_learn (distributed BPE
    # training), text_quality_classifier (trained LR selection), and
    # text_model_selection (4-signal consensus), registered below after
    # their definitions. No §2-anchoring query is demoted.
}

# Subsumed column-for-column by text_profile; oracle-verified locally.
PACK_CAPACITY = 512


def q_text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (operators/packing.py): docs
    per language in doc_id order form one token stream cut into
    512-token sequences; each doc gets (seq_id, offset). One shuffle +
    a codegen window cumsum — the oracle is the identical prefix-sum
    arithmetic in SQL."""
    from ..operators.packing import pack_sequences

    docs = widen(t(spark, sf_dir, "documents"))
    return pack_sequences(
        docs, "lang", "doc_id", T.token_count("text"), PACK_CAPACITY
    )


_TEXT_PACK_SQL = f"""
WITH toks AS (
    SELECT lang, doc_id, len({H.tokens("text")[1]}) AS n_tokens FROM documents
), cum AS (
    SELECT lang, doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS _start
    FROM toks
)
SELECT lang, doc_id, n_tokens,
       _start // {PACK_CAPACITY} AS seq_id,
       _start % {PACK_CAPACITY} AS offset
FROM cum
"""


MIX_BUDGET_TOKENS = 12_000  # ~45% of the sf0.01 corpus — real downsampling


def q_text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-token-budget domain mixture (operators/sampling.py): each
    `source` gets budget/n_domains tokens, documents hash-sampled at the
    per-domain acceptance rate. Rate table broadcast; corpus never
    shuffled for the join."""
    from ..operators.sampling import sample_domain_mixture

    docs = widen(t(spark, sf_dir, "documents"))
    return sample_domain_mixture(docs, MIX_BUDGET_TOKENS)


_TEXT_DOMAIN_MIX_SQL = S.sample_domain_mixture_duck(MIX_BUDGET_TOKENS)


def q_text_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=0.5 temperature domain mixture (operators/sampling.py):
    sampled share ∝ √(domain share) — the standard multilingual
    re-weighting between proportional (τ=1) and uniform (τ→0). Same
    zero-corpus-shuffle plan as the equal-budget mixture; τ=0.5 keeps
    the power IEEE-exact (sqrt), so the oracle hash-matches."""
    from ..operators.sampling import sample_temperature_mixture

    docs = widen(t(spark, sf_dir, "documents"))
    return sample_temperature_mixture(docs, MIX_BUDGET_TOKENS)


_TEXT_TEMP_MIX_SQL = S.sample_temperature_mixture_duck(MIX_BUDGET_TOKENS)


def q_text_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level curation — the stage a web pipeline runs BEFORE
    fetching content (crawl frontiers dedupe and blocklist on URLs,
    not documents). The corpus has no URL column, so each doc is
    SALTED with a deterministic doc_id-derived URL (same discipline as
    text_pii_redact): varied TLDs, tracking query params on every 4th,
    fragments on every 5th — so normalization, domain extraction, and
    URL-dedup all do real work under a real value oracle.

    Stages, all map-only codegen until the final small aggregation:
    normalize (strip query/fragment), extract registered domain
    (regexp in the RE2 ∩ Java dialect, like the PII chain), blocklist
    match (the 'src1' domains), then per-domain accounting: raw URLs,
    distinct normalized URLs (tracking params collapse → real dedup),
    blocked count."""
    docs = widen(t(spark, sf_dir, "documents"))
    url = F.concat(
        F.lit("https://"),
        col("source"),
        F.lit(".example"),
        F.element_at(
            F.array(F.lit(".com"), F.lit(".org"), F.lit(".net")),
            (col("doc_id") % 3 + 1).cast("int"),
        ),
        F.lit("/p/"),
        (col("doc_id") % 40).cast("string"),
        F.lit("/"),
        col("doc_id").cast("string"),
        F.when(
            col("doc_id") % 4 == 0,
            F.concat(F.lit("?utm_source=feed&ref="), (col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
        F.when(col("doc_id") % 5 == 0, F.lit("#section")).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", url.alias("url"))
    norm = F.regexp_replace(col("url"), r"[?#].*$", "")
    domain = F.regexp_extract(col("url"), r"^https://([^/]+)/", 1)
    staged = base.select(
        "doc_id",
        norm.alias("norm_url"),
        domain.alias("domain"),
        domain.startswith("src1.").cast("int").alias("blocked"),
    )
    return staged.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("norm_url").alias("n_distinct_norm"),
        F.sum("blocked").alias("n_blocked"),
    )


_URL_CURATION_SQL = """
WITH base AS (
    SELECT doc_id,
           'https://' || source || '.example' ||
           (['.com', '.org', '.net'])[CAST(doc_id % 3 + 1 AS INT)] ||
           '/p/' || CAST(doc_id % 40 AS VARCHAR) || '/' || CAST(doc_id AS VARCHAR) ||
           CASE WHEN doc_id % 4 = 0
                THEN '?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR)
                ELSE '' END ||
           CASE WHEN doc_id % 5 = 0 THEN '#section' ELSE '' END AS url
    FROM documents
),
staged AS (
    SELECT doc_id,
           regexp_replace(url, '[?#].*$', '') AS norm_url,
           regexp_extract(url, '^https://([^/]+)/', 1) AS domain
    FROM base
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT norm_url) AS BIGINT) AS n_distinct_norm,
       CAST(sum(CASE WHEN domain LIKE 'src1.%' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_blocked
FROM staged
GROUP BY domain
"""


CURRICULUM_SHARDS = 8


def q_text_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum shard assignment: split the corpus into N ordered
    shards by quality (highest-quality shard first) WITHOUT a global
    sort. A window ``ntile`` over all docs would collapse to a single
    task at scale (no partitionBy), and ``repartitionByRange`` samples
    its boundaries non-deterministically; instead this uses
    HISTOGRAM-QUANTILE sharding: quality lives on a 1e-4 grid, so a
    ≤10001-row histogram + one cumulative window over it yields exact
    integer shard boundaries, broadcast back as a bucket→shard map —
    one tiny aggregation plus a map-only join, deterministic, and the
    corpus is never globally sorted. Docs sharing a grid value share a
    shard (ties never split), so shard sizes are approximately — not
    exactly — equal. Emitted per shard: count, quality-bucket range,
    id checksum; ordering invariants in tests/test_sampling.py."""
    docs = widen(t(spark, sf_dir, "documents"))
    from pyspark.sql.window import Window as W

    feats = docs.select(
        "doc_id",
        F.floor(T.quality_score("text") * 10000).cast("int").alias("qb"),
    )
    hist = feats.groupBy("qb").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.orderBy(col("qb").desc())
    buckets = hist.select(
        "qb",
        (F.sum("cnt").over(w) - col("cnt")).alias("cum_before"),
        F.sum("cnt").over(W.partitionBy()).alias("total"),
    ).select(
        "qb",
        F.expr(
            f"CAST(1 + (cum_before * {CURRICULUM_SHARDS}) DIV total AS INT)"
        ).alias("shard"),
    )
    return (
        feats.join(F.broadcast(buckets), "qb")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("qb").alias("min_qb"),
            F.max("qb").alias("max_qb"),
            F.sum("doc_id").alias("docid_checksum"),
        )
    )


def _curriculum_oracle() -> str:
    qd = T.quality_score_duck("text")
    n = CURRICULUM_SHARDS
    return f"""
WITH f AS (
    SELECT doc_id, CAST(floor(({qd}) * 10000) AS INT) AS qb FROM documents
),
h AS (SELECT qb, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY qb),
c AS (
    SELECT qb,
           CAST(sum(cnt) OVER (ORDER BY qb DESC ROWS UNBOUNDED PRECEDING) - cnt
                AS BIGINT) AS cum_before,
           CAST(sum(cnt) OVER () AS BIGINT) AS total
    FROM h
),
m AS (SELECT qb, CAST(1 + (cum_before * {n}) // total AS INT) AS shard FROM c)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(qb) AS min_qb,
       max(qb) AS max_qb,
       CAST(sum(doc_id) AS BIGINT) AS docid_checksum
FROM f JOIN m USING (qb)
GROUP BY shard
"""


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (operators/text.py pattern chain). The
    corpus text is word salad with no PII, so each doc is SALTED with
    deterministic synthetic PII derived from its own doc_id (an email,
    a URL, a phone number) — both engines construct the identical
    string, so the counts and the redacted output get a real value
    oracle instead of an all-zeros one."""
    docs = widen(t(spark, sf_dir, "documents"))
    salted = F.concat(
        col("text"),
        F.lit(" contact user"),
        col("doc_id").cast("string"),
        F.lit("@example.com via https://ex.org/d/"),
        col("doc_id").cast("string"),
        F.lit(" or +65 9123 45"),
        F.lpad((col("doc_id") % 100).cast("string"), 2, "0"),
    )
    return docs.select(
        "doc_id",
        *[c for c in T.pii_counts_on(salted)],
        T.redact_pii_col(salted).alias("redacted"),
    )


def _pii_oracle() -> str:
    salted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com via https://ex.org/d/' || CAST(doc_id AS VARCHAR)"
        " || ' or +65 9123 45' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
    )
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all({salted}, '{pat}')) AS INT) AS n_{kind}"
        for kind, pat, _ in T.PII_PATTERNS
    )
    return f"""
SELECT doc_id,
       {counts},
       {T.redact_pii_duck(salted)} AS redacted
FROM documents
"""


# --- C4-style cleaning -------------------------------------------------------
# The corpus is single-line word salad with no punctuation, so (same
# discipline as text_pii_redact) each document is SALTED into a
# synthetic multi-line page built identically in both engines: good
# sentences, a too-short line, a no-terminal-punctuation line, and
# doc_id-conditional javascript / lorem-ipsum / curly-brace lines — so
# every C4 rule fires on a deterministic subset and the filter output
# carries a real value oracle.

_C4_GOOD2 = "the quick brown fox jumps over the lazy dog today."
_C4_GOOD3 = "a second well formed sentence closes out this document."
_C4_SHORT = "too short."
_C4_NOPUNCT = "five words but no full stop here"
_C4_JS = "please enable javascript to view the full content here."
_C4_LOREM = "lorem ipsum dolor sit amet consectetur adipiscing elit."
_C4_BRACE = "function render() { return html; }"


def _c4_salted_sql() -> str:
    """Engine-shared page builder (valid Spark SQL and DuckDB SQL:
    concat_ws skips NULLs, CASE without ELSE yields NULL, chr(10))."""
    return (
        "concat_ws(chr(10), text || '.', "
        f"'{_C4_SHORT}', '{_C4_NOPUNCT}', "
        f"CASE WHEN doc_id % 3 = 0 THEN '{_C4_JS}' END, "
        f"CASE WHEN doc_id % 5 = 0 THEN '{_C4_LOREM}' END, "
        f"CASE WHEN doc_id % 7 = 0 THEN '{_C4_BRACE}' END, "
        f"'{_C4_GOOD2}', '{_C4_GOOD3}')"
    )


def q_text_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line/page cleaning (operators/text.py C4_* rules) over salted
    multi-line pages. Pure higher-order-function Column expressions —
    map-only, zero shuffles, codegen-resident; at 100 TB this is a
    scan-bound single pass."""
    docs = widen(t(spark, sf_dir, "documents"))
    salted = _c4_salted_sql()
    lines_s = T.c4_lines(salted)[0]
    kept_s = T.c4_kept_lines(salted)[0]
    bad_s = T.c4_page_bad(salted)[0]
    keep = f"(NOT {bad_s} AND size({kept_s}) >= {T.C4_MIN_KEPT_LINES})"
    return docs.select(
        "doc_id",
        F.expr(f"size({lines_s})").alias("n_lines"),
        F.expr(f"size({kept_s})").alias("n_kept"),
        F.expr(f"CAST({keep} AS INT)").alias("page_keep"),
        F.expr(
            f"CASE WHEN {keep} THEN array_join({kept_s}, chr(10)) END"
        ).alias("cleaned"),
    )


def _c4_oracle() -> str:
    salted = _c4_salted_sql()
    lines_d = T.c4_lines(salted)[1]
    kept_d = T.c4_kept_lines(salted)[1]
    bad_d = T.c4_page_bad(salted)[1]
    keep = f"(NOT {bad_d} AND len({kept_d}) >= {T.C4_MIN_KEPT_LINES})"
    return f"""
SELECT doc_id,
       CAST(len({lines_d}) AS INT) AS n_lines,
       CAST(len({kept_d}) AS INT) AS n_kept,
       CAST({keep} AS INT) AS page_keep,
       CASE WHEN {keep} THEN array_to_string({kept_d}, chr(10)) END AS cleaned
FROM documents
"""


# --- Gopher-style quality rules ----------------------------------------------
# Symbol/number salt varies the symbol-ratio and alphabetic-word
# fraction across documents (the raw corpus contains neither symbols
# nor digits, so those rules would be constant without it).

_GOPHER_NUM_SALT = "404 500 301 202 100 999 123 456 789 000"


def _gopher_salted_sql() -> str:
    return (
        "text || CASE WHEN doc_id % 3 = 0 THEN ' # # ...' "
        "WHEN doc_id % 3 = 1 THEN ' #' ELSE '' END || "
        f"CASE WHEN doc_id % 11 = 0 THEN ' {_GOPHER_NUM_SALT}' ELSE '' END"
    )


def q_text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality ruleset (operators/text.py GOPHER_*):
    word-count band, mean-word-length band, symbol ratio, alphabetic
    fraction, stopword presence → keep flag. Map-only, codegen."""
    docs = widen(t(spark, sf_dir, "documents"))
    salted = _gopher_salted_sql()
    n_words = f"size({H.tokens(salted)[0]})"
    mean_len = (
        f"round(aggregate(transform({H.tokens(salted)[0]}, x -> length(x)), 0, "
        f"(acc, x) -> acc + x) / CAST({n_words} AS DOUBLE), 4)"
    )
    n_sym = T.gopher_symbol_count(salted)[0]
    n_alpha = T.gopher_alpha_count(salted)[0]
    sym_ratio = f"round({n_sym} / CAST({n_words} AS DOUBLE), 4)"
    alpha_frac = f"round({n_alpha} / CAST({n_words} AS DOUBLE), 4)"
    sw = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])
    n_stop = f"size(filter({H.tokens(salted)[0]}, x -> x IN ({sw})))"
    keep = (
        f"({n_words} BETWEEN {T.GOPHER_MIN_WORDS} AND {T.GOPHER_MAX_WORDS}"
        f" AND {mean_len} BETWEEN {T.GOPHER_MIN_MEAN_WORD_LEN} AND {T.GOPHER_MAX_MEAN_WORD_LEN}"
        f" AND {sym_ratio} <= {T.GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {alpha_frac} >= {T.GOPHER_MIN_ALPHA_FRAC}"
        f" AND {n_stop} >= {T.GOPHER_MIN_STOPWORDS})"
    )
    return docs.select(
        "doc_id",
        F.expr(n_words).alias("n_words"),
        F.expr(mean_len).alias("mean_word_len"),
        F.expr(sym_ratio).alias("symbol_ratio"),
        F.expr(alpha_frac).alias("alpha_frac"),
        F.expr(n_stop).alias("n_stopwords"),
        F.expr(f"CAST({keep} AS INT)").alias("keep"),
    )


def _gopher_oracle() -> str:
    salted = _gopher_salted_sql()
    toks = H.tokens(salted)[1]
    n_words = f"len({toks})"
    mean_len = (
        f"round(list_reduce(list_prepend(0, list_transform({toks}, "
        f"x -> length(x))), (acc, x) -> acc + x) / CAST({n_words} AS DOUBLE), 4)"
    )
    n_sym = T.gopher_symbol_count(salted)[1]
    n_alpha = T.gopher_alpha_count(salted)[1]
    sym_ratio = f"round({n_sym} / CAST({n_words} AS DOUBLE), 4)"
    alpha_frac = f"round({n_alpha} / CAST({n_words} AS DOUBLE), 4)"
    n_stop = T.stopword_count_duck(salted, "en")
    keep = (
        f"({n_words} BETWEEN {T.GOPHER_MIN_WORDS} AND {T.GOPHER_MAX_WORDS}"
        f" AND {mean_len} BETWEEN {T.GOPHER_MIN_MEAN_WORD_LEN} AND {T.GOPHER_MAX_MEAN_WORD_LEN}"
        f" AND {sym_ratio} <= {T.GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {alpha_frac} >= {T.GOPHER_MIN_ALPHA_FRAC}"
        f" AND {n_stop} >= {T.GOPHER_MIN_STOPWORDS})"
    )
    return f"""
SELECT doc_id,
       CAST({n_words} AS INT) AS n_words,
       {mean_len} AS mean_word_len,
       {sym_ratio} AS symbol_ratio,
       {alpha_frac} AS alpha_frac,
       CAST({n_stop} AS INT) AS n_stopwords,
       CAST({keep} AS INT) AS keep
FROM documents
"""


# --- passage-level duplication (ExactSubstr-lite) ---------------------------

PASSAGE_N = 8  # tokens per passage shingle


def q_text_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplicate detection, the ExactSubstr idea of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") at shingle granularity: a long token n-gram occurring in
    MORE THAN ONE document marks a duplicated passage; per-doc output
    is the duplicated-shingle count and first duplicated position (the
    span a trainer would cut). Dataflow = the inverted-index posting
    shape of dedup_ngram_jaccard — explode is linear in token volume,
    the gram aggregation is partial-agg'd, no pairwise term anywhere."""
    docs = widen(t(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.posexplode(F.expr(H.shingles(H.tokens("text"), PASSAGE_N)[0])).alias(
            "pos", "gram"
        ),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(col("n_docs") >= 2)
        .select("gram")
    )
    return (
        grams.join(dup, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_passages"),
            F.min("pos").alias("first_dup_pos"),
        )
    )


def _repeated_passages_oracle() -> str:
    shingles = H.shingles(H.tokens("text"), PASSAGE_N)[1]
    return f"""
WITH g AS (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'gram': l[i]}} for i in range(1, len(l) + 1)],
                recursive := true)
  FROM (SELECT doc_id, {shingles} AS l FROM documents)
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_dup_passages,
       CAST(min(g.pos) AS INT) AS first_dup_pos
FROM g JOIN d USING (gram)
GROUP BY g.doc_id
"""


def q_text_cut_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT step of ExactSubstr dedup: token spans covered by a
    duplicated shingle are REMOVED from every document except the
    gram's canonical owner (lowest doc_id), and the cleaned text is
    reassembled in token order. Output per doc: total tokens, cut
    tokens, cleaned (lower-cased token-normalized) text. Dataflow:
    posting explode (linear in token volume) → owner aggregation →
    span explode → distinct cut positions → anti-join → ordered
    reassembly; no pairwise term, every join keyed on (doc_id, pos) or
    gram."""
    docs = widen(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.posexplode(F.expr(H.tokens("text")[0])).alias("tpos", "tok"),
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(F.expr(H.shingles(H.tokens("text"), PASSAGE_N)[0])).alias(
            "pos", "gram"
        ),
    )
    owners = (
        grams.groupBy("gram")
        .agg(
            F.min("doc_id").alias("owner"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .filter(col("nd") >= 2)
        .select("gram", "owner")
    )
    cut = (
        grams.join(owners, "gram")
        .filter(col("doc_id") != col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(col("pos"), col("pos") + F.lit(PASSAGE_N - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    kept = toks.join(cut, ["doc_id", "tpos"], "left_anti")
    totals = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("cleaned"),
    )
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (col("n_tokens") - F.coalesce(col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_cut_tokens"),
        F.coalesce(col("cleaned"), F.lit("")).alias("cleaned"),
    )


def _cut_passages_oracle() -> str:
    toks = H.tokens("text")[1]
    sh = H.shingles(H.tokens("text"), PASSAGE_N)[1]
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id,
         unnest([{{'tpos': i - 1, 'tok': l[i]}} for i in range(1, len(l) + 1)],
                recursive := true)
  FROM (SELECT doc_id, {toks} AS l FROM documents)
), g AS MATERIALIZED (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'gram': l[i]}} for i in range(1, len(l) + 1)],
                recursive := true)
  FROM (SELECT doc_id, {sh} AS l FROM documents)
), owners AS (
  SELECT gram, min(doc_id) AS owner FROM g
  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), cutpos AS (
  SELECT DISTINCT c.doc_id, c.pos + x.i AS tpos
  FROM (SELECT g.doc_id, g.pos FROM g JOIN owners o USING (gram)
        WHERE g.doc_id != o.owner) c,
       (SELECT unnest(range(0, {PASSAGE_N})) AS i) x
), kept AS (
  SELECT t.doc_id, t.tpos, t.tok
  FROM t ANTI JOIN cutpos c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
), totals AS (
  SELECT doc_id, count(*) AS n_tokens FROM t GROUP BY doc_id
), agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY tpos) AS cleaned
  FROM kept GROUP BY doc_id
)
SELECT tt.doc_id, tt.n_tokens,
       CAST(tt.n_tokens - COALESCE(a.n_kept, 0) AS BIGINT) AS n_cut_tokens,
       COALESCE(a.cleaned, '') AS cleaned
FROM totals tt LEFT JOIN agg a USING (doc_id)
"""


QUERIES["text_c4_filter"] = QuerySpec(q_text_c4_filter, _c4_oracle())
QUERIES["text_gopher_quality"] = QuerySpec(q_text_gopher_quality, _gopher_oracle())


# --- model-based data selection (operators/scoring.py) ---------------------

def q_text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring (Wenzek et al. 2020): train an
    add-one-smoothed bigram LM on a trusted slice (even doc_ids — the
    deterministic stand-in for 'Wikipedia'), score EVERY document by
    per-token negative log-likelihood. Model-sized broadcast joins, one
    doc_id shuffle; the quantized-BIGINT log fold makes the score
    hash-exact cross-engine (see operators/scoring.py docstring)."""
    from ..operators import scoring as SC

    docs = widen(t(spark, sf_dir, "documents"))
    uni, big, vocab = SC.train_bigram_lm(docs.filter(col("doc_id") % 2 == 0), "text")
    return SC.score_perplexity(docs, "text", uni, big, vocab)


def _lm_perplexity_oracle() -> str:
    from ..operators import scoring as SC

    tok_d = H.tokens("text")[1]
    bg_d = H.shingles(H.tokens("text"), 2)[1]
    lpq = SC.lm_logprob_sql("coalesce(bc, 0)", "coalesce(uc, 0)", "vsz")
    return f"""
WITH train AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
uni AS (SELECT w, count(*) AS uc
        FROM (SELECT unnest({tok_d}) AS w FROM train) GROUP BY w),
big AS (SELECT bg, count(*) AS bc
        FROM (SELECT unnest({bg_d}) AS bg FROM train) GROUP BY bg),
v AS (SELECT count(*) AS vsz FROM uni),
occ AS (SELECT doc_id, unnest({bg_d}) AS bg FROM documents),
scored AS (
  SELECT occ.doc_id, {lpq} AS lpq
  FROM occ
  LEFT JOIN big USING (bg)
  LEFT JOIN uni ON uni.w = string_split(occ.bg, ' ')[1]
  CROSS JOIN v)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(-sum(lpq) AS BIGINT) AS nll_q,
       {SC.avg_presentation_sql("-sum(lpq)", "count(*)")} AS avg_nll
FROM scored GROUP BY doc_id
"""


BM25_TERMS = ["vector", "stream", "merge"]
BM25_K = 20


def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-20 documents for a fixed keyword query.
    One corpus pass for global stats (1-row broadcast), one map-only
    scoring pass (per-term tf is an array fold — no explode), then
    TakeOrderedAndProject. Zero data-sized shuffles."""
    from ..operators import scoring as SC

    docs = widen(t(spark, sf_dir, "documents"))
    return SC.bm25_topk(docs, "text", BM25_TERMS, BM25_K)


def q_text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    features into 64 buckets; weight = Σ_features log(p_target/p_raw)
    with target = English docs. The model is 64 rows at ANY corpus
    scale; two corpus passes, one doc_id shuffle."""
    from ..operators import scoring as SC

    docs = widen(t(spark, sf_dir, "documents"))
    return SC.dsir_logweights(docs, "text", col("lang") == "en")


def _dsir_oracle() -> str:
    from ..operators import scoring as SC

    feats_d = SC.dsir_features_sql("text")[1]
    lrq = SC.dsir_logratio_sql("tbc", "tt", "rbc", "rt")
    return f"""
WITH bux AS (
  SELECT doc_id, lang, h % {SC.DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, unnest({feats_d}) AS h FROM documents)
),
rates AS (
  SELECT b, CAST(count(*) AS BIGINT) AS rbc,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tbc
  FROM bux GROUP BY b),
tot AS (SELECT CAST(sum(rbc) AS BIGINT) AS rt, CAST(sum(tbc) AS BIGINT) AS tt
        FROM rates),
lr AS (SELECT b, {lrq} AS lrq FROM rates CROSS JOIN tot)
SELECT doc_id, count(*) AS n_feats,
       CAST(sum(lrq) AS BIGINT) AS logw_q,
       {SC.avg_presentation_sql("sum(lrq)", "count(*)")} AS avg_logw
FROM bux JOIN lr USING (b)
GROUP BY doc_id
"""


BPE_MERGES = 6
# Same bounded-LRU discipline as the ANN indexes (values are plain
# merge lists — nothing to unpersist, but dead sessions/datasets must
# still fall out instead of accumulating forever).
from ..operators.index_cache import IndexCache as _IndexCache  # noqa: E402

_BPE_MERGE_CACHE = _IndexCache()


def _bpe_model(spark: SparkSession, sf_dir: str):
    """ONE trained BPE model per (session, corpus): (merges, final
    piece frequencies), shared by the learn/apply query AND the
    id-encoding query — the iterative training must not run twice for
    the same corpus in one session, and the piece frequencies fall out
    of training's own final symbol table for free
    (``bpe_train_with_freqs``)."""
    from ..operators.bpe import bpe_train_with_freqs
    from ..operators.similarity import session_cache_key

    key = (session_cache_key(spark), sf_dir, BPE_MERGES)
    model = _BPE_MERGE_CACHE.get(key)
    if model is None:
        docs_train = t(spark, sf_dir, "documents")
        model = _BPE_MERGE_CACHE.put(
            key, bpe_train_with_freqs(docs_train, "text", n_merges=BPE_MERGES)
        )
    return model


def q_text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE merges on the corpus (operators/bpe.py — the
    vocabulary-table iterative shape: corpus scanned once, iterations
    over word frequencies) and encode every document with them.
    Carries a FULL oracle since round 4: the fixed merge count unrolls
    as CTE layers (the BPE analog of the Lloyd-unroll k-means oracle),
    with greedy left-to-right merge application expressed as a single
    ``replace()`` over a separator-flanked symbol string — see
    ``_bpe_learn_oracle``. Exact model parity + determinism +
    monotonicity are additionally pinned in tests/test_bpe.py. The
    trained model is cached per (session, corpus) and shared with the
    id-encoding query (``_bpe_model``).

    GRADED-SCHEMA CONTRACT: the driver's hash canonicalization only
    handles scalar cells (pandas ``sort_values`` dies on list values —
    CORRECTNESS_r05's one red row), so the inspection head is emitted
    as a space-joined STRING, not ``array<string>``. Pieces come from
    whitespace tokenization and can never contain a space, so the join
    is lossless. Enforced registry-wide by
    tests/test_registry.py::test_graded_outputs_are_scalar."""
    from ..operators.bpe import bpe_apply

    merges, _ = _bpe_model(spark, sf_dir)
    docs = widen(t(spark, sf_dir, "documents"))
    return bpe_apply(docs, "text", merges).select(
        "doc_id",
        "bpe_n_pieces",
        F.array_join("bpe_pieces", " ").alias("bpe_pieces_head"),
    )


# Deterministic HTML wrapper for the extraction query: the corpus text
# embeds in a realistic page (head/style/script/comment/entity noise),
# and extraction must recover exactly the whitespace-collapsed text.
_HTML_PRE = (
    '<html><head><title>doc</title><style>p { color: red; }</style></head>'
    '<body>\n<div id="nav"><a href="/x">Home</a> &gt; Docs</div>\n<p class="main">'
)
_HTML_POST = (
    '</p>\n<script type="text/javascript">var x = 1 < 2; emit("</p>");</script>'
    "<!-- footer\n spans lines --></body></html>"
)


def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (operators/text.html_to_text — the
    CommonCrawl/C4 extraction step): strip script/style/comment blocks
    and tags, decode entities, collapse whitespace. Pure codegen
    regexp chain, no UDF; every pattern means the same thing to Java
    regex and RE2, so the oracle is exact. The corpus text is embedded
    in a deterministic page wrapper (nav + entity + a script whose body
    contains both ``<`` and a decoy ``</p>``) so the op provably does
    its job: the extraction must recover ``Home > Docs`` plus exactly
    the whitespace-collapsed document text."""
    from ..operators.text import html_to_text

    docs = widen(t(spark, sf_dir, "documents"))
    html = F.concat(F.lit(_HTML_PRE), col("text"), F.lit(_HTML_POST))
    clean = html_to_text(html)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_clean"),
    )


def _html_extract_oracle() -> str:
    from ..operators.text import html_to_text_duck

    pre = _HTML_PRE.replace("'", "''")
    post = _HTML_POST.replace("'", "''")
    clean = html_to_text_duck(f"'{pre}' || text || '{post}'")
    return f"""
SELECT doc_id, {clean} AS clean_text,
       CAST(length({clean}) AS BIGINT) AS n_clean
FROM documents
"""


def _wordpiece_model(spark: SparkSession, sf_dir: str):
    """ONE trained WordPiece model per (session, corpus) — same cache
    discipline as ``_bpe_model`` (distinct key: selection rule differs,
    mechanics shared)."""
    from ..operators.bpe import wordpiece_train_with_freqs
    from ..operators.similarity import session_cache_key

    key = (session_cache_key(spark), sf_dir, "wordpiece", BPE_MERGES)
    model = _BPE_MERGE_CACHE.get(key)
    if model is None:
        docs_train = t(spark, sf_dir, "documents")
        model = _BPE_MERGE_CACHE.put(
            key, wordpiece_train_with_freqs(docs_train, "text", n_merges=BPE_MERGES)
        )
    return model


def q_text_wordpiece_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn WORDPIECE merges on the corpus (operators/bpe.py — the
    BERT tokenizer's likelihood-scored selection: the merged pair
    maximizes count(ab)/(count(a)·count(b)) among pairs ≥ min_count,
    vs BPE's raw frequency) and segment every document with them.
    Merge application, corpus-pass shape, and driver-local bound are
    shared with BPE; only the per-round argmax differs, and the unroll
    oracle differs only in its per-layer argmax CTE
    (``_bpe_cte_parts(scored=True)``)."""
    from ..operators.bpe import bpe_apply

    merges, _ = _wordpiece_model(spark, sf_dir)
    docs = widen(t(spark, sf_dir, "documents"))
    return bpe_apply(docs, "text", merges).select(
        "doc_id",
        col("bpe_n_pieces").alias("wp_n_pieces"),
        F.array_join("bpe_pieces", " ").alias("wp_pieces_head"),
    )


def _wordpiece_learn_oracle() -> str:
    """DuckDB twin of ``wordpiece_train_with_freqs`` + ``bpe_apply``:
    the scored unroll prefix plus per-doc piece re-assembly."""
    body = ",\n".join(_bpe_cte_parts(scored=True))
    return f"""
WITH {body},
agg AS (
  SELECT doc_id, CAST(sum(len(pieces)) AS BIGINT) AS wp_n_pieces,
         flatten(list(pieces ORDER BY wi)) AS allp
  FROM docw JOIN perword USING (word)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.wp_n_pieces, 0) AS wp_n_pieces,
       coalesce(array_to_string(
           coalesce(a.allp[1:32], CAST([] AS VARCHAR[])), ' '),
                '') AS wp_pieces_head
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _bpe_cte_parts(scored: bool = False) -> list[str]:
    """Shared BPE-unroll CTE prefix (DuckDB twin of ``bpe_train``):
    w0/s0 plus one (p, m, s) layer per merge, ending with ``perword``
    (word → final pieces, with cnt) and ``docw`` (doc → ordered words).

    ``scored=True`` switches each layer's argmax to the WORDPIECE
    selection rule (DuckDB twin of ``wordpiece_train_with_freqs``): a
    per-layer symbol-count CTE ``c{i}`` joins the pair counts and the
    winner maximizes ``n / (ca·cb)`` over pairs with ``n >= 2`` —
    HUGEINT exact product, one correctly-rounded cast to double, one
    IEEE divide: the same single-rounding convention as
    ``operators/bpe._wp_score`` (Python big-int → float) and the
    distributed path's DECIMAL(38,0) product, ties → lexicographic
    (a, b). Merge APPLICATION is identical.
    The crux is greedy LEFT-TO-RIGHT non-overlapping merge application
    — ``replace()`` scans exactly that way, so each word's symbol
    sequence is carried as a flanked string ``U+sym1+UU+sym2+UU+...+U``
    (U = chr(31), never in a symbol): the pattern ``U+a+UU+b+U`` can
    only match whole adjacent symbols, each match consumes its flanking
    separators so runs like (a,a,a) merge greedily to (aa,a), and the
    replacement re-flanks the merged symbol so chained pairs (a,b,a,b)
    both merge. A layer whose best pair falls under min_count=2 (or
    whose pair set is empty) degrades to an impossible pattern
    (a=b=U), which reproduces ``bpe_train``'s early break as a no-op
    tail. Consumed by ``_bpe_learn_oracle`` and
    ``_bpe_encode_ids_oracle`` (same discipline as the shared
    Lloyd-unroll prefix in queries/similarity.py)."""
    from ..operators.bpe import END

    u = "chr(31)"
    uu = f"{u}||{u}"
    toks = H.tokens("text")[1]
    parts = [
        f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({toks}) AS word FROM documents)
  GROUP BY word),
s0 AS (
  SELECT word,
         {u} || array_to_string(
             list_append([substring(word, i, 1) for i in range(1, length(word) + 1)],
                         '{END}'), {uu}) || {u} AS s,
         cnt
  FROM w0)"""
    ]
    for i in range(1, BPE_MERGES + 1):
        p = i - 1
        # Each layer references s{p} more than once (pair counts [+
        # symbol counts when scored] + merge application); DuckDB
        # inlines CTEs, so without MATERIALIZED the chain re-evaluates
        # its whole prefix per reference — measured 257s → 15s (scored)
        # and 0.57s → 0.15s (plain) at sf0.01.
        mat = "MATERIALIZED "
        if scored:
            argmax = f"""c{i} AS (
  SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
  FROM (
    SELECT unnest(string_split(substring(s, 2, length(s) - 2), {uu})) AS sym, cnt
    FROM s{p}
  ) GROUP BY 1),
m{i} AS (
  -- aggregate form: ALWAYS one row, even when no pair reaches
  -- min_count — the trainer's break becomes a no-op pattern instead
  SELECT coalesce(max(CASE WHEN rn = 1 THEN a END), chr(31)) AS a{i},
         coalesce(max(CASE WHEN rn = 1 THEN b END), chr(31)) AS b{i}
  FROM (SELECT a, b, row_number() OVER (
            -- HUGEINT product: exact for any two BIGINT counts, then
            -- one correctly-rounded cast — the same single-rounding
            -- convention as _wp_score and the DECIMAL(38,0) product in
            -- the distributed path (a BIGINT product would overflow)
            ORDER BY CAST(n AS DOUBLE)
                     / CAST(CAST(ca AS HUGEINT) * cb AS DOUBLE) DESC, a, b
        ) AS rn
        FROM (SELECT pp.a, pp.b, pp.n, ca.c AS ca, cb.c AS cb
              FROM p{i} pp
              JOIN c{i} ca ON pp.a = ca.sym
              JOIN c{i} cb ON pp.b = cb.sym
              WHERE pp.n >= 2)))"""
        else:
            argmax = f"""m{i} AS (
  -- aggregate form: ALWAYS one row, even when p{i} is empty (every
  -- word fully merged) — an empty m{i} would CROSS JOIN the whole
  -- vocabulary away; bpe_train's break becomes a no-op pattern instead
  SELECT coalesce(max(CASE WHEN rn = 1 AND n >= 2 THEN a END), chr(31)) AS a{i},
         coalesce(max(CASE WHEN rn = 1 AND n >= 2 THEN b END), chr(31)) AS b{i}
  FROM (SELECT a, b, n, row_number() OVER (ORDER BY n DESC, a, b) AS rn
        FROM p{i}))"""
        parts.append(
            f"""p{i} AS (
  SELECT pr['a'] AS a, pr['b'] AS b, CAST(sum(cnt) AS BIGINT) AS n
  FROM (
    SELECT unnest([{{'a': sy[j], 'b': sy[j + 1]}} for j in range(1, len(sy))]) AS pr,
           cnt
    FROM (SELECT string_split(substring(s, 2, length(s) - 2), {uu}) AS sy, cnt
          FROM s{p})
  ) GROUP BY 1, 2),
{argmax},
s{i} AS {mat}(
  SELECT word,
         replace(s, {u}||a{i}||{uu}||b{i}||{u}, {u}||a{i}||b{i}||{u}) AS s,
         cnt
  FROM s{p} CROSS JOIN m{i})"""
        )
    n = BPE_MERGES
    parts.append(
        f"""perword AS (
  SELECT word, string_split(substring(s, 2, length(s) - 2), {uu}) AS pieces, cnt
  FROM s{n}),
docw AS (
  SELECT doc_id, ww['wi'] AS wi, ww['word'] AS word
  FROM (SELECT doc_id,
               unnest([{{'wi': i, 'word': w[i]}} for i in range(1, len(w) + 1)]) AS ww
        FROM (SELECT doc_id, {toks} AS w FROM documents)))"""
    )
    return parts


def _bpe_learn_oracle() -> str:
    """DuckDB twin of ``bpe_train`` + ``bpe_apply``: the shared unroll
    prefix (see ``_bpe_cte_parts``) plus per-doc piece re-assembly."""
    body = ",\n".join(_bpe_cte_parts())
    return f"""
WITH {body},
agg AS (
  SELECT doc_id, CAST(sum(len(pieces)) AS BIGINT) AS bpe_n_pieces,
         flatten(list(pieces ORDER BY wi)) AS allp
  FROM docw JOIN perword USING (word)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.bpe_n_pieces, 0) AS bpe_n_pieces,
       coalesce(array_to_string(
           coalesce(a.allp[1:32], CAST([] AS VARCHAR[])), ' '),
                '') AS bpe_pieces_head
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


BPE_VOCAB = 30  # top-V pieces get ids 1..V; everything else → 0 (UNK)


def q_text_bpe_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer SERVING step: encode every document to vocabulary
    IDS with the trained merges — what a training pipeline actually
    feeds the model. Vocabulary = the corpus's top-``BPE_VOCAB`` pieces
    by frequency (ties → lexicographic), ids 1..V in rank order, all
    other pieces → 0 (UNK) — a deliberately truncated vocab so the OOV
    path is exercised and counted.

    Scale shape mirrors the trained-model family: piece frequencies
    fall out of training's own final symbol table (one
    vocabulary-sized aggregation — no extra corpus pass), the ranked
    vocab is a bounded driver fold (≤ alphabet + merges symbols)
    shipped in the encode UDF's closure, and encoding is one
    shuffle-free Arrow pass over the corpus. The trained model is the
    SAME cached (session, corpus) model the learn query uses
    (``_bpe_model``) — training never runs twice."""
    from ..operators.bpe import bpe_encode_ids, bpe_vocab_from_freqs

    merges, freqs = _bpe_model(spark, sf_dir)
    vocab = bpe_vocab_from_freqs(freqs, top_v=BPE_VOCAB)
    docs = widen(t(spark, sf_dir, "documents"))
    out = bpe_encode_ids(docs, "text", merges, vocab)
    # Graded-schema contract: scalar-only output (see q_text_bpe_learn).
    return out.select(
        "doc_id",
        "n_pieces",
        "n_oov",
        F.array_join(col("id_head").cast("array<string>"), " ").alias(
            "id_head_str"
        ),
    )


def _bpe_encode_ids_oracle() -> str:
    body = ",\n".join(_bpe_cte_parts())
    return f"""
WITH {body},
vocab AS (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
  FROM (SELECT unnest(pieces) AS piece, cnt FROM perword)
  GROUP BY piece),
vr AS (
  SELECT piece,
         CAST(row_number() OVER (ORDER BY freq DESC, piece) AS INT) AS rk
  FROM vocab),
vtop AS (
  SELECT piece, CASE WHEN rk <= {BPE_VOCAB} THEN rk ELSE 0 END AS pid FROM vr),
docp AS (SELECT doc_id, wi, pieces FROM docw JOIN perword USING (word)),
dpp AS (
  SELECT doc_id, wi,
         unnest([{{'pi': i, 'p': pieces[i]}} for i in range(1, len(pieces) + 1)]) AS pp
  FROM docp),
dids AS (
  SELECT doc_id, wi, pp['pi'] AS pi,
         COALESCE(v.pid, 0) AS pid
  FROM dpp LEFT JOIN vtop v ON pp['p'] = v.piece),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
         CAST(sum(CASE WHEN pid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         list(pid ORDER BY wi, pi) AS ids
  FROM dids GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_pieces, 0) AS n_pieces,
       coalesce(a.n_oov, 0) AS n_oov,
       coalesce(array_to_string(
           list_transform(coalesce(a.ids[1:32], CAST([] AS INT[])),
                          x -> CAST(x AS VARCHAR)), ' '), '') AS id_head_str
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


_LR_W_CACHE = _IndexCache()  # trained LR weights per (session, corpus)


def _lr_model(spark: SparkSession, sf_dir: str) -> list[float]:
    """ONE trained LR model per (session, corpus): full-batch GD on the
    deterministic doc_id-parity slice, target = English — shared by the
    corpus-scoring query, the composed selection stage, and (r5) the
    streaming classifier gate, so training never runs twice."""
    from ..operators import classifier as CL
    from ..operators.similarity import session_cache_key

    key = (session_cache_key(spark), sf_dir, "lr_en")
    w = _LR_W_CACHE.get(key)
    if w is None:
        docs = widen(t(spark, sf_dir, "documents"))
        train_fx = CL.featurize(
            docs.filter(col("doc_id") % 2 == 0), "text", col("lang") == "en"
        )
        w = _LR_W_CACHE.put(key, CL.lr_train(train_fx))
    return w


def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fasttext-style linear domain classifier trained IN the engine:
    full-batch logistic-regression GD over hashed unigram+bigram bucket
    features (operators/classifier.py), trained on the deterministic
    doc_id-parity slice with target = English, then one map-only pass
    scoring the whole corpus. Iterative training carries a FULL oracle:
    quantized gradients make every GD sum order-free exact, and the
    DuckDB twin unrolls the iterations as CTE layers (the same
    discipline as the Lloyd-unroll k-means/PQ oracles). Weights cached
    per (session, corpus) like the other trained models (``_lr_model``)."""
    from ..operators import classifier as CL

    docs = widen(t(spark, sf_dir, "documents"))
    w = _lr_model(spark, sf_dir)
    return CL.lr_score(CL.featurize(docs, "text", col("lang") == "en"), w)


def _lr_query_oracle() -> str:
    from ..operators import classifier as CL

    return CL.lr_oracle("lang = 'en'", "doc_id % 2 = 0")


# consensus thresholds for the composed selection decision (centered on
# the sf0.01 signal medians; any fixed constants work — the decision
# rule is what's under test, the thresholds just need to split the data)
SEL_NLL_MAX = 3.45
SEL_PROBQ_MIN = 470_400
_VOTES_EXPR = (
    f"CAST(avg_nll <= {SEL_NLL_MAX} AS INT) + CAST(avg_logw > 0 AS INT) "
    f"+ CAST(prob_q >= {SEL_PROBQ_MIN} AS INT)"
)
_DECISION_EXPR = (
    "CASE WHEN quality_band = 'drop' THEN 'drop' "
    "WHEN votes >= 2 THEN 'keep' "
    "WHEN votes = 1 THEN 'review' ELSE 'drop' END"
)


def q_text_model_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed model-based data-selection stage: every per-doc
    model signal — bigram-LM NLL (CCNet), DSIR importance weight,
    trained-classifier probability, heuristic quality band — joined on
    doc_id into one consensus keep/review/drop decision. Mirrors
    curation_report's role for the heuristic pipeline: proves the
    model-based operators COMPOSE. Each signal keeps its own scale
    shape (model-sized broadcasts, ≤1 doc_id shuffle each); the final
    joins are doc_id-partitioned merges of already-aggregated frames."""
    docs = widen(t(spark, sf_dir, "documents"))
    lm = q_text_lm_perplexity(spark, sf_dir).select("doc_id", "avg_nll")
    ds = q_text_dsir_weights(spark, sf_dir).select("doc_id", "avg_logw")
    cl = q_text_quality_classifier(spark, sf_dir).select("doc_id", "prob_q", "prob")
    score = T.quality_score("text")
    qb = docs.select(
        "doc_id",
        F.when(score >= 0.6, "keep").when(score >= 0.4, "review").otherwise("drop").alias(
            "quality_band"
        ),
    )
    return (
        lm.join(ds, "doc_id")
        .join(cl, "doc_id")
        .join(qb, "doc_id")
        .withColumn("votes", F.expr(_VOTES_EXPR))
        .select(
            "doc_id",
            "avg_nll",
            "avg_logw",
            "prob",
            "quality_band",
            "votes",
            F.expr(_DECISION_EXPR).alias("decision"),
        )
    )


def _model_selection_oracle() -> str:
    return f"""
WITH lm AS ({_lm_perplexity_oracle()}),
ds AS ({_dsir_oracle()}),
cl AS ({_lr_query_oracle()}),
qb AS (SELECT doc_id,
       CASE WHEN {T.quality_score_duck("text")} >= 0.6 THEN 'keep'
            WHEN {T.quality_score_duck("text")} >= 0.4 THEN 'review'
            ELSE 'drop' END AS quality_band
       FROM documents),
j AS (
  SELECT lm.doc_id, avg_nll, avg_logw, prob_q, prob, quality_band,
         {_VOTES_EXPR} AS votes
  FROM lm JOIN ds USING (doc_id) JOIN cl USING (doc_id) JOIN qb USING (doc_id))
SELECT doc_id, avg_nll, avg_logw, prob, quality_band, votes,
       {_DECISION_EXPR} AS decision
FROM j
"""


def _bm25_oracle() -> str:
    from ..operators import scoring as SC

    return SC.bm25_topk_oracle(BM25_TERMS, BM25_K, H.tokens("text")[1])


# r5 promotions into the graded window (defined only here, after their
# oracles exist; see the rotation note on QUERIES above).
QUERIES["text_bpe_learn"] = QuerySpec(q_text_bpe_learn, _bpe_learn_oracle())
QUERIES["text_wordpiece_learn"] = QuerySpec(
    q_text_wordpiece_learn, _wordpiece_learn_oracle()
)
QUERIES["text_quality_classifier"] = QuerySpec(
    q_text_quality_classifier, _lr_query_oracle()
)
# r9 rotation: text_model_selection demoted to LOCAL_QUERIES (below) —
# the consensus composite's four signals each stay graded individually
# (text_c4_filter, text_gopher_quality, text_quality_classifier,
# dedup family), freeing a slot for er_fastss_join on the hard signal.
# Still fully oracle- and plan-verified locally.

LOCAL_QUERIES: dict[str, QuerySpec] = {
    "text_model_selection": QuerySpec(
        q_text_model_selection, _model_selection_oracle()
    ),
    "text_chunk_overlap": QuerySpec(q_text_chunk_overlap, _TEXT_CHUNK_SQL),
    "text_bloom_decontaminate": QuerySpec(
        q_text_bloom_decontaminate, _bloom_decontam_oracle()
    ),
    "text_corpus_diff": QuerySpec(q_text_corpus_diff, _corpus_diff_oracle()),
    "text_temperature_mix": QuerySpec(q_text_temperature_mix, _TEXT_TEMP_MIX_SQL),
    "text_curriculum_shards": QuerySpec(
        q_text_curriculum_shards, _curriculum_oracle()
    ),
    "text_url_curation": QuerySpec(q_text_url_curation, _URL_CURATION_SQL),
    "text_bpe_encode_ids": QuerySpec(
        q_text_bpe_encode_ids, _bpe_encode_ids_oracle()
    ),
    "text_lm_perplexity": QuerySpec(q_text_lm_perplexity, _lm_perplexity_oracle()),
    # r6 rotation: text_wordpiece_learn PROMOTED to the graded window
    # (registered after its definition) — the tokenizer trio's
    # likelihood-scored trainer on the hard signal, now that the
    # graded-schema contract makes its output scalar.
    "text_html_extract": QuerySpec(q_text_html_extract, _html_extract_oracle()),
    "text_bm25_topk": QuerySpec(q_text_bm25_topk, _bm25_oracle()),
    "text_dsir_weights": QuerySpec(q_text_dsir_weights, _dsir_oracle()),
    # r5 demotions out of the graded window (rotation note on QUERIES):
    "text_repetition": QuerySpec(q_text_repetition, _TEXT_REPETITION_SQL),
    "text_bpe_tokens": QuerySpec(q_text_bpe_tokens, _TEXT_BPE_SQL),
    "text_profile": QuerySpec(q_text_profile, _TEXT_PROFILE_SQL),
    "text_repeated_passages": QuerySpec(
        q_text_repeated_passages, _repeated_passages_oracle()
    ),
    "text_cut_passages": QuerySpec(q_text_cut_passages, _cut_passages_oracle()),
    "text_fingerprint": QuerySpec(q_text_fingerprint, _TEXT_FINGERPRINT_SQL),
    "text_top_tokens": QuerySpec(q_text_top_tokens, _TEXT_TOP_TOKENS_SQL),
    "text_pii_redact": QuerySpec(q_text_pii_redact, _pii_oracle()),
    "text_domain_mix": QuerySpec(q_text_domain_mix, _TEXT_DOMAIN_MIX_SQL),
    "text_stats": QuerySpec(q_text_stats, _TEXT_STATS_SQL),
    "text_quality": QuerySpec(q_text_quality, _TEXT_QUALITY_SQL),
    "text_lang_id": QuerySpec(q_text_lang_id, _TEXT_LANG_ID_SQL),
    "text_pack_sequences": QuerySpec(q_text_pack_sequences, _TEXT_PACK_SQL),
}


# --- unigram-LM tokenizer (third of the tokenizer trio) ---------------------


def _unigram_model(spark: SparkSession, sf_dir: str):
    """ONE trained unigram model per (session, corpus) — the
    ``_bpe_model`` cache discipline. Holds (qlp, words) where words is
    the persisted vocab-sized frequency frame training built."""
    from ..operators.similarity import session_cache_key
    from ..operators.unigram import MAX_WORD_LEN, unigram_train

    key = (session_cache_key(spark), sf_dir, "unigram")
    model = _BPE_MERGE_CACHE.get(key)
    if model is None:
        docs_train = t(spark, sf_dir, "documents")
        model = unigram_train(docs_train, "text")
        # oracle-compat guard for EVERY consumer (learn + encode): the
        # SQL unroll is static in MAX_WORD_LEN (one DP layer per
        # position); the Python decoder is length-agnostic. One tiny
        # agg over the vocab-sized frame, paid once per (session,
        # corpus) with the training itself. On failure, release the
        # persisted words frame training built — the model never enters
        # the cache, so nothing else would ever unpersist it.
        try:
            max_len = model[1].agg(F.max(F.length("word"))).first()[0] or 0
            if max_len > MAX_WORD_LEN:
                raise ValueError(
                    f"corpus has a {max_len}-char word; raise "
                    f"unigram.MAX_WORD_LEN (adds one oracle CTE layer per char)"
                )
        except BaseException:
            model[1].unpersist()
            raise
        model = _BPE_MERGE_CACHE.put(key, model)
    return model


def q_text_unigram_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a UNIGRAM-LM tokenizer on the corpus (operators/unigram.py
    — Kudo 2018's SentencePiece model, deterministic hard-EM variant)
    and Viterbi-segment every document with it. Completes the tokenizer
    trio: BPE (frequency-greedy merges), WordPiece (likelihood-scored
    merges), unigram (EM-fitted piece probabilities + max-likelihood
    decoding) — three genuinely different learning rules over the same
    one-corpus-pass / vocab-sized-iteration scale shape.

    FULL oracle (``_unigram_learn_oracle``): seed → 2 hard-EM rounds →
    prune → apply, with the Viterbi DP unrolled as one CTE layer per
    prefix position (the positional analog of the Lloyd/merge unrolls)
    and every compared quantity a BIGINT (quantized add-one log-probs on
    the scoring.py grid, integer path scores) so both engines pick
    identical segmentations, tie-for-tie. ``uni_score_q`` exposes the
    summed DP objective per document — the oracle matches the decoder's
    arithmetic, not just its output."""
    from ..operators.unigram import unigram_apply

    qlp, words = _unigram_model(spark, sf_dir)
    docs = widen(t(spark, sf_dir, "documents"))
    out = unigram_apply(docs, "text", qlp, words)
    # Graded-schema contract: scalar-only output (see q_text_bpe_learn).
    return out.select(
        "doc_id",
        "uni_n_pieces",
        F.array_join("uni_pieces", " ").alias("uni_pieces_head"),
        "uni_score_q",
    )


def _unigram_vit_parts(tag: str, q: str) -> list[str]:
    """Viterbi CTE block for one decode pass under log-prob table ``q``:
    forward DP unrolled positionally (``{tag}d{j}``: best score/pieces/
    backpointer for each word's j-char prefix — per-position argmax by
    (score DESC, np ASC, bp DESC), the exact tuple rule of
    ``unigram.viterbi_segment``), a union view ``{tag}v``, then the
    backtrace unrolled as MAX_WORD_LEN prepend layers ending in
    ``{tag}pw`` (word → pieces, score_q) and counts ``{tag}c``. Every
    layer MATERIALIZED — each references earlier layers repeatedly and
    inlining would re-evaluate the whole prefix per reference (the BPE
    unroll lesson)."""
    from ..operators.unigram import MAX_PIECE, MAX_WORD_LEN

    parts = []
    for j in range(1, MAX_WORD_LEN + 1):
        cands = []
        for length in range(1, min(MAX_PIECE, j) + 1):
            if length == j:
                cands.append(
                    f"""      SELECT w.word, q.qlp AS score, 1 AS np, {length} AS bp
      FROM w0 w JOIN {q} q ON q.piece = substring(w.word, 1, {length})
      WHERE length(w.word) >= {j}"""
                )
            else:
                cands.append(
                    f"""      SELECT w.word, v.score + q.qlp AS score, v.np + 1 AS np, {length} AS bp
      FROM w0 w
      JOIN {tag}d{j - length} v ON v.word = w.word
      JOIN {q} q ON q.piece = substring(w.word, {j - length + 1}, {length})
      WHERE length(w.word) >= {j}"""
                )
        union = "\n      UNION ALL\n".join(cands)
        parts.append(
            f"""{tag}d{j} AS MATERIALIZED (
  SELECT word, score, np, bp FROM (
    SELECT word, score, np, bp,
           row_number() OVER (PARTITION BY word
                              ORDER BY score DESC, np, bp DESC) AS rn
    FROM (
{union}
    )) WHERE rn = 1)"""
        )
    vall = "\n    UNION ALL\n".join(
        f"    SELECT word, {j} AS j, score, np, bp FROM {tag}d{j}"
        for j in range(1, MAX_WORD_LEN + 1)
    )
    parts.append(f"{tag}v AS MATERIALIZED (\n{vall})")
    parts.append(
        f"""{tag}t0 AS (
  SELECT word, CAST(length(word) AS INT) AS pos,
         CAST([] AS VARCHAR[]) AS pieces
  FROM w0)"""
    )
    for k in range(1, MAX_WORD_LEN + 1):
        parts.append(
            f"""{tag}t{k} AS MATERIALIZED (
  SELECT t.word,
         CASE WHEN t.pos > 0 THEN t.pos - v.bp ELSE t.pos END AS pos,
         CASE WHEN t.pos > 0
              THEN list_prepend(substring(t.word, t.pos - v.bp + 1, v.bp),
                                t.pieces)
              ELSE t.pieces END AS pieces
  FROM {tag}t{k - 1} t
  LEFT JOIN {tag}v v ON v.word = t.word AND v.j = t.pos)"""
        )
    parts.append(
        f"""{tag}pw AS MATERIALIZED (
  SELECT t.word, t.pieces, s.score AS score_q
  FROM {tag}t{MAX_WORD_LEN} t
  JOIN {tag}v s ON s.word = t.word AND s.j = length(t.word))"""
    )
    parts.append(
        f"""{tag}c AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT unnest(p.pieces) AS piece, w.cnt
        FROM {tag}pw p JOIN w0 w USING (word))
  GROUP BY 1)"""
    )
    return parts


def _unigram_qlp_cte(name: str, vsrc: str) -> str:
    """Quantized add-one log-prob table over a (piece, c) vocab CTE —
    the exact expression text of ``unigram._qlp``."""
    from ..operators.unigram import LOG_GRID

    return f"""{name} AS MATERIALIZED (
  SELECT piece,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(t.total + t.v AS DOUBLE))
                    * {LOG_GRID}.0 + 0.5) AS BIGINT) AS qlp
  FROM {vsrc}, (SELECT CAST(sum(c) AS BIGINT) AS total,
                       CAST(count(*) AS BIGINT) AS v
                FROM {vsrc}) t)"""


def _unigram_learn_oracle() -> str:
    """DuckDB twin of ``unigram_train`` + ``unigram_apply``: seed
    substring counts → kept seed vocab → q0 → EM_ITERS unrolled
    (Viterbi block + fixed-vocab recount + re-quantized log-probs) →
    count-prune → final Viterbi block → per-doc re-assembly."""
    from ..operators.unigram import (
        EM_ITERS,
        MAX_PIECE,
        MIN_COUNT,
        SEED_KEEP,
        VOCAB_KEEP,
    )

    toks = H.tokens("text")[1]
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({toks}) AS word FROM documents)
  GROUP BY word)""",
        f"""seedc AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
  FROM (
    SELECT unnest(flatten(
      [[substring(word, i, j - i + 1)
        for j in range(i, least(i + {MAX_PIECE - 1}, length(word)) + 1)]
       for i in range(1, length(word) + 1)])) AS piece, cnt
    FROM w0
  ) GROUP BY 1)""",
        f"""v0 AS MATERIALIZED (
  SELECT piece, c FROM seedc WHERE length(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
    FROM seedc WHERE length(piece) >= 2 AND c >= {MIN_COUNT})
  WHERE rn <= {SEED_KEEP})""",
        _unigram_qlp_cte("q0", "v0"),
    ]
    for i in range(1, EM_ITERS + 1):
        parts.extend(_unigram_vit_parts(f"e{i}", f"q{i - 1}"))
        # EM keeps the vocab FIXED: unproduced pieces stay at count 0
        parts.append(
            f"""v{i} AS MATERIALIZED (
  SELECT q.piece, coalesce(c.c, 0) AS c
  FROM q{i - 1} q LEFT JOIN e{i}c c USING (piece))"""
        )
        parts.append(_unigram_qlp_cte(f"q{i}", f"v{i}"))
    parts.append(
        f"""vf AS MATERIALIZED (
  SELECT piece, c FROM v{EM_ITERS} WHERE length(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
    FROM v{EM_ITERS} WHERE length(piece) >= 2 AND c >= 1)
  WHERE rn <= {VOCAB_KEEP})"""
    )
    parts.append(_unigram_qlp_cte("qf", "vf"))
    parts.extend(_unigram_vit_parts("f", "qf"))
    parts.append(
        f"""docw AS (
  SELECT doc_id, ww['wi'] AS wi, ww['word'] AS word
  FROM (SELECT doc_id,
               unnest([{{'wi': i, 'word': w[i]}} for i in range(1, len(w) + 1)]) AS ww
        FROM (SELECT doc_id, {toks} AS w FROM documents)))"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body},
agg AS (
  SELECT doc_id, CAST(sum(len(pieces)) AS BIGINT) AS uni_n_pieces,
         flatten(list(pieces ORDER BY wi)) AS allp,
         CAST(sum(score_q) AS BIGINT) AS uni_score_q
  FROM docw JOIN fpw USING (word)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.uni_n_pieces, 0) AS uni_n_pieces,
       coalesce(array_to_string(
           coalesce(a.allp[1:32], CAST([] AS VARCHAR[])), ' '),
                '') AS uni_pieces_head,
       coalesce(a.uni_score_q, 0) AS uni_score_q
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


LOCAL_QUERIES["text_unigram_learn"] = QuerySpec(
    q_text_unigram_learn, _unigram_learn_oracle()
)


def q_text_unigram_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram tokenizer SERVING: documents → vocabulary ids under the
    SAME cached (session, corpus) model the learn query trains
    (``_unigram_model`` — training never runs twice). Ids rank pieces
    by (qlp DESC, piece ASC); no UNK path exists because single chars
    always survive the prune, so coverage is total by construction —
    the structural difference vs the deliberately truncated
    ``text_bpe_encode_ids`` vocab, and worth a distinct query: this is
    the id-space a sampler/packer downstream actually consumes."""
    from ..operators.unigram import unigram_encode_ids

    qlp, words = _unigram_model(spark, sf_dir)
    docs = widen(t(spark, sf_dir, "documents"))
    out = unigram_encode_ids(docs, "text", qlp, words)
    # Graded-schema contract: scalar-only output (see q_text_bpe_learn).
    return out.select(
        "doc_id",
        "n_pieces",
        F.array_join(col("id_head").cast("array<string>"), " ").alias(
            "id_head_str"
        ),
    )


def _unigram_encode_ids_oracle() -> str:
    """The learn oracle's prefix (through the final Viterbi block) plus
    probability-ranked ids and per-doc id re-assembly."""
    from ..operators.unigram import (
        EM_ITERS,
        MAX_PIECE,
        MIN_COUNT,
        SEED_KEEP,
        VOCAB_KEEP,
    )

    toks = H.tokens("text")[1]
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({toks}) AS word FROM documents)
  GROUP BY word)""",
        f"""seedc AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
  FROM (
    SELECT unnest(flatten(
      [[substring(word, i, j - i + 1)
        for j in range(i, least(i + {MAX_PIECE - 1}, length(word)) + 1)]
       for i in range(1, length(word) + 1)])) AS piece, cnt
    FROM w0
  ) GROUP BY 1)""",
        f"""v0 AS MATERIALIZED (
  SELECT piece, c FROM seedc WHERE length(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
    FROM seedc WHERE length(piece) >= 2 AND c >= {MIN_COUNT})
  WHERE rn <= {SEED_KEEP})""",
        _unigram_qlp_cte("q0", "v0"),
    ]
    for i in range(1, EM_ITERS + 1):
        parts.extend(_unigram_vit_parts(f"e{i}", f"q{i - 1}"))
        parts.append(
            f"""v{i} AS MATERIALIZED (
  SELECT q.piece, coalesce(c.c, 0) AS c
  FROM q{i - 1} q LEFT JOIN e{i}c c USING (piece))"""
        )
        parts.append(_unigram_qlp_cte(f"q{i}", f"v{i}"))
    parts.append(
        f"""vf AS MATERIALIZED (
  SELECT piece, c FROM v{EM_ITERS} WHERE length(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
    FROM v{EM_ITERS} WHERE length(piece) >= 2 AND c >= 1)
  WHERE rn <= {VOCAB_KEEP})"""
    )
    parts.append(_unigram_qlp_cte("qf", "vf"))
    parts.extend(_unigram_vit_parts("f", "qf"))
    parts.extend(
        [
            f"""docw AS (
  SELECT doc_id, ww['wi'] AS wi, ww['word'] AS word
  FROM (SELECT doc_id,
               unnest([{{'wi': i, 'word': w[i]}} for i in range(1, len(w) + 1)]) AS ww
        FROM (SELECT doc_id, {toks} AS w FROM documents)))""",
            """ids AS MATERIALIZED (
  SELECT piece, CAST(row_number() OVER (ORDER BY qlp DESC, piece) AS INT) AS pid
  FROM qf)""",
            """dp AS (
  SELECT doc_id, wi, pp['pi'] AS pi, pp['p'] AS piece
  FROM (SELECT doc_id, wi,
               unnest([{'pi': i, 'p': pieces[i]} for i in range(1, len(pieces) + 1)]) AS pp
        FROM docw JOIN fpw USING (word)))""",
        ]
    )
    body = ",\n".join(parts)
    return f"""
WITH {body},
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
         list(pid ORDER BY wi, pi) AS ids_l
  FROM dp JOIN ids USING (piece)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_pieces, 0) AS n_pieces,
       coalesce(array_to_string(
           list_transform(coalesce(a.ids_l[1:32], CAST([] AS INT[])),
                          x -> CAST(x AS VARCHAR)), ' '), '') AS id_head_str
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


LOCAL_QUERIES["text_unigram_encode_ids"] = QuerySpec(
    q_text_unigram_encode_ids, _unigram_encode_ids_oracle()
)


# --- hybrid retrieval: BM25 + dense cosine fused with RRF -------------------

# Reciprocal-rank fusion (Cormack et al. 2009): rrf(d) = Σ_lists
# 1/(K + rank_list(d)). K=60 is the paper's constant. Scores are
# quantized onto an integer grid (floor(1e9/(K+rank))) so the two-term
# sum is order-free and bit-identical across engines.
RRF_K = 60
RRF_LIST_K = 20  # depth of each input ranking
RRF_TOP = 10
RRF_SCALE = 1_000_000_000


def q_text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the sparse (BM25 keyword) and dense
    (embedding cosine) rankings for one query with reciprocal-rank
    fusion — the standard first stage of a RAG / retrieval pipeline
    when neither signal alone is trusted.

    Plan shape: each ranker is the already-scaled distributed top-K
    (BM25 = map-only score + TakeOrderedAndProject; cosine = broadcast
    1-row query + TakeOrderedAndProject), so the fusion itself only
    touches 2·RRF_LIST_K rows — the single-partition row_number windows
    and the full-outer join run on K-bounded frames, never the corpus.
    Docs absent from a list contribute rank 0 (coalesced, keeping the
    rank columns non-nullable for cross-engine dtype stability)."""
    from pyspark.sql import Window

    from ..operators import scoring as SC
    from ..operators import similarity as SIM
    from .similarity import QUERY_VEC_ID

    docs = widen(t(spark, sf_dir, "documents"))
    bm = SC.bm25_topk(docs, "text", BM25_TERMS, RRF_LIST_K)
    w_bm = Window.orderBy(col("score_q").desc(), col("doc_id"))
    bm_ranked = bm.select(
        "doc_id", F.row_number().over(w_bm).alias("bm_rank")
    )

    emb = t(spark, sf_dir, "embeddings")
    dim = SIM.embedding_dim(emb)
    query = emb.filter(col("vec_id") == QUERY_VEC_ID).select(
        col("embedding").alias("q_emb")
    )
    cos = (
        widen(emb.filter(col("vec_id") != QUERY_VEC_ID))
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            SIM.cosine_expr("embedding", "q_emb", dim=dim).alias("cosine"),
        )
        .orderBy(col("cosine").desc(), col("vec_id"))
        .limit(RRF_LIST_K)
    )
    w_cos = Window.orderBy(col("cosine").desc(), col("vec_id"))
    cos_ranked = cos.select(
        col("vec_id").alias("doc_id"), F.row_number().over(w_cos).alias("cos_rank")
    )

    def contrib(rank_col: str):
        return F.coalesce(
            F.floor(F.lit(float(RRF_SCALE)) / (F.lit(RRF_K) + col(rank_col))).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        )

    return (
        bm_ranked.join(cos_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(col("bm_rank"), F.lit(0)).alias("bm_rank"),
            F.coalesce(col("cos_rank"), F.lit(0)).alias("cos_rank"),
            (contrib("bm_rank") + contrib("cos_rank")).alias("rrf_q"),
        )
        .withColumn(
            "rrf", F.round(col("rrf_q").cast("double") / RRF_SCALE, 6)
        )
        .orderBy(col("rrf_q").desc(), col("doc_id"))
        .limit(RRF_TOP)
    )


def _hybrid_rrf_oracle() -> str:
    from ..operators import scoring as SC
    from ..operators import similarity as SIM
    from .similarity import QUERY_VEC_ID

    bm25_sql = SC.bm25_topk_oracle(BM25_TERMS, RRF_LIST_K, H.tokens("text")[1])
    cos_d = SIM.cosine("e.embedding", "q.qe")[1]
    return f"""
WITH bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id) AS bm_rank
  FROM ({bm25_sql})
), cos AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cosine DESC, vec_id) AS cos_rank
  FROM (
    SELECT e.vec_id, {cos_d} AS cosine
    FROM embeddings e,
         (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
    WHERE e.vec_id != {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {RRF_LIST_K}
  )
), fused AS (
  SELECT COALESCE(bm.doc_id, cos.doc_id) AS doc_id,
         COALESCE(bm.bm_rank, 0) AS bm_rank,
         COALESCE(cos.cos_rank, 0) AS cos_rank,
         COALESCE(CAST(floor({RRF_SCALE}.0 / ({RRF_K} + bm.bm_rank)) AS BIGINT), 0)
         + COALESCE(CAST(floor({RRF_SCALE}.0 / ({RRF_K} + cos.cos_rank)) AS BIGINT), 0)
           AS rrf_q
  FROM bm FULL OUTER JOIN cos ON bm.doc_id = cos.doc_id
)
SELECT doc_id, bm_rank, cos_rank, rrf_q,
       round(CAST(rrf_q AS DOUBLE) / {RRF_SCALE}, 6) AS rrf
FROM fused
ORDER BY rrf_q DESC, doc_id
LIMIT {RRF_TOP}
"""


LOCAL_QUERIES["text_hybrid_rrf"] = QuerySpec(q_text_hybrid_rrf, _hybrid_rrf_oracle())


# --- masked-LM training-example prep ----------------------------------------

MLM_RATE = 15  # percent of positions masked
MLM_HEAD = 12  # tokens of input/target surfaced per row

# Deterministic per-(doc, position) mask decision — pure BIGINT
# arithmetic shared by both engines. doc_id is reduced mod 2^31 BEFORE
# any multiply so every intermediate stays < 2^63 for arbitrary ids
# (the overflow discipline from emb_cluster_sample). `{i}` is the
# 1-BASED token position.
_MLM_PRED = (
    "((((((({doc} % 2147483648) * 1000003 + ({i}) * 10007) % 2147483648)"
    " * 2654435761) % 2147483648) {div} 32768) % 100) < " + str(MLM_RATE)
)


def q_text_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-LM training-example construction (BERT-style): mask ~15%
    of token positions per document, deterministically — the mask is a
    pure function of (doc_id, position), so re-running the pipeline,
    re-sharding, or recovering a failed partition regenerates EXACTLY
    the same examples (the property random.random() masking loses on
    retry, silently changing the training set).

    Row-local by construction: one shuffle-free pass, the mask/input/
    target all derive from the doc's own token array. Expressed as
    whole-stage-codegen'd HOF expressions (no Python boundary); emits
    the counts plus bounded heads of the corrupted input and the mask
    targets rather than corpus-sized full arrays."""
    docs = widen(t(spark, sf_dir, "documents"))
    toks = H.tokens("text")[0]
    pred = _MLM_PRED.format(doc="doc_id", i="i + 1", div="div")
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(
            f"aggregate(transform({toks}, (x, i) -> IF({pred}, 1, 0)),"
            " 0, (acc, v) -> acc + v)"
        ).alias("n_masked"),
        # Graded-schema contract: heads emit as space-joined strings
        # (tokens are whitespace-split, so the join is lossless).
        F.expr(
            f"array_join(slice(transform({toks}, (x, i) -> IF({pred}, '[MASK]', x)),"
            f" 1, {MLM_HEAD}), ' ')"
        ).alias("input_head"),
        F.expr(
            f"array_join(slice(filter({toks}, (x, i) -> {pred}), 1, {MLM_HEAD}), ' ')"
        ).alias("target_head"),
    )


def _mlm_mask_oracle() -> str:
    toks = H.tokens("text")[1]
    pred = _MLM_PRED.format(doc="doc_id", i="i", div="//")
    return f"""
WITH base AS (
    SELECT doc_id, {toks} AS toks FROM documents
), tagged AS (
    SELECT doc_id, toks,
           [ {{'t': toks[i],
               'm': CASE WHEN {pred} THEN 1 ELSE 0 END}}
             for i in range(1, len(toks) + 1) ] AS tm
    FROM base
)
SELECT doc_id,
       len(toks) AS n_tokens,
       list_reduce(list_prepend(0, list_transform(tm, s -> s['m'])),
                   (a, b) -> a + b) AS n_masked,
       coalesce(array_to_string(
           list_transform(tm, s -> CASE WHEN s['m'] = 1 THEN '[MASK]'
                                        ELSE s['t'] END)[1:{MLM_HEAD}],
           ' '), '') AS input_head,
       coalesce(array_to_string(
           list_transform(list_filter(tm, s -> s['m'] = 1),
                          s -> s['t'])[1:{MLM_HEAD}], ' '), '') AS target_head
FROM tagged
"""


LOCAL_QUERIES["text_mlm_mask"] = QuerySpec(q_text_mlm_mask, _mlm_mask_oracle())


# --- sequence-length bucketing ----------------------------------------------

# Power-of-two batch-length buckets with a 512 truncation cap — the
# standard padded-batch shapes. A doc pads up to its bucket length;
# docs past the cap truncate (waste 0, lost tokens reported).
LEN_BUCKETS = (16, 32, 64, 128, 256, 512)


def q_text_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing: assign every document the smallest
    power-of-two batch length that holds it (truncating at the cap) and
    report per-bucket doc counts, kept tokens, padding waste, and the
    padding ratio — the analysis that decides batch shapes for training
    throughput (uniform max-length padding wastes compute linearly in
    the length spread; bucketing bounds it by the bucket granularity).

    Map-only CASE ladder over the row-local token count, then one
    |LEN_BUCKETS|-group aggregate — no joins, no window, nothing
    corpus-sized past the shuffle's partial aggregation."""
    docs = widen(t(spark, sf_dir, "documents"))
    n = T.token_count("text")
    bucket = F.when(n <= LEN_BUCKETS[0], LEN_BUCKETS[0])
    for b in LEN_BUCKETS[1:]:
        bucket = bucket.when(n <= b, b)
    bucket = bucket.otherwise(LEN_BUCKETS[-1])
    kept = F.least(n, F.lit(LEN_BUCKETS[-1]))
    return (
        docs.select(
            bucket.cast("int").alias("bucket_len"),
            n.alias("n_tokens"),
            kept.alias("kept"),
            (bucket - kept).cast("long").alias("waste"),
            F.greatest(n - LEN_BUCKETS[-1], F.lit(0)).cast("long").alias("truncated"),
        )
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("long").alias("kept_tokens"),
            F.sum("waste").alias("pad_tokens"),
            F.sum("truncated").alias("truncated_tokens"),
        )
        .withColumn(
            "pad_ratio",
            F.round(
                col("pad_tokens").cast("double")
                / (col("pad_tokens") + col("kept_tokens")),
                4,
            ),
        )
    )


def _length_buckets_oracle() -> str:
    toks = H.tokens("text")[1]
    cap = LEN_BUCKETS[-1]
    ladder = " ".join(
        f"WHEN n <= {b} THEN {b}" for b in LEN_BUCKETS
    )
    return f"""
WITH counted AS (
    SELECT CAST(len({toks}) AS BIGINT) AS n FROM documents
), assigned AS (
    SELECT CAST(CASE {ladder} ELSE {cap} END AS INT) AS bucket_len,
           least(n, {cap}) AS kept,
           CAST(CASE {ladder} ELSE {cap} END - least(n, {cap}) AS BIGINT) AS waste,
           CAST(greatest(n - {cap}, 0) AS BIGINT) AS truncated
    FROM counted
)
SELECT bucket_len,
       count(*) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS kept_tokens,
       CAST(sum(waste) AS BIGINT) AS pad_tokens,
       CAST(sum(truncated) AS BIGINT) AS truncated_tokens,
       round(CAST(sum(waste) AS DOUBLE)
             / (CAST(sum(waste) AS BIGINT) + CAST(sum(kept) AS BIGINT)), 4)
           AS pad_ratio
FROM assigned
GROUP BY bucket_len
"""


LOCAL_QUERIES["text_length_buckets"] = QuerySpec(
    q_text_length_buckets, _length_buckets_oracle()
)


# --- phrase search -----------------------------------------------------------

PHRASE = ("table", "hash")  # adjacent-token phrase query


def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("table hash"): documents where the two
    tokens appear ADJACENT, with the match count — what BM25's
    bag-of-words scoring cannot express.

    Spark-first shape: phrase matching is ROW-LOCAL — per doc,
    positions(w1) ∩ (positions(w2) − 1) — so this is one shuffle-free
    codegen map + filter, with both term predicates evaluated inside
    the same projection. The textbook alternative (positional inverted
    index: posexplode → groupBy token → postings self-join on
    pos_b = pos_a + 1) pays a corpus-sized shuffle to build state that
    only amortizes over MANY ad-hoc phrase queries; for a scan-time
    phrase predicate the row-local intersection is strictly better at
    any scale."""
    w1, w2 = PHRASE
    toks = H.tokens("text")[0]

    def pos(term: str) -> str:
        return (
            f"filter(transform({toks}, (x, i) -> IF(x = '{term}', i, -1)),"
            " v -> v >= 0)"
        )

    phrase_count = F.expr(
        f"size(array_intersect({pos(w1)}, transform({pos(w2)}, p -> p - 1)))"
    )
    docs = widen(t(spark, sf_dir, "documents"))
    return (
        docs.select(
            "doc_id",
            F.expr(f"size({toks})").alias("n_tokens"),
            phrase_count.alias("phrase_count"),
        )
        .filter(col("phrase_count") > 0)
    )


def _phrase_search_oracle() -> str:
    w1, w2 = PHRASE
    toks = H.tokens("text")[1]
    return f"""
WITH base AS (
    SELECT doc_id, {toks} AS toks FROM documents
), positions AS (
    SELECT doc_id, len(toks) AS n_tokens,
           [i for i in range(1, len(toks) + 1) if toks[i] = '{w1}'] AS p1,
           [i for i in range(1, len(toks) + 1) if toks[i] = '{w2}'] AS p2
    FROM base
)
SELECT doc_id, n_tokens,
       len(list_intersect(p1, list_transform(p2, p -> p - 1))) AS phrase_count
FROM positions
WHERE len(list_intersect(p1, list_transform(p2, p -> p - 1))) > 0
"""


LOCAL_QUERIES["text_phrase_search"] = QuerySpec(
    q_text_phrase_search, _phrase_search_oracle()
)


# --- PMI collocations --------------------------------------------------------

PMI_MIN_COUNT = 5


def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information bigram mining (collocation
    extraction — the signal behind phrase-aware vocabularies and
    tokenizer merge seeding).

    PMI(x,y) = ln( P(x,y) / (P(x)·P(y)) ) with P(x,y)=c_xy/B over
    bigram occurrences and P(x)=c_x/T over token occurrences.

    Plan: two corpus explode→partial-agg shuffles (bigram grain, token
    grain) and then everything is vocab-sized: the unigram table is
    broadcast onto the bigram table twice and the two scalar totals
    ride a broadcast crossJoin. The ln() runs on exact integer counts
    pushed through a textually identical double expression in both
    engines, so quantized PMI matches bit-for-bit. At 100 TB the
    corpus is touched exactly twice, map-side combined both times."""
    toks = H.tokens("text")[0]
    docs = widen(t(spark, sf_dir, "documents"))
    bigrams = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN size({toks}) >= 2 THEN "
                f"transform(sequence(1, size({toks}) - 1), "
                f"i -> concat(element_at({toks}, i), ' ', element_at({toks}, i + 1))) "
                "ELSE array() END"
            )
        ).alias("bigram")
    )
    bg_all = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        docs.select(F.explode(F.expr(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    totals = bg_all.agg(F.sum("c_xy").alias("bb")).crossJoin(
        uni.agg(F.sum("c_tok").alias("tt"))
    )
    u1 = uni.select(col("tok").alias("w1"), col("c_tok").alias("c_x"))
    u2 = uni.select(col("tok").alias("w2"), col("c_tok").alias("c_y"))
    pmi = F.expr(
        "ln((CAST(c_xy AS DOUBLE) * CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE))"
        " / (CAST(bb AS DOUBLE) * CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)))"
    )
    return (
        bg_all.filter(col("c_xy") >= PMI_MIN_COUNT)
        .withColumn("w1", F.split(col("bigram"), " ")[0])
        .withColumn("w2", F.split(col("bigram"), " ")[1])
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.floor(pmi * 1e4 + F.lit(0.5)).cast("long").alias("pmi_q"),
        )
    )


def _pmi_bigrams_oracle() -> str:
    tk = H.tokens("text")[1]
    return f"""
WITH toks AS (
    SELECT {tk} AS tk FROM documents
), bgs AS (
    SELECT unnest([tk[i] || ' ' || tk[i + 1] for i in range(1, len(tk))]) AS bigram
    FROM toks
), bg_all AS (
    SELECT bigram, count(*) AS c_xy FROM bgs GROUP BY bigram
), uni AS (
    SELECT tok, count(*) AS c_tok
    FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY tok
), totals AS (
    SELECT (SELECT CAST(sum(c_xy) AS BIGINT) FROM bg_all) AS bb,
           (SELECT CAST(sum(c_tok) AS BIGINT) FROM uni) AS tt
)
SELECT string_split(b.bigram, ' ')[1] AS w1,
       string_split(b.bigram, ' ')[2] AS w2,
       b.c_xy, u1.c_tok AS c_x, u2.c_tok AS c_y,
       CAST(floor(
           ln((CAST(b.c_xy AS DOUBLE) * CAST(t.tt AS DOUBLE) * CAST(t.tt AS DOUBLE))
              / (CAST(t.bb AS DOUBLE) * CAST(u1.c_tok AS DOUBLE) * CAST(u2.c_tok AS DOUBLE)))
           * 1e4 + 0.5) AS BIGINT) AS pmi_q
FROM bg_all b
JOIN uni u1 ON u1.tok = string_split(b.bigram, ' ')[1]
JOIN uni u2 ON u2.tok = string_split(b.bigram, ' ')[2]
CROSS JOIN totals t
WHERE b.c_xy >= {PMI_MIN_COUNT}
"""


LOCAL_QUERIES["text_pmi_bigrams"] = QuerySpec(
    q_text_pmi_bigrams, _pmi_bigrams_oracle()
)


# --- keyword extraction ------------------------------------------------------

KEYWORDS_PER_DOC = 3


def q_text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k TF-IDF keywords per document — the tagging/labeling stage
    of a corpus pipeline (distinct from corpus-level ``text_top_tokens``
    and from query-centric BM25: this scores every doc's own terms).

    Plan: one explode→(doc_id, token) partial-agg shuffle builds the tf
    table; document frequency is a vocab-sized aggregate OF that table
    (no second corpus pass) broadcast back; n_docs rides a 1-row
    broadcast crossJoin. The per-doc top-k avoids a rank window's
    sort-within-partition: a groupBy(doc_id) collects the doc's own
    vocab-bounded term list and slices the top k after an in-memory
    sort_array — one shuffle, map-side combined, no skew (per-doc term
    lists are document-bounded). idf is exact-int math through an
    identical double expression in both engines."""
    toks = H.tokens("text")[0]
    docs = widen(t(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score_q = F.expr(
        "CAST(floor(CAST(tf AS DOUBLE) * ln((CAST(n_docs AS DOUBLE) + 1.0)"
        " / (CAST(df AS DOUBLE) + 1.0)) * 1e4 + 0.5) AS BIGINT)"
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "tok", "tf", score_q.alias("score_q"))
    )
    topk = (
        scored.groupBy("doc_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct((-col("score_q")).alias("ns"), "tok", "tf"))
                ),
                1,
                KEYWORDS_PER_DOC,
            ).alias("top")
        )
        .select("doc_id", F.posexplode("top").alias("pos", "kw"))
    )
    return topk.select(
        "doc_id",
        (col("pos") + 1).alias("rank"),
        col("kw.tok").alias("tok"),
        col("kw.tf").alias("tf"),
        (-col("kw.ns")).alias("score_q"),
    )


def _keywords_tfidf_oracle() -> str:
    tk = H.tokens("text")[1]
    return f"""
WITH tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM (SELECT doc_id, unnest({tk}) AS tok FROM documents)
    GROUP BY doc_id, tok
), df_tbl AS (
    SELECT tok, count(*) AS df FROM tf GROUP BY tok
), nd AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT t.doc_id, t.tok, t.tf,
           CAST(floor(CAST(t.tf AS DOUBLE) * ln((CAST(nd.n_docs AS DOUBLE) + 1.0)
               / (CAST(d.df AS DOUBLE) + 1.0)) * 1e4 + 0.5) AS BIGINT) AS score_q
    FROM tf t JOIN df_tbl d USING (tok) CROSS JOIN nd
), ranked AS (
    SELECT doc_id, tok, tf, score_q,
           row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, tok ASC)
               AS rank
    FROM scored
)
SELECT doc_id, rank, tok, tf, score_q
FROM ranked WHERE rank <= {KEYWORDS_PER_DOC}
"""


LOCAL_QUERIES["text_keywords_tfidf"] = QuerySpec(
    q_text_keywords_tfidf, _keywords_tfidf_oracle()
)


# --- Count-Min heavy hitters -------------------------------------------------

CMS_W = 512   # counters per hash row
CMS_D = 4     # hash rows (DEFAULT_SEEDS[0:4])
CMS_TOP = 20


def q_text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter token counts through a from-scratch Count-Min
    sketch (d=4 × w=512, deterministic polynomial hashes —
    functions/hashing.py), with the exact count alongside so the
    sketch's one-sided error (est ≥ exact, always) is itself
    hash-verified against the DuckDB twin.

    The CMS update is a SUM into (row, bucket) cells — associative and
    commutative — so building the cells from the pre-aggregated token
    counts is bit-identical to streaming per-occurrence increments;
    that is exactly the map-side-combine identity a 1000-executor
    ingest relies on (each executor sketches its partition, cells
    merge by +). Plan: one corpus explode→token-grain partial-agg
    shuffle; everything after is vocab-sized (4 projection passes over
    the count table, a 2048-row cell table broadcast onto the top-k
    candidates)."""
    toks = H.tokens("text")[0]
    docs = widen(t(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(F.expr(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    def bucketed(src: DataFrame, keep: list[str]) -> DataFrame:
        # ONE posexplode over the 4 bucket expressions — a 4-way union
        # of projections would re-execute the (corpus-derived) source
        # subtree once per arm in the DAG.
        buckets = F.array(
            *[
                F.expr(f"({H.string_hash('tok', *H.DEFAULT_SEEDS[d])[0]}) % {CMS_W}")
                for d in range(CMS_D)
            ]
        )
        return src.select(*keep, F.posexplode(buckets).alias("d", "bucket"))

    cells = (
        bucketed(counts, ["tok", "n"])
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("cell"))
    )
    top = counts.orderBy(col("n").desc(), col("tok")).limit(CMS_TOP)
    return (
        bucketed(top, ["tok", "n"])
        .join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("tok", "n")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "tok",
            col("n").alias("exact_n"),
            "cms_est",
            (col("cms_est") - col("n")).alias("overcount"),
        )
    )


def _cms_oracle() -> str:
    tk = H.tokens("text")[1]
    hs = [H.string_hash("tok", *H.DEFAULT_SEEDS[d])[1] for d in range(CMS_D)]
    cell_arms = " UNION ALL ".join(
        f"SELECT {d} AS d, ({hs[d]}) % {CMS_W} AS bucket, n FROM counts"
        for d in range(CMS_D)
    )
    cand_arms = " UNION ALL ".join(
        f"SELECT tok, n, {d} AS d, ({hs[d]}) % {CMS_W} AS bucket FROM top"
        for d in range(CMS_D)
    )
    return f"""
WITH counts AS (
    SELECT tok, count(*) AS n
    FROM (SELECT unnest({tk}) AS tok FROM documents) GROUP BY tok
), cells AS (
    SELECT d, bucket, CAST(sum(n) AS BIGINT) AS cell
    FROM ({cell_arms}) GROUP BY d, bucket
), top AS (
    SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT {CMS_TOP}
), cand AS (
    {cand_arms}
)
SELECT c.tok, c.n AS exact_n,
       CAST(min(cl.cell) AS BIGINT) AS cms_est,
       CAST(min(cl.cell) - c.n AS BIGINT) AS overcount
FROM cand c JOIN cells cl USING (d, bucket)
GROUP BY c.tok, c.n
"""


LOCAL_QUERIES["text_cms_heavy_hitters"] = QuerySpec(
    q_text_cms_heavy_hitters, _cms_oracle()
)


# --- content-defined chunking ------------------------------------------------

CDC_WINDOW = 4      # rolling-hash window (tokens)
CDC_DIVISOR = 16    # boundary when rolling hash % divisor == 0 (~16-token chunks)
_CDC_M = H.MERSENNE_31
_CDC_A = 131
_CDC_A2 = 131 * 131
_CDC_A3 = 131 * 131 * 131


def q_text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall where a rolling
    hash of the last 4 tokens is ≡ 0 mod 16, so an insertion early in a
    document only perturbs the chunks it touches — unlike fixed-width
    chunking (text_chunk_overlap), where one shifted token re-keys
    every downstream chunk. This is the storage-dedup / shift-robust
    corpus-dedup primitive (rsync/LBFS lineage); ``n_dups`` counts
    cross-corpus repeats of each chunk fingerprint.

    Everything before the final dup-count is ROW-LOCAL codegen-side
    array work (token hashes → windowed rolling hash → boundary
    positions → per-chunk fingerprints, each token touched O(1) times;
    the chunk structs are built INSIDE the row so the token-hash array
    is never duplicated per chunk) — zero shuffles until the one
    fingerprint-grain aggregate + its AQE join back. Per-term mod
    keeps every product < 2^62 (DuckDB overflow errors; Spark wraps).
    At 100 TB: one corpus pass + one chunk-hash shuffle."""
    toks = H.tokens("text")[0]
    th = f"transform({toks}, x -> {H.string_hash('x')[0]})"
    docs = widen(t(spark, sf_dir, "documents"))
    base = docs.select("doc_id", F.expr(th).alias("th")).filter(F.expr("size(th) > 0"))
    rolling = (
        f"transform(sequence(1, size(th)), i -> CASE WHEN i >= {CDC_WINDOW} THEN "
        f"((element_at(th, i - 3) * {_CDC_A3}) % {_CDC_M}"
        f" + (element_at(th, i - 2) * {_CDC_A2}) % {_CDC_M}"
        f" + (element_at(th, i - 1) * {_CDC_A}) % {_CDC_M}"
        f" + element_at(th, i)) % {_CDC_M} ELSE -1 END)"
    )
    # boundaries strictly before the end + the end itself: appending the
    # final position (rather than dedup'ing) keeps both engines' arrays
    # in ascending order (DuckDB list_distinct does NOT preserve order)
    bounds = (
        f"concat(filter(sequence(1, size(th)), "
        f"i -> i < size(th) AND element_at(r, i) >= 0 "
        f"AND element_at(r, i) % {CDC_DIVISOR} = 0), "
        "array(size(th)))"
    )
    chunk_hash = (
        "aggregate(slice(th, strt, ln), CAST(7 AS BIGINT), "
        f"(acc, x) -> (acc * {_CDC_A} + x) % {_CDC_M})"
    )
    chunks = (
        "transform(sequence(1, size(bounds)), j -> "
        "named_struct('chunk_idx', j, "
        "'start_pos', CASE WHEN j = 1 THEN 1 ELSE element_at(bounds, j - 1) + 1 END, "
        "'n_tokens', element_at(bounds, j) - "
        "(CASE WHEN j = 1 THEN 0 ELSE element_at(bounds, j - 1) END)))"
    )
    per_chunk = (
        base.select("doc_id", "th", F.expr(rolling).alias("r"))
        .select("doc_id", "th", F.expr(bounds).alias("bounds"))
        .select("doc_id", "th", F.explode(F.expr(chunks)).alias("c"))
        .select(
            "doc_id",
            col("c.chunk_idx").alias("chunk_idx"),
            col("c.start_pos").alias("start_pos"),
            col("c.n_tokens").alias("n_tokens"),
            F.expr(
                chunk_hash.replace("strt", "c.start_pos").replace("ln", "c.n_tokens")
            ).alias("chunk_hash"),
        )
    )
    dups = per_chunk.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("n_dups"))
    return per_chunk.join(dups, "chunk_hash").select(
        "doc_id", "chunk_idx", "start_pos", "n_tokens", "chunk_hash", "n_dups"
    )


def _cdc_chunks_oracle() -> str:
    tk = H.tokens("text")[1]
    th = f"list_transform(tk, x -> {H.string_hash('x')[1]})"
    return f"""
WITH base AS (
    SELECT doc_id, {th} AS th
    FROM (SELECT doc_id, {tk} AS tk FROM documents)
    WHERE len(tk) > 0
), rolled AS (
    SELECT doc_id, th,
           [CASE WHEN i >= {CDC_WINDOW} THEN
                ((th[i - 3] * {_CDC_A3}) % {_CDC_M}
                 + (th[i - 2] * {_CDC_A2}) % {_CDC_M}
                 + (th[i - 1] * {_CDC_A}) % {_CDC_M}
                 + th[i]) % {_CDC_M} ELSE -1 END
            for i in range(1, len(th) + 1)] AS r
    FROM base
), bounded AS (
    SELECT doc_id, th,
           list_append(
               [i for i in range(1, len(th))
                if r[i] >= 0 AND r[i] % {CDC_DIVISOR} = 0],
               len(th)) AS bounds
    FROM rolled
), per_chunk AS (
    SELECT doc_id,
           unnest(range(1, len(bounds) + 1)) AS chunk_idx,
           unnest([CASE WHEN j = 1 THEN 1 ELSE bounds[j - 1] + 1 END
                   for j in range(1, len(bounds) + 1)]) AS start_pos,
           unnest([bounds[j] - (CASE WHEN j = 1 THEN 0 ELSE bounds[j - 1] END)
                   for j in range(1, len(bounds) + 1)]) AS n_tokens,
           unnest([list_reduce(
                       list_prepend(CAST(7 AS BIGINT),
                           th[(CASE WHEN j = 1 THEN 1 ELSE bounds[j - 1] + 1 END):(bounds[j])]),
                       (acc, x) -> (acc * {_CDC_A} + x) % {_CDC_M})
                   for j in range(1, len(bounds) + 1)]) AS chunk_hash
    FROM bounded
), dup_counts AS (
    SELECT chunk_hash, count(*) AS n_dups FROM per_chunk GROUP BY chunk_hash
)
SELECT p.doc_id, p.chunk_idx, p.start_pos, p.n_tokens, p.chunk_hash, d.n_dups
FROM per_chunk p JOIN dup_counts d USING (chunk_hash)
"""


LOCAL_QUERIES["text_cdc_chunks"] = QuerySpec(
    q_text_cdc_chunks, _cdc_chunks_oracle()
)


# --- weighted sampling -------------------------------------------------------

WSAMPLE_K = 100


def q_text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subsampling WITHOUT replacement via the
    Efraimidis–Spirakis exponential race: each doc gets the
    deterministic key r = −ln(u)/w (u from the avalanche hash of
    doc_id, w = its quality score) and the K smallest keys win —
    inclusion probability proportional to weight, exactly the
    quality-weighted subsample a data-mixing pipeline draws.

    Deterministic where random sampling is not: re-runs, retries, and
    re-partitions select the SAME sample (u is a pure function of
    doc_id), which is what makes the draw auditable and the oracle
    possible. Plan: one map-only scoring pass +
    TakeOrderedAndProject — no global sort, no shuffle of the corpus;
    at 100 TB the per-partition top-K merge is driver-bounded at K."""
    from ..functions.hashing import avalanche_hash, spark_shr, spark_xor

    docs = widen(t(spark, sf_dir, "documents"))
    h = avalanche_hash("doc_id", xor=spark_xor, shr=spark_shr)
    w = T.quality_score("text")
    neg_ln_u = F.expr(f"-ln((CAST({h} AS DOUBLE) + 1.0) / 2147483649.0)")
    r = neg_ln_u / w
    return (
        docs.select(
            "doc_id",
            F.floor(w * 1e4 + F.lit(0.5)).cast("long").alias("w_q"),
            F.floor(r * 1e6 + F.lit(0.5)).cast("long").alias("r_q"),
            r.alias("_r"),
        )
        .filter(col("w_q") > 0)
        .orderBy(col("_r").asc(), col("doc_id"))
        .limit(WSAMPLE_K)
        .select("doc_id", "w_q", "r_q")
    )


def _weighted_sample_oracle() -> str:
    from ..functions.hashing import avalanche_hash, duck_shr, duck_xor

    h = avalanche_hash("doc_id", xor=duck_xor, shr=duck_shr)
    w = T.quality_score_duck("text")
    r = f"(-ln((CAST({h} AS DOUBLE) + 1.0) / 2147483649.0) / ({w}))"
    return f"""
SELECT doc_id,
       CAST(floor(({w}) * 1e4 + 0.5) AS BIGINT) AS w_q,
       CAST(floor({r} * 1e6 + 0.5) AS BIGINT) AS r_q
FROM documents
WHERE CAST(floor(({w}) * 1e4 + 0.5) AS BIGINT) > 0
ORDER BY {r} ASC, doc_id
LIMIT {WSAMPLE_K}
"""


LOCAL_QUERIES["text_weighted_sample"] = QuerySpec(
    q_text_weighted_sample, _weighted_sample_oracle()
)


# --- token-distribution drift ------------------------------------------------

JSD_TOP = 20


def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between two corpus vintages' unigram
    distributions (even/odd doc_id as the deterministic split) — the
    text twin of ``emb_drift_report``: the drift monitor that catches a
    source mix or extraction change shifting the token distribution.

    ONE explode pass builds both vintages' counts as conditional sums;
    everything after is vocab-sized. The per-token JS contribution is
    quantized to a 1e-12 BIGINT grid and summed EXACTLY (sum of raw
    doubles would be partition-order-dependent — the scoring.py
    precedent), so the total divergence hash-matches. Emits the top-20
    |contribution| tokens with the corpus-level js_q alongside."""
    toks = H.tokens("text")[0]
    docs = widen(t(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(F.expr(toks)).alias("tok"), (col("doc_id") % 2).alias("side"))
        .groupBy("tok")
        .agg(
            F.sum(F.expr("CAST(side = 0 AS INT)")).alias("c_a"),
            F.sum(F.expr("CAST(side = 1 AS INT)")).alias("c_b"),
        )
        # vocab-sized, consumed by scored/totals/total_js — checkpoint
        # or the corpus explode re-executes per branch
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b")
    )
    contrib = F.expr(
        "0.5 * (CASE WHEN c_a > 0 THEN (CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE))"
        " * ln((CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE))"
        " / ((CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE)"
        " + CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE)) / 2.0)) ELSE 0.0 END)"
        " + 0.5 * (CASE WHEN c_b > 0 THEN (CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE))"
        " * ln((CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE))"
        " / ((CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE)"
        " + CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE)) / 2.0)) ELSE 0.0 END)"
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        "c_a",
        "c_b",
        F.floor(contrib * 1e12 + F.lit(0.5)).cast("long").alias("contrib_q"),
    )
    total_js = scored.agg(F.sum("contrib_q").alias("js_q"))
    return (
        scored.crossJoin(F.broadcast(total_js))
        .orderBy(F.abs(col("contrib_q")).desc(), "tok")
        .limit(JSD_TOP)
        .select("tok", "c_a", "c_b", "contrib_q", "js_q")
    )


def _js_divergence_oracle() -> str:
    tk = H.tokens("text")[1]
    contrib = (
        "0.5 * (CASE WHEN c_a > 0 THEN (CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE))"
        " * ln((CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE))"
        " / ((CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE)"
        " + CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE)) / 2.0)) ELSE 0.0 END)"
        " + 0.5 * (CASE WHEN c_b > 0 THEN (CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE))"
        " * ln((CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE))"
        " / ((CAST(c_a AS DOUBLE) / CAST(t_a AS DOUBLE)"
        " + CAST(c_b AS DOUBLE) / CAST(t_b AS DOUBLE)) / 2.0)) ELSE 0.0 END)"
    )
    return f"""
WITH counts AS (
    SELECT tok,
           CAST(sum(CAST(side = 0 AS INT)) AS BIGINT) AS c_a,
           CAST(sum(CAST(side = 1 AS INT)) AS BIGINT) AS c_b
    FROM (SELECT unnest({tk}) AS tok, doc_id % 2 AS side FROM documents)
    GROUP BY tok
), totals AS (
    SELECT CAST(sum(c_a) AS BIGINT) AS t_a, CAST(sum(c_b) AS BIGINT) AS t_b
    FROM counts
), scored AS (
    SELECT tok, c_a, c_b,
           CAST(floor(({contrib}) * 1e12 + 0.5) AS BIGINT) AS contrib_q
    FROM counts CROSS JOIN totals
), total_js AS (
    SELECT CAST(sum(contrib_q) AS BIGINT) AS js_q FROM scored
)
SELECT tok, c_a, c_b, contrib_q, js_q
FROM scored CROSS JOIN total_js
ORDER BY abs(contrib_q) DESC, tok
LIMIT {JSD_TOP}
"""


LOCAL_QUERIES["text_js_divergence"] = QuerySpec(
    q_text_js_divergence, _js_divergence_oracle()
)


# --- vocabulary coverage -----------------------------------------------------

VOCAB_COVERAGE_KS = (10, 100, 1000, 10000)


def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of token OCCURRENCES covered
    by the top-K vocabulary, for K in {10, 100, 1k, 10k} — the Zipf
    diagnostic that sizes a tokenizer vocabulary (and predicts the UNK
    rate text_bpe_encode_ids will pay at each budget).

    One corpus explode→token-grain partial agg; the rank window and
    cumulative sum run over the VOCAB-sized count table (never the
    corpus), and the total rides a 1-row broadcast crossJoin. Ordering
    is (count desc, token asc) — fully deterministic under ties."""
    toks = H.tokens("text")[0]
    docs = widen(t(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(F.expr(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(col("n").desc(), col("tok"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum", F.sum("n").over(w)
    )
    total = counts.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_vocab"))
    ks = ", ".join(str(k) for k in VOCAB_COVERAGE_KS)
    return (
        ranked.filter(col("rank").isin(*VOCAB_COVERAGE_KS))
        .crossJoin(F.broadcast(total))
        .select(
            col("rank").alias("k"),
            "n_vocab",
            col("cum").alias("covered"),
            "total",
            F.floor(
                F.expr("CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)") * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("coverage_q"),
        )
    )


def _vocab_coverage_oracle() -> str:
    tk = H.tokens("text")[1]
    ks = ", ".join(str(k) for k in VOCAB_COVERAGE_KS)
    return f"""
WITH counts AS (
    SELECT tok, count(*) AS n
    FROM (SELECT unnest({tk}) AS tok FROM documents) GROUP BY tok
), ranked AS (
    SELECT tok, n,
           row_number() OVER (ORDER BY n DESC, tok) AS rank,
           sum(n) OVER (ORDER BY n DESC, tok) AS cum
    FROM counts
), total AS (
    SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_vocab FROM counts
)
SELECT r.rank AS k, t.n_vocab, CAST(r.cum AS BIGINT) AS covered, t.total,
       CAST(floor(CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE) * 1e6 + 0.5)
           AS BIGINT) AS coverage_q
FROM ranked r CROSS JOIN total t
WHERE r.rank IN ({ks})
"""


LOCAL_QUERIES["text_vocab_coverage"] = QuerySpec(
    q_text_vocab_coverage, _vocab_coverage_oracle()
)


# --- span corruption (T5-style) -----------------------------------------------

SPAN_RATE = 4  # % of positions that OPEN a 3-token corruption span
SPAN_LEN = 3
SPAN_HEAD = 20

# deterministic per-(doc, position) span-start predicate — same shape as
# _MLM_PRED but decorrelated constants, so MLM masks and span starts are
# independent signals on the same corpus
_SPAN_PRED = (
    "((((((({doc} % 2147483648) * 999983 + ({i}) * 20011) % 2147483648)"
    " * 2654435761) % 2147483648) {div} 32768) % 100) < " + str(SPAN_RATE)
)


def _span_masked(pos: str, doc: str, div: str) -> str:
    """masked(pos) for 1-based pos: a span opened at pos, pos-1 or pos-2."""
    def p(i: str) -> str:
        return _SPAN_PRED.format(doc=doc, i=i, div=div)

    return (
        f"({p(pos)}"
        f" OR ((({pos}) >= 2) AND {p(f'({pos}) - 1')})"
        f" OR ((({pos}) >= 3) AND {p(f'({pos}) - 2')}))"
    )


def _span_start(pos: str, doc: str, div: str) -> str:
    """start(pos): masked(pos) and not masked(pos-1) — overlapping spans
    merge (T5 semantics), so a start is the left edge of a masked run."""
    return (
        f"({_span_masked(pos, doc, div)}"
        f" AND ((({pos}) = 1) OR NOT {_span_masked(f'({pos}) - 1', doc, div)}))"
    )


def q_text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption training-example construction (T5-style): open a
    corruption span at ~{SPAN_RATE}% of token positions, each span
    masking {SPAN_LEN} tokens (overlaps merge); the encoder input keeps
    the uncorrupted tokens with one '<X>' sentinel per span, the decoder
    target is the masked-out tokens. Deterministic — spans are a pure
    function of (doc_id, position), so retries/re-shards regenerate the
    same examples (see text_mlm_mask for why that matters).

    Row-local by construction: one shuffle-free whole-stage-codegen'd
    pass of HOF expressions over the doc's own token array (no Python
    boundary); emits counts plus bounded heads, never corpus-sized
    arrays."""
    docs = widen(t(spark, sf_dir, "documents"))
    toks = H.tokens("text")[0]
    m = _span_masked("i + 1", "doc_id", "div")
    s = _span_start("i + 1", "doc_id", "div")
    tagged = (
        f"transform({toks}, (x, i) -> named_struct("
        f"'x', x, 'm', IF({m}, 1, 0), 's', IF({s}, 1, 0)))"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(
            f"aggregate({tagged}, 0, (acc, e) -> acc + e.m)"
        ).alias("n_masked"),
        F.expr(
            f"aggregate({tagged}, 0, (acc, e) -> acc + e.s)"
        ).alias("n_spans"),
        # Graded-schema contract: heads emit as space-joined strings
        # (tokens are whitespace-split, so the join is lossless).
        F.expr(
            f"array_join(slice(transform(filter({tagged}, e -> e.m = 0 OR e.s = 1),"
            f" e -> IF(e.s = 1, '<X>', e.x)), 1, {SPAN_HEAD}), ' ')"
        ).alias("input_head"),
        F.expr(
            f"array_join(slice(transform(filter({tagged}, e -> e.m = 1), e -> e.x),"
            f" 1, {SPAN_HEAD}), ' ')"
        ).alias("target_head"),
    )


def _span_corruption_oracle() -> str:
    toks = H.tokens("text")[1]
    m = _span_masked("i", "doc_id", "//")
    s = _span_start("i", "doc_id", "//")
    return f"""
WITH base AS (
    SELECT doc_id, {toks} AS toks FROM documents
), tagged AS (
    SELECT doc_id, toks,
           [ {{'x': toks[i],
               'm': CASE WHEN {m} THEN 1 ELSE 0 END,
               's': CASE WHEN {s} THEN 1 ELSE 0 END}}
             for i in range(1, len(toks) + 1) ] AS tm
    FROM base
)
SELECT doc_id,
       len(toks) AS n_tokens,
       list_reduce(list_prepend(0, list_transform(tm, e -> e['m'])),
                   (a, b) -> a + b) AS n_masked,
       list_reduce(list_prepend(0, list_transform(tm, e -> e['s'])),
                   (a, b) -> a + b) AS n_spans,
       coalesce(array_to_string(
           list_transform(list_filter(tm, e -> e['m'] = 0 OR e['s'] = 1),
                          e -> CASE WHEN e['s'] = 1 THEN '<X>'
                                    ELSE e['x'] END)[1:{SPAN_HEAD}],
           ' '), '') AS input_head,
       coalesce(array_to_string(
           list_transform(list_filter(tm, e -> e['m'] = 1),
                          e -> e['x'])[1:{SPAN_HEAD}], ' '), '') AS target_head
FROM tagged
"""


LOCAL_QUERIES["text_span_corruption"] = QuerySpec(
    q_text_span_corruption, _span_corruption_oracle()
)


# --- Zipf slope fit -----------------------------------------------------------

ZIPF_LOG_GRID = 10000  # ln values quantized to 1e-4 before the moment sums


def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution: the least-squares
    slope of ln(frequency) on ln(rank) over the vocabulary — natural
    text sits near −1, and a corpus that drifts (template spam pushes
    the head, OCR noise fattens the tail) moves the slope before it
    moves most other health metrics. Companion to text_vocab_coverage
    (which reads the same curve as coverage budgets).

    EXACTNESS DESIGN: ln() is not required to round identically across
    engine libms, so each ln is quantized to the 1e-4 grid FIRST (a
    1-ulp libm divergence flips a grid cell only on an exact .5 knife
    edge — the same measure-zero class the Lloyd oracle tolerates);
    the four regression moments are then exact BIGINT sums over the
    VOCAB-sized rank table (grid 1e4 keeps Σxy under int64 up to ~3e16
    tokens of vocab mass), and the closed-form slope runs once through
    an identical double expression. Rank is the one windowed step —
    over the vocab histogram, never the corpus."""
    toks = H.tokens("text")[0]
    docs = widen(t(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(F.expr(toks)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(col("n").desc(), col("tok"))
    g = ZIPF_LOG_GRID
    pts = counts.withColumn("rank", F.row_number().over(w)).select(
        F.expr(
            f"CAST(floor(ln(CAST(rank AS DOUBLE)) * {g} + 0.5) AS BIGINT)"
        ).alias("x"),
        F.expr(f"CAST(floor(ln(CAST(n AS DOUBLE)) * {g} + 0.5) AS BIGINT)").alias(
            "y"
        ),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    slope = (
        "(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return mom.select(
        col("m").alias("n_vocab"),
        F.floor(F.expr(slope) * 1e6 + F.lit(0.5)).cast("long").alias("slope_q"),
    )


def _zipf_oracle() -> str:
    tk = H.tokens("text")[1]
    g = ZIPF_LOG_GRID
    return f"""
WITH counts AS (
    SELECT tok, count(*) AS n
    FROM (SELECT unnest({tk}) AS tok FROM documents) GROUP BY tok
), pts AS (
    SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY n DESC, tok)
               AS DOUBLE)) * {g} + 0.5) AS BIGINT) AS x,
           CAST(floor(ln(CAST(n AS DOUBLE)) * {g} + 0.5) AS BIGINT) AS y
    FROM counts
), mom AS (
    SELECT count(*) AS m,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM pts
)
SELECT m AS n_vocab,
       CAST(floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * 1e6 + 0.5) AS BIGINT) AS slope_q
FROM mom
"""


LOCAL_QUERIES["text_zipf_slope"] = QuerySpec(q_text_zipf_slope, _zipf_oracle())


# --- per-source scorecard -----------------------------------------------------


def q_text_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus scorecard: doc count, token mass, mean quality
    (exact integer quotient over the 1e-4 quality grid), and LANGUAGE
    ENTROPY — the one-page health report a data-sourcing team reads
    per provider (a source whose language entropy jumps got a new
    crawl mix; one whose quality mean sags needs its filters retuned).

    ONE corpus pass to (source, lang) grain (counts + token mass +
    quality sums partial-aggregate together), checkpointed —
    everything after is providers-sized. Entropy quantizes each
    p·ln(p) term on the 1e-4 ln grid BEFORE the source-level sum
    (text_zipf_slope's libm-divergence discipline), so the sum is an
    exact integer fold."""
    docs = widen(t(spark, sf_dir, "documents"))
    sl = (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(T.token_count("text")).alias("toks"),
            F.sum(F.floor(T.quality_score("text") * 10000).cast("long")).alias(
                "qs"
            ),
        )
        .localCheckpoint(eager=False)
    )
    base = sl.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
        F.sum("qs").alias("q_sum"),
    )
    ent = (
        sl.join(
            sl.groupBy("source").agg(F.sum("n").alias("tot")), "source"
        )
        .select(
            "source",
            F.expr(
                "CAST(floor(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))"
                " * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))"
                " * 10000 + 0.5) AS BIGINT)"
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.sum("term").alias("lang_entropy_q4"))
    )
    return base.join(ent, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(
            "CAST(floor(CAST(q_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) + 0.5)"
            " AS BIGINT)"
        ).alias("mean_quality_q4"),
        "lang_entropy_q4",
    )


def _source_scorecard_oracle() -> str:
    tk = H.tokens("text")[1]
    qd = T.quality_score_duck("text")
    return f"""
WITH sl AS (
    SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
), base AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(len({tk})) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(floor(({qd}) * 10000) AS BIGINT)) AS BIGINT) AS q_sum
    FROM documents GROUP BY source
), ent AS (
    SELECT sl.source,
           CAST(sum(CAST(floor(-(CAST(sl.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
               * ln(CAST(sl.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
               * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS lang_entropy_q4
    FROM sl JOIN (SELECT source, CAST(sum(n) AS BIGINT) AS tot
                  FROM sl GROUP BY source) t USING (source)
    GROUP BY sl.source
)
SELECT b.source, b.n_docs, b.n_tokens,
       CAST(floor(CAST(b.q_sum AS DOUBLE) / CAST(b.n_docs AS DOUBLE) + 0.5)
           AS BIGINT) AS mean_quality_q4,
       e.lang_entropy_q4
FROM base b JOIN ent e USING (source)
"""


LOCAL_QUERIES["text_source_scorecard"] = QuerySpec(
    q_text_source_scorecard, _source_scorecard_oracle()
)


# --- KS length-drift statistic --------------------------------------------------

KS_TOP = 15


def q_text_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Kolmogorov–Smirnov statistic between sources' document
    LENGTH distributions (token counts) — the distribution-drift test
    that catches a provider whose docs silently got truncated or
    concatenated (complementing text_js_divergence, which compares
    token CONTENT). Emits the top-{K} most-divergent source pairs.

    KS = max |F_a − F_b| over the merged support, computed EXACTLY:
    lengths histogram per source, cumulative counts at every support
    point via a support × histogram range join (support is the
    distinct-length set — bounded by max doc length, never corpus-
    sized), and the sup taken over |c_a·n_b − c_b·n_a| integer cross
    moments with ONE final division. No sort of the corpus, no float
    accumulation."""
    docs = widen(t(spark, sf_dir, "documents"))
    lens = docs.select("source", T.token_count("text").alias("len"))
    hist = (
        lens.groupBy("source", "len")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=False)
    )
    totals = hist.groupBy("source").agg(F.sum("m").alias("n"))
    support = hist.select("len").distinct().select(col("len").alias("s"))
    # support-sized (|support| × sources rows) and consumed by BOTH
    # pair-join sides — one materialization beats re-running the
    # range join per side
    cdf = (
        support.join(hist, col("len") <= col("s"))
        .groupBy("source", "s")
        .agg(F.sum("m").alias("c"))
        .join(F.broadcast(totals), "source")
        .localCheckpoint(eager=False)
    )
    a = cdf.select(
        col("source").alias("src_a"), "s", col("c").alias("ca"), col("n").alias("na")
    )
    b = cdf.select(
        col("source").alias("src_b"), "s", col("c").alias("cb"), col("n").alias("nb")
    )
    pair = a.join(b, "s").filter(col("src_a") < col("src_b"))
    ks = (
        pair.groupBy("src_a", "src_b")
        .agg(
            F.max(
                F.abs(F.expr("ca * nb - cb * na"))
            ).alias("cross_max"),
            F.max(F.expr("na * nb")).alias("nn"),
        )
        .select(
            "src_a",
            "src_b",
            F.floor(
                F.expr("CAST(cross_max AS DOUBLE) / CAST(nn AS DOUBLE)") * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ks_q"),
        )
    )
    return ks.orderBy(col("ks_q").desc(), "src_a", "src_b").limit(KS_TOP)


def _length_ks_oracle() -> str:
    tk = H.tokens("text")[1]
    return f"""
WITH lens AS (
    SELECT source, len({tk}) AS len FROM documents
), hist AS (
    SELECT source, len, count(*) AS m FROM lens GROUP BY 1, 2
), totals AS (
    SELECT source, CAST(sum(m) AS BIGINT) AS n FROM hist GROUP BY source
), support AS (
    SELECT DISTINCT len AS s FROM hist
), cdf AS (
    SELECT h.source, sp.s, CAST(sum(h.m) AS BIGINT) AS c, t.n
    FROM support sp
    JOIN hist h ON h.len <= sp.s
    JOIN totals t ON t.source = h.source
    GROUP BY h.source, sp.s, t.n
), pair AS (
    SELECT a.source AS src_a, b.source AS src_b,
           max(abs(a.c * b.n - b.c * a.n)) AS cross_max,
           max(a.n * b.n) AS nn
    FROM cdf a JOIN cdf b ON a.s = b.s AND a.source < b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(floor(CAST(cross_max AS DOUBLE) / CAST(nn AS DOUBLE) * 1e6 + 0.5)
           AS BIGINT) AS ks_q
FROM pair
ORDER BY ks_q DESC, src_a, src_b
LIMIT {KS_TOP}
"""


LOCAL_QUERIES["text_length_ks"] = QuerySpec(q_text_length_ks, _length_ks_oracle())


# --- preference-pair construction (chosen vs rejected) -------------------------

PREF_GAP_Q4 = 2000  # minimum quality gap on the 1e-4 grid (0.2)


def q_text_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for preference-tuning data (the
    DPO/RLHF dataset shape): within each (lang, source) slice — the
    topical unit two comparable documents share — pair the
    highest-quality document (chosen) against the lowest-quality one
    (rejected), keeping only pairs whose quality gap clears a floor so
    every emitted pair is a meaningful supervision signal.

    Quality rides the exact 1e-4 integer grid BEFORE any comparison
    (ordering, gap floor, output), so ranking and filtering are
    bit-stable cross-engine; ties break on doc_id. Plan: one scan
    computes quality, two row_number windows share one (lang, source)
    exchange (same partitioning, opposite orderings), and the
    chosen×rejected join is GROUP-grain — at 100 TB the join input is
    |slices| rows, not |corpus|, and the corpus shuffles exactly once."""
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    scored = widen(docs).select(
        "doc_id",
        "lang",
        "source",
        F.floor(T.quality_score("text") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("q4"),
    )
    grp = Window.partitionBy("lang", "source")
    best = (
        scored.withColumn(
            "rn", F.row_number().over(grp.orderBy(col("q4").desc(), col("doc_id")))
        )
        .filter(col("rn") == 1)
        .select(
            "lang",
            "source",
            col("doc_id").alias("chosen_id"),
            col("q4").alias("chosen_q4"),
        )
    )
    worst = (
        scored.withColumn(
            "rn", F.row_number().over(grp.orderBy(col("q4").asc(), col("doc_id")))
        )
        .filter(col("rn") == 1)
        .select(
            "lang",
            "source",
            col("doc_id").alias("rejected_id"),
            col("q4").alias("rejected_q4"),
        )
    )
    return (
        best.join(worst, ["lang", "source"])
        .filter(
            (col("chosen_id") != col("rejected_id"))
            & (col("chosen_q4") - col("rejected_q4") >= PREF_GAP_Q4)
        )
        .select(
            "lang",
            "source",
            "chosen_id",
            "rejected_id",
            "chosen_q4",
            "rejected_q4",
            (col("chosen_q4") - col("rejected_q4")).alias("gap_q4"),
        )
    )


def _preference_pairs_oracle() -> str:
    q = T.quality_score_duck("text")
    return f"""
WITH scored AS (
    SELECT doc_id, lang, source,
           CAST(floor(({q}) * 10000 + 0.5) AS BIGINT) AS q4
    FROM documents
), best AS (
    SELECT lang, source, doc_id AS chosen_id, q4 AS chosen_q4 FROM (
        SELECT *, row_number() OVER (
            PARTITION BY lang, source ORDER BY q4 DESC, doc_id) AS rn
        FROM scored
    ) WHERE rn = 1
), worst AS (
    SELECT lang, source, doc_id AS rejected_id, q4 AS rejected_q4 FROM (
        SELECT *, row_number() OVER (
            PARTITION BY lang, source ORDER BY q4 ASC, doc_id) AS rn
        FROM scored
    ) WHERE rn = 1
)
SELECT b.lang, b.source, chosen_id, rejected_id, chosen_q4, rejected_q4,
       chosen_q4 - rejected_q4 AS gap_q4
FROM best b JOIN worst w ON b.lang = w.lang AND b.source = w.source
WHERE chosen_id != rejected_id AND chosen_q4 - rejected_q4 >= {PREF_GAP_Q4}
"""


LOCAL_QUERIES["text_preference_pairs"] = QuerySpec(
    q_text_preference_pairs, _preference_pairs_oracle()
)


# --- stratified eval-set split (exact per-stratum proportions) ------------------

STRAT_TEST_PCT = 10  # test share per stratum, percent


def q_text_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED eval-set construction: exactly ⌊n·10%⌋ test documents
    from every (lang, source) stratum — the guarantee the hash-mod
    split (``text_train_test_split``) can't make (its per-stratum
    ratios only converge in expectation; a small stratum can land
    all-train and silently vanish from eval).

    Selection is deterministic, not random: each stratum's docs rank by
    md5(doc_id) — the salted-hash order both engines compute
    identically (the FS u-sample discipline) — and the smallest
    ⌊n·pct/100⌋ become test. Plan: one count window + one row_number
    window sharing a single (lang, source) exchange, map-only
    everywhere else; no stratum-grain collect, no global sort. At
    100 TB each stratum sorts independently inside its partition group
    — skew-bounded by the largest stratum, the same bound any
    stratified operation carries."""
    from pyspark.sql.window import Window

    docs = widen(t(spark, sf_dir, "documents"))
    grp = Window.partitionBy("lang", "source")
    ranked = docs.select(
        "doc_id",
        "lang",
        "source",
        F.row_number()
        .over(grp.orderBy(F.md5(col("doc_id").cast("string")), col("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(grp).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "source",
        F.when(
            col("rn") <= F.floor(col("n") * STRAT_TEST_PCT / 100), "test"
        )
        .otherwise("train")
        .alias("split"),
    )


_STRATIFIED_SPLIT_SQL = f"""
SELECT doc_id, lang, source,
       CASE WHEN rn <= floor(n * {STRAT_TEST_PCT} / 100)
            THEN 'test' ELSE 'train' END AS split
FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           count(*) OVER (PARTITION BY lang, source) AS n
    FROM documents
)
"""


LOCAL_QUERIES["text_stratified_split"] = QuerySpec(
    q_text_stratified_split, _STRATIFIED_SPLIT_SQL
)
