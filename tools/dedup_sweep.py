#!/usr/bin/env python3
"""MinHash-LSH banding sweep — the tuning table the near-dup dedup
family needs: candidate-pair volume, precision, and recall vs the
EXACT shingle-Jaccard ground truth, per (bands, rows-per-band) config.

The (b, r) choice IS the dedup operator's quality/cost contract: the
collision probability of a pair with Jaccard s is 1-(1-s^r)^b (an
S-curve with its knee near (1/b)^(1/r)), so more bands buys recall at
the price of candidate volume (the shuffle + verify cost driver) and
more rows per band sharpens the threshold. This sweep measures the
curve on real data instead of trusting the formula.

Ground truth is EXACT: all i<j pairs over a deterministic sample
(doc_id < N) scored with the same distinct-3-shingle Jaccard the
production verifier (operators/dedup.verify_jaccard_pairs) uses —
O(N²) is the price of truth, which is why it runs on a sample here
and never in the registered queries. Candidates come from the same
`minhash_band_pairs` operator the graded `dedup_minhash_lsh` query
uses, so the numbers transfer.

Prints a markdown table for BENCH_history.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from hdb_resale_price_data_pipeline_spark.functions import hashing as H
from hdb_resale_price_data_pipeline_spark.operators.dedup import (
    jaccard_expr,
    minhash_band_pairs,
)
from hdb_resale_price_data_pipeline_spark.session import get_spark_session
from hdb_resale_price_data_pipeline_spark.sources import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SAMPLE_N = int(os.environ.get("SPARK_GRAFT_DEDUP_SWEEP_N", "3000"))
SHINGLE_LEN = 3
THRESHOLDS = (0.3, 0.7)
CONFIGS = [(2, 4), (4, 2), (4, 4), (6, 3), (8, 2), (8, 4)]


def _shingle_jaccard_truth(docs):
    """Exact Jaccard over distinct word 3-shingles for ALL i<j sample
    pairs (the O(N²) truth the LSH configs are scored against)."""
    sh = docs.select(
        col("doc_id"),
        F.array_distinct(
            F.expr(H.shingles(H.tokens("text"), SHINGLE_LEN)[0])
        ).alias("sh"),
    ).localCheckpoint(eager=False)
    a = sh.select(col("doc_id").alias("doc_a"), col("sh").alias("toks_a"))
    b = sh.select(col("doc_id").alias("doc_b"), col("sh").alias("toks_b"))
    pairs = a.join(b, col("doc_a") < col("doc_b"))
    scored = pairs.select(
        "doc_a", "doc_b", jaccard_expr("toks_a", "toks_b").alias("j")
    )
    # ONE pass over the O(N²) join: collect everything above the loosest
    # threshold, split per-τ driver-side (a collect per τ would re-run
    # the whole all-pairs join each time)
    rows = scored.filter(col("j") >= min(THRESHOLDS)).collect()
    return {
        tau: {(r.doc_a, r.doc_b) for r in rows if r.j >= tau}
        for tau in THRESHOLDS
    }


def sweep(spark) -> None:
    docs = (
        read_table(spark, SF_DIR, "documents")
        .filter(col("doc_id") < SAMPLE_N)
        .select("doc_id", "text")
    )
    n_docs = docs.count()
    print(f"sample: {n_docs} docs ({SF_DIR}), shingle_len={SHINGLE_LEN}")
    t0 = time.perf_counter()
    truth = _shingle_jaccard_truth(docs)
    t_truth = time.perf_counter() - t0
    for tau in THRESHOLDS:
        print(f"ground truth: {len(truth[tau])} pairs at J>={tau}")
    print(f"(exact all-pairs truth took {t_truth:.1f}s)\n")

    tau_cols = " | ".join(
        f"recall@{tau} | prec@{tau}" for tau in THRESHOLDS
    )
    print(f"| bands | rows | sig len | knee (1/b)^(1/r) | candidates |"
          f" {tau_cols} | t(s) |")
    print("|---|---|---|---|---|" + "---|" * (2 * len(THRESHOLDS)) + "---|")
    for bands, rows in CONFIGS:
        t0 = time.perf_counter()
        cand_rows = minhash_band_pairs(
            docs, "doc_id", "text",
            shingle_len=SHINGLE_LEN, num_bands=bands, rows_per_band=rows,
        ).collect()
        dt = time.perf_counter() - t0
        cand = {
            (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in cand_rows
        }
        knee = (1.0 / bands) ** (1.0 / rows)
        cells = []
        for tau in THRESHOLDS:
            gt = truth[tau]
            hit = len(cand & gt)
            rec = hit / len(gt) if gt else float("nan")
            prec = hit / len(cand) if cand else float("nan")
            cells += [f"{rec:.3f}", f"{prec:.3f}"]
        print(
            f"| {bands} | {rows} | {bands * rows} | {knee:.2f} |"
            f" {len(cand)} | " + " | ".join(cells) + f" | {dt:.2f} |"
        )


def main() -> None:
    spark = get_spark_session(app_name="dedup-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sweep(spark)
    spark.stop()


if __name__ == "__main__":
    main()
