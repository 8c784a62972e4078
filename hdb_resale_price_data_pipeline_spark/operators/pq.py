"""Product quantization (PQ) for embedding compression + ANN.

The memory-scale path for similarity search: IVF (operators/ivf.py)
prunes which vectors to score; PQ shrinks what a score costs. Each
D-dim vector is split into M contiguous subvectors; each subspace gets
its own ksub-centroid k-means codebook (operators/kmeans.py — the same
deterministic Lloyd trainer); a vector is stored as M small codes. At
M=8, ksub=16 a 64-dim float32 vector (256 B) becomes 8 nibble codes
(4 B) — 64× compression, which is what lets a 100 TB corpus's index
live in cluster RAM while the raw vectors stay on disk.

Query-time scoring is the classic asymmetric distance computation
(ADC, Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): build an M×ksub lookup table of exact
query-subvector→centroid distances once per query, then every
candidate's approximate distance is M table lookups + a sum — no
per-candidate float math at all. The Spark shape:

- encode: ONE shuffle-free Arrow ``pandas_udf`` pass (all M codebooks
  ride the closure — M×ksub×(D/M) = D×ksub floats, broadcast-sized);
- score: the LUT (M×ksub doubles) rides the closure of a second
  vectorized ``pandas_udf``; top-k is TakeOrderedAndProject;
- refine: production PQ re-ranks the top R ≫ k ADC candidates with
  exact distances — here the candidate filter + exact cosine stays
  fully distributed (the encoded frame keeps the raw vector column
  locally; at scale the re-rank joins codes→vectors by id against the
  vector store).

PQ distances are approximations of TRUE distances, but the pipeline
itself is deterministic: every accumulation below walks dimensions in
index order (the same IEEE op sequence as ``ivf.assign_to_codebook``
and the DuckDB ``list_reduce`` folds), so the whole encode → LUT → ADC
→ re-rank chain carries an exact SQL oracle built from the generalized
Lloyd-unroll CTE (queries/similarity._pq_oracle); recall vs brute force
is additionally gated in tests/test_similarity_recall.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, pandas_udf


def pq_train(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    m: int = 8,
    ksub: int = 16,
    max_iter: int = 3,
) -> list[list[list[float]]]:
    """Train M per-subspace codebooks; returns ``codebooks[m][j] ->
    centroid (D/M floats)``.

    All M Lloyd fits run JOINTLY: each iteration is ONE shuffle-free
    ``mapInPandas`` pass that assigns and partial-sums every subspace
    at once (M×ksub×P tiny partial rows to the driver), instead of M
    independent fits each paying its own corpus scans — at 100 TB that
    is max_iter passes over the data rather than M×max_iter. The
    arithmetic is bit-identical to M separate ``kmeans_fit`` calls:
    same first-ksub init, same dimension-ordered affinity walk per
    subspace, same (cid, pid)-ordered driver fold, and converged
    subspaces are Lloyd fixed points so running the remaining
    iterations reproduces them unchanged. At real scale you fit on a
    sample (PQ codebooks need ~100k vectors, not the corpus); the fit
    dataflow is already the shuffle-free partial-sums shape, so
    sampling is a ``.sample()`` away.
    """
    from ..shipping import ensure_package_shipped
    from .ivf import _sq_norm
    from .similarity import embedding_dim

    ensure_package_shipped(df.sparkSession)
    dim = embedding_dim(df, emb_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    base = (
        df.select(
            col(id_col).alias("_id"),
            col(emb_col).cast("array<double>").alias("_ed"),
        ).persist()
    )
    init = base.orderBy("_id").limit(ksub).collect()
    # codebooks[i][j] = centroid j of subspace i (cid ≡ list index)
    cbs: list[list[list[float]]] = [
        [[float(v) for v in r._ed[i * sub : (i + 1) * sub]] for r in init]
        for i in range(m)
    ]
    staged = base.withColumn("_pid", F.spark_partition_id())

    for _ in range(max_iter):
        cents = [[list(map(float, c)) for c in cb] for cb in cbs]
        sq_norms = [[_sq_norm(c) for c in cb] for cb in cents]

        def gen(batches):
            import numpy as np

            acc_n = np.zeros((m, ksub), dtype="int64")
            acc_s = np.zeros((m, ksub, sub))
            pid = -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["_pid"].iloc[0])
                mat = np.stack(pdf["_ed"].to_numpy()).astype(np.float64, copy=False)
                n = mat.shape[0]
                for i in range(m):
                    e = mat[:, i * sub : (i + 1) * sub]
                    best_d = np.full(n, np.inf)
                    best_i = np.zeros(n, dtype="int64")
                    for idx, (cent, sq) in enumerate(zip(cents[i], sq_norms[i])):
                        acc = e[:, 0] * cent[0]
                        for j in range(1, sub):
                            acc = acc + e[:, j] * cent[j]
                        d = sq - 2.0 * acc
                        take = d < best_d
                        best_d = np.where(take, d, best_d)
                        best_i = np.where(take, idx, best_i)
                    for cid in range(ksub):
                        msk = best_i == cid
                        c = int(msk.sum())
                        if c:
                            acc_n[i, cid] += c
                            acc_s[i, cid] += e[msk].sum(axis=0)
            if pid < 0:
                return
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "sp": [i for i in range(m) for _ in range(ksub)],
                    "cid": [cid for _ in range(m) for cid in range(ksub)],
                    "n": acc_n.reshape(-1),
                    "s": [
                        acc_s[i, cid].tolist()
                        for i in range(m)
                        for cid in range(ksub)
                    ],
                }
            )

        rows = staged.mapInPandas(
            gen, "pid int, sp int, cid int, n long, s array<double>"
        ).collect()
        for i in range(m):
            folded: dict[int, tuple[int, list[float]]] = {}
            for r in sorted(
                (r for r in rows if r.sp == i), key=lambda r: (r.cid, r.pid)
            ):
                nn, s = folded.get(r.cid, (0, [0.0] * sub))
                folded[r.cid] = (nn + int(r.n), [a + b for a, b in zip(s, r.s)])
            new_cb = []
            for cid, old in enumerate(cbs[i]):
                nn, s = folded.get(cid, (0, []))
                # empty cluster keeps its centroid (kmeans_fit parity)
                new_cb.append([v / nn for v in s] if nn else old)
            cbs[i] = new_cb
    base.unpersist()
    return cbs


def pq_encode(
    df: DataFrame, emb_col: str, codebooks: list[list[list[float]]]
) -> DataFrame:
    """Append ``pq_code`` (array<int>, length M): per-subspace nearest
    centroid. One Arrow pass, no shuffle."""
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    cents = [[list(map(float, c)) for c in cb] for cb in codebooks]
    m = len(cents)
    sub = len(cents[0][0])

    from .ivf import _sq_norm

    sq_norms = [[_sq_norm(c) for c in cb] for cb in cents]

    @pandas_udf("array<int>")
    def _encode(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        n = mat.shape[0]
        codes = np.empty((n, m), dtype="int32")
        for i in range(m):
            e = mat[:, i * sub : (i + 1) * sub]  # n × sub
            # |e−c|² argmin ≡ (|c|² − 2⟨e,c⟩) argmin, dot walked in
            # dimension order (same IEEE op sequence as the oracle's
            # list_reduce fold; ties → lowest code, like row_number)
            best_d = np.full(n, np.inf)
            best_j = np.zeros(n, dtype="int32")
            for j, cent in enumerate(cents[i]):
                acc = e[:, 0] * cent[0]
                for dd in range(1, sub):
                    acc = acc + e[:, dd] * cent[dd]
                d = sq_norms[i][j] - 2.0 * acc
                take = d < best_d
                best_d = np.where(take, d, best_d)
                best_j = np.where(take, np.int32(j), best_j).astype("int32")
            codes[:, i] = best_j
        return pd.Series(list(codes))

    return df.withColumn("pq_code", _encode(col(emb_col)))


def adc_lut(q_vec: list[float], codebooks: list[list[list[float]]]) -> list[list[float]]:
    """Per-query lookup table: LUT[m][j] = |q_sub(m) − c_mj|², each
    entry a sequential dimension-order fold (oracle IEEE parity)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    q = [float(v) for v in q_vec]
    lut = []
    for i in range(m):
        qs = q[i * sub : (i + 1) * sub]
        row = []
        for cent in codebooks[i]:
            acc = 0.0
            for dd in range(sub):
                diff = float(cent[dd]) - qs[dd]
                acc = acc + diff * diff
            row.append(acc)
        lut.append(row)
    return lut


def adc_score(encoded: DataFrame, lut: list[list[float]]) -> DataFrame:
    """Append ``adc_dist``: Σ_m LUT[m][code[m]] — M lookups per row,
    vectorized across the Arrow batch. No float math touches the
    vectors; the scan can read ONLY the code column (4 B/row)."""
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(encoded.sparkSession)
    table = [list(map(float, row)) for row in lut]

    @pandas_udf("double")
    def _score(codes: pd.Series) -> pd.Series:
        import numpy as np

        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        lut_m = np.asarray(table)  # M × ksub
        cm = np.stack(codes.to_numpy()).astype("int64")  # n × M
        # subspaces accumulated in index order — the oracle sums the
        # M lut terms left-associatively in the same order
        scores = lut_m[0][cm[:, 0]]
        for i in range(1, lut_m.shape[0]):
            scores = scores + lut_m[i][cm[:, i]]
        return pd.Series(scores)

    return encoded.withColumn("adc_dist", _score(col("pq_code")))


def pq_topk_refined(
    encoded: DataFrame,
    q_vec: list[float],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    refine_factor: int = 4,
) -> DataFrame:
    """ADC shortlist (top refine_factor×k by PQ distance,
    TakeOrderedAndProject) re-ranked by EXACT cosine — the standard
    PQ serving pipeline. Returns (id, label, cosine) like the exact
    top-k queries so recall is directly comparable."""
    shortlist = (
        adc_score(encoded, adc_lut(q_vec, codebooks))
        .orderBy(col("adc_dist").asc(), col(id_col))
        .limit(refine_factor * k)
    )
    return rerank_exact(shortlist, q_vec, k, id_col=id_col, emb_col=emb_col)


def rerank_exact(
    shortlist: DataFrame,
    q_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """The shared serving tail: exact-cosine re-rank of an ADC
    shortlist, float ties broken by id (one place — every PQ variant's
    output semantics stay in lockstep)."""
    from .similarity import cosine_expr

    dim = len(q_vec)
    q_lit = F.array(*[F.lit(float(v)) for v in q_vec]).cast("array<float>")
    return (
        shortlist.withColumn("q_emb", q_lit)
        .select(
            id_col,
            "label",
            cosine_expr(emb_col, "q_emb", dim=dim).alias("cosine"),
        )
        .orderBy(col("cosine").desc(), col(id_col))
        .limit(k)
    )


def with_residual(
    assigned: DataFrame,
    emb_col: str,
    coarse_codebook: list[tuple[int, list[float]]],
    out_col: str = "residual",
) -> DataFrame:
    """Append the coarse residual (vector − its list's centroid) as a
    DOUBLE array — the quantity residual PQ (IVFADC, Jégou et al. 2011
    §III) encodes instead of the raw vector. One Arrow pass; the coarse
    codebook rides the closure. Element-wise float64 subtraction in
    index order — the same arithmetic the SQL oracle's list
    comprehension performs."""
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(assigned.sparkSession)
    cents = {cid: [float(v) for v in cent] for cid, cent in coarse_codebook}

    def batches(it):
        import numpy as np

        for pdf in it:
            if len(pdf) == 0:
                continue
            mats = np.stack(pdf[emb_col].to_numpy()).astype(np.float64, copy=False)
            cmat = np.stack([cents[int(c)] for c in pdf["ivf_cid"]])
            res = mats - cmat
            out = pdf.copy()
            out[out_col] = list(res)
            yield out

    import pyspark.sql.types as T

    schema = T.StructType(
        assigned.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    return assigned.mapInPandas(batches, schema=schema)


def residual_luts(
    q_vec: list[float],
    probe_cents: dict[int, list[float]],
    codebooks: list[list[list[float]]],
) -> dict[int, list[list[float]]]:
    """One ADC lookup table per probed list, built from the QUERY
    RESIDUAL against that list's centroid (q − c_L). Driver-side,
    |probe| × M × ksub doubles."""
    out = {}
    for cid, cent in probe_cents.items():
        qres = [float(q) - float(c) for q, c in zip(q_vec, cent)]
        out[cid] = adc_lut(qres, codebooks)
    return out


def adc_score_residual(
    encoded: DataFrame, luts_by_cid: dict[int, list[list[float]]]
) -> DataFrame:
    """Append ``adc_dist`` using the candidate's OWN list's LUT — M
    lookups + a sequential sum per row, vectorized per list within the
    Arrow batch."""
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(encoded.sparkSession)
    table = {int(cid): [list(map(float, row)) for row in lut] for cid, lut in luts_by_cid.items()}

    @pandas_udf("double")
    def _score(cids: pd.Series, codes: pd.Series) -> pd.Series:
        import numpy as np

        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        cm = np.stack(codes.to_numpy()).astype("int64")
        cid_arr = cids.to_numpy()
        scores = np.empty(len(codes), dtype="float64")
        for cid in np.unique(cid_arr):
            lut_m = np.asarray(table[int(cid)])
            msk = cid_arr == cid
            sub = cm[msk]
            s = lut_m[0][sub[:, 0]]
            for i in range(1, lut_m.shape[0]):
                s = s + lut_m[i][sub[:, i]]
            scores[msk] = s
        return pd.Series(scores)

    return encoded.withColumn("adc_dist", _score(col("ivf_cid"), col("pq_code")))
