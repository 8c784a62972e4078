"""Arrow-vectorized twins of the ``functions/hashing.py`` primitives.

The expression pairs in ``hashing.py`` are the cross-engine *spec*: the
DuckDB side runs in every oracle, and the Spark side is provably
value-identical to it (tests/test_cross_engine.py). But Spark evaluates
higher-order functions (``transform``/``aggregate``) in interpreted
mode — no whole-stage codegen — so per-char polynomial folds cost
~100× a codegen expression per row, and profiling shows shingle/token
staging dominating every dedup query (sf0.1: ~2.1s of a 2.4s
n-gram-Jaccard extraction stage).

These pandas_udfs compute the SAME values through Arrow + numpy:

- one ``utf-32-le`` encode turns a whole batch's strings into a flat
  code-point array (``ascii()`` ≡ ``ord()`` ≡ utf-32 code unit);
- the polynomial fold ``(acc * a + c) % (2^31-1)`` runs as ragged
  vectorized int64 arithmetic (a congruence — step order and mod points
  match the SQL fold exactly, and every intermediate stays < 2^41, far
  from int64 overflow);
- per-document minima use ``np.minimum.reduceat`` over the batch's
  shingle segments.

Bit-identity with the expression path is asserted by
tests/test_arrow_text.py on the real ``documents`` table, so the DuckDB
oracles are unchanged. This is the sanctioned slow-path escape hatch:
Arrow-batched vectorized UDFs, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf

from .hashing import MERSENNE_31, take_seeds


def _tokens(text: str, lowered: bool = False) -> list[str]:
    """Python twin of hashing.tokens: lower-cased space tokens, empties
    dropped (``str.split(' ')`` keeps empty fragments exactly like
    Spark/DuckDB ``split``, then we filter — same derivation)."""
    base = text if lowered else text.lower()
    return [t for t in base.split(" ") if t]


def _shingles(toks: list[str], n: int) -> list[str]:
    """Python twin of hashing.shingles: word n-grams joined by ' ';
    a doc shorter than ``n`` tokens yields its single partial shingle
    (``slice(st, 1, n)`` ≡ ``toks[0:n]``)."""
    m = max(len(toks) - n + 1, 1)
    return [" ".join(toks[i : i + n]) for i in range(m)]


def _flat_codes(strings: list[str]):
    """Flatten a batch of strings into (codes, starts, lens) numpy
    arrays via ONE utf-32 encode — no per-char Python."""
    import numpy as np

    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=len(strings))
    joined = "".join(strings)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    starts = np.zeros(len(strings), dtype=np.int64)
    if len(strings) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    return codes, starts, lens


def _fold_ragged(codes, starts, lens, a: int, b: int):
    """Vectorized polynomial fold per segment: identical congruence and
    step order to ``aggregate(codes, b, (acc, x) -> (acc*a + x) % M)``.
    Empty segments keep the init ``b`` (≡ fold over an empty array)."""
    import numpy as np

    n = len(starts)
    acc = np.full(n, b, dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    for j in range(maxlen):
        m = lens > j
        acc[m] = (acc[m] * a + codes[starts[m] + j]) % MERSENNE_31
    return acc


def distinct_grams_udf(shingle_len: int):
    """array<string> of DISTINCT word n-grams per document —
    value-identical to ``array_distinct(shingles(tokens(text)))`` (both
    keep first-occurrence order; downstream set semantics don't care)."""

    @pandas_udf("array<string>")
    def _grams(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: None
            if t is None
            else list(dict.fromkeys(_shingles(_tokens(t), shingle_len)))
        )

    return _grams


def band_keys_udf(shingle_len: int, num_bands: int, rows_per_band: int):
    """array<string> of MinHash-LSH band keys per document — twin of
    ``band_keys_from_codes`` over ``shingle_codes``: per seed, min over
    shingles of the char-code fold; per band, '-'-joined consecutive
    signature slots."""
    seeds = take_seeds(num_bands * rows_per_band)

    @pandas_udf("array<string>")
    def _bands(text: pd.Series) -> pd.Series:
        import numpy as np

        docs = [None if t is None else _shingles(_tokens(t), shingle_len) for t in text]
        flat = [s for sh in docs if sh is not None for s in sh]
        if not flat:
            return pd.Series([None if d is None else [] for d in docs], dtype=object)
        counts = np.fromiter(
            (len(sh) for sh in docs if sh is not None), dtype=np.int64
        )
        doc_starts = np.zeros(len(counts), dtype=np.int64)
        if len(counts) > 1:
            np.cumsum(counts[:-1], out=doc_starts[1:])
        codes, starts, lens = _flat_codes(flat)
        # signature slot s, document d → sig[s][d]
        sig = [
            np.minimum.reduceat(_fold_ragged(codes, starts, lens, a, b), doc_starts)
            for a, b in seeds
        ]
        out: list[list[str] | None] = []
        di = 0
        for sh in docs:
            if sh is None:
                out.append(None)
                continue
            out.append(
                [
                    "-".join(
                        str(sig[band * rows_per_band + r][di])
                        for r in range(rows_per_band)
                    )
                    for band in range(num_bands)
                ]
            )
            di += 1
        return pd.Series(out, dtype=object)

    return _bands


def token_hashes_udf(a: int = 131, b: int = 7):
    """array<bigint> of per-token polynomial hashes — twin of
    ``token_hashes(tokens(text))`` (SimHash's staging column)."""

    @pandas_udf("array<bigint>")
    def _th(text: pd.Series) -> pd.Series:
        import numpy as np

        docs = [None if t is None else _tokens(t) for t in text]
        flat = [t for toks in docs if toks is not None for t in toks]
        if not flat:
            return pd.Series([None if d is None else [] for d in docs], dtype=object)
        codes, starts, lens = _flat_codes(flat)
        hashes = _fold_ragged(codes, starts, lens, a, b)
        out: list[list[int] | None] = []
        pos = 0
        for toks in docs:
            if toks is None:
                out.append(None)
                continue
            out.append(hashes[pos : pos + len(toks)].tolist())
            pos += len(toks)
        return pd.Series(out, dtype=object)

    return _th


def distinct_gram_hashes_udf(shingle_len: int, a: int = 131, b: int = 7):
    """array<bigint> of DISTINCT hashed word n-grams per document —
    twin of ``array_distinct(shingle_hashes(shingles(tokens(text))))``
    (decontamination's staging column). Grams are deduped before the
    fold (cheaper) and hashes deduped after it, which is exactly
    ``array_distinct`` over the full hash list: first occurrence wins
    in both steps, and a cross-gram hash collision is removed by the
    second step just as array_distinct would."""

    @pandas_udf("array<bigint>")
    def _gh(text: pd.Series) -> pd.Series:
        docs = [
            None
            if t is None
            else list(dict.fromkeys(_shingles(_tokens(t), shingle_len)))
            for t in text
        ]
        flat = [g for gs in docs if gs is not None for g in gs]
        if not flat:
            return pd.Series([None if d is None else [] for d in docs], dtype=object)
        codes, starts, lens = _flat_codes(flat)
        hashes = _fold_ragged(codes, starts, lens, a, b)
        out: list[list[int] | None] = []
        pos = 0
        for gs in docs:
            if gs is None:
                out.append(None)
                continue
            out.append(list(dict.fromkeys(hashes[pos : pos + len(gs)].tolist())))
            pos += len(gs)
        return pd.Series(out, dtype=object)

    return _gh
