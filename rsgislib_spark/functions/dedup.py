"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
phash near-dup (images).

Scale shapes:
 - exact / fingerprint: hash → groupBy (one shuffle on a short hash key).
 - MinHash+LSH: tokens explode → per-(doc, seed) min-hash agg → band
   signatures → self-join on (band, signature) — the classic
   shingle→minhash→band→bucket-join pipeline; candidate pairs only, the
   exact Jaccard verify joins back token sets for candidates only.
 - SimHash: vectorized pandas UDF (bit-majority over token hashes),
   bucket by hash prefix bands for candidate pairing.
 - phash: Hamming-ball grouping over the int64 phash column via 4-band
   exact-match blocking (any near-dup within radius r<=k bits shares at
   least one of k+1 bands — pigeonhole).

MinHash here uses md5-based hash functions (``min(md5(token || seed))``
lexicographically) so the DuckDB oracle can recompute signatures
byte-identically.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DEFAULT_SEEDS = 4  # 2 bands × 2 rows
DEFAULT_BANDS = 2


def doc_tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc, token) pairs, whitespace tokenization."""
    return (
        df.select(id_col, F.explode(F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))).alias("token"))
        .distinct()
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: md5(text) groups; canonical = min id per group."""
    h = df.select(id_col, F.md5(F.col(text_col)).alias("text_hash"))
    return h.groupBy("text_hash").agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("group_size"),
    )


def minhash_signatures(
    tokens: DataFrame, n_seeds: int = DEFAULT_SEEDS, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc MinHash signature columns mh_0..mh_{n-1} (md5-min hashes)."""
    aggs = [
        F.min(F.md5(F.concat(F.col("token"), F.lit(f"#seed{s}")))).alias(f"mh_{s}")
        for s in range(n_seeds)
    ]
    return tokens.groupBy(id_col).agg(*aggs)


def minhash_band_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_seeds: int = DEFAULT_SEEDS,
    n_bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band signature."""
    rows = n_seeds // n_bands
    sig = minhash_signatures(doc_tokens(df, id_col, text_col), n_seeds, id_col)
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        bands.append(
            sig.select(
                F.col(id_col), F.lit(b).alias("band"), F.concat(*cols).alias("sig")
            )
        )
    band_df = bands[0]
    for b in bands[1:]:
        band_df = band_df.unionByName(b)
    a = band_df.alias("a")
    bb = band_df.alias("b")
    return (
        a.join(bb, ["band", "sig"], "inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-set Jaccard over all pairs via token inverted index:
    explode → self-join on token → |A∩B| counts → sizes join → filter.

    At scale this runs AFTER LSH blocking (candidates only); standalone it
    is the verify stage of the dedup pipeline.
    """
    toks = doc_tokens(df, id_col, text_col)
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, "token")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("nb"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (bit-majority of token hash vectors) —
    vectorized pandas UDF (bit unpack not expressible in builtins)."""

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            acc = np.zeros(64, dtype=np.int64)
            for tok in set((t or "").split()):
                hv = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big", signed=False
                )
                bits = (hv >> np.arange(64, dtype=np.uint64)) & 1
                acc += np.where(bits.astype(bool), 1, -1)
            h = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    h |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(h.astype(np.uint64).view(np.int64))
        return pd.Series(out)

    return df.select(id_col, _simhash(F.col(text_col)).alias("simhash"))


def phash_near_dups(images: DataFrame, id_col: str = "image_id", max_bits: int = 3) -> DataFrame:
    """Image near-dup candidate pairs by 4-band phash blocking.

    Any pair within Hamming distance <= 3 shares at least one of 4
    16-bit bands (pigeonhole); exact Hamming verify runs on candidates.
    """
    bands = []
    for b in range(4):
        bands.append(
            images.select(
                id_col,
                "phash",
                F.lit(b).alias("band"),
                (F.shiftrightunsigned(F.col("phash"), b * 16).bitwiseAND(F.lit(0xFFFF))).alias("sig"),
            )
        )
    band_df = bands[0]
    for b in bands[1:]:
        band_df = band_df.unionByName(b)
    a, bb = band_df.alias("a"), band_df.alias("b")
    cand = (
        a.join(bb, ["band", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_bits)
        .select("id_a", "id_b", "hamming")
    )
