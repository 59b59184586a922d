"""Deterministic sampling — hash-based, seed-stable, resume-safe.

The reference's sampling family (SURVEY.md §2.6: take_random_sample,
perform_random_pxl_sample_in_mask, split_sample_hdf5_file,
create_train_test_smpls …) is pseudo-random with a seed. At cluster
scale a *hash* of the row key is the right primitive instead: the
sample is a pure function of the data, independent of partitioning,
task retries, and executor count — which `df.sample` is not. The same
md5 expression runs in the DuckDB oracle, so sampling is
correctness-gated like every other operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, n_buckets: int = 16, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the md5 of the key string.

    Uses the first 8 hex chars as an int — identical in any engine with
    md5 + hex parsing (DuckDB: ``('0x' || substr(md5(k),1,8))::BIGINT``).
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def deterministic_sample(
    df: DataFrame, key: Column, fraction_buckets: int, n_buckets: int = 16, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket < fraction_buckets (≈ fraction_buckets /
    n_buckets of the data) — take_random_sample, reproducibly."""
    return df.filter(hash_bucket(key, n_buckets, salt) < fraction_buckets)


def train_test_split(
    df: DataFrame, key: Column, test_buckets: int = 3, n_buckets: int = 10, salt: str = "tt"
):
    """(train, test) split by hash bucket — create_train_test_smpls
    (imageutils/__init__.py:3665+) without RNG state."""
    b = hash_bucket(key, n_buckets, salt)
    return df.filter(b >= test_buckets), df.filter(b < test_buckets)


def stratified_counts(df: DataFrame, strata: str, key: Column, keep_buckets: int = 2,
                      n_buckets: int = 16) -> DataFrame:
    """Per-stratum deterministic subsample then count — histo_sampling
    (rastergis.cpp:2127-2147) shape."""
    return (
        df.filter(hash_bucket(key, n_buckets) < keep_buckets)
        .groupBy(strata)
        .agg(F.count("*").alias("n_sampled"))
    )
