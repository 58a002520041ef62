"""Deterministic sampling operators for training-data mixing.

A 100 TB corpus is never trained on whole: pipelines draw per-source /
per-language quotas ("data mixing") and reproducibility demands the
draw be a pure function of the data, not of partition layout or RNG
state. Both operators here key on md5 of the row id — a uniform,
engine-portable hash (any SQL engine reproduces it byte-for-byte, so
every sample is DuckDB-oracle-checkable) — and are single-pass:

* hash_sample       — Bernoulli-style fraction sampling: keep rows
                      whose md5-prefix falls below the fraction
                      threshold. A pure narrow filter — pushes into
                      the scan, no shuffle, no state; the sample is
                      stable under repartitioning, appends, and
                      re-runs (unlike DataFrame.sample, whose draw
                      depends on partition iteration order).
* stratified_quota  — exactly-n-per-stratum sampling: rank rows
                      within each stratum by their hash and keep the
                      first n. One shuffle on the stratum key; the
                      md5 rank makes the quota a uniform random (but
                      deterministic) draw rather than "first n in
                      storage order". Mega-strata skew the window
                      sort at scale — for quotas << stratum size the
                      hash_sample prefilter (rate ≈ 4·n/|stratum|)
                      bounds each partition's sort input first.

Spark's built-in `df.sample`/`sampleBy` are O(1)-state too but seed
their RNG per partition split — adding or compacting files changes
the sample. Hash sampling is the reproducible-pipeline answer
(cf. the standard content-keyed sharding trick used for train/test
splits), which is why it is the engine's default.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash16(key: Column) -> Column:
    """First 16 bits of md5(key) as an integer in [0, 65536). md5 (not
    xxhash64/crc32) so any SQL engine reproduces the draw."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep ≈`fraction` of rows, chosen by the key's md5 prefix.
    Deterministic, order-independent, scan-pushable (a narrow filter
    over a per-row expression — zero shuffles)."""
    threshold = int(round(fraction * 65536))
    return df.where(_hash16(F.col(key_col)) < F.lit(threshold))


def stratified_quota(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    prefilter_fraction: Optional[float] = None,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, drawn uniformly by
    the key hash. `prefilter_fraction` applies hash_sample first so a
    mega-stratum's window sorts only the expected survivors (set it to
    ~4·n/|stratum| when quotas are tiny relative to strata)."""
    if prefilter_fraction is not None:
        df = hash_sample(df, key_col, prefilter_fraction)
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


__all__ = ["hash_sample", "stratified_quota"]
