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


# Self-arming prefilter policy (VERDICT r2 #4): a stratum only gets a
# prefilter when it is big enough for the window sort to hurt AND the
# quota is small relative to it. The margin keeps expected survivors
# at MARGIN×n so undershoot (fewer than n survivors) is rare; an
# exactness check repairs the rare misses, so results are ALWAYS
# identical to the unprefiltered draw.
PREFILTER_MARGIN = 8
AUTO_PREFILTER_MIN_STRATUM = 100_000


def _rank_quota(df: DataFrame, strata_col: str, key_col: str, n: int) -> DataFrame:
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )


def stratified_quota(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    prefilter_fraction: Optional[float] = None,
    stratum_counts: Optional[dict] = None,
    auto_prefilter: bool = True,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, drawn uniformly by
    the key hash — byte-identical to ranking the WHOLE stratum, by
    construction (see below), whatever prefilter path runs.

    Mega-strata are the skew hazard: the window sorts a whole stratum
    in one task, so a 10^9-row stratum with a 20-row quota would sort
    10^9 rows for 20. The defense is a hash prefilter that is a
    *prefix of the ranking order*: the window orders by md5(key), and
    ``hash_sample`` keeps exactly the rows whose md5 16-bit prefix
    falls below a threshold — a downward-closed set in that order —
    so as long as a stratum keeps ≥ its quota, the top-n of the
    survivors IS the top-n of the stratum.

    * ``prefilter_fraction`` — explicit caller-set rate (legacy knob).
    * otherwise, when ``auto_prefilter`` (the default): per-stratum
      rates arm themselves at MARGIN·n/|stratum| for strata over
      AUTO_PREFILTER_MIN_STRATUM rows, from ``stratum_counts``
      (caller-supplied counters, e.g. manifest/partition stats) or one
      cheap count-by-stratum scan. Strata are data-mixing keys
      (source/language/domain — driver-sized cardinality by
      assumption). Undershot strata (survivors < quota, probability
      ≈ Poisson(MARGIN·n < n) per stratum) are detected by a
      survivor-count check and re-ranked without the prefilter, so
      exactness never depends on luck.

    EAGER-JOB WARNING: unlike a plain transformation, the default
    ``auto_prefilter=True`` path runs up to TWO Spark jobs at
    plan-build time — a groupBy().count() over `df` when
    ``stratum_counts`` is not supplied, and the exactness-check
    collect over the (cheap, prefiltered) plan — and the returned
    plan is recomputed on the caller's action. Callers that need a
    lazy plan should pass ``auto_prefilter=False`` (or precomputed
    ``stratum_counts``, which removes the count scan). All
    expressions are deterministic, so the recomputation on action is
    byte-identical to what the check job saw.

    NULL strata are supported: they never arm a prefilter and are
    never dropped by the repair splice (null-safe predicates
    throughout).
    """
    if prefilter_fraction is not None:
        return _rank_quota(
            hash_sample(df, key_col, prefilter_fraction),
            strata_col, key_col, n_per_stratum,
        )
    if not auto_prefilter:
        return _rank_quota(df, strata_col, key_col, n_per_stratum)

    if stratum_counts is None:
        stratum_counts = {
            r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
        }
    # NULL strata never arm: a None key can't survive the broadcast
    # equi-join (NULL != NULL) or the isin() exactness/repair splices
    # under three-valued logic, so NULL-stratum rows route AROUND the
    # prefilter entirely (they pass the _thr16-isNull branch below and
    # are ranked like any small stratum).
    armed = {
        s: min(1.0, PREFILTER_MARGIN * n_per_stratum / c)
        for s, c in stratum_counts.items()
        if s is not None
        and c >= AUTO_PREFILTER_MIN_STRATUM
        and PREFILTER_MARGIN * n_per_stratum < c
    }
    if not armed:
        return _rank_quota(df, strata_col, key_col, n_per_stratum)

    spark = df.sparkSession
    from pyspark.sql import types as T

    # fresh StructType (StructType.add mutates cached schemas)
    thr_schema = T.StructType(
        [
            T.StructField(strata_col, df.schema[strata_col].dataType),
            T.StructField("_thr16", T.LongType()),
        ]
    )
    thr = spark.createDataFrame(
        [(s, int(round(f * 65536))) for s, f in armed.items()], thr_schema
    )
    pre = (
        df.join(F.broadcast(thr), strata_col, "left")
        .where(
            F.col("_thr16").isNull()
            | (_hash16(F.col(key_col)) < F.col("_thr16"))
        )
        .drop("_thr16")
    )
    kept = _rank_quota(pre, strata_col, key_col, n_per_stratum)

    # exactness check over the armed strata only: each must keep
    # min(n, |stratum|) rows. The check job runs on the PREFILTERED
    # plan (cheap); deterministic expressions make the recomputation
    # on return identical.
    got = {
        r[0]: r[1]
        for r in kept.where(F.col(strata_col).isin(list(armed)))
        .groupBy(strata_col)
        .count()
        .collect()
    }
    short = [
        s
        for s in armed
        if got.get(s, 0) < min(n_per_stratum, stratum_counts[s])
    ]
    if not short:
        return kept
    # rare undershoot: re-rank just the short strata without the
    # prefilter and splice them back in. `short` never contains None
    # (armed excludes it), but `kept` can contain NULL-stratum rows:
    # ~isin(short) is NULL for them under three-valued logic, so the
    # splice must coalesce to True or every NULL-stratum row vanishes.
    repair = _rank_quota(
        df.where(F.col(strata_col).isin(short)),
        strata_col, key_col, n_per_stratum,
    )
    keep_pred = F.coalesce(~F.col(strata_col).isin(short), F.lit(True))
    return kept.where(keep_pred).unionByName(repair)


# --------------------------------------------------------------------
# Temperature mixture sampling — the data-mixing staple (Pile /
# LLaMA-style source re-weighting): small high-quality sources are
# UP-sampled relative to their raw share, huge crawl dumps DOWN-
# sampled, by flattening the source distribution with a temperature
# before drawing per-source Bernoulli rates.
#
# Exact-reproducibility protocol (so the draw is DuckDB-oracle-
# checkable like every other sample here): the temperature is fixed
# at tau = 0.5 and the reweighting uses INTEGER arithmetic end to
# end —
#     w_s   = isqrt(n_s)                    (integer sqrt = n_s^0.5)
#     S     = sum_s w_s                     (exact integer)
#     thr_s = min(65536, (65536 * target_rows * w_s) // (S * n_s))
#     keep row <=> md5-prefix16(key) < thr_s
# floor(ieee_sqrt(n)) == isqrt(n) for n < 2^52 (sqrt is correctly
# rounded and the nearest half-ulp cannot cross an integer below
# 2^26), so a SQL engine reproduces w_s exactly; everything after is
# integer division. Fractional-temperature generalizations need
# transcendental pow whose last-ulp differs across libms — a float
# threshold can then flip by one — so they are deliberately out of
# the gated protocol (pass precomputed `rates` for arbitrary mixes).
#
# Plan shape: one tiny eager groupBy(source).count() when counts are
# not supplied (driver-sized source cardinality — same documented
# assumption as stratified_quota), then a PURE NARROW literal-map
# filter: zero shuffles, pushes to the scan, stable under
# repartitioning/appends. NULL-source rows draw rate 0 (the oracle's
# inner join on source drops them identically).
# --------------------------------------------------------------------

MIXTURE_HASH_SPACE = 65536


def mixture_thresholds(
    source_counts: dict, target_rows: int
) -> dict:
    """Per-source 16-bit keep thresholds under the integer tau=0.5
    protocol (see block comment). Exact integer arithmetic; the SQL
    mirror needs 65536 * target_rows * isqrt(max_n) < 2^63."""
    import math

    weights = {
        s: math.isqrt(n) for s, n in source_counts.items() if s is not None
    }
    total_w = sum(weights.values())
    if total_w == 0:
        return {s: 0 for s in weights}
    return {
        s: min(
            MIXTURE_HASH_SPACE,
            (MIXTURE_HASH_SPACE * target_rows * w)
            // (total_w * source_counts[s]),
        )
        for s, w in weights.items()
    }


def mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    target_rows: int = 10_000,
    source_counts: Optional[dict] = None,
) -> DataFrame:
    """Deterministic temperature-0.5 mixture sample of ~target_rows
    rows: per-source keep rates flatten the source distribution
    (rate_s proportional to isqrt(n_s)/n_s, capped at 1), each row
    kept iff its md5 hash falls under its source's threshold.

    Eager when `source_counts` is None: runs one groupBy().count()
    job at plan-build time (like stratified_quota's auto path).
    Returns all original columns; NULL-source rows are dropped.
    """
    if source_counts is None:
        source_counts = {
            r[0]: r[1] for r in df.groupBy(source_col).count().collect()
        }
    thr = mixture_thresholds(source_counts, target_rows)
    if not thr:
        return df.where(F.lit(False))
    mapping = F.create_map(
        *[x for s, t in thr.items() for x in (F.lit(s), F.lit(t))]
    )
    return df.where(
        _hash16(F.col(key_col))
        < F.coalesce(mapping[F.col(source_col)], F.lit(0))
    )




def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement — Efraimidis & Spirakis
    2006 ("Weighted random sampling with a reservoir", public paper):
    each row draws a uniform u and keys on u^(1/w); the k largest keys
    are a weighted-without-replacement sample. Equivalently (and
    monotonically) the k SMALLEST values of -ln(u)/w, which is the
    form used here because it quantizes cleanly.

    Deterministic cross-engine protocol (the lm_logloss precedent):
    u = (hash16(key)+1)/65537 — an exact rational in (0,1) from the
    md5-prefix16 draw every sampler in this module uses — and the
    sort key is floor(-1e6 * ln(u) / w) in integer micro-nats, ties
    broken by key. ln of an exact small rational agrees across
    engines to ~1 ulp, so the floor bucket is stable in practice and
    the winner set hash-gates against DuckDB.

    Plan shape: one narrow projection + orderBy(limit k) — Spark
    compiles it to TakeOrderedAndProject (per-task top-k heaps, only
    k rows per partition reach the driver-side merge); the corpus is
    never globally sorted. Zero weight means never sampled (+inf key
    → bottom of the order); weights must be non-negative."""
    u_num = _hash16(F.col(key_col)) + F.lit(1)  # 1..65536
    w = F.col(weight_col).cast("double")
    key_micro = F.when(
        w > 0,
        F.floor(
            F.lit(-1_000_000.0)
            * F.log(u_num.cast("double") / F.lit(65537.0))
            / w
        ).cast("long"),
    )
    return (
        df.withColumn("sample_key_micro", key_micro)
        .filter(F.col("sample_key_micro").isNotNull())
        .orderBy(F.col("sample_key_micro").asc(), F.col(key_col).asc())
        .limit(int(k))
    )

__all__ = ["weighted_sample", "hash_sample", "stratified_quota", "mixture_sample",
           "mixture_thresholds"]

