"""Deterministic sampling + distribution-stats operators for a
training-data pipeline.

A training corpus is rarely "all the data": sources are up-/down-weighted
(stratified rates), ablations need reproducible subsets, and mixture
tuning needs per-stratum distribution stats. Spark's built-in
``df.sample`` is seeded per-partition — its output changes with the
partitioning, so a repartitioned rerun silently yields a different corpus.
These operators key every decision off a content-stable hash of the row
id, so the same row gets the same verdict on any cluster layout, any
partition count, any engine (the md5 scheme is recomputable in ANSI SQL —
the DuckDB oracle runs the identical expression).

Scale notes: hash sampling is a pure per-row filter — no shuffle, no
state, pushes through scans; at 100 TB it is bandwidth-bound and
embarrassingly parallel. Decile stats shuffle once by stratum; a single
giant stratum serializes its sort into one task, so at extreme skew you
would switch the ntile to a two-phase approx-quantile cut — kept exact
here because exactness is what the oracle certifies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sample_key_col", "hash_sample", "stratified_hash_sample",
           "stratum_decile_stats", "top_k_per_stratum",
           "temperature_resample"]

# rate quantum: rates are floored to k/65536 so the keep decision is an
# exact 4-hex-digit string comparison (portable to any SQL engine — no
# hex→int conversion, no float thresholds)
_RATE_DENOM = 1 << 16


def sample_key_col(id_col: Column, salt: str = "sample") -> Column:
    """The first 4 hex digits of md5(salt ':' id) — a uniform U(0, 65535)
    draw that is a pure function of the row identity, never the layout."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 4
    )


def _threshold_hex(rate: float) -> str:
    """rate (0 <= rate <= 1) as the exclusive 4-hex-digit upper bound.
    rate=1.0 (keep the whole stratum — a standard mixture weight) maps
    to 'g', which every 4-hex-digit key sorts below, so the comparison
    stays a plain string '<' with no special-casing at the call sites."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    if rate == 1.0:
        return "g"
    return format(int(rate * _RATE_DENOM), "04x")


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic uniform sample: keep rows whose sample key falls
    below the rate threshold. Same id → same verdict, independent of
    partitioning, ordering, or engine (unlike DataFrame.sample)."""
    return df.where(
        sample_key_col(F.col(id_col), salt) < F.lit(_threshold_hex(rate))
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting step of
    a corpus build (e.g. keep 75%% of a high-quality source, 25%% of a
    noisy one). ``rates`` maps stratum value → keep rate; strata not
    listed get ``default_rate``. The threshold is a broadcast-free CASE
    expression, so the whole operator stays a scan-level filter."""
    thr: Column = F.lit(_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_threshold_hex(rate))
        ).otherwise(thr)
    return df.where(sample_key_col(F.col(id_col), salt) < thr)


def top_k_per_stratum(
    df: DataFrame,
    stratum_col: str,
    order_cols: list[Column],
    k: int,
) -> DataFrame:
    """Per-stratum quota: keep the top-k rows of each stratum under the
    given (deterministic, total) ordering — the per-domain/per-source cap
    every corpus build applies so no single origin dominates the mixture.
    Adds a ``quota_rank`` column (1-based).

    One shuffle by stratum; rank is a row_number window, so per-stratum
    state is O(1) and the cap streams. The ordering must be total (break
    ties with the id column) or the kept set is engine-dependent."""
    w = Window.partitionBy(stratum_col).orderBy(*order_cols)
    return (
        df.withColumn("quota_rank", F.row_number().over(w).cast("long"))
        .where(F.col("quota_rank") <= k)
    )


def stratum_decile_stats(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Exact per-stratum n-tile distribution stats of a numeric column —
    the corpus-shape readout mixture tuning reads (length deciles per
    source, etc.). Ties are broken by id so the tiling is a deterministic
    total order (ntile over a non-total order is engine-dependent).
    Output: (stratum, tile, n_rows, min_val, max_val)."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(stratum_col).alias("stratum"),
            F.col(value_col).alias("v"),
            F.ntile(n_tiles).over(w).cast("long").alias("tile"),
        )
        .groupBy("stratum", "tile")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("v").alias("min_val"),
            F.max("v").alias("max_val"),
        )
    )


def temperature_resample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based mixture resampling — the multilingual/source
    rebalancing step (sampling share of stratum s ∝ count_s^alpha):
    alpha=1 keeps the natural distribution, alpha=0 flattens every
    stratum to the rarest one's size, 0.5 is the usual compromise.

    Per-stratum keep rate r_s = (c_min / c_s)^(1-alpha), quantized to the
    same 16-bit hash-key scheme as the fixed-rate samplers, with the
    rates derived IN the plan from the stratum counts (one tiny agg,
    broadcast back) — so the operator is reproducible on any layout and
    recomputable by the SQL oracle end-to-end, counts included.

    alpha is restricted to {0, 0.25, 0.5, 0.75, 1}: the exponent is then
    a composition of IEEE-exact sqrt/multiply/divide (x^0.75 =
    sqrt(x)·sqrt(sqrt(x))), so Spark, DuckDB, and any IEEE-754 engine
    quantize to identical thresholds — a libm pow() would not be
    correctly rounded and could differ in the last ulp right at a
    quantization boundary.

    Keeps all original columns plus ``keep_thr_q`` (the stratum's
    quantized threshold, 65536 = keep everything)."""
    expo = 1.0 - alpha
    ratio = F.col("_cmin").cast("double") / F.col("_c").cast("double")
    if expo == 0.0:
        r = F.lit(1.0)
    elif expo == 0.25:
        r = F.sqrt(F.sqrt(ratio))
    elif expo == 0.5:
        r = F.sqrt(ratio)
    elif expo == 0.75:
        r = F.sqrt(ratio) * F.sqrt(F.sqrt(ratio))
    elif expo == 1.0:
        r = ratio
    else:
        raise ValueError(
            f"alpha must be one of 0, 0.25, 0.5, 0.75, 1 (got {alpha}); "
            "other exponents are not IEEE-exactly portable across engines"
        )
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_c"))
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    dim = counts.crossJoin(F.broadcast(cmin)).select(
        F.col(stratum_col).alias("_stratum"),
        F.least(F.floor(r * _RATE_DENOM), F.lit(_RATE_DENOM))
        .cast("long")
        .alias("keep_thr_q"),
    )
    key = sample_key_col(F.col(id_col), salt)
    # null-safe join: groupBy counts a NULL stratum as its own group, so
    # NULL-stratum rows must match their threshold row too (a plain
    # equi-join would silently drop them — breaking "alpha=1 keeps
    # everything")
    return (
        df.join(
            F.broadcast(dim),
            F.col(stratum_col).eqNullSafe(F.col("_stratum")),
        )
        .drop("_stratum")
        .where(
            (F.col("keep_thr_q") >= _RATE_DENOM)
            | (key < F.format_string("%04x", F.col("keep_thr_q")))
        )
    )
