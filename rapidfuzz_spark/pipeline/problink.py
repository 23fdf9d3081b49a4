"""Fellegi-Sunter probabilistic record linkage with EM-estimated
parameters — the classic unsupervised ER scorer (Fellegi & Sunter 1969;
the method behind Splink), built Spark-first:

1. ``comparison vectors``: each candidate pair gets a small tuple of
   discrete per-field agreement levels (gamma), computed MAP-SIDE from
   the pair row (exact equality, banded numeric closeness, or a
   thresholded rapidfuzz similarity — the same 6-dp-rounded kernels the
   rest of the pipeline scores with).
2. ``pattern_counts``: the corpus-sized pair stream collapses to one row
   per distinct gamma pattern via a partial-agg-friendly groupBy — at
   most ``prod(n_levels)`` rows (e.g. 3x2x3 = 18), a model-sized
   constant regardless of corpus size. This is the ONLY shuffle the
   estimator ever does, and it shuffles almost nothing.
3. ``em_fit``: expectation-maximization over the *pattern table* (never
   the pairs — every pair with the same gamma has the same
   responsibility, so EM on pattern counts is exact, not an
   approximation). The table is driver-collected under the repo's
   bounded-collect contract (like the IVF centroid seed) and iterated
   in plain Python with engine-replayable arithmetic: every
   responsibility, weighted sum, and probability is rounded to 6 dp
   half-away-from-zero at a defined point, so DuckDB replays the whole
   fit bit-for-bit as generated SQL CTEs (see ``fs_em_linkage`` oracle
   in ``__spark_entry__``). Only IEEE-exact ops (*, /, +) touch the
   numbers between roundings — no log/exp, whose libm rounding differs
   across engines.
4. ``posterior scoring``: the fitted (lambda, m, u) go back as plan
   literals; each pair's match posterior
   ``lam*K_m / (lam*K_m + (1-lam)*K_u)`` (K = the conditional-
   independence product of per-field level probabilities) is one
   codegen CASE-product projection — zero shuffle, zero Python.

Plan shape at 100 TB: one pass over the pairs for the pattern census
(collapsing map-side to <= prod(n_levels) rows per task), one map-side
scoring pass. Callers who can't afford re-deriving the pair stream
twice pass ``cache_pairs=True`` (lazy localCheckpoint, same pattern as
training_export / perplexity_buckets).

No reference counterpart (rapidfuzz-rs scores strings, it does not fit
linkage models); cited for semantics: Fellegi & Sunter (JASA 1969),
Winkler (1988) on EM for the latent-class model.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic, data-independent EM starting points per level count:
# the top level is presumed likely under a match and rare under a
# non-match, mirrored for level 0. Literals, so the SQL replay can
# inline them.
_INIT = {
    2: ((0.1, 0.9), (0.9, 0.1)),
    3: ((0.05, 0.15, 0.8), (0.7, 0.25, 0.05)),
}

_CLAMP_LO, _CLAMP_HI = 1e-6, 0.999999


def _r6(x: float) -> float:
    """Round half-away-from-zero to 6 dp — the same policy Spark and
    DuckDB ``round(x, 6)`` apply, unlike Python's banker's ``round``."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _clamp(x: float) -> float:
    return min(max(x, _CLAMP_LO), _CLAMP_HI)


# ---------------------------------------------------------------- gammas


def similarity_level(sim: Column, hi: float, lo: float) -> Column:
    """3-level agreement from a similarity column: 2 when the 6-dp
    rounded score >= hi, 1 when >= lo, else 0 (NULL scores -> 0)."""
    r = F.round(sim, 6)
    return (
        F.when(r >= hi, F.lit(2))
        .when(r >= lo, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


def exact_level(a: Column, b: Column) -> Column:
    """2-level agreement: 1 on equality, 0 otherwise (NULLs -> 0, the
    conservative Fellegi-Sunter convention for missing fields)."""
    return F.when(a == b, F.lit(1)).otherwise(F.lit(0)).cast("int")


def numeric_band_level(a: Column, b: Column, hi: float, lo: float) -> Column:
    """3-level banded numeric closeness: 2 when |a-b| <= hi, 1 when
    <= lo, else 0 (NULLs -> 0). Subtraction/abs are IEEE-exact, so the
    level is engine-reproducible without rounding."""
    d = F.abs(a - b)
    return (
        F.when(d <= hi, F.lit(2))
        .when(d <= lo, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


# --------------------------------------------------------------- EM core


def pattern_counts(pairs: DataFrame, gamma_cols: list) -> DataFrame:
    """One row per distinct gamma pattern with its pair count — the
    sufficient statistic for the whole EM fit. Partial aggregation
    collapses each task to <= prod(n_levels) rows before the (tiny)
    shuffle."""
    return pairs.groupBy(*gamma_cols).count()


def em_fit(
    patterns: dict,
    n_levels: list,
    iters: int = 3,
    lam0: float = 0.05,
) -> tuple:
    """Fit (lambda, m, u) by ``iters`` EM rounds over
    ``patterns: {gamma tuple: count}``.

    m[f][l] = P(gamma_f = l | match), u[f][l] = P(gamma_f = l |
    non-match), lambda = P(match), under conditional independence of
    fields given the class. Fixed iteration count + 6-dp half-away-
    from-zero rounding at every defined point (responsibilities, the
    per-pattern weighted counts, the probability quotients, lambda)
    keep the fit deterministic and replayable in SQL; probabilities
    clamp to [1e-6, 0.999999] AFTER rounding so a level never observed
    keeps a floor instead of zeroing every downstream product.

    Sum-order note: weighted counts are rounded per pattern BEFORE the
    (<= prod(n_levels)-term) sum and the sum re-rounds to 6 dp, the
    same discipline as the k-means centroid sums — float addition
    order across engines then cannot move the 6-dp value except on an
    adversarial boundary.
    """
    n_fields = len(n_levels)
    keys = sorted(patterns)
    lam = lam0
    m = [list(_INIT[n][0]) for n in n_levels]
    u = [list(_INIT[n][1]) for n in n_levels]
    total = sum(patterns[k] for k in keys)
    for _ in range(iters):
        # E-step: responsibility per PATTERN (exact — equal gammas
        # imply equal posteriors)
        w = {}
        for k in keys:
            km, ku = 1.0, 1.0
            for f in range(n_fields):
                km *= m[f][k[f]]
                ku *= u[f][k[f]]
            w[k] = _r6(lam * km / (lam * km + (1.0 - lam) * ku))
        # M-step from 6-dp-rounded weighted counts
        t = {k: _r6(w[k] * patterns[k]) for k in keys}
        tu = {k: _r6((1.0 - w[k]) * patterns[k]) for k in keys}
        den_m = _r6(sum(t[k] for k in keys))
        den_u = _r6(sum(tu[k] for k in keys))
        for f in range(n_fields):
            for lvl in range(n_levels[f]):
                num_m = _r6(sum(t[k] for k in keys if k[f] == lvl))
                num_u = _r6(sum(tu[k] for k in keys if k[f] == lvl))
                m[f][lvl] = _clamp(_r6(num_m / den_m))
                u[f][lvl] = _clamp(_r6(num_u / den_u))
        lam = _clamp(_r6(den_m / total))
    return lam, m, u


def posterior_expr(gamma_cols: list, lam: float, m: list, u: list) -> Column:
    """Map-side match posterior from fitted literals: per-field CASE
    lookups multiplied left-to-right (IEEE-exact), one division, one
    6-dp round. Pure whole-stage-codegen arithmetic."""

    def k_prod(tab: list) -> Column:
        expr = None
        for f, g in enumerate(gamma_cols):
            case = F.when(F.col(g) == 0, F.lit(tab[f][0]))
            for lvl in range(1, len(tab[f])):
                case = case.when(F.col(g) == lvl, F.lit(tab[f][lvl]))
            case = case.otherwise(F.lit(_CLAMP_LO))
            expr = case if expr is None else expr * case
        return expr

    km = F.lit(float(lam)) * k_prod(m)
    ku = F.lit(float(1.0 - lam)) * k_prod(u)
    return F.round(km / (km + ku), 6)


def fs_em_linkage(
    pairs: DataFrame,
    gamma_cols: list,
    n_levels: list,
    iters: int = 3,
    lam0: float = 0.05,
    cache_pairs: bool = True,
) -> DataFrame:
    """End-to-end Fellegi-Sunter: census the gamma patterns, EM-fit
    (lambda, m, u) on the driver (model-sized), attach the per-pair
    match ``posterior`` as a codegen projection. ``pairs`` must already
    carry the integer gamma columns (see the level helpers above);
    ``n_levels[f]`` is the level count of ``gamma_cols[f]``.

    ``cache_pairs`` lazily localCheckpoints the pair frame so the
    pattern census and the scoring pass share one materialization of
    the (possibly expensive — fuzzy-kernel) gamma computation instead
    of re-deriving it; pass False when the caller already persisted.
    """
    if cache_pairs:
        pairs = pairs.localCheckpoint(eager=False)
    rows = pattern_counts(pairs, gamma_cols).collect()  # bounded:
    # <= prod(n_levels) rows — the EM model's sufficient statistic,
    # never corpus-scale (same contract as the IVF centroid seed)
    patterns = {
        tuple(int(r[g]) for g in gamma_cols): int(r["count"]) for r in rows
    }
    lam, m, u = em_fit(patterns, n_levels, iters=iters, lam0=lam0)
    return pairs.withColumn(
        "posterior", posterior_expr(gamma_cols, lam, m, u)
    )


def tf_adjusted_weights(
    pairs: DataFrame,
    docs: DataFrame,
    val_expr: Column,
    val1: Column | str,
    val2: Column | str,
    m: float = 0.9,
    lam: float = 0.05,
) -> DataFrame:
    """Term-frequency-adjusted Fellegi-Sunter match weights for an
    exact-match comparison (the Splink ``tf_adjustments`` mechanic;
    Fellegi & Sunter 1969 §3 for the underlying m/u algebra): a pair
    agreeing on a COMMON value ("john smith") is far weaker evidence
    than one agreeing on a RARE value, so for agreeing pairs the
    generic chance-agreement probability u = sum_v p(v)^2 is replaced
    by the matched value's own term frequency p(v):

        agree on v:  bf = m / p(v)
        disagree:    bf = (1 - m) / (1 - u)

    with match_weight = log2(bf) and posterior the lam-prior Bayes
    update. ``m`` is the (externally fitted — compose with em_fit)
    probability that true matches agree on the field; ``val_expr`` maps
    a doc row to the field value; ``val1``/``val2`` name the two sides'
    value columns on ``pairs``.

    Engine-exact arithmetic: p(v) = c_v / N is one exact integer
    division per pair, and u's numerator sum_v c_v^2 is an exact BIGINT
    sum (never a float accumulation), so the only float ops are the
    final per-pair divisions/log2 — identical in any engine, 6-dp
    rounded.

    Scale shape: one census aggregation over docs (vocabulary-sized
    output), broadcast-joined to the pair frame on the agreeing value;
    u's sum is a scalar aggregate of the census. No pairwise stage
    beyond the input pairs.
    """
    v1 = F.col(val1) if isinstance(val1, str) else val1
    v2 = F.col(val2) if isinstance(val2, str) else val2
    tf = docs.select(val_expr.alias("v")).where(
        F.col("v").isNotNull() & (F.length("v") > 0)
    )
    census = tf.groupBy("v").agg(F.count("*").alias("c_v"))
    tot = census.agg(
        F.sum("c_v").alias("n_tot"),
        F.sum(F.col("c_v") * F.col("c_v")).alias("sq_sum"),
    ).collect()[0]
    n_tot, sq_sum = int(tot["n_tot"]), int(tot["sq_sum"])
    u_generic = sq_sum / float(n_tot * n_tot)

    # EQUI broadcast join on the left value (every pair row joins its
    # own value's census row — a hash join, never a nested-loop); c_v
    # is only CONSUMED when the pair agrees
    scored = (
        pairs.withColumn("agree", F.coalesce(v1 == v2, F.lit(False)))
        .join(
            F.broadcast(census.withColumnRenamed("v", "__tfv")),
            v1 == F.col("__tfv"),
            "left",
        )
        .withColumn(
            "bf",
            F.when(
                F.col("agree"),
                F.lit(m) * n_tot / F.col("c_v"),
            ).otherwise(F.lit((1.0 - m) / (1.0 - u_generic))),
        )
    )
    bayes = (F.lit(lam) * F.col("bf")) / (
        F.lit(lam) * F.col("bf") + F.lit(1.0 - lam)
    )
    return scored.select(
        *[c for c in pairs.columns],
        "agree",
        F.round(F.log2("bf"), 6).alias("match_weight"),
        F.round(bayes, 6).alias("posterior"),
    )
