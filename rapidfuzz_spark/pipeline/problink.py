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
