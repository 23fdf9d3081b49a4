"""Deterministic sampling operators for training-data curation.

Large-corpus pipelines need reproducible sampling that (a) never uses an
RNG (so re-runs, resumed runs and audits select the same rows), (b) is
cheap at 100 TB (a hash per row, no global shuffle for the Bernoulli
form), and (c) is portable (md5-derived, so an independent SQL engine
reproduces the selection bit-for-bit — same policy as textops/dedup.py).

Two shapes:

- ``stratified_sample``: per-group Bernoulli with a deterministic
  md5-uniform per key. Pure map-side — zero shuffles; at scale this is
  the only sane way to downsample a 10^12-row table (a global
  ``ORDER BY rand() LIMIT n`` is a full sort).
- ``quota_sample``: exactly-n-per-group selection by ranking the same
  md5-uniform inside each group — one shuffle on the group column. The
  hash order is a deterministic stand-in for reservoir sampling: every
  key's rank is stable under re-runs AND under corpus growth re-ranks
  only within the group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["md5_uniform", "stratified_sample", "quota_sample"]


def md5_uniform(key: Column | str, salt: str = "s0") -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex digits of
    md5(salt ':' key) as a 32-bit integer over 2^32. Exactly reproducible
    in any engine with md5 + hex parsing (DuckDB:
    ``('0x' || substr(md5(...), 1, 8))::BIGINT / 4294967296.0``); the
    division by a power of two is exact in a double, so cross-engine
    comparison needs no rounding tolerance."""
    k = key if isinstance(key, Column) else F.col(key)
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), k.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long").cast(
        "double"
    ) / F.lit(float(1 << 32))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Keep each row independently with its group's rate, selected by the
    deterministic md5-uniform of its key. Returns the input rows plus
    ``u`` (the draw) and ``rate`` (the group's threshold) for audit.

    Plan shape: one ``when`` chain per group (groups are config, not
    data — language/source allowlists are small) and a hash per row; no
    join, no shuffle, fully codegen'd, so the filter pushes down to the
    scan boundary and a 100 TB input is one map-only pass."""
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return (
        docs.withColumn("u", md5_uniform(key_col, salt))
        .withColumn("rate", rate)
        .where(F.col("u") < F.col("rate"))
    )


def quota_sample(
    docs: DataFrame,
    n_per_group: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Exactly min(n, group size) rows per group: rank rows inside each
    group by their md5-uniform (key as tiebreak — the draw is injective
    per key in practice but the ORDER BY must be total for determinism)
    and keep rank <= n.

    One shuffle on ``group_col``. Skew note: a dominant group (90% 'en')
    makes one partition hot; at scale pre-filter with
    ``stratified_sample`` at a rate that leaves O(n log n) survivors per
    group, then rank the survivors — the hash-rank selection composes
    exactly (the top-n by hash of a superset that keeps all hash-low rows
    is the same top-n)."""
    u = md5_uniform(key_col, salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        docs.withColumn("u", u)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_group)
    )
