"""Approximate nearest-neighbour search over an embedding column.

- brute_force_topk: exact cosine top-k via a blocked cross join + window
  rank. The baseline; at 100 TB you bound it by broadcasting the (small)
  query set against the partitioned corpus — the cross join is then
  embarrassingly parallel with no shuffle of the big side.
- hyperplane_buckets / lsh_topk: random-hyperplane (sign) LSH. The
  hyperplane matrix is *derived from md5 parity* — deterministic, needs no
  stored model, identical on every executor and every engine. Search cost
  drops from |Q|x|C| to |Q|x|bucket|; recall is tuned by n_planes (fewer
  planes -> bigger buckets).
- ivf_cells / ivf_topk: IVF (inverted-file) coarse quantizer. Centroids
  are a deterministic hash-order sample of the corpus (no training, no
  stored model — the same md5 order reproduces them on any engine), and
  every vector is assigned to its best-cosine cell by a PURE-CODEGEN
  argmax over the literal centroid matrix: zero shuffle, zero UDF, the
  corpus is touched once per assignment. Queries probe their ``nprobe``
  best cells and brute-force only inside them — the classic IVF
  recall/cost dial. Coarse quantizers are coarse by design (n_cells ~
  sqrt(corpus) at scale); beyond ~64 cells ``assign='pandas'`` (the
  ``auto`` default picks it) swaps the literal argmax for one Arrow-
  batched NumPy matmul against the broadcast centroid matrix — the plan
  shape (assign -> equi-join on cell -> windowed top-k) is unchanged,
  and the *returned* cos_sim is always the codegen cosine, so output
  values are engine-exact regardless of the assignment backend.

Everything is built-in expressions: posexplode for the dim axis, groupBy
partial aggregation for projections, window row_number for ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_similarity


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(qid, cid, cos_sim, rnk): exact top-k by cosine, self excluded.
    Rank on the 6-dp rounded score with id tiebreak so ordering is
    reproducible across engines and runs."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("qe")
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(emb_col).alias("ce"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cos_sim", "rnk")
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign-LSH bucket as an ``n_planes``-char bitstring.
    Plane component (p, d) is +1 when the first hex nibble of
    md5('p:d') has its high bit set, else -1 — a fixed pseudo-random
    +-1 matrix shared by construction everywhere."""
    dims = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(emb_col).alias("d", "x"),
    )
    proj = (
        dims.withColumn("p", F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))))
        .select(
            "vec_id",
            "p",
            (
                F.when(
                    F.expr(
                        "substring(md5(concat(cast(p as string), ':',"
                        " cast(d as string))), 1, 1)"
                    ).isin(*list("89abcdef")),
                    F.lit(1.0),
                )
                .otherwise(F.lit(-1.0))
                * F.col("x").cast("double")
            ).alias("t"),
        )
        .groupBy("vec_id", "p")
        .agg(F.sum("t").alias("proj"))
    )
    return proj.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "p",
                            F.when(F.col("proj") >= 0, F.lit("1"))
                            .otherwise(F.lit("0"))
                            .alias("bit"),
                        )
                    )
                ),
                lambda s: s["bit"],
            ),
            "",
        ).alias("bucket")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_cap: int | None = 10000,
) -> DataFrame:
    """(qid, cid, cos_sim, rnk): top-k within the query's LSH bucket —
    the scale path: an equi-join on bucket instead of a cross join.

    ``bucket_cap``: corpus buckets above the cap (degenerate embedding
    mass, e.g. near-zero vectors all hashing together) are dropped via a
    broadcast census so one hot bucket cannot quadratically dominate the
    join — same policy as blocking.py's drop_cap."""
    qb = hyperplane_buckets(queries, n_planes, id_col, emb_col)
    cb = hyperplane_buckets(corpus, n_planes, id_col, emb_col)
    if bucket_cap is not None:
        hot = (
            cb.groupBy("bucket")
            .count()
            .where(F.col("count") > bucket_cap)
            .select("bucket")
        )
        cb = cb.join(F.broadcast(hot), ["bucket"], "left_anti")
    q = queries.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("qe")).join(
        qb.select(F.col("vec_id").alias("qid"), "bucket"), "qid"
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(emb_col).alias("ce")).join(
        cb.select(F.col("vec_id").alias("cid"), "bucket"), "cid"
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cos_sim", "rnk")
    )


def _ivf_centroids(
    corpus: DataFrame, n_cells: int, id_col: str, emb_col: str
) -> list:
    """Deterministic hash-order centroid sample: the ``n_cells`` corpus
    vectors with the smallest md5(id) (ties by id), cell index = rank in
    that order. Reproducible on any engine from the data alone — no
    k-means state to ship. The collect is bounded at n_cells rows (a
    model-sized constant, like the checkpoint ledger manifests), never
    corpus-scale."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(emb_col).alias("e"))
        .where(F.col("e").isNotNull())  # a null vector can't be a centroid
        .withColumn("h", F.md5(F.col("i").cast("string")))
        .orderBy("h", "i")
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r["e"]] for r in rows]


def _cell_scores(emb: "F.Column", cents: list) -> "F.Column":
    """array<double> of round(cosine(emb, centroid_c), 6) per cell: ONE
    nested-array centroid literal + ONE transform lambda, so the Catalyst
    tree stays O(n_cells x dim) literal leaves plus a single cosine
    expression (n_cells separate cosine trees re-duplicated by an argmax
    made the optimizer's tree copies blow the driver heap). The 6-dp
    rounding happens BEFORE the argmax so cell assignment ties break
    identically across engines (same policy as the top-k rankings)."""
    cmat = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cents])
    return F.transform(cmat, lambda c: F.round(cosine_similarity(emb, c), 6))


def _cell_scores_pandas(emb: "F.Column", cents: list) -> "F.Column":
    """Same array<double> of rounded cell cosines as ``_cell_scores``,
    computed as ONE NumPy matmul per Arrow batch against the centroid
    matrix captured in the UDF closure (broadcast once per executor by
    task serialization). This is the large-``n_cells`` path: the codegen
    literal argmax is O(n_cells x dim) *expression-tree* leaves, which
    stops being reasonable a few hundred cells in, while a (batch x dim)
    @ (dim x n_cells) matmul is flat in plan size and BLAS-fast.

    Parity with the codegen path: float64 throughout, zero-norm (and
    null) vectors score 0.0 like ``cosine_similarity``'s nullif guard,
    and rounding emulates Spark's HALF_UP (away from zero; NumPy's
    native half-even would disagree on exact .5e-6 boundaries). The one
    residual caveat: BLAS sums dot products in a different order than
    the JVM's sequential fold, so a score sitting within ~1 ulp of a
    6-dp rounding boundary can flip and shift a *cell assignment* (never
    a returned cos_sim value) — measure-zero on real embeddings, and an
    ANN index is free to draw cell borders either way."""
    from pyspark.sql.pandas.functions import pandas_udf

    cmat = np.asarray(cents, dtype=np.float64)  # (n_cells, dim)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))

    @pandas_udf("array<double>")
    def _scores(v: pd.Series) -> pd.Series:
        dim = cmat.shape[1]
        zero = np.zeros(dim, dtype=np.float64)
        m = np.stack(
            [
                zero if x is None else np.asarray(x, dtype=np.float64)
                for x in v
            ]
        )
        dots = m @ cmat.T  # (batch, n_cells)
        denom = np.outer(np.sqrt((m * m).sum(axis=1)), cnorm)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(denom == 0.0, 0.0, dots / denom)
        r = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
        return pd.Series(list(r))

    return _scores(emb)


def _assign_scores(
    emb: "F.Column", cents: list, assign: str
) -> "F.Column":
    """Route cell-score computation: 'codegen' (literal transform),
    'pandas' (Arrow matmul), or 'auto' — codegen up to 64 cells, where
    the expression tree is still small and the zero-UDF plan wins."""
    if assign == "auto":
        assign = "codegen" if len(cents) <= 64 else "pandas"
    if assign == "codegen":
        return _cell_scores(emb, cents)
    if assign == "pandas":
        return _cell_scores_pandas(emb, cents)
    raise ValueError(f"assign must be auto|codegen|pandas, got {assign!r}")


# cells ranked best-first by (score desc, cell asc) — the same
# deterministic tie policy everywhere; references `scores` exactly once
_RANKED_CELLS = (
    "transform(array_sort(zip_with(scores, sequence(0, size(scores) - 1),"
    " (s, i) -> struct(-s AS negs, i AS cell))), x -> x.cell)"
)


def ivf_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    assign: str = "auto",
) -> DataFrame:
    """(vec_id, cell): each vector's best-cosine centroid, first-max (=
    lowest cell id) on rounded ties. One narrow projection, no shuffle."""
    cents = _ivf_centroids(corpus, n_cells, id_col, emb_col)
    return (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            _assign_scores(F.col(emb_col), cents, assign).alias("scores"),
        )
        .withColumn("cell", F.expr(f"element_at({_RANKED_CELLS}, 1)"))
        .select("vec_id", "cell")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    assign: str = "auto",
) -> DataFrame:
    """SemDeDup-style embedding-space deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus's embeddings, and within each
    cluster prune every vector that is ε-similar to another, keeping
    one canonical member per similar group. Returns one row per input
    vector: ``(vec_id, canonical_id, keep)`` with ``canonical_id`` the
    min vec_id of the vector's transitive ≥-threshold group and
    ``keep = (canonical_id == vec_id)`` — the same canonical/keep
    contract as the text-space dedup operators.

    Composition of audited primitives, nothing new to verify in
    isolation: cells come from ``ivf_cells`` (deterministic hash-order
    centroids — reproducible on any engine, no k-means state), in-cell
    pairs from ``dedup.embedding_near_duplicates`` with the cell as the
    block, transitive grouping from the ER pipeline's large/small-star
    ``connected_components``.

    Scale: candidate pairs never cross cells — the SemDeDup recall
    trade, which is what makes the op subquadratic: the self-join is an
    equi-join on cell, O(sum of cell sizes squared) not O(corpus²).
    ``n_cells`` is the knob (the paper runs ~11k clusters at 100M+
    docs); size it so cells fit an executor and pick ``assign='pandas'``
    past a few hundred cells (Arrow matmul assignment, plan-size-flat).
    """
    from ..pipeline.cluster import connected_components
    from .dedup import embedding_near_duplicates

    cells = ivf_cells(
        corpus, n_cells=n_cells, id_col=id_col, emb_col=emb_col, assign=assign
    )
    e = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")
    ).join(cells, "vec_id")
    pairs = embedding_near_duplicates(e, threshold=threshold, block_col="cell")
    comps = connected_components(
        pairs.select(
            F.col("id_1").alias("doc_id_1"), F.col("id_2").alias("doc_id_2")
        )
    )
    return (
        corpus.select(F.col(id_col).alias("vec_id"))
        .join(
            comps.select(
                F.col("doc_id").alias("vec_id"),
                F.col("entity_id").alias("canonical_id"),
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("canonical_id", F.col("vec_id")).alias("canonical_id"),
        )
        .withColumn("keep", F.col("canonical_id") == F.col("vec_id"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    assign: str = "auto",
    cell_cap: int | None = None,
) -> DataFrame:
    """(qid, cid, cos_sim, rnk): IVF top-k — queries probe their
    ``nprobe`` best cells, exact cosine only within them. Search cost
    |Q| x nprobe x |cell| instead of |Q| x |C|; each corpus vector lives
    in exactly one cell, so probing can never duplicate a (qid, cid)
    pair. Skewed cells (degenerate embedding mass) are a bounded factor
    of the average at realistic n_cells; AQE's skew-join split is the
    first backstop, and ``cell_cap`` (off by default — it trades recall)
    drops corpus cells above the cap via a broadcast census, the same
    drop policy as ``lsh_topk``'s bucket_cap and blocking.py's drop_cap,
    for corpora where one degenerate cell would dominate the join."""
    cents = _ivf_centroids(corpus, n_cells, id_col, emb_col)
    c = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(emb_col).alias("ce"),
            _assign_scores(F.col(emb_col), cents, assign).alias("scores"),
        )
        .withColumn("cell", F.expr(f"element_at({_RANKED_CELLS}, 1)"))
        .drop("scores")
    )
    if cell_cap is not None:
        hot = (
            c.groupBy("cell")
            .count()
            .where(F.col("count") > cell_cap)
            .select("cell")
        )
        c = c.join(F.broadcast(hot), ["cell"], "left_anti")
    q = (
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(emb_col).alias("qe"),
            _assign_scores(F.col(emb_col), cents, assign).alias("scores"),
        )
        .withColumn(
            "cell", F.explode(F.expr(f"slice({_RANKED_CELLS}, 1, {nprobe})"))
        )
        .drop("scores")
    )
    scored = (
        q.join(c, "cell")
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cos_sim", "rnk")
    )


def refine_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    assign: str = "auto",
) -> list:
    """Lloyd-refined centroid matrix for the IVF index: start from the
    deterministic hash-order seed (:func:`_ivf_centroids`) and run
    ``iters`` k-means rounds — assign every vector to its best rounded
    cosine centroid, recompute each centroid as the element-wise MEAN of
    its members. No L2 normalization: cosine is scale-invariant, so the
    plain mean assigns identically to the spherical-k-means normalized
    mean while staying exactly replayable (a norm would add an
    engine-order-dependent sum of squares).

    Determinism / engine portability: per-coordinate member sums are
    rounded to 6 dp IN the aggregation, the mean divides those rounded
    sums by the member count, and the quotient re-rounds half-away-from-
    zero to 6 dp (the same policy as Spark/DuckDB ``round``) — every
    engine that replays this arithmetic reproduces the centroid doubles
    bit-for-bit, and assignments compare 6 dp-rounded cosines with ties
    to the lowest cell, as everywhere else in this module. Cells that
    lose all members keep their previous centroid. NULL vectors take no
    part in refinement (they carry no position).

    Plan shape per iteration at 100 TB: one map-side assignment (the
    centroid literal / Arrow matmul — zero shuffle), one hash aggregate
    of dim+1 partial-agg-friendly columns shuffling ``n_cells`` rows,
    and a model-sized driver collect (n_cells x dim doubles — the same
    bounded-collect contract as the seed pick). Nothing corpus-sized
    ever reaches the driver, and the corpus is scanned once per
    iteration (the irreducible minimum for Lloyd)."""
    import math

    cents = _ivf_centroids(corpus, n_cells, id_col, emb_col)
    if not cents:
        return cents
    dim = len(cents[0])

    def half_up(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    vecs = corpus.select(F.col(emb_col).alias("e")).where(
        F.col("e").isNotNull()
    )
    for _ in range(iters):
        assigned = vecs.select(
            "e", _assign_scores(F.col("e"), cents, assign).alias("scores")
        ).withColumn("cell", F.expr(f"element_at({_RANKED_CELLS}, 1)"))
        stats = assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[
                F.round(F.sum(F.element_at("e", i + 1)), 6).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new = {
            r["cell"]: [half_up(r[f"s{i}"] / r["n"]) for i in range(dim)]
            for r in stats.collect()
            if r["n"]
        }
        cents = [new.get(c, cents[c]) for c in range(len(cents))]
    return cents


def kmeans_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    assign: str = "auto",
) -> DataFrame:
    """(vec_id, cell): IVF cell assignment under Lloyd-refined centroids
    (:func:`refine_centroids`) — same map-side argmax projection as
    :func:`ivf_cells`, sharper cells. NULL vectors score 0.0 against
    every centroid and land in cell 0 by the lowest-cell tie rule."""
    cents = refine_centroids(
        corpus, n_cells, iters, id_col, emb_col, assign
    )
    return (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            _assign_scores(F.col(emb_col), cents, assign).alias("scores"),
        )
        .withColumn("cell", F.expr(f"element_at({_RANKED_CELLS}, 1)"))
        .select("vec_id", "cell")
    )
