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

Everything is built-in expressions: posexplode for the dim axis, groupBy
partial aggregation for projections, window row_number for ranking.
"""

from __future__ import annotations

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
