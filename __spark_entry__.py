"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship fuzzy top-k self-join on sf0.001 documents.
``queries()``     — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()``  — DuckDB-equivalent SQL per query (same column names).

Oracle notes:
- levenshtein / damerau / jaro / jaro-winkler / hamming use DuckDB's own
  implementations (independently verified to agree with the reference
  semantics on these inputs).
- indel / lcs / ratio / weighted-levenshtein / osa have no DuckDB builtin:
  oracles are recursive-CTE dynamic programs over anti-diagonals on
  length-capped substrings (exact, engine-independent).
- prefix / postfix / hamming-pad oracles use generate_series scans.
- jaro of two empty strings differs (DuckDB 0.0 vs reference 1.0);
  document texts are non-empty so the case never arises here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import rapidfuzz_spark.functions as RF

# ---------------------------------------------------------------------------
# shared building blocks
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs: same (lang, length-bucket), id_1 < id_2 —
    identical in SQL below."""
    d = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.floor(F.col("a.n_chars") / 50) == F.floor(F.col("b.n_chars") / 50))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_1"),
            F.col("b.doc_id").alias("id_2"),
            F.col("a.text").alias("t1"),
            F.col("b.text").alias("t2"),
        )
    )


_PAIRS_SQL = """
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, a.text AS t1, b.text AS t2
  FROM documents a JOIN documents b
    ON a.lang = b.lang
   AND floor(a.n_chars / 50) = floor(b.n_chars / 50)
   AND a.doc_id < b.doc_id
"""


def _lcs_cte(expr1: str, expr2: str) -> str:
    """Recursive-CTE LCS over anti-diagonals (carry 2 diagonals via age)."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_1, id_2, {expr1} AS s1, {expr2} AS s2 FROM ({_PAIRS_SQL})
),
cells(id_1, id_2, i, j, v, age) AS (
  SELECT id_1, id_2, 0, 0, 0, 0 FROM pairs
  UNION ALL
  (
    WITH contrib AS (
      SELECT c.id_1, c.id_2, c.i + 1 AS i, c.j AS j, c.v AS v
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 0 AND c.i < len(p.s1)
      UNION ALL
      SELECT c.id_1, c.id_2, c.i, c.j + 1, c.v
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 0 AND c.j < len(p.s2)
      UNION ALL
      SELECT c.id_1, c.id_2, c.i + 1, c.j + 1,
             c.v + CASE WHEN substr(p.s1, c.i + 1, 1) = substr(p.s2, c.j + 1, 1)
                        THEN 1 ELSE 0 END
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 1 AND c.i < len(p.s1) AND c.j < len(p.s2)
    )
    SELECT id_1, id_2, i, j, max(v), 0 FROM contrib GROUP BY id_1, id_2, i, j
    UNION ALL
    SELECT c.id_1, c.id_2, c.i, c.j, c.v, c.age + 1
    FROM cells c JOIN pairs p USING (id_1, id_2)
    WHERE c.age = 0 AND c.i + c.j < len(p.s1) + len(p.s2)
  )
),
lcs AS (
  SELECT p.id_1, p.id_2, len(p.s1) AS l1, len(p.s2) AS l2,
         coalesce(max(c.v), 0) AS lcs_len
  FROM pairs p LEFT JOIN cells c
    ON c.id_1 = p.id_1 AND c.id_2 = p.id_2
   AND c.i = len(p.s1) AND c.j = len(p.s2)
  GROUP BY p.id_1, p.id_2, len(p.s1), len(p.s2)
)
"""


_OSA_CTE = f"""
WITH RECURSIVE pairs AS (
  SELECT id_1, id_2, substr(t1, 1, 10) AS s1, substr(t2, 1, 10) AS s2
  FROM ({_PAIRS_SQL})
),
cells(id_1, id_2, i, j, v, age) AS (
  SELECT id_1, id_2, 0, 0, 0, 0 FROM pairs
  UNION ALL
  (
    WITH contrib AS (
      -- deletion / insertion from the current diagonal
      SELECT c.id_1, c.id_2, c.i + 1 AS i, c.j AS j, c.v + 1 AS v
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 0 AND c.i < len(p.s1)
      UNION ALL
      SELECT c.id_1, c.id_2, c.i, c.j + 1, c.v + 1
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 0 AND c.j < len(p.s2)
      UNION ALL
      -- match/substitute from two diagonals back
      SELECT c.id_1, c.id_2, c.i + 1, c.j + 1,
             c.v + CASE WHEN substr(p.s1, c.i + 1, 1) = substr(p.s2, c.j + 1, 1)
                        THEN 0 ELSE 1 END
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 1 AND c.i < len(p.s1) AND c.j < len(p.s2)
      UNION ALL
      -- adjacent transposition from four diagonals back
      SELECT c.id_1, c.id_2, c.i + 2, c.j + 2, c.v + 1
      FROM cells c JOIN pairs p USING (id_1, id_2)
      WHERE c.age = 3 AND c.i + 2 <= len(p.s1) AND c.j + 2 <= len(p.s2)
        AND substr(p.s1, c.i + 2, 1) = substr(p.s2, c.j + 1, 1)
        AND substr(p.s1, c.i + 1, 1) = substr(p.s2, c.j + 2, 1)
    )
    SELECT id_1, id_2, i, j, min(v), 0 FROM contrib GROUP BY id_1, id_2, i, j
    UNION ALL
    SELECT c.id_1, c.id_2, c.i, c.j, c.v, c.age + 1
    FROM cells c JOIN pairs p USING (id_1, id_2)
    WHERE c.age <= 2 AND c.i + c.j < len(p.s1) + len(p.s2)
  )
)
SELECT p.id_1, p.id_2, min(c.v) AS osa_dist
FROM pairs p JOIN cells c
  ON c.id_1 = p.id_1 AND c.id_2 = p.id_2
 AND c.i = len(p.s1) AND c.j = len(p.s2)
GROUP BY p.id_1, p.id_2
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Top-3 fuzzy matches per document (jaro-winkler within blocks) on
    sf0.001 — the blocking + vectorized scoring + window top-k slice of the
    record-linkage pipeline."""
    pairs = _pairs(spark, "/root/testdata/sf0.001")
    scored = pairs.withColumn("score", RF.jaro_winkler_similarity("t1", "t2"))
    w = Window.partitionBy("id_1").orderBy(F.desc("score"), "id_2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("id_1", "id_2", "score", "rank")
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def _q(scorer) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return scorer(_pairs(spark, sf_dir))

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    q["lev_distance"] = _q(
        lambda p: p.select(
            "id_1", "id_2", RF.levenshtein_distance("t1", "t2").alias("lev_dist")
        )
    )
    q["lev_distance_cutoff"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.levenshtein_distance("t1", "t2", score_cutoff=40).alias("lev_dist_c"),
        )
    )
    q["lev_norm_sim"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            F.round(RF.levenshtein_normalized_similarity("t1", "t2"), 6).alias(
                "lev_nsim"
            ),
        )
    )
    q["weighted_lev_112"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.levenshtein_distance(
                F.substring("t1", 1, 12), F.substring("t2", 1, 12), weights=(1, 1, 2)
            ).alias("wlev_dist"),
        )
    )
    q["indel_distance"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.indel_distance(
                F.substring("t1", 1, 12), F.substring("t2", 1, 12)
            ).alias("indel_dist"),
        )
    )
    q["lcs_similarity"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.lcs_seq_similarity(
                F.substring("t1", 1, 12), F.substring("t2", 1, 12)
            ).alias("lcs_sim"),
        )
    )
    q["fuzz_ratio"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            F.round(
                RF.ratio(F.substring("t1", 1, 12), F.substring("t2", 1, 12)), 6
            ).alias("ratio"),
        )
    )
    q["jaro_similarity"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            F.round(RF.jaro_similarity("t1", "t2"), 6).alias("jaro_sim"),
        )
    )
    q["jaro_winkler_similarity"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            F.round(RF.jaro_winkler_similarity("t1", "t2"), 6).alias("jw_sim"),
        )
    )
    q["damerau_distance"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.damerau_levenshtein_distance(
                F.substring("t1", 1, 40), F.substring("t2", 1, 40)
            ).alias("dl_dist"),
        )
    )
    q["osa_distance"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.osa_distance(
                F.substring("t1", 1, 10), F.substring("t2", 1, 10)
            ).alias("osa_dist"),
        )
    )
    q["hamming_distance"] = _q(
        lambda p: p.select(
            "id_1",
            "id_2",
            RF.hamming_distance(
                F.substring("t1", 1, 32), F.substring("t2", 1, 32), pad=True
            ).alias("ham_dist"),
        )
    )
    q["prefix_similarity"] = _q(
        lambda p: p.select(
            "id_1", "id_2", RF.prefix_similarity("t1", "t2").alias("pfx_sim")
        )
    )
    q["postfix_similarity"] = _q(
        lambda p: p.select(
            "id_1", "id_2", RF.postfix_similarity("t1", "t2").alias("sfx_sim")
        )
    )

    def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        pairs = _pairs(spark, sf_dir)
        sym = pairs.select(
            F.col("id_1").alias("qid"), F.col("id_2").alias("cid"), "t1", "t2"
        ).unionAll(
            pairs.select(
                F.col("id_2").alias("qid"), F.col("id_1").alias("cid"),
                F.col("t2").alias("t1"), F.col("t1").alias("t2"),
            )
        )
        scored = sym.withColumn(
            "score", F.round(RF.jaro_winkler_similarity("t1", "t2"), 6)
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), "cid")
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("qid", "cid", "score", "rnk")
        )

    q["topk_matches"] = topk

    def block_census(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        return (
            d.select(
                "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
            )
            .where(F.length("tok") >= 2)
            .groupBy("tok")
            .agg(F.count("*").alias("n_docs"))
        )

    q["block_census"] = block_census

    def salted_block_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Token-blocked pair generation WITH forced hot-key salting; the
        oracle is the naive unsalted SQL self-join — proving salting
        changes the distribution, never the result."""
        from rapidfuzz_spark.pipeline import blocking

        d = _docs(spark, sf_dir).withColumn("norm_text", F.col("text"))
        keys = blocking.token_keys(d)
        pairs = blocking.candidate_pairs(keys, hot_cap=25, drop_cap=10**9)
        return pairs.select(
            F.col("doc_id_1").alias("id_1"), F.col("doc_id_2").alias("id_2")
        )

    q["salted_block_pairs"] = salted_block_pairs
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["lev_distance"] = (
        f"SELECT id_1, id_2, levenshtein(t1, t2) AS lev_dist FROM ({_PAIRS_SQL})"
    )
    o["lev_distance_cutoff"] = f"""
      SELECT id_1, id_2,
             CASE WHEN levenshtein(t1, t2) <= 40 THEN levenshtein(t1, t2) END
               AS lev_dist_c
      FROM ({_PAIRS_SQL})"""
    o["lev_norm_sim"] = f"""
      SELECT id_1, id_2,
             round(1.0 - levenshtein(t1, t2)::DOUBLE
                         / greatest(len(t1), len(t2)), 6) AS lev_nsim
      FROM ({_PAIRS_SQL})"""
    o["weighted_lev_112"] = (
        _lcs_cte("substr(t1, 1, 12)", "substr(t2, 1, 12)")
        + "SELECT id_1, id_2, l1 + l2 - 2 * lcs_len AS wlev_dist FROM lcs"
    )
    o["indel_distance"] = (
        _lcs_cte("substr(t1, 1, 12)", "substr(t2, 1, 12)")
        + "SELECT id_1, id_2, l1 + l2 - 2 * lcs_len AS indel_dist FROM lcs"
    )
    o["lcs_similarity"] = (
        _lcs_cte("substr(t1, 1, 12)", "substr(t2, 1, 12)")
        + "SELECT id_1, id_2, lcs_len AS lcs_sim FROM lcs"
    )
    o["fuzz_ratio"] = (
        _lcs_cte("substr(t1, 1, 12)", "substr(t2, 1, 12)")
        + """SELECT id_1, id_2,
                round(CASE WHEN l1 + l2 = 0 THEN 1.0
                           ELSE 1.0 - (l1 + l2 - 2 * lcs_len)::DOUBLE / (l1 + l2)
                      END, 6) AS ratio
           FROM lcs"""
    )
    o["jaro_similarity"] = f"""
      SELECT id_1, id_2, round(jaro_similarity(t1, t2), 6) AS jaro_sim
      FROM ({_PAIRS_SQL})"""
    o["jaro_winkler_similarity"] = f"""
      SELECT id_1, id_2, round(jaro_winkler_similarity(t1, t2), 6) AS jw_sim
      FROM ({_PAIRS_SQL})"""
    o["damerau_distance"] = f"""
      SELECT id_1, id_2,
             damerau_levenshtein(substr(t1, 1, 40), substr(t2, 1, 40)) AS dl_dist
      FROM ({_PAIRS_SQL})"""
    o["osa_distance"] = _OSA_CTE
    o["hamming_distance"] = f"""
      SELECT p.id_1, p.id_2,
             sum(CASE WHEN g.i <= least(len(p.s1), len(p.s2))
                       AND substr(p.s1, g.i, 1) <> substr(p.s2, g.i, 1)
                      THEN 1 ELSE 0 END)
             + abs(len(p.s1) - len(p.s2)) AS ham_dist
      FROM (SELECT id_1, id_2, substr(t1, 1, 32) AS s1, substr(t2, 1, 32) AS s2
            FROM ({_PAIRS_SQL})) p
      CROSS JOIN generate_series(1, 32) g(i)
      GROUP BY p.id_1, p.id_2, p.s1, p.s2"""
    o["prefix_similarity"] = f"""
      SELECT p.id_1, p.id_2,
             coalesce(max(CASE WHEN g.i <= least(len(p.t1), len(p.t2))
                                AND substr(p.t1, 1, g.i) = substr(p.t2, 1, g.i)
                               THEN g.i END), 0) AS pfx_sim
      FROM ({_PAIRS_SQL}) p CROSS JOIN generate_series(1, 700) g(i)
      GROUP BY p.id_1, p.id_2"""
    o["postfix_similarity"] = f"""
      SELECT p.id_1, p.id_2,
             coalesce(max(CASE WHEN g.i <= least(len(p.t1), len(p.t2))
                                AND substr(reverse(p.t1), 1, g.i)
                                    = substr(reverse(p.t2), 1, g.i)
                               THEN g.i END), 0) AS sfx_sim
      FROM ({_PAIRS_SQL}) p CROSS JOIN generate_series(1, 700) g(i)
      GROUP BY p.id_1, p.id_2"""
    o["topk_matches"] = f"""
      WITH sym AS (
        SELECT id_1 AS qid, id_2 AS cid, t1, t2 FROM ({_PAIRS_SQL})
        UNION ALL
        SELECT id_2 AS qid, id_1 AS cid, t2 AS t1, t1 AS t2 FROM ({_PAIRS_SQL})
      ),
      scored AS (
        SELECT qid, cid, round(jaro_winkler_similarity(t1, t2), 6) AS score,
               row_number() OVER (PARTITION BY qid ORDER BY
                 round(jaro_winkler_similarity(t1, t2), 6) DESC, cid) AS rnk
        FROM sym
      )
      SELECT qid, cid, score, rnk FROM scored WHERE rnk <= 3"""
    o["block_census"] = """
      SELECT tok, count(*) AS n_docs
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents)
      WHERE len(tok) >= 2
      GROUP BY tok"""
    o["salted_block_pairs"] = """
      WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
      )
      SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      WHERE len(a.tok) >= 2"""
    return o
