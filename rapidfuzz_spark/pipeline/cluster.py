"""Transitive clustering: connected components via alternating
large-star / small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") expressed as DataFrame groupBy/join rounds.

Deterministic: ties break on lexicographic min doc_id, so entity ids are
stable across runs and parallelism levels. Each round is two shuffles;
lineage is cut with localCheckpoint per iteration (driver loop, bounded by
``max_iter`` — converges in O(log^2 n) rounds in theory, single digits in
practice). Convergence test is a cheap aggregate hash compare, not a
DataFrame diff (scales to 10^12 edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(neighbors+self); connect strictly larger
    neighbors to m."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to (larger -> smaller); for each node u: connect all
    smaller neighbors and u to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("vs"))
    m = grouped.select(
        "u", F.array_min("vs").alias("m"), F.explode(
            F.array_union("vs", F.array("u"))
        ).alias("n")
    )
    return (
        m.where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _sig(edges: DataFrame):
    return edges.agg(
        F.count("*").alias("c"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
    ).collect()[0]


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """edges(doc_id_1, doc_id_2[, ...]) -> (doc_id, entity_id) where
    entity_id = min doc_id of the component."""
    cur = edges.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    ).distinct()
    cur = cur.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _sig(cur)
        if prev_sig is not None and sig == prev_sig:
            break
        prev_sig = sig
    # converged: edges form stars (node -> component min)
    roots = cur.select(F.col("src").alias("doc_id"), F.col("dst").alias("entity_id"))
    selfs = (
        cur.select(F.col("dst").alias("doc_id"))
        .distinct()
        .withColumn("entity_id", F.col("doc_id"))
    )
    return roots.unionByName(selfs).groupBy("doc_id").agg(
        F.min("entity_id").alias("entity_id")
    )


def assign_entities(docs: DataFrame, components: DataFrame) -> DataFrame:
    """Every doc gets an entity id; singletons are their own entity."""
    return docs.join(components, "doc_id", "left").withColumn(
        "entity_id", F.coalesce("entity_id", "doc_id")
    )
