"""Incremental ER (batch + Structured Streaming) and array-sequence
metric functions."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import rapidfuzz_spark.functions as RF
from rapidfuzz_spark.pipeline import incremental, ingest, synth
from rapidfuzz_spark.pipeline.run import PipelineConfig


@pytest.fixture(scope="module")
def split_corpus(spark):
    """Synthesized corpus split into a base catalog (first doc of each
    entity) and an increment (the remaining duplicate docs)."""
    docs = synth.synth_documents(spark, n_entities=250, seed=42).cache()
    first = docs.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("entity_id").orderBy("doc_id")),
    )
    base = first.where(F.col("rn") == 1).drop("rn").cache()
    increment = first.where(F.col("rn") > 1).drop("rn").cache()
    base.count(), increment.count()
    return base, increment


def test_link_increment_accuracy(spark, split_corpus):
    base, increment = split_corpus
    base_t = ingest.with_match_text(base.select("doc_id", "spans"))
    base_entities = base.select("doc_id", F.col("doc_id").alias("entity_id"))
    conf = PipelineConfig(metric="ratio", threshold=0.85)
    out = incremental.link_increment(
        increment.select("doc_id", "spans"), base_t, base_entities, conf
    ).cache()
    assert out.count() == increment.count()
    # spans pass through untouched
    assert (
        out.select("doc_id", "spans")
        .exceptAll(increment.select("doc_id", "spans"))
        .isEmpty()
    )
    # accuracy: the assigned entity's doc belongs to the same true entity
    truth = increment.select("doc_id", F.col("entity_id").alias("true_ent"))
    base_truth = base.select(
        F.col("doc_id").alias("entity_id"), F.col("entity_id").alias("ent_true")
    )
    joined = out.join(truth, "doc_id").join(base_truth, "entity_id", "left")
    n = joined.count()
    correct = joined.where(F.col("ent_true") == F.col("true_ent")).count()
    assert correct / n >= 0.9, f"incremental accuracy {correct}/{n}"


def test_stream_link(spark, split_corpus, tmp_path):
    base, increment = split_corpus
    base_t = ingest.with_match_text(base.select("doc_id", "spans"))
    base_entities = base.select("doc_id", F.col("doc_id").alias("entity_id"))
    src = str(tmp_path / "stream_src")
    increment.select("doc_id", "spans").repartition(3).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = incremental.stream_link(
        stream,
        base_t,
        base_entities,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        conf=PipelineConfig(metric="ratio", threshold=0.85),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out" / "assignments"))
    assert out.count() == increment.count()
    assert out.select("doc_id").distinct().count() == increment.count()


def test_seq_metrics_match_string_metrics(spark):
    """array<int> sequences: injective remap invariance — distances equal
    those of the equivalent strings (HashableChar parity)."""
    rows = [
        ([1, 2, 3, 4], [1, 2, 4]),
        ([7, 7, 7], [8, 8, 8]),
        ([1, 2], [2, 1]),
        ([100000, 5], [100000, 5]),
    ]
    df = spark.createDataFrame(rows, "s1 array<int>, s2 array<int>")
    got = df.select(
        RF.levenshtein_distance_seq("s1", "s2").alias("lev"),
        RF.indel_distance_seq("s1", "s2").alias("ind"),
        RF.hamming_distance_seq("s1", "s2", pad=True).alias("ham"),
        RF.osa_distance_seq("s1", "s2").alias("osa"),
        RF.damerau_levenshtein_distance_seq("s1", "s2").alias("dl"),
    ).collect()
    assert [r.lev for r in got] == [1, 3, 2, 0]
    assert [r.ind for r in got] == [1, 6, 2, 0]  # indel = l1+l2-2*LCS
    assert [r.ham for r in got] == [2, 3, 2, 0]
    assert [r.osa for r in got] == [1, 3, 1, 0]
    assert [r.dl for r in got] == [1, 3, 1, 0]


def test_seq_metrics_int_hamming_reference_case(spark):
    # reference hamming.rs: [1,2,4] vs [1,2,3] = 1
    df = spark.createDataFrame([([1, 2, 4], [1, 2, 3])], "s1 array<int>, s2 array<int>")
    assert df.select(RF.hamming_distance_seq("s1", "s2").alias("h")).collect()[0].h == 1


# ---------------------------------------------------------------------------
# incremental connected components (cluster-id maintenance)
# ---------------------------------------------------------------------------


def _full_cc(spark, assign_rows, new_edge_rows):
    """Ground truth: full re-cluster of star(assign) UNION new edges."""
    from rapidfuzz_spark.pipeline import cluster

    assign = spark.createDataFrame(assign_rows, "doc_id string, entity_id string")
    star = assign.where(F.col("doc_id") != F.col("entity_id")).select(
        F.col("doc_id").alias("doc_id_1"), F.col("entity_id").alias("doc_id_2")
    )
    new_e = spark.createDataFrame(new_edge_rows, "doc_id_1 string, doc_id_2 string")
    comps = cluster.connected_components(star.unionByName(new_e))
    docs = assign.select("doc_id").unionByName(
        new_e.select(F.col("doc_id_1").alias("doc_id"))
    ).unionByName(new_e.select(F.col("doc_id_2").alias("doc_id"))).distinct()
    return {
        r["doc_id"]: r["entity_id"]
        for r in cluster.assign_entities(docs, comps).collect()
    }


def _inc_cc(spark, assign_rows, new_edge_rows):
    from rapidfuzz_spark.pipeline import cluster

    assign = spark.createDataFrame(assign_rows, "doc_id string, entity_id string")
    new_e = spark.createDataFrame(new_edge_rows, "doc_id_1 string, doc_id_2 string")
    out = cluster.incremental_connected_components(assign, new_e)
    return {r["doc_id"]: r["entity_id"] for r in out.collect()}


def test_incremental_cc_merge_two_old_clusters(spark):
    assign = [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1"),
              ("c1", "c1")]
    new_e = [("a2", "b2")]
    got = _inc_cc(spark, assign, new_e)
    assert got == {"a1": "a1", "a2": "a1", "b1": "a1", "b2": "a1", "c1": "c1"}
    assert got == _full_cc(spark, assign, new_e)


def test_incremental_cc_new_doc_smaller_id_takes_root(spark):
    # a brand-new doc with the smallest id becomes the merged root,
    # exactly as a full recompute would decide
    assign = [("m5", "m5"), ("m6", "m5")]
    new_e = [("a0", "m6")]
    got = _inc_cc(spark, assign, new_e)
    assert got == {"m5": "a0", "m6": "a0", "a0": "a0"}
    assert got == _full_cc(spark, assign, new_e)


def test_incremental_cc_untouched_and_intra_cluster_edges(spark):
    # edges wholly inside an existing cluster are no-ops; untouched
    # entities pass through byte-identical; isolated new self-pairs
    # become singletons
    assign = [("x1", "x1"), ("x2", "x1"), ("y1", "y1")]
    new_e = [("x1", "x2"), ("z9", "z9")]
    got = _inc_cc(spark, assign, new_e)
    assert got == {"x1": "x1", "x2": "x1", "y1": "y1", "z9": "z9"}
    assert got == _full_cc(spark, assign, new_e)


def test_incremental_cc_randomized_vs_full_recompute(spark):
    import random

    rng = random.Random(73)
    for trial in range(3):
        n = 40
        docs = [f"d{i:03d}" for i in range(n)]
        # random base clustering: partition docs into groups, entity =
        # min doc of the group (the invariant assign_entities maintains)
        groups: list[list[str]] = []
        for d in docs:
            if groups and rng.random() < 0.6:
                rng.choice(groups).append(d)
            else:
                groups.append([d])
        assign = [(d, min(g)) for g in groups for d in g]
        pool = docs + [f"n{i:03d}" for i in range(10)]
        new_e = [
            (rng.choice(pool), rng.choice(pool)) for _ in range(rng.randint(1, 25))
        ]
        got = _inc_cc(spark, assign, new_e)
        want = _full_cc(spark, assign, new_e)
        assert got == want, f"trial {trial}: {got} != {want}"


# ---------------------------------------------------------------------------
# streaming entity-id maintenance (stream_link_cc)
# ---------------------------------------------------------------------------

_SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string,"
    " media_ref string, offset int>>"
)


def _span_doc(doc_id: str, text: str):
    return (doc_id, [("text", text, None, 0)])


def test_stream_link_cc_merges_across_batches_and_restart(spark, tmp_path):
    """Batch 0's doc bridges two base entities (merge evidence the top-1
    stream_link path discards); batch 1 adds a singleton and a doc that
    joins the MERGED cluster; a restarted run (new file, same
    checkpoint) reads the maintained snapshot and keeps chaining."""
    import os
    import shutil

    from rapidfuzz_spark.pipeline import incremental, ingest
    from rapidfuzz_spark.pipeline.run import PipelineConfig

    base = spark.createDataFrame(
        [
            _span_doc("A1", "alpha beta gamma delta"),
            _span_doc("B1", "alpha beta gamma zeta"),
            _span_doc("C1", "unrelated stuff entirely"),
        ],
        _SPAN_SCHEMA,
    )
    base_t = ingest.with_match_text(base)
    initial = base.select("doc_id", F.col("doc_id").alias("entity_id"))
    conf = PipelineConfig(metric="ratio", threshold=0.85)
    src = str(tmp_path / "in")
    os.makedirs(src)

    def _add(i, rows):
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        part = str(tmp_path / f"c{i}")
        df.coalesce(1).write.parquet(part)
        f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.move(os.path.join(part, f), dst)
        os.utime(dst, (1000 + i, 1000 + i))

    def _run():
        stream = (
            spark.readStream.schema(_SPAN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = incremental.stream_link_cc(
            stream,
            base_t,
            initial,
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            conf=conf,
        )
        q.awaitTermination(180)

    # n1 matches BOTH A1 and B1 above 0.85 -> merges their entities
    _add(0, [_span_doc("n1", "alpha beta gamma delta zeta")])
    # n2 matches nothing; n3 matches B1 -> must land in the MERGED cluster
    _add(1, [_span_doc("n2", "totally different words here"),
             _span_doc("n3", "alpha beta gamma zeta eta")])
    _run()
    root = str(tmp_path / "out" / "assign")
    latest = max(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("version=")
    )
    got = {
        r.doc_id: r.entity_id
        for r in spark.read.parquet(
            os.path.join(root, f"version={latest}")
        ).collect()
    }
    assert got == {
        "A1": "A1", "B1": "A1", "n1": "A1", "n3": "A1",
        "C1": "C1", "n2": "n2",
    }
    # restart with one more file: n4 matches A1 -> joins the merged
    # cluster; everything else passes through unchanged
    _add(2, [_span_doc("n4", "alpha beta gamma delta eta")])
    _run()
    latest2 = max(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("version=")
    )
    assert latest2 > latest
    got2 = {
        r.doc_id: r.entity_id
        for r in spark.read.parquet(
            os.path.join(root, f"version={latest2}")
        ).collect()
    }
    assert got2 == {**got, "n4": "A1"}
