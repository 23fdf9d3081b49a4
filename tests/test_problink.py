"""Fellegi-Sunter EM linkage (pipeline/problink.py): the estimator must
actually *resolve entities* on planted ground truth — not just replay
deterministically (the driver oracle covers bit-exactness)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rapidfuzz_spark import functions as RF
from rapidfuzz_spark.pipeline import problink


def _planted(spark, n_entities: int = 40):
    """Two records per entity: the duplicate keeps the name up to a
    1-char suffix tweak, the same segment, a nearby balance. Distinct
    entities get unrelated (hash-derived — no shared prefix that would
    saturate Jaro-Winkler) names/segments/balances."""
    import hashlib

    rows = []
    segs = ["AUTO", "BUILD", "FURN", "HOUSE", "MACH"]
    for e in range(n_entities):
        dig = hashlib.md5(f"entity-{e}".encode()).digest()
        name = "".join(chr(97 + b % 26) for b in dig[:10])
        bal = 1000.0 * e
        rows.append((2 * e, name, segs[e % 5], bal, e))
        tweak = "q" if name[-1] != "q" else "z"
        rows.append((2 * e + 1, name[:-1] + tweak, segs[e % 5], bal + 7.0, e))
    return spark.createDataFrame(
        rows, "rid long, name string, seg string, bal double, entity long"
    )


@pytest.fixture(scope="module")
def scored(spark):
    recs = _planted(spark).cache()
    a, b = recs.alias("a"), recs.alias("b")
    pairs = a.join(b, F.col("a.rid") < F.col("b.rid")).select(
        F.col("a.rid").alias("id_1"),
        F.col("b.rid").alias("id_2"),
        (F.col("a.entity") == F.col("b.entity")).alias("truth"),
        problink.similarity_level(
            RF.jaro_winkler_similarity(F.col("a.name"), F.col("b.name")),
            0.9,
            0.7,
        ).alias("g_name"),
        problink.exact_level(F.col("a.seg"), F.col("b.seg")).alias("g_seg"),
        problink.numeric_band_level(
            F.col("a.bal"), F.col("b.bal"), 50.0, 500.0
        ).alias("g_bal"),
    )
    out = problink.fs_em_linkage(
        pairs, ["g_name", "g_seg", "g_bal"], [3, 2, 3], iters=5
    )
    return out.collect()


def test_em_separates_planted_entities(scored):
    """Posterior >= 0.5 must recover the planted duplicate pairs with
    F1 >= 0.95 — the Fellegi-Sunter point, unsupervised."""
    tp = sum(1 for r in scored if r.truth and r.posterior >= 0.5)
    fp = sum(1 for r in scored if not r.truth and r.posterior >= 0.5)
    fn = sum(1 for r in scored if r.truth and r.posterior < 0.5)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    assert f1 >= 0.95, (tp, fp, fn)


def test_em_posteriors_polarized(scored):
    """True pairs should sit near 1, non-pairs near 0 — the two-class
    mixture must actually polarize, not hedge at lambda."""
    true_post = [r.posterior for r in scored if r.truth]
    false_post = [r.posterior for r in scored if not r.truth]
    assert min(true_post) > 0.99
    assert max(false_post) < 0.5  # every non-pair below the boundary
    assert sorted(false_post)[int(0.9 * len(false_post))] < 0.05


def test_em_fit_params_oriented(spark):
    """On the planted data the fitted m must dominate u at the top
    agreement level of every informative field (matches agree, random
    pairs mostly don't)."""
    recs = _planted(spark)
    a, b = recs.alias("a"), recs.alias("b")
    pairs = a.join(b, F.col("a.rid") < F.col("b.rid")).select(
        problink.similarity_level(
            RF.jaro_winkler_similarity(F.col("a.name"), F.col("b.name")),
            0.9,
            0.7,
        ).alias("g_name"),
        problink.exact_level(F.col("a.seg"), F.col("b.seg")).alias("g_seg"),
        problink.numeric_band_level(
            F.col("a.bal"), F.col("b.bal"), 50.0, 500.0
        ).alias("g_bal"),
    )
    rows = problink.pattern_counts(
        pairs, ["g_name", "g_seg", "g_bal"]
    ).collect()
    pats = {
        (r.g_name, r.g_seg, r.g_bal): r["count"] for r in rows
    }
    lam, m, u = problink.em_fit(pats, [3, 2, 3], iters=5)
    assert m[0][2] > u[0][2]  # name agreement
    assert m[2][2] > u[2][2]  # balance closeness
    # planted match share: 40 true pairs / C(80,2)=3160 — lambda lands
    # near it rather than at the 0.05 init
    assert 0.005 < lam < 0.05


def test_em_deterministic_under_repartition(spark):
    recs = _planted(spark, n_entities=15)
    a, b = recs.alias("a"), recs.alias("b")
    pairs = a.join(b, F.col("a.rid") < F.col("b.rid")).select(
        F.col("a.rid").alias("id_1"),
        F.col("b.rid").alias("id_2"),
        problink.exact_level(F.col("a.seg"), F.col("b.seg")).alias("g_seg"),
        problink.numeric_band_level(
            F.col("a.bal"), F.col("b.bal"), 50.0, 500.0
        ).alias("g_bal"),
    )
    one = {
        (r.id_1, r.id_2): r.posterior
        for r in problink.fs_em_linkage(
            pairs, ["g_seg", "g_bal"], [2, 3], iters=3
        ).collect()
    }
    two = {
        (r.id_1, r.id_2): r.posterior
        for r in problink.fs_em_linkage(
            pairs.repartition(13), ["g_seg", "g_bal"], [2, 3], iters=3
        ).collect()
    }
    assert one == two


def test_em_unobserved_level_clamps():
    """A level that never occurs keeps the 1e-6 floor (no zero
    products downstream), and probabilities stay in the clamp range."""
    pats = {(0, 0): 90, (1, 1): 10}  # level 2 of field 1 never observed
    lam, m, u = problink.em_fit(pats, [2, 3], iters=4)
    assert m[1][2] == problink._CLAMP_LO and u[1][2] == problink._CLAMP_LO
    for tab in (m, u):
        for f in tab:
            for p in f:
                assert problink._CLAMP_LO <= p <= problink._CLAMP_HI
    assert problink._CLAMP_LO <= lam <= problink._CLAMP_HI


def test_tf_adjusted_weights_hand_values(spark):
    """Rare-value agreement must out-weigh common-value agreement; all
    numbers replayed by hand (m=0.9, lam=0.5 for easy arithmetic)."""
    import math

    from pyspark.sql import functions as F

    from rapidfuzz_spark.pipeline.problink import tf_adjusted_weights

    docs = spark.createDataFrame(
        [("d1", "john a"), ("d2", "john b"), ("d3", "john c"),
         ("d4", "zara d"), ("d5", "mia e")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [("d1", "d2", "john", "john"),   # common agree: p=3/5
         ("d4", "x", "zara", "zara"),    # rare agree:   p=1/5
         ("d1", "d4", "john", "zara")],  # disagree
        ["id_1", "id_2", "v1", "v2"],
    )
    out = {
        (r.id_1, r.id_2): (r.agree, r.match_weight, r.posterior)
        for r in tf_adjusted_weights(
            pairs, docs,
            F.split(F.trim(F.lower("text")), r"\s+").getItem(0),
            "v1", "v2", m=0.9, lam=0.5,
        ).collect()
    }
    # u = (3^2 + 1 + 1) / 25 = 0.44
    bf_john = 0.9 * 5 / 3          # 1.5
    bf_zara = 0.9 * 5 / 1          # 4.5
    bf_dis = (1.0 - 0.9) / (1.0 - 11 / 25.0)

    def mw_post(bf):
        return (round(math.log2(bf), 6),
                round(0.5 * bf / (0.5 * bf + 0.5), 6))

    assert out[("d1", "d2")] == (True, *mw_post(bf_john))
    assert out[("d4", "x")] == (True, *mw_post(bf_zara))
    assert out[("d1", "d4")] == (False, *mw_post(bf_dis))
    # rare agreement strictly stronger than common agreement
    assert out[("d4", "x")][1] > out[("d1", "d2")][1]


def test_adjusted_rand_index_hand_values(spark):
    """ARI vs hand-computed contingency arithmetic, including the
    perfect-match and independent-split corners."""
    from rapidfuzz_spark.pipeline.metrics import adjusted_rand_index

    # classic example: pred splits {a,b,c}{d,e,f}, truth {a,b}{c,d,e,f}
    assign = spark.createDataFrame(
        [("a", "p1", "t1"), ("b", "p1", "t1"), ("c", "p1", "t2"),
         ("d", "p2", "t2"), ("e", "p2", "t2"), ("f", "p2", "t2")],
        ["doc_id", "pred", "truth"],
    )
    r = adjusted_rand_index(assign).collect()[0]
    # cells: (p1,t1)=2 (p1,t2)=1 (p2,t2)=3 -> idx = 1 + 0 + 3 = 4
    # a: C(3,2)*2 = 6 ; b: C(2,2)=1 + C(4,2)=6 -> 7 ; cn2 = 15
    # ari = 2*(4*15 - 42) / ((6+7)*15 - 2*42) = 36/111
    assert (r.n_docs, r.idx, r.a_sum, r.b_sum) == (6, 4, 6, 7)
    assert r.ari == round(36 / 111, 6)
    # identical clusterings -> ARI 1.0
    same = spark.createDataFrame(
        [("a", "x", "x"), ("b", "x", "x"), ("c", "y", "y")],
        ["doc_id", "pred", "truth"],
    )
    assert adjusted_rand_index(same).collect()[0].ari == 1.0
    # degenerate: everything one cluster on both sides -> den = 0 -> null
    one = spark.createDataFrame(
        [("a", "x", "t"), ("b", "x", "t")], ["doc_id", "pred", "truth"]
    )
    assert adjusted_rand_index(one).collect()[0].ari is None
