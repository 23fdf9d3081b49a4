"""Exact edit-distance self-join (Ed-Join prefix filter): losslessness
vs the naive all-pairs definition, short-string bucket, and the
plan-shape invariants (no all-pairs stage on the long side)."""

from __future__ import annotations

import itertools

import pytest

from rapidfuzz_spark.kernels.batch import levenshtein_batch
from rapidfuzz_spark.textops.edjoin import edit_distance_join


def _naive_pairs(rows, k):
    """All-pairs oracle via the (test-locked) batch kernel."""
    out = set()
    for (i1, s1), (i2, s2) in itertools.combinations(rows, 2):
        a, b = (i1, i2) if i1 < i2 else (i2, i1)
        d = levenshtein_batch([s1.lower()], [s2.lower()])[0]
        if d <= k:
            out.add((a, b, int(d)))
    return out


def _join_pairs(spark, rows, k, q=2, prefix_chars=None):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = edit_distance_join(df, "text", k=k, q=q, prefix_chars=prefix_chars)
    return {(r.doc_id_1, r.doc_id_2, r.dist) for r in got.collect()}


CORPUS = [
    ("d01", "the quick brown fox jumps"),
    ("d02", "the quick brown fox jump"),  # del 1
    ("d03", "the quikc brown fox jumps"),  # transposition = 2 subs
    ("d04", "a completely different doc"),
    ("d05", "the quick brown fox jumps"),  # exact dup of d01
    ("d06", "THE QUICK BROWN FOX JUMPS"),  # case-only dup
    ("d07", "lorem ipsum dolor sit amet"),
    ("d08", "lorem ipsum dolor sit ame"),
    ("d09", "xylophone quartz"),
    ("d10", "xylophone quarts"),
]


def test_matches_naive_all_pairs(spark):
    for k in (0, 1, 2, 3):
        assert _join_pairs(spark, CORPUS, k) == _naive_pairs(CORPUS, k), k


def test_short_string_bucket_and_cross_bucket(spark):
    rows = [
        ("s1", ""),
        ("s2", "a"),
        ("s3", "ab"),
        ("s4", "abc"),
        ("s5", "abcd"),
        ("s6", "abcde"),
        ("s7", "abcdef"),  # long side (n=6 > short_max=5 at k=q=2)
        ("s8", "abcdefg"),
        ("s9", "zzzzz"),
        ("s10", "qrstuv"),
    ]
    # k=2,q=2: short_max=5 — s6/s7 pairs cross the bucket boundary and
    # must come out of the prefix path (the round-trip losslessness fix)
    assert _join_pairs(spark, rows, 2) == _naive_pairs(rows, 2)
    assert _join_pairs(spark, rows, 1) == _naive_pairs(rows, 1)


def test_prefix_chars_truncation(spark):
    rows = [
        ("p1", "identical head AAAA tail one"),
        ("p2", "identical head AAAB completely other tail"),
        ("p3", "unrelated prefix entirely"),
    ]
    got = _join_pairs(spark, rows, k=1, prefix_chars=19)
    trunc = [(i, s.lower()[:19]) for i, s in rows]
    assert got == _naive_pairs(trunc, 1)


def test_qgram_width_equivalence(spark):
    # q only changes the FILTER, never the verified result
    for q in (1, 2, 3):
        assert _join_pairs(spark, CORPUS, 2, q=q) == _naive_pairs(CORPUS, 2)


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_losslessness(spark, seed):
    import random

    rng = random.Random(seed)
    alphabet = "abcdefg "
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14))) for _ in range(25)]
    rows = []
    for i, s in enumerate(base):
        rows.append((f"r{i:03d}", s))
        # planted near-dup: one random edit
        if s and rng.random() < 0.6:
            p = rng.randrange(len(s))
            op = rng.choice(["del", "sub", "ins"])
            if op == "del":
                m = s[:p] + s[p + 1 :]
            elif op == "sub":
                m = s[:p] + rng.choice(alphabet) + s[p + 1 :]
            else:
                m = s[:p] + rng.choice(alphabet) + s[p:]
            rows.append((f"m{i:03d}", m))
    assert _join_pairs(spark, rows, 2) == _naive_pairs(rows, 2)


def test_no_cartesian_on_long_side(spark):
    """The only cartesian product in the plan is the bounded short-string
    bucket; with no short strings the plan must contain none."""
    rows = [(f"x{i}", f"wordy document number {i} padded") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plan = edit_distance_join(df, "text", k=2)._jdf.queryExecution().executedPlan().toString()
    n_cart = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoop")
    # short bucket is empty but still planned: allow exactly the one
    # bucket join, nothing on the gram path
    assert n_cart <= 1, plan


# --- Monge-Elkan (textops/softtfidf.monge_elkan_pairs) -------------------


def _me_brute(t1: str, t2: str):
    """Reference Monge-Elkan with micro-int mean, normalized-lev inner."""
    import itertools as it

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i, j in it.product(range(1, len(a) + 1), range(1, len(b) + 1)):
            m[i][j] = min(
                m[i - 1][j] + 1,
                m[i][j - 1] + 1,
                m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
        return m[len(a)][len(b)]

    def direction(xs, ys):
        micro_sum = 0
        cnt = 0
        from collections import Counter

        for tok, c in Counter(xs).items():
            mx = max(1.0 - lev(tok, y) / max(len(tok), len(y)) for y in set(ys))
            micro_sum += round(mx * 1e6) * c
            cnt += c
        return round(micro_sum / (1e6 * cnt), 6)

    xs = [w for w in t1.lower().split() if w]
    ys = [w for w in t2.lower().split() if w]
    ab, ba = direction(xs, ys), direction(ys, xs)
    return ab, ba, max(ab, ba)


def test_monge_elkan_hand_values(spark):
    from rapidfuzz_spark.textops.softtfidf import monge_elkan_pairs

    rows = [
        ("a", "b", "aa bb", "aa bc"),
        ("a", "c", "aa aa bb", "aa bc"),
        ("x", "y", "paul johnson", "johson paule"),
    ]
    df = spark.createDataFrame(rows, ["doc_id_1", "doc_id_2", "t1", "t2"])
    got = {
        (r.doc_id_1, r.doc_id_2): (r.me_12, r.me_21, r.me_sym)
        for r in monge_elkan_pairs(df).collect()
    }
    assert got[("a", "b")] == (0.75, 0.75, 0.75)
    me12 = round((2 * 1e6 + 500000) / 3e6, 6)
    assert got[("a", "c")] == (me12, 0.75, me12)
    for k, (t1, t2) in {("a", "b"): rows[0][2:], ("a", "c"): rows[1][2:], ("x", "y"): rows[2][2:]}.items():
        assert got[k] == pytest.approx(_me_brute(t1, t2), abs=1e-9), k


def test_monge_elkan_randomized(spark):
    import random

    from rapidfuzz_spark.textops.softtfidf import monge_elkan_pairs

    rng = random.Random(3)
    words = ["smith", "smyth", "jon", "john", "acme", "corp", "ltd", "zz"]
    rows = []
    for i in range(30):
        t1 = " ".join(rng.choice(words) for _ in range(rng.randint(1, 6)))
        t2 = " ".join(rng.choice(words) for _ in range(rng.randint(1, 6)))
        rows.append((f"l{i}", f"r{i}", t1, t2))
    df = spark.createDataFrame(rows, ["doc_id_1", "doc_id_2", "t1", "t2"])
    got = {
        (r.doc_id_1, r.doc_id_2): (r.me_12, r.me_21, r.me_sym)
        for r in monge_elkan_pairs(df).collect()
    }
    for i1, i2, t1, t2 in rows:
        assert got[(i1, i2)] == pytest.approx(_me_brute(t1, t2), abs=1e-9)


# --- R-S (two-table) Ed-Join ---------------------------------------------


def _naive_rs(lrows, rrows, k):
    out = set()
    for i1, s1 in lrows:
        for i2, s2 in rrows:
            d = levenshtein_batch([s1.lower()], [s2.lower()])[0]
            if d <= k:
                out.add((i1, i2, int(d)))
    return out


def _join_rs(spark, lrows, rrows, k, q=2, prefix_chars=None):
    from rapidfuzz_spark.textops.edjoin import edit_distance_join_rs

    ldf = spark.createDataFrame(lrows, ["doc_id", "text"])
    rdf = spark.createDataFrame(rrows, ["doc_id", "text"])
    got = edit_distance_join_rs(ldf, rdf, "text", k=k, q=q, prefix_chars=prefix_chars)
    return {(r.doc_id_1, r.doc_id_2, r.dist) for r in got.collect()}


def test_rs_matches_naive(spark):
    lrows = CORPUS[:6]
    rrows = CORPUS[4:] + [("r1", "the quick brown fax jumps")]
    for k in (0, 1, 2):
        assert _join_rs(spark, lrows, rrows, k) == _naive_rs(lrows, rrows, k), k


def test_rs_short_and_cross_bucket(spark):
    lrows = [("l1", ""), ("l2", "ab"), ("l3", "abcde"), ("l4", "abcdef"), ("l5", "zzzz")]
    rrows = [("r1", "a"), ("r2", "abc"), ("r3", "abcdE"), ("r4", "abcdefgh"), ("r5", "zz")]
    for k in (1, 2):
        assert _join_rs(spark, lrows, rrows, k) == _naive_rs(lrows, rrows, k), k


def test_rs_same_doc_both_sides(spark):
    rows = CORPUS[:4]
    got = _join_rs(spark, rows, rows, 2)
    # every doc pairs with itself at dist 0, both directions of near-dups
    assert all((i, i, 0) in got for i, _ in rows)
    assert got == _naive_rs(rows, rows, 2)


def test_rs_randomized(spark):
    import random

    rng = random.Random(11)
    alphabet = "abcdef "
    lrows = [(f"l{i}", "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))) for i in range(20)]
    rrows = [(f"r{i}", "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))) for i in range(20)]
    # plant cross-side near-dups
    for i in range(0, 18, 3):
        s = lrows[i][1]
        if s:
            p = rng.randrange(len(s))
            rrows[i] = (rrows[i][0], s[:p] + rng.choice(alphabet) + s[p + 1 :])
    assert _join_rs(spark, lrows, rrows, 2) == _naive_rs(lrows, rrows, 2)
