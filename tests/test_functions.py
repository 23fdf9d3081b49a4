"""UDF parity: every pandas-UDF Column function must agree with the scalar
API (which is itself oracle-tested against the reference) on a mixed batch
of pairs, including nulls and cutoff filtering."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import rapidfuzz_spark.functions as RF
from rapidfuzz_spark import api

random.seed(11)
POOL = "abcdef XYИ香"
PAIRS = [
    (
        "".join(random.choice(POOL) for _ in range(random.randint(0, 40))),
        "".join(random.choice(POOL) for _ in range(random.randint(0, 40))),
    )
    for _ in range(300)
] + [
    ("South Korea", "North Korea"),
    ("kitten", "sitting"),
    ("", ""),
    ("a" * 100, "b" * 100),
    (None, "x"),
    ("x", None),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, ["s1", "s2"]).cache()


METRICS = [
    "levenshtein",
    "indel",
    "lcs_seq",
    "osa",
    "damerau_levenshtein",
    "jaro",
    "jaro_winkler",
    "prefix",
    "postfix",
]
VARIANTS = ["distance", "similarity", "normalized_distance", "normalized_similarity"]


@pytest.mark.parametrize("metric", METRICS)
def test_udf_matches_scalar(spark, pairs_df, metric):
    cols = [
        getattr(RF, f"{metric}_{v}")("s1", "s2").alias(v) for v in VARIANTS
    ]
    rows = pairs_df.select("s1", "s2", *cols).collect()
    scalar = getattr(api, metric)
    for r in rows:
        if r.s1 is None or r.s2 is None:
            for v in VARIANTS:
                assert r[v] is None
            continue
        for v in VARIANTS:
            exp = getattr(scalar, v)(r.s1, r.s2)
            got = r[v]
            assert got == pytest.approx(exp, abs=1e-9), (metric, v, r.s1, r.s2)


def test_udf_cutoff_null_semantics(spark, pairs_df):
    rows = (
        pairs_df.na.drop()
        .select(
            "s1",
            "s2",
            RF.levenshtein_distance("s1", "s2", score_cutoff=5).alias("d5"),
            RF.ratio("s1", "s2", score_cutoff=0.5).alias("r05"),
        )
        .collect()
    )
    for r in rows:
        d = api.levenshtein.distance(r.s1, r.s2)
        assert r.d5 == (d if d <= 5 else None)
        rt = api.fuzz.ratio(r.s1, r.s2)
        assert (r.r05 is None) == (rt < 0.5)
        if r.r05 is not None:
            assert r.r05 == pytest.approx(rt)


def test_hamming_udf_null_on_length_mismatch(spark):
    df = spark.createDataFrame([("ham", "hamming"), ("abc", "abd")], ["s1", "s2"])
    rows = df.select(
        RF.hamming_distance("s1", "s2").alias("strict"),
        RF.hamming_distance("s1", "s2", pad=True).alias("padded"),
    ).collect()
    assert rows[0].strict is None and rows[0].padded == 4
    assert rows[1].strict == 1 and rows[1].padded == 1


def test_weighted_levenshtein_udf(spark):
    df = spark.createDataFrame([("kitten", "sitting")], ["s1", "s2"])
    r = df.select(
        RF.levenshtein_distance("s1", "s2", weights=(1, 1, 2)).alias("w")
    ).collect()[0]
    assert r.w == 5


def test_token_sort_key(spark):
    df = spark.createDataFrame([("New York  Mets!",), ("mets york new",)], ["t"])
    vals = [r.k for r in df.select(RF.token_sort_key("t").alias("k")).collect()]
    assert vals[0] == vals[1] == "mets new york"


def test_hamming_strict_mode(spark):
    """Column-API parity with the scalar API's DifferentLengthArgs
    (reference hamming.rs:232-235): strict=True fails the job on unequal
    lengths, the default yields null."""
    import pytest

    import rapidfuzz_spark.functions as RF

    df = spark.createDataFrame([("abc", "abd"), ("ab", "abcd")], "a string, b string")
    got = [r.d for r in df.select(RF.hamming_distance("a", "b").alias("d")).collect()]
    assert sorted(got, key=str) == [1, None]
    with pytest.raises(Exception, match="DifferentLengthArgs|unequal lengths"):
        df.select(RF.hamming_distance("a", "b", strict=True).alias("d")).collect()
