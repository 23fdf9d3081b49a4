"""Deterministic synthesizer for the interleaved text+media document table.

Produces the exact ``input_hint`` shape:
    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>
plus truth tables (entities_truth, labels) for F1 evaluation.

Generation is *distributed and seed-deterministic*: entities are generated
from ``spark.range(n_entities)`` with a per-entity RNG seeded by
(seed, entity_id), so output is independent of partitioning/parallelism —
the same corpus at local[8] and local[32], and the same recipe scales to a
1000-executor cluster (no driver-side materialization).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FIRST = [
    "james", "robert", "john", "michael", "william", "david", "joseph",
    "thomas", "charles", "mary", "patricia", "jennifer", "linda",
    "elizabeth", "barbara", "susan", "jessica", "sarah", "karen",
]
LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
]
EXTRA = ["inc", "llc", "ltd", "co", "corp", "group", "the", "and", "son"]
ALPHA = "abcdefghijklmnopqrstuvwxyz"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("entity_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _perturb(rng: np.random.Generator, name: str) -> str:
    """Apply the edit operations the metrics detect (FIXTURES.md F2):
    char sub/ins/del, adjacent swap, token reorder, prefix keep."""
    ops = rng.integers(0, 6)
    chars = list(name)
    # edit positions restricted to letters (typos happen inside tokens;
    # keeps token structure intact so corruption stays metric-detectable)
    letter_idx = [i for i, c in enumerate(chars) if c != " "]
    if ops == 0:  # substitute
        i = letter_idx[int(rng.integers(0, len(letter_idx)))]
        chars[i] = ALPHA[int(rng.integers(0, 26))]
    elif ops == 1:  # insert next to a letter
        i = letter_idx[int(rng.integers(0, len(letter_idx)))]
        chars.insert(i + 1, ALPHA[int(rng.integers(0, 26))])
    elif ops == 2 and len(letter_idx) > 4:  # delete
        del chars[letter_idx[int(rng.integers(0, len(letter_idx)))]]
    elif ops == 3:  # adjacent swap within a token
        cand = [i for i in letter_idx[:-1] if chars[i + 1] != " "]
        if cand:
            i = cand[int(rng.integers(0, len(cand)))]
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    elif ops == 4:  # token reorder (canonicalized away by token sorting)
        toks = "".join(chars).split(" ")
        if len(toks) > 1:
            order = rng.permutation(len(toks))
            chars = list(" ".join(toks[i] for i in order))
    # ops == 5: keep exact
    return "".join(chars)


def _entity_docs(seed: int, ent: int) -> list:
    rng = np.random.default_rng((seed, ent))
    # distinctive third token (entity-unique id-like string, as real-world
    # records carry addresses/ids) keeps cross-entity similarity low while
    # within-entity perturbations stay small
    uniq = "".join(ALPHA[int(c)] for c in rng.integers(0, 26, size=7))
    name = (
        FIRST[int(rng.integers(0, len(FIRST)))]
        + " "
        + LAST[int(rng.integers(0, len(LAST)))]
        + " "
        + uniq
    )
    n_docs = 1 + int(rng.integers(0, 5))  # 1..5 duplicate docs per entity
    docs = []
    for d in range(n_docs):
        text = name if d == 0 else _perturb(rng, name)
        if rng.random() < 0.2:
            text = text + " " + EXTRA[int(rng.integers(0, len(EXTRA)))]
        # split the text into 1-3 text spans, interleave 0-3 media spans
        words = text.split(" ")
        n_text_spans = min(len(words), 1 + int(rng.integers(0, 3)))
        cuts = sorted(
            rng.choice(range(1, len(words)), size=n_text_spans - 1, replace=False)
        ) if n_text_spans > 1 else []
        parts, prev = [], 0
        for c in list(cuts) + [len(words)]:
            parts.append(" ".join(words[prev:c]))
            prev = c
        spans = []
        offset = 0
        for p in parts:
            if rng.random() < 0.35:
                kind = "image" if rng.random() < 0.6 else "audio"
                spans.append(
                    (kind, None, f"m://{int(rng.integers(0, 2**62)):x}", offset)
                )
                offset += 1
            spans.append(("text", p, None, offset))
            offset += 1
        if rng.random() < 0.2:
            spans.append(("image", None, f"m://{int(rng.integers(0, 2**62)):x}", offset))
        docs.append((f"d{ent:09d}_{d}", f"e{ent:09d}", spans))
    return docs


def synth_documents(spark: SparkSession, n_entities: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic corpus: (doc_id, entity_id, spans)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ent in pdf["id"]:
                rows.extend(_entity_docs(seed, int(ent)))
            yield pd.DataFrame(rows, columns=["doc_id", "entity_id", "spans"])

    parts = max(4, n_entities // 5000)
    return (
        spark.range(n_entities)
        .repartition(parts)
        .mapInPandas(gen, schema=DOC_SCHEMA)
    )


def truth_tables(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """entities_truth(doc_id, entity_id) and labels(doc_id_1, doc_id_2,
    is_match) for all same-entity pairs (cluster sizes are bounded <= 5,
    so the per-entity pair explosion is O(1) per entity at any scale)."""
    truth = docs.select("doc_id", "entity_id")
    a, b = truth.alias("a"), truth.alias("b")
    labels = (
        a.join(b, (F.col("a.entity_id") == F.col("b.entity_id")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.lit(True).alias("is_match"),
        )
    )
    return truth, labels
