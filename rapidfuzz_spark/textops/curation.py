"""End-to-end corpus curation: the keep/drop decision a training-data
pipeline actually ships, composed from the audited primitives — language
allowlist, token-count floor, quality-score floor, exact dedup, MinHash
near-dup pruning, and the duplicate-n-gram-span ceiling — with a
``drop_reason`` column so corpus reports can attribute every removal.

Plan shape at scale: each signal is its own independent job (they share
only the documents scan), joined back on doc_id — six co-partitioned
hash joins, no signal ever sees another's intermediate state, so the
heaviest stage (near-dup LSH + connected components) bounds the wall and
the cheap map-only signals (lang, quality) never wait on it in a DAG
scheduler. The decision itself is one codegen'd CASE."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    duplicate_ngram_fraction,
    exact_duplicates,
    near_duplicate_prune,
)
from .quality import quality_features

__all__ = ["curation_keep_list", "redact_pii", "PII_PATTERNS"]

# Redaction rules applied IN ORDER, each to the previous rule's output.
# Patterns are deliberately written in the common subset of Java regex
# (Spark) and RE2 (DuckDB/Go scanners) — no lookarounds, no backrefs —
# so the operator is engine-portable and SQL-oracle-verifiable (both
# engines use leftmost-first alternation, so multi-alternative rules
# agree too). Ordering is load-bearing: email before ipv4 (an address
# like user@10.0.0.7 redacts as one email, not an email fragment plus
# an IP); card before phone (a 13-19 digit Luhn-valid run is a card
# even when phone-shaped; Luhn-invalid candidates fall through to the
# phone rule untouched).
#
# The third element is an optional checksum validator: "luhn" keeps
# only regex candidates whose digits pass the Luhn mod-10 check —
# aggressive digit-run patterns stay precise because the checksum, not
# the regex, decides. The phone rule covers E.164 (+14155550123),
# separator-grouped international (+1-415-555-0123), parenthesized US
# ((415) 555 0123), and plain 3-3-4 US (415.555.0123) forms; a PII
# scrubber prefers over- to under-matching, so "100 200 3000"-style
# numeric prose is accepted collateral — callers with cleaner notions
# of a phone number pass their own rules.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", None),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", None),
    ("card", r"\b(?:\d[- ]?){12,18}\d\b", "luhn"),
    (
        "phone",
        r"\+\d{7,15}"
        r"|\+\d{1,3}[-. ]\d{2,4}[-. ]\d{3,4}(?:[-. ]\d{1,4})?"
        r"|\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}"
        r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
        None,
    ),
)


def _luhn_ok(cand):
    """Catalyst Luhn mod-10 check over a candidate string's digits —
    array expressions only (filter/reverse/transform/aggregate), so the
    validated rule keeps redact_pii's zero-Python zero-shuffle shape."""
    digits = F.reverse(
        F.filter(F.split(cand, ""), lambda ch: ch.rlike("^[0-9]$"))
    )
    contrib = F.transform(
        digits,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(
                d.cast("int") * 2
            ),
        ).otherwise(d.cast("int")),
    )
    return F.aggregate(contrib, F.lit(0), lambda a, x: a + x) % 10 == 0


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: Sequence[tuple] = PII_PATTERNS,
    key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, redacted, n_<kind>...): scrub personally identifiable
    substrings before training export — each pattern's matches are
    counted and replaced with a ``<kind>`` token, sequentially, so a
    later pattern never re-matches an earlier redaction's remains.
    Patterns are ``(kind, regex)`` or ``(kind, regex, validator)``;
    validator ``"luhn"`` keeps only candidates passing the Luhn mod-10
    checksum (credit-card kinds), replacing each surviving candidate's
    occurrences with ``<kind>`` and counting every matched occurrence.

    Plan shape: a chain of codegen'd ``regexp_replace``/
    ``regexp_extract_all`` expressions — pure JVM map stage, zero
    Python, zero shuffle, scales linearly with corpus bytes at any
    cluster size (the same shape as the quality scorers); validated
    kinds add array higher-order functions (filter/aggregate) to the
    same map stage. NULL text stays NULL with all counts 0.
    """
    cur = F.col(text_col)
    cols = [F.col(key_col).alias("doc_id")]
    counts = []
    for entry in patterns:
        kind, pat = entry[0], entry[1]
        validator = entry[2] if len(entry) > 2 else None
        if validator == "luhn":
            valid = F.filter(
                F.regexp_extract_all(cur, F.lit(pat), F.lit(0)), _luhn_ok
            )
            counts.append(
                F.when(F.col(text_col).isNull(), F.lit(0))
                .otherwise(F.size(valid))
                .alias(f"n_{kind}")
            )
            # fold the validated candidates into the text: replace() of
            # each literal candidate (all its occurrences; a repeated
            # candidate's second fold is a no-op)
            cur = F.aggregate(
                valid,
                cur,
                lambda acc, c: F.replace(acc, c, F.lit(f"<{kind}>")),
            )
        elif validator is None:
            counts.append(
                F.when(F.col(text_col).isNull(), F.lit(0))
                .otherwise(
                    F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
                )
                .alias(f"n_{kind}")
            )
            cur = F.regexp_replace(cur, pat, f"<{kind}>")
        else:
            raise ValueError(f"unknown validator {validator!r} for {kind}")
    return docs.select(*cols, cur.alias("redacted"), *counts)


def curation_keep_list(
    docs: DataFrame,
    allowed_langs: Sequence[str] = ("en", "de", "fr", "es"),
    min_tokens: int = 12,
    min_quality: float = 0.8,
    max_dup_frac: float = 0.5,
    ngram_n: int = 8,
    lsh_bucket_cap: int | None = 5000,
) -> DataFrame:
    """(doc_id, lang, drop_reason, keep): one row per input document.
    ``drop_reason`` is the FIRST failing rule in a fixed priority order
    (cheap metadata rules first, so corpus reports attribute a document
    to the earliest filter that would have caught it):

    1. ``lang``            — language not in the allowlist
    2. ``too_few_tokens``  — whitespace token count below ``min_tokens``
    3. ``low_quality``     — composite quality score below ``min_quality``
    4. ``exact_duplicate`` — byte-identical to a lower-doc_id document
    5. ``near_duplicate``  — in a MinHash/Jaccard near-dup cluster and
       not its canonical (min-doc_id) member
    6. ``dup_ngrams``      — duplicate word-n-gram fraction above
       ``max_dup_frac`` (boilerplate-heavy even after doc-level dedup)

    ``keep`` is true iff no rule fires. Deduplication keeps exactly one
    member per duplicate cluster regardless of the other rules, matching
    the reported-corpus convention: a cluster's canonical doc can still
    be dropped for quality, but its duplicates are attributed to
    duplication, not to whatever else is also wrong with them.

    The duplicate-n-gram signal is computed over the DEDUPLICATED corpus
    (cluster canonicals only): counting gram document-frequency over the
    raw corpus would flag every duplicate cluster's canonical as
    boilerplate purely because its own copies repeat its grams — the
    doc-level and span-level signals must not double-count the same
    duplication (Lee et al. 2022 run substring dedup after document
    dedup for the same reason)."""
    q = quality_features(docs).select("doc_id", "n_tokens", "quality")
    ex = exact_duplicates(docs).select(
        "doc_id", F.col("canonical_id").alias("exact_canon")
    )
    nd = near_duplicate_prune(docs, bucket_cap=lsh_bucket_cap).select(
        "doc_id", F.col("canonical_id").alias("near_canon")
    )
    survivors = (
        ex.join(nd, "doc_id")
        .where(
            (F.col("exact_canon") == F.col("doc_id"))
            & (F.col("near_canon") == F.col("doc_id"))
        )
        .select("doc_id")
    )
    dn = duplicate_ngram_fraction(
        docs.join(survivors, "doc_id"), n=ngram_n
    ).select("doc_id", "dup_frac")
    j = (
        docs.select("doc_id", "lang")
        .join(q, "doc_id")
        .join(ex, "doc_id")
        .join(nd, "doc_id")
        # left: non-canonical docs have no dup_frac — an earlier dedup
        # rule always fires for them before the CASE reaches it
        .join(dn, "doc_id", "left")
    )
    reason = (
        # isNull explicitly: NULL lang must be DROPPED by an allowlist,
        # but `~isin` alone evaluates to NULL and skips the branch
        F.when(
            F.col("lang").isNull() | ~F.col("lang").isin(*allowed_langs),
            F.lit("lang"),
        )
        .when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(F.col("exact_canon") != F.col("doc_id"), F.lit("exact_duplicate"))
        .when(F.col("near_canon") != F.col("doc_id"), F.lit("near_duplicate"))
        .when(F.col("dup_frac") > max_dup_frac, F.lit("dup_ngrams"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "doc_id", "lang", reason.alias("drop_reason")
    ).withColumn("keep", F.col("drop_reason").isNull())
