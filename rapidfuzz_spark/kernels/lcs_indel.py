"""LCS-seq similarity (Hyyrö bit-parallel) + Indel distance.

Semantics match /root/reference/src/distance/lcs_seq.rs and indel.rs:
- LCS similarity = length of the longest common subsequence;
  distance = max(len1, len2) - LCS (lcs_seq.rs:549-551).
- Indel distance = len1 + len2 - 2*LCS, maximum = len1 + len2
  (indel.rs:62-105).

Algorithm: Hyyrö's published bit-parallel LCS-length recurrence
(S' = ((S + (S & M)) | (S & ~M)) equivalent form), arbitrary-precision
Python ints instead of u64 blocks.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from .common import (
    MetricSurface,
    common_prefix_len,
    common_suffix_len,
    pm_vector,
    remove_common_affix,
)

Seq = Union[str, Sequence[int]]


def lcs_length(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> int:
    """Bit-parallel LCS length; ``s1`` is the pattern."""
    m = len(s1)
    if m == 0 or len(s2) == 0:
        return 0
    if pm is None:
        pm = pm_vector(s1)
    mask = (1 << m) - 1
    s = mask
    get = pm.get
    for ch in s2:
        matches = get(ch, 0)
        u = s & matches
        s = ((s + u) & mask) | (s - u)
    # zero bits of S mark matched pattern positions
    return m - bin(s).count("1")


def lcs_similarity_raw(s1: Seq, s2: Seq) -> int:
    pfx = common_prefix_len(s1, s2)
    affix = pfx
    t1, t2 = s1[pfx:], s2[pfx:]
    sfx = common_suffix_len(t1, t2)
    affix += sfx
    if sfx:
        t1, t2 = t1[:-sfx], t2[:-sfx]
    if len(t1) > len(t2):
        t1, t2 = t2, t1
    return affix + lcs_length(t1, t2)


def _lcs_dist(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> int:
    # cached-pattern path (BatchComparator): pm is built over the FULL
    # unstripped s1, so score via lcs_length directly (the affix strip is
    # an optimization, not a semantic requirement)
    if pm is not None:
        return max(len(s1), len(s2)) - lcs_length(s1, s2, pm)
    return max(len(s1), len(s2)) - lcs_similarity_raw(s1, s2)


def _lcs_maximum(s1: Seq, s2: Seq, **_kw) -> int:
    return max(len(s1), len(s2))


def bounded_indel_distance(s1: Seq, s2: Seq, k: int, pm: Optional[dict] = None) -> int:
    """Exact indel distance when <= k, else any value > k. Tiny bounds go
    to mbleven enumeration over {delete, insert} ops — the reference's
    LCS mbleven path for max_misses < 5 (lcs_seq.rs:113-197) reached
    through indel's LCS wrapper (indel.rs:66-105). ``pm`` (cached pattern
    state) is only consulted by the full-kernel fallback."""
    if k < 0:
        return k + 1
    if abs(len(s1) - len(s2)) > k:
        return k + 1
    if k <= 4:
        from .levenshtein import mbleven_distance

        s1, s2 = remove_common_affix(s1, s2)
        if not len(s1) or not len(s2):
            return len(s1) + len(s2)
        return mbleven_distance(s1, s2, k, op_kinds="di")
    return indel_raw_distance(s1, s2, pm)


def bounded_lcs_dist(s1: Seq, s2: Seq, k: int, pm: Optional[dict] = None) -> int:
    """Exact LCS distance (max(len) - LCS) when <= k, else > k. Derived
    from the indel bound: lcs_dist = (indel + |len1-len2|) / 2."""
    len_diff = abs(len(s1) - len(s2))
    if k < 0 or len_diff > k:
        return k + 1
    k_indel = 2 * k - len_diff
    d = bounded_indel_distance(s1, s2, k_indel, pm)
    if d > k_indel:
        return k + 1
    return (d + len_diff) // 2


lcs_surface = MetricSurface(_lcs_dist, _lcs_maximum, bounded_dist_fn=bounded_lcs_dist)


def indel_raw_distance(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> int:
    """indel.rs:66-105: distance = len1 + len2 - 2*LCS."""
    if pm is not None:
        return len(s1) + len(s2) - 2 * lcs_length(s1, s2, pm)
    return len(s1) + len(s2) - 2 * lcs_similarity_raw(s1, s2)


def _indel_maximum(s1: Seq, s2: Seq, **_kw) -> int:
    return len(s1) + len(s2)


indel_surface = MetricSurface(
    indel_raw_distance, _indel_maximum, bounded_dist_fn=bounded_indel_distance
)
