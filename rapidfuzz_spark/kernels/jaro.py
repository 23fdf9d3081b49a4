"""Jaro and Jaro-Winkler similarity.

Semantics match /root/reference/src/distance/jaro.rs and jaro_winkler.rs:
- jaro = (m/len1 + m/len2 + (m-t)/m) / 3 over window-bounded greedy common
  chars m and transpositions t (jaro.rs:106-119); match window
  bound = max(len1, len2)/2 - 1, floored at 0 (jaro.rs:457-470).
- both-empty -> 1.0, one-empty -> 0.0; m == 0 -> 0.0.
- jaro_winkler: sim += prefix_len(<=4) * prefix_weight * (1 - sim), applied
  only when sim > 0.7; default prefix_weight = 0.1 (jaro_winkler.rs:36,78-98).
- maximum = 1.0; distance = 1 - similarity.

Char flagging is the published bit-parallel formulation: per text char,
candidate = PM[c] & window & ~flagged, take lowest set bit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from .common import MetricSurface, pm_vector

Seq = Union[str, Sequence[int]]


def jaro_similarity(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    bound = max(l1, l2) // 2 - 1
    if bound < 0:
        bound = 0
    if pm is None:
        pm = pm_vector(s1)
    full = (1 << l1) - 1
    flagged1 = 0
    matched2: list = []
    get = pm.get
    for j in range(l2):
        lo = j - bound
        if lo < 0:
            lo = 0
        width = j + bound + 1 - lo
        window = ((1 << width) - 1) << lo
        cand = get(s2[j], 0) & window & ~flagged1 & full
        if cand:
            flagged1 |= cand & -cand
            matched2.append(s2[j])
    m = len(matched2)
    if m == 0:
        return 0.0
    # matched chars of s1 in position order vs matched chars of s2 in order
    t = 0
    rest = flagged1
    for ch2 in matched2:
        bit = rest & -rest
        rest ^= bit
        if s1[bit.bit_length() - 1] != ch2:
            t += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler_similarity(
    s1: Seq, s2: Seq, prefix_weight: float = 0.1, pm: Optional[dict] = None
) -> float:
    sim = jaro_similarity(s1, s2, pm)
    if sim > 0.7:
        pfx = 0
        n = min(len(s1), len(s2), 4)
        while pfx < n and s1[pfx] == s2[pfx]:
            pfx += 1
        sim += pfx * prefix_weight * (1.0 - sim)
    return min(sim, 1.0)


def _jaro_dist(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> float:
    return 1.0 - jaro_similarity(s1, s2, pm)


def _jw_dist(
    s1: Seq, s2: Seq, prefix_weight: float = 0.1, pm: Optional[dict] = None
) -> float:
    return 1.0 - jaro_winkler_similarity(s1, s2, prefix_weight, pm)


def _one(s1: Seq, s2: Seq, **kw) -> float:
    return 1.0


jaro_surface = MetricSurface(_jaro_dist, _one, integral=False)
jaro_winkler_surface = MetricSurface(_jw_dist, _one, integral=False)
