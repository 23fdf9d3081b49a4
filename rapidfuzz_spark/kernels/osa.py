"""Optimal String Alignment distance (restricted Damerau-Levenshtein).

Semantics match /root/reference/src/distance/osa.rs: ins/del/sub/adjacent
transposition, but each substring may be edited at most once, so
OSA("CA","ABC") = 3 while unrestricted Damerau gives 2 (osa.rs:21-22).
maximum = max(len1, len2) (osa.rs:232-234).

Algorithm: Hyyrö's published bit-parallel Damerau/OSA variant (the
transposition carry D0 |= ((~D0_prev & PM) << 1) & PM_prev), with
arbitrary-precision Python ints.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from .common import MetricSurface, pm_vector, remove_common_affix

Seq = Union[str, Sequence[int]]


def osa_distance_kernel(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> int:
    m = len(s1)
    if m == 0:
        return len(s2)
    if len(s2) == 0:
        return m
    if pm is None:
        pm = pm_vector(s1)
    mask = (1 << m) - 1
    last = 1 << (m - 1)
    vp = mask
    vn = 0
    d0 = 0
    pm_prev = 0
    dist = m
    get = pm.get
    for ch in s2:
        pm_j = get(ch, 0)
        tr = ((((~d0) & pm_j) << 1) & pm_prev) & mask
        d0 = (((pm_j & vp) + vp) & mask) ^ vp
        d0 = d0 | pm_j | vn | tr
        hp = vn | (~(d0 | vp) & mask)
        hn = d0 & vp
        if hp & last:
            dist += 1
        if hn & last:
            dist -= 1
        hp = ((hp << 1) | 1) & mask
        hn = (hn << 1) & mask
        vp = hn | (~(d0 | hp) & mask)
        vn = hp & d0
        pm_prev = pm_j
    return dist


def _dist(s1: Seq, s2: Seq) -> int:
    s1, s2 = remove_common_affix(s1, s2)
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    return osa_distance_kernel(s1, s2)


def _maximum(s1: Seq, s2: Seq) -> int:
    return max(len(s1), len(s2))


surface = MetricSurface(_dist, _maximum)
