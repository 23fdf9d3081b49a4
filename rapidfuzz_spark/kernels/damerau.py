"""Unrestricted Damerau-Levenshtein distance (a true metric).

Semantics match /root/reference/src/distance/damerau_levenshtein.rs:
ins/del/sub/adjacent-transposition with unlimited re-editing, so
DL("CA","ABC") = 2 (damerau_levenshtein.rs tests). maximum =
max(len1, len2) (damerau_levenshtein.rs:194-196). The reference uses the
Zhao & Sahni linear-space formulation; we use the classic published
Lowrance-Wagner DP, row-vectorized in NumPy (the within-row insert chain is
resolved with a prefix-min trick), O(N*M) time like the reference
(damerau_levenshtein.rs:45-48).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from .common import MetricSurface, remove_common_affix

Seq = Union[str, Sequence[int]]


def _codes(s: Seq) -> np.ndarray:
    if isinstance(s, str):
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return np.asarray(list(s), dtype=np.int64)


def damerau_distance_py(s1: Seq, s2: Seq) -> int:
    """Plain-Python Lowrance-Wagner; reference oracle for tests and tiny inputs."""
    la, lb = len(s1), len(s2)
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    # matrix with sentinel row/col of INF at index 0; M[i+1][j+1] = d(a[:i], b[:j])
    m = [[inf] * (lb + 2) for _ in range(la + 2)]
    for j in range(lb + 1):
        m[1][j + 1] = j
    for i in range(la + 1):
        m[i + 1][1] = i
    da: dict = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            m[i + 1][j + 1] = min(
                m[i][j] + cost,
                m[i + 1][j] + 1,
                m[i][j + 1] + 1,
                m[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[s1[i - 1]] = i
    return m[la + 1][lb + 1]


def damerau_distance_np(s1: Seq, s2: Seq) -> int:
    """Row-vectorized Lowrance-Wagner. Keeps the whole matrix (gathers into
    arbitrary earlier rows for the transposition term), vectorized over
    columns; Python loops only over rows."""
    la, lb = len(s1), len(s2)
    if la == 0:
        return lb
    if lb == 0:
        return la
    a = _codes(s1)
    b = _codes(s2)
    inf = la + lb
    m = np.full((la + 2, lb + 2), inf, dtype=np.int64)
    m[1, 1:] = np.arange(lb + 1)
    m[1:, 1] = np.arange(la + 1)
    j_idx = np.arange(1, lb + 1, dtype=np.int64)
    # last row (< i) where each b[j] occurred in a
    ub, inv = np.unique(b, return_inverse=True)
    da = np.zeros(len(ub), dtype=np.int64)
    a_in_b = np.searchsorted(ub, a)
    a_present = (a_in_b < len(ub)) & (ub[np.minimum(a_in_b, len(ub) - 1)] == a)
    for i in range(1, la + 1):
        eq = b == a[i - 1]
        cost = np.where(eq, 0, 1)
        # l = last column < j (in this row) where b matched a[i-1]
        match_pos = np.where(eq, j_idx, 0)
        run = np.maximum.accumulate(match_pos)
        l_vec = np.empty(lb, dtype=np.int64)
        l_vec[0] = 0
        l_vec[1:] = run[:-1]
        k_vec = da[inv]
        prev = m[i]
        # prev is offset by 2 sentinel cols: for cell (i, j) at col j+2,
        # diag = m[i][j] lives at prev[j+1], up = m[i][j+1] at prev[j+2]
        diag = prev[1:lb + 1] + cost
        up = prev[2:lb + 2] + 1
        trans = m[k_vec, l_vec] + (i - k_vec - 1) + 1 + (j_idx - l_vec - 1)
        cand = np.minimum(np.minimum(diag, up), trans)
        # left insert chain: row[c] = min(cand[c], min_{c'<c} row[c'] + (c-c'))
        t = np.minimum.accumulate(np.minimum(cand - j_idx, i - 0))
        m[i + 1, 2:] = np.minimum(cand, t + j_idx)
        if a_present[i - 1]:
            da[a_in_b[i - 1]] = i
    return int(m[la + 1, lb + 1])


def _dist(s1: Seq, s2: Seq) -> int:
    s1, s2 = remove_common_affix(s1, s2)
    la, lb = len(s1), len(s2)
    if la == 0 or lb == 0:
        return max(la, lb)
    if la * lb <= 256:
        return damerau_distance_py(s1, s2)
    return damerau_distance_np(s1, s2)


def _maximum(s1: Seq, s2: Seq) -> int:
    return max(len(s1), len(s2))


surface = MetricSurface(_dist, _maximum)
