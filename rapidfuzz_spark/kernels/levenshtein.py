"""Levenshtein distance: uniform (bit-parallel Myers) + weighted (Wagner-Fischer).

Semantics match /root/reference/src/distance/levenshtein.rs:
- uniform kernel: Myers/Hyyrö bit-parallel (levenshtein.rs:435-507); we use
  arbitrary-precision Python ints so one code path covers all pattern
  lengths (the reference blocks into u64 words at :769-1019).
- maximum for weights (ins, del, sub):
  min(all-substitute-then-adjust, all-insert+all-delete)
  (levenshtein.rs:263-277).
- weight rewrites (levenshtein.rs:1244-1331): uniform*k when ins==del==sub,
  indel*k when sub >= ins+del, generic Wagner-Fischer otherwise.

The algorithm itself is the published Myers 1999 / Hyyrö 2003 recurrence.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from .common import MetricSurface, pm_vector, remove_common_affix

Seq = Union[str, Sequence[int]]


def myers_distance(s1: Seq, s2: Seq, pm: Optional[dict] = None) -> int:
    """Uniform Levenshtein via Myers' bit-parallel algorithm.

    ``s1`` is the pattern (bitmasked); complexity O(len2) big-int steps.
    """
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
    dist = m
    get = pm.get
    for ch in s2:
        x = get(ch, 0) | vn
        d0 = ((((x & vp) + vp) & mask) ^ vp) | x
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
    return dist


def _mbleven_models(k: int, len_diff: int, op_kinds: str = "sdi") -> list:
    """All edit-op sequences of cost <= k whose net length change matches
    ``len_diff`` (= len(s1) - len(s2) >= 0, s1 the longer side). Ops:
    's' substitution (advance both), 'd' delete-from-s1 (advance i),
    'i' insert-into-s1 == delete-from-s2 (advance j). ``op_kinds``
    restricts the alphabet — indel/LCS metrics use "di" (no
    substitutions). Enumeration-based bounded edit distance per the
    published mbleven algorithm; the reference uses precomputed tables of
    the same sequences (/root/reference/src/distance/levenshtein.rs:
    311-427, lcs_seq.rs:113-197)."""
    deltas = {"s": 0, "d": 1, "i": -1}
    out = []
    seqs = [("", 0)]
    for _ in range(k):
        nxt = []
        for ops, bal in seqs:
            for op in op_kinds:
                nxt.append((ops + op, bal + deltas[op]))
        seqs += nxt
    seen = set()
    for ops, bal in seqs:
        if bal == len_diff and ops not in seen:
            seen.add(ops)
            out.append(ops)
    return out


_MBLEVEN_CACHE: dict = {}


def mbleven_distance(s1: Seq, s2: Seq, k: int, op_kinds: str = "sdi") -> int:
    """Bounded uniform Levenshtein for k <= 3 by edit-script enumeration.

    Returns the exact distance when it is <= k, else k+1 (sentinel).
    O(models * len) with NumPy common-prefix scans — beats any DP when k
    is tiny and the strings are long (the common dedup case; reference
    routes cutoff < 4 here too, levenshtein.rs:1104-1222)."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    len_diff = len(s1) - len(s2)
    if len_diff > k:
        return k + 1
    a = _codes(s1)
    b = _codes(s2)
    la, lb = len(a), len(b)
    key = (k, len_diff, op_kinds)
    models = _MBLEVEN_CACHE.get(key)
    if models is None:
        models = _MBLEVEN_CACHE[key] = _mbleven_models(k, len_diff, op_kinds)
    best = k + 1
    for ops in models:
        if len(ops) >= best:
            continue
        i = j = cost = 0
        p = 0
        ok = True
        while True:
            n = min(la - i, lb - j)
            if n:
                neq = a[i : i + n] != b[j : j + n]
                adv = int(np.argmax(neq))
                if not neq[adv]:
                    adv = n
                i += adv
                j += adv
            if i == la and j == lb:
                break
            if p == len(ops) or cost + 1 >= best:
                ok = False
                break
            op = ops[p]
            p += 1
            cost += 1
            if op == "s":
                if i < la and j < lb:
                    i += 1
                    j += 1
                else:
                    ok = False
                    break
            elif op == "d":
                if i < la:
                    i += 1
                else:
                    ok = False
                    break
            else:
                if j < lb:
                    j += 1
                else:
                    ok = False
                    break
        if ok and cost < best:
            best = cost
            if best == 0:
                break
    return best


def bounded_distance(s1: Seq, s2: Seq, k: int, weights=(1, 1, 1)) -> int:
    """Exact distance when <= k, else any value > k. Routes tiny bounds
    to mbleven (cutoff < 4, uniform weights — levenshtein.rs:1142-1147),
    everything else to the full kernel."""
    if weights == (1, 1, 1):
        if k < 0:
            return k + 1  # nothing can pass a negative distance bound
        if abs(len(s1) - len(s2)) > k:
            return k + 1
        if k == 0:
            return 0 if s1 == s2 else 1
        if k <= 3:
            s1, s2 = remove_common_affix(s1, s2)
            if not len(s1) or not len(s2):
                return max(len(s1), len(s2))
            return mbleven_distance(s1, s2, k)
    return _dist(s1, s2, weights)


def uniform_distance(s1: Seq, s2: Seq) -> int:
    """Uniform Levenshtein with the reference's cheap pre-passes:
    affix strip (levenshtein.rs:1094-1101) then bit-parallel kernel."""
    s1, s2 = remove_common_affix(s1, s2)
    if not len(s1):
        return len(s2)
    if not len(s2):
        return len(s1)
    # pattern = shorter side keeps the mask narrow
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    return myers_distance(s1, s2)


def _codes(s: Seq) -> np.ndarray:
    if isinstance(s, str):
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return np.asarray(list(s), dtype=np.int64)


def wagner_fischer_weighted(
    s1: Seq, s2: Seq, ins: int = 1, dele: int = 1, sub: int = 1
) -> int:
    """Generic weighted Levenshtein, NumPy row-vectorized Wagner-Fischer.

    Within-row (left) dependency resolved by the prefix-min trick:
    row[j] = min_k<=j (cand[k] + (j-k)*ins)  ==  accmin(cand[k]-k*ins)+j*ins.
    O(N*M) as the reference documents for the generic case
    (levenshtein.rs:62-63).
    """
    s1, s2 = remove_common_affix(s1, s2)
    la, lb = len(s1), len(s2)
    if la == 0:
        return lb * ins
    if lb == 0:
        return la * dele
    a = _codes(s1)
    b = _codes(s2)
    j_idx = np.arange(1, lb + 1, dtype=np.int64)
    prev = np.empty(lb + 1, dtype=np.int64)
    prev[0] = 0
    prev[1:] = j_idx * ins
    step = j_idx * ins
    for i in range(1, la + 1):
        cost = np.where(b == a[i - 1], 0, sub)
        cand = np.minimum(prev[:-1] + cost, prev[1:] + dele)
        # fold in left-to-right insert chain, seeded by row[0] = i*dele
        t = np.minimum.accumulate(np.minimum(cand - step, i * dele - 0))
        new = np.empty(lb + 1, dtype=np.int64)
        new[0] = i * dele
        new[1:] = np.minimum(cand, t + step)
        prev = new
    return int(prev[-1])


def _weighted_maximum(len1: int, len2: int, ins: int, dele: int, sub: int) -> int:
    """levenshtein.rs:263-277: max distance under a weight table."""
    if len1 > len2:
        # substitute len2, delete the surplus
        max_dist = len2 * min(sub, ins + dele) + (len1 - len2) * dele
    else:
        max_dist = len1 * min(sub, ins + dele) + (len2 - len1) * ins
    return max_dist


def weighted_distance(s1: Seq, s2: Seq, weights=(1, 1, 1)) -> int:
    """Weight-table algebraic rewriting per levenshtein.rs:1244-1331."""
    ins, dele, sub = weights
    if ins == dele:
        if ins == sub:
            return uniform_distance(s1, s2) * ins
        if sub >= ins + dele:
            # substitutions never optimal -> indel distance scaled
            from .lcs_indel import indel_raw_distance

            return indel_raw_distance(s1, s2) * ins
    return wagner_fischer_weighted(s1, s2, ins, dele, sub)


def _dist(s1: Seq, s2: Seq, weights=(1, 1, 1)) -> int:
    if weights == (1, 1, 1):
        return uniform_distance(s1, s2)
    return weighted_distance(s1, s2, weights)


def _maximum(s1: Seq, s2: Seq, weights=(1, 1, 1)) -> int:
    ins, dele, sub = weights
    return _weighted_maximum(len(s1), len(s2), ins, dele, sub)


surface = MetricSurface(_dist, _maximum, bounded_dist_fn=bounded_distance)
distance = surface.distance
similarity = surface.similarity
normalized_distance = surface.normalized_distance
normalized_similarity = surface.normalized_similarity


class BatchComparator:
    """One×many with precomputed pattern state
    (levenshtein.rs:1636-1818 semantics)."""

    def __init__(self, s1: Seq, weights=(1, 1, 1)) -> None:
        self.s1 = s1
        self.weights = weights
        # weighted routing never reads the PM mask — skip the O(len(s1))
        # build it would pay for nothing
        self._pm = pm_vector(s1) if weights == (1, 1, 1) else None

    def _raw(self, s2: Seq) -> int:
        if self.weights == (1, 1, 1):
            if len(self.s1) == 0:
                return len(s2)
            if len(s2) == 0:
                return len(self.s1)
            return myers_distance(self.s1, s2, self._pm)
        return weighted_distance(self.s1, s2, self.weights)

    def distance(self, s2: Seq, *, score_cutoff=None, score_hint=None):
        raw = self._raw(s2)
        return None if score_cutoff is not None and raw > score_cutoff else raw

    def similarity(self, s2: Seq, *, score_cutoff=None, score_hint=None):
        raw = _maximum(self.s1, s2, self.weights) - self._raw(s2)
        return None if score_cutoff is not None and raw < score_cutoff else raw

    def normalized_distance(self, s2: Seq, *, score_cutoff=None, score_hint=None):
        maximum = _maximum(self.s1, s2, self.weights)
        nd = (self._raw(s2) / maximum) if maximum else 0.0
        return None if score_cutoff is not None and nd > score_cutoff else nd

    def normalized_similarity(self, s2: Seq, *, score_cutoff=None, score_hint=None):
        maximum = _maximum(self.s1, s2, self.weights)
        nd = (self._raw(s2) / maximum) if maximum else 0.0
        ns = 1.0 - nd
        return None if score_cutoff is not None and ns < score_cutoff else ns
