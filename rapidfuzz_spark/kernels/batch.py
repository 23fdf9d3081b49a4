"""Batch (many-pairs) scoring engine — the Arrow-batch hot path.

This is the Spark analogue of the reference's ``BatchComparator`` one×many
caching (/root/reference/src/distance/levenshtein.rs:1625-1657,
Readme.md:100-106), applied *within* an Arrow batch of a pandas UDF:

- pairs whose pattern fits one machine word (len <= 64) and is latin-1
  encodable are scored by a **NumPy-vectorized Myers/Hyyrö kernel across
  pairs**: the char loop runs over text positions, each step processing
  every still-active pair with uint64 SIMD-ish ops. Pairs are sorted by
  text length so the active set is a shrinking prefix (no wasted lanes).
- remaining pairs take the arbitrary-precision Python-int kernels with a
  per-batch pattern-mask cache keyed by the pattern string (the
  BatchComparator analogue: pattern state is built once per distinct s1).

No per-row Python UDF dispatch ever happens on the Spark side — one UDF
call scores the whole Arrow batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import damerau as _damerau
from . import hamming as _hamming
from . import jaro as _jaro
from . import osa as _osa
from .common import common_prefix_len, common_suffix_len, pm_vector
from .levenshtein import myers_distance, wagner_fischer_weighted
from .lcs_indel import lcs_length

_POPCNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint64)


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    return _POPCNT_TABLE[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


def _encode_latin1(strings) -> Optional[tuple]:
    """Concatenate latin-1 codes; None if any string is not latin-1."""
    try:
        blob = "".join(strings).encode("latin-1")
    except UnicodeEncodeError:
        return None
    codes = np.frombuffer(blob, dtype=np.uint8).astype(np.intp)
    lens = np.fromiter((len(s) for s in strings), dtype=np.intp, count=len(strings))
    offs = np.zeros(len(strings) + 1, dtype=np.intp)
    np.cumsum(lens, out=offs[1:])
    return codes, lens, offs


def _build_pm_word(pats: list, codes, lens, offs) -> np.ndarray:
    """PM bitmask table, shape (n, 256) uint64, for patterns of len <= 64."""
    n = len(pats)
    pm = np.zeros((n, 256), dtype=np.uint64)
    rows = np.repeat(np.arange(n, dtype=np.intp), lens)
    pos = np.arange(len(codes), dtype=np.int64) - np.repeat(offs[:-1], lens)
    bits = (np.uint64(1) << pos.astype(np.uint64))
    np.bitwise_or.at(pm, (rows, codes), bits)
    return pm


def _word_masks(lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mask = np.array([(1 << int(m)) - 1 for m in lens], dtype=np.uint64)
    last = (np.uint64(1) << (lens.astype(np.uint64) - np.uint64(1)))
    return mask, last


def myers_batch_word(pats: list, texts: list) -> np.ndarray:
    """Vectorized-across-pairs Myers for patterns with len in [1, 64].

    Returns int64 distances. All strings must be latin-1 encodable and
    texts non-empty (callers handle the trivial cases).
    """
    n = len(pats)
    enc_p = _encode_latin1(pats)
    enc_t = _encode_latin1(texts)
    assert enc_p is not None and enc_t is not None
    pcodes, plens, poffs = enc_p
    tcodes, tlens, toffs = enc_t
    # sort by text length desc -> active pairs are a prefix at every step
    order = np.argsort(-tlens, kind="stable")
    inv = np.empty(n, dtype=np.intp)
    inv[order] = np.arange(n, dtype=np.intp)
    pm = _build_pm_word(pats, pcodes, plens, poffs)[order]
    plens_s = plens[order]
    tlens_s = tlens[order]
    toffs_s = toffs[:-1][order]
    mask, last = _word_masks(plens_s)
    one = np.uint64(1)
    vp = mask.copy()
    vn = np.zeros(n, dtype=np.uint64)
    dist = plens_s.astype(np.int64).copy()
    max_t = int(tlens_s[0]) if n else 0
    active = n
    rows = np.arange(n, dtype=np.intp)
    for j in range(max_t):
        # shrink the active prefix
        while active > 0 and tlens_s[active - 1] <= j:
            active -= 1
        a = slice(0, active)
        cj = tcodes[toffs_s[a] + j]
        pm_j = pm[rows[a], cj]
        x = pm_j | vn[a]
        d0 = (((x & vp[a]) + vp[a]) ^ vp[a]) | x
        hp = vn[a] | ~(d0 | vp[a])
        hn = d0 & vp[a]
        dist[a] += ((hp & last[a]) != 0).astype(np.int64)
        dist[a] -= ((hn & last[a]) != 0).astype(np.int64)
        hp = ((hp << one) | one) & mask[a]
        hn = (hn << one) & mask[a]
        vp[a] = hn | (~(d0 | hp) & mask[a])
        vn[a] = hp & d0
    return dist[inv]


def lcs_batch_word(pats: list, texts: list) -> np.ndarray:
    """Vectorized-across-pairs Hyyrö LCS length for patterns len in [1, 64]."""
    n = len(pats)
    pcodes, plens, poffs = _encode_latin1(pats)
    tcodes, tlens, toffs = _encode_latin1(texts)
    order = np.argsort(-tlens, kind="stable")
    inv = np.empty(n, dtype=np.intp)
    inv[order] = np.arange(n, dtype=np.intp)
    pm = _build_pm_word(pats, pcodes, plens, poffs)[order]
    plens_s = plens[order]
    tlens_s = tlens[order]
    toffs_s = toffs[:-1][order]
    mask, _ = _word_masks(plens_s)
    s = mask.copy()
    max_t = int(tlens_s[0]) if n else 0
    active = n
    rows = np.arange(n, dtype=np.intp)
    for j in range(max_t):
        while active > 0 and tlens_s[active - 1] <= j:
            active -= 1
        a = slice(0, active)
        m = pm[rows[a], tcodes[toffs_s[a] + j]]
        u = s[a] & m
        s[a] = ((s[a] + u) & mask[a]) | (s[a] - u)
    return plens_s[inv].astype(np.int64) - _popcount_u64(s[inv]).astype(np.int64)


def _affix_strip_pair(a: str, b: str) -> tuple[str, str, int]:
    pfx = common_prefix_len(a, b)
    a, b = a[pfx:], b[pfx:]
    sfx = common_suffix_len(a, b)
    if sfx:
        a, b = a[:-sfx], b[:-sfx]
    return a, b, pfx + sfx


def _is_word_ok(s: str) -> bool:
    if len(s) > 64:
        return False
    try:
        s.encode("latin-1")
        return True
    except UnicodeEncodeError:
        return False


def levenshtein_batch(a_arr, b_arr) -> np.ndarray:
    """Uniform Levenshtein distances for paired object arrays of str."""
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    np_idx: list = []
    np_p: list = []
    np_t: list = []
    pm_cache: dict = {}
    for i in range(n):
        a, b = a_arr[i], b_arr[i]
        if a == b:
            continue
        sa, sb, _ = _affix_strip_pair(a, b)
        if not sa or not sb:
            out[i] = max(len(sa), len(sb))
            continue
        if len(sa) > len(sb):
            sa, sb = sb, sa
        if _is_word_ok(sa) and _is_word_ok(sb):
            np_idx.append(i)
            np_p.append(sa)
            np_t.append(sb)
        else:
            pm = pm_cache.get(sa)
            if pm is None:
                pm = pm_cache[sa] = pm_vector(sa)
            out[i] = myers_distance(sa, sb, pm)
    if np_idx:
        out[np.asarray(np_idx, dtype=np.intp)] = myers_batch_word(np_p, np_t)
    return out


def lcs_similarity_batch(a_arr, b_arr) -> np.ndarray:
    """LCS lengths for paired object arrays of str."""
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    np_idx: list = []
    np_p: list = []
    np_t: list = []
    base: list = []
    pm_cache: dict = {}
    for i in range(n):
        a, b = a_arr[i], b_arr[i]
        if a == b:
            out[i] = len(a)
            continue
        sa, sb, affix = _affix_strip_pair(a, b)
        if not sa or not sb:
            out[i] = affix
            continue
        if len(sa) > len(sb):
            sa, sb = sb, sa
        if _is_word_ok(sa) and _is_word_ok(sb):
            np_idx.append(i)
            np_p.append(sa)
            np_t.append(sb)
            base.append(affix)
        else:
            pm = pm_cache.get(sa)
            if pm is None:
                pm = pm_cache[sa] = pm_vector(sa)
            out[i] = affix + lcs_length(sa, sb, pm)
    if np_idx:
        idx = np.asarray(np_idx, dtype=np.intp)
        out[idx] = np.asarray(base, dtype=np.int64) + lcs_batch_word(np_p, np_t)
    return out


def indel_batch(a_arr, b_arr) -> np.ndarray:
    lens = np.fromiter(
        (len(a) + len(b) for a, b in zip(a_arr, b_arr)), dtype=np.int64, count=len(a_arr)
    )
    return lens - 2 * lcs_similarity_batch(a_arr, b_arr)


def osa_batch(a_arr, b_arr) -> np.ndarray:
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    pm_cache: dict = {}
    for i in range(n):
        a, b = a_arr[i], b_arr[i]
        if a == b:
            continue
        sa, sb, _ = _affix_strip_pair(a, b)
        if not sa or not sb:
            out[i] = max(len(sa), len(sb))
            continue
        if len(sa) > len(sb):
            sa, sb = sb, sa
        pm = pm_cache.get(sa)
        if pm is None:
            pm = pm_cache[sa] = pm_vector(sa)
        out[i] = _osa.osa_distance_kernel(sa, sb, pm)
    return out


def damerau_batch(a_arr, b_arr) -> np.ndarray:
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i] = _damerau._dist(a_arr[i], b_arr[i])
    return out


def jaro_batch(a_arr, b_arr) -> np.ndarray:
    n = len(a_arr)
    out = np.zeros(n, dtype=np.float64)
    pm_cache: dict = {}
    for i in range(n):
        a = a_arr[i]
        pm = pm_cache.get(a)
        if pm is None:
            pm = pm_cache[a] = pm_vector(a)
        out[i] = _jaro.jaro_similarity(a, b_arr[i], pm)
    return out


def jaro_winkler_batch(a_arr, b_arr, prefix_weight: float = 0.1) -> np.ndarray:
    n = len(a_arr)
    out = np.zeros(n, dtype=np.float64)
    pm_cache: dict = {}
    for i in range(n):
        a = a_arr[i]
        pm = pm_cache.get(a)
        if pm is None:
            pm = pm_cache[a] = pm_vector(a)
        out[i] = _jaro.jaro_winkler_similarity(a, b_arr[i], prefix_weight, pm)
    return out


def hamming_batch(a_arr, b_arr, pad: bool = True) -> np.ndarray:
    """pad=False yields -1 (caller maps to null) on unequal lengths —
    the SQL-friendly analogue of the reference's Err (hamming.rs:232-235)."""
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        a, b = a_arr[i], b_arr[i]
        if len(a) != len(b) and not pad:
            out[i] = -1
            continue
        out[i] = _hamming.hamming_distance_raw(a, b, pad=True)
    return out


def prefix_batch(a_arr, b_arr) -> np.ndarray:
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i] = common_prefix_len(a_arr[i], b_arr[i])
    return out


def postfix_batch(a_arr, b_arr) -> np.ndarray:
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i] = common_suffix_len(a_arr[i], b_arr[i])
    return out


def weighted_levenshtein_batch(a_arr, b_arr, weights=(1, 1, 1)) -> np.ndarray:
    """Weight rewrites per levenshtein.rs:1244-1331, batched."""
    ins, dele, sub = weights
    if ins == dele:
        if ins == sub:
            return levenshtein_batch(a_arr, b_arr) * ins
        if sub >= ins + dele:
            return indel_batch(a_arr, b_arr) * ins
    n = len(a_arr)
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        out[i] = wagner_fischer_weighted(a_arr[i], b_arr[i], ins, dele, sub)
    return out


RAW_DISTANCE = {
    "levenshtein": levenshtein_batch,
    "indel": indel_batch,
    "osa": osa_batch,
    "damerau_levenshtein": damerau_batch,
}


def maximum_batch(metric: str, a_arr, b_arr, weights=(1, 1, 1)) -> np.ndarray:
    n = len(a_arr)
    la = np.fromiter((len(x) for x in a_arr), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b_arr), dtype=np.int64, count=n)
    if metric == "indel":
        return la + lb
    if metric == "levenshtein":
        ins, dele, sub = weights
        lo = np.minimum(la, lb)
        return lo * min(sub, ins + dele) + np.where(
            la > lb, (la - lb) * dele, (lb - la) * ins
        )
    # lcs_seq, osa, damerau_levenshtein, hamming, prefix, postfix
    return np.maximum(la, lb)
