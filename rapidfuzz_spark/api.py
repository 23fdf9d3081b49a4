"""Scalar Python API: the reference's 10-function surface per metric.

Mirrors /root/reference/src/distance.rs:1-10 module layout — for every
metric M in {levenshtein, indel, lcs_seq, damerau_levenshtein, osa, jaro,
jaro_winkler, hamming, prefix, postfix}:
M.distance / M.similarity / M.normalized_distance / M.normalized_similarity
(each accepting ``score_cutoff`` -> returns None when filtered, and a
semantics-free ``score_hint``), plus M.BatchComparator (one×many with
cached pattern state, /root/reference/Readme.md:100-106).

These are driver-side scalar functions — the distributed path is
``rapidfuzz_spark.functions`` (pandas UDFs over the same kernels).
"""

from __future__ import annotations

from types import SimpleNamespace

from .kernels import damerau as _damerau
from .kernels import hamming as _hamming
from .kernels import jaro as _jaro
from .kernels import lcs_indel as _lcs_indel
from .kernels import levenshtein as _levenshtein
from .kernels import osa as _osa
from .kernels import prefix_postfix as _pp
from .kernels.common import MetricSurface, pm_vector
from .kernels.fuzz import ratio as _ratio


def _pm_state(s1):
    return {"pm": pm_vector(s1)}


def _make_batch_comparator(surface: MetricSurface, pattern_state=None):
    class BatchComparator:
        """One×many scorer; pattern state built once per s1 (reference
        Readme.md:100-106 / e.g. jaro.rs:797: every metric's comparator
        caches its pattern bitmask, not just Levenshtein's)."""

        def __init__(self, s1, **kw):
            self.s1 = s1
            self.kw = kw
            if pattern_state is not None:
                self.kw = {**kw, **pattern_state(s1)}

        def distance(self, s2, **k):
            return surface.distance(self.s1, s2, **self.kw, **k)

        def similarity(self, s2, **k):
            return surface.similarity(self.s1, s2, **self.kw, **k)

        def normalized_distance(self, s2, **k):
            return surface.normalized_distance(self.s1, s2, **self.kw, **k)

        def normalized_similarity(self, s2, **k):
            return surface.normalized_similarity(self.s1, s2, **self.kw, **k)

    return BatchComparator


def _ns(surface: MetricSurface, batch=None) -> SimpleNamespace:
    return SimpleNamespace(
        distance=surface.distance,
        similarity=surface.similarity,
        normalized_distance=surface.normalized_distance,
        normalized_similarity=surface.normalized_similarity,
        BatchComparator=batch or _make_batch_comparator(surface),
    )


levenshtein = _ns(_levenshtein.surface, _levenshtein.BatchComparator)
indel = _ns(
    _lcs_indel.indel_surface,
    _make_batch_comparator(_lcs_indel.indel_surface, _pm_state),
)
lcs_seq = _ns(
    _lcs_indel.lcs_surface,
    _make_batch_comparator(_lcs_indel.lcs_surface, _pm_state),
)
damerau_levenshtein = _ns(_damerau.surface)
osa = _ns(_osa.surface)
jaro = _ns(
    _jaro.jaro_surface, _make_batch_comparator(_jaro.jaro_surface, _pm_state)
)
jaro_winkler = _ns(
    _jaro.jaro_winkler_surface,
    _make_batch_comparator(_jaro.jaro_winkler_surface, _pm_state),
)
hamming = _ns(_hamming.surface)
prefix = _ns(_pp.prefix_surface)
postfix = _ns(_pp.postfix_surface)

class _RatioBatchComparator:
    """fuzz::RatioBatchComparator (reference src/fuzz.rs:98-150): one×many
    simple-ratio scorer. Exactly like the reference, it is a thin wrapper
    over the indel BatchComparator's cached pattern state — `similarity`
    IS indel normalized_similarity (fuzz.rs:116-149)."""

    def __init__(self, s1, **kw):
        self._bc = indel.BatchComparator(s1, **kw)

    def similarity(self, s2, **k):
        return self._bc.normalized_similarity(s2, **k)


fuzz = SimpleNamespace(ratio=_ratio, RatioBatchComparator=_RatioBatchComparator)

ALL_METRICS = {
    "levenshtein": levenshtein,
    "indel": indel,
    "lcs_seq": lcs_seq,
    "damerau_levenshtein": damerau_levenshtein,
    "osa": osa,
    "jaro": jaro,
    "jaro_winkler": jaro_winkler,
    "hamming": hamming,
    "prefix": prefix,
    "postfix": postfix,
}
