"""Shared kernel machinery: cutoff/duality layer, affix stripping, pattern masks.

Reproduces the *semantics* (not the code) of the reference's score layer:

- cutoff filtering: distance kept iff ``raw <= cutoff``; similarity kept iff
  ``raw >= cutoff`` (/root/reference/src/common.rs:33-86).
- result duality: ``similarity = maximum - distance``,
  ``normalized_distance = distance / maximum`` with a 0.0 guard when
  ``maximum == 0``, ``normalized_similarity = 1 - normalized_distance``
  (/root/reference/src/details/distance.rs:154-275, :246-251).
- ``norm_sim_to_norm_dist(c) = min(1.0, 1.0 - c + 1e-5)`` slack is an
  *internal pruning* conversion in the reference
  (/root/reference/src/details/common.rs:4-7); the externally observable
  filter is exact (norm_sim >= cutoff), which is what we implement.

All kernels here compute the full raw distance and apply cutoffs at this
layer — observably identical to the reference's early-exit kernels.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

Seq = Union[str, Sequence[int]]

NORM_SIM_SLACK = 1e-5


def norm_sim_to_norm_dist(score_cutoff: float) -> float:
    """Reference /root/reference/src/details/common.rs:4-7.

    DOCUMENTATION-ONLY parity helper: the package implements the
    externally observable cutoff filter exactly (see module docstring)
    and never calls this — using it would introduce the reference's 1e-5
    internal slack into results."""
    return min(1.0, 1.0 - score_cutoff + NORM_SIM_SLACK)


_NP_AFFIX_MIN = 512  # below this the Python loop beats encode overhead


def _np_mismatch_scan(s1: str, s2: str, n: int, from_end: bool) -> int:
    import numpy as np

    a = np.frombuffer(
        (s1[-n:] if from_end else s1[:n]).encode("utf-32-le"), dtype=np.uint32
    )
    b = np.frombuffer(
        (s2[-n:] if from_end else s2[:n]).encode("utf-32-le"), dtype=np.uint32
    )
    neq = a != b if not from_end else a[::-1] != b[::-1]
    idx = int(np.argmax(neq))
    return n if not neq[idx] else idx


def common_prefix_len(s1: Seq, s2: Seq) -> int:
    """Length of the common prefix (details/common.rs:39-49 semantics)."""
    n = min(len(s1), len(s2))
    if n >= _NP_AFFIX_MIN and isinstance(s1, str) and isinstance(s2, str):
        return _np_mismatch_scan(s1, s2, n, from_end=False)
    i = 0
    while i < n and s1[i] == s2[i]:
        i += 1
    return i


def common_suffix_len(s1: Seq, s2: Seq) -> int:
    """Length of the common suffix (details/common.rs:51-62 semantics)."""
    n = min(len(s1), len(s2))
    if n >= _NP_AFFIX_MIN and isinstance(s1, str) and isinstance(s2, str):
        return _np_mismatch_scan(s1, s2, n, from_end=True)
    i = 0
    while i < n and s1[len(s1) - 1 - i] == s2[len(s2) - 1 - i]:
        i += 1
    return i


def remove_common_affix(s1: Seq, s2: Seq) -> tuple[Seq, Seq]:
    """Strip shared prefix+suffix; edit-distance invariant
    (details/common.rs:79-108 semantics)."""
    pfx = common_prefix_len(s1, s2)
    s1, s2 = s1[pfx:], s2[pfx:]
    sfx = common_suffix_len(s1, s2)
    if sfx:
        s1, s2 = s1[:-sfx], s2[:-sfx]
    return s1, s2


def pm_vector(pattern: Seq) -> dict:
    """char/element -> arbitrary-width Python-int bitmask of its positions.

    Python ints are arbitrary precision, so one mask covers patterns of any
    length — the analogue of PatternMatchVector + BlockPatternMatchVector
    (/root/reference/src/details/pattern_match_vector.rs:67-102,194-224)
    without explicit 64-bit blocking.
    """
    pm: dict = {}
    bit = 1
    for ch in pattern:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    return pm


# ---------------------------------------------------------------------------
# The 8-function scalar surface generator (§2.3 of SURVEY.md).
# A metric provides: dist_fn(s1, s2) -> int|float raw distance, and
# maximum_fn(s1, s2) -> int|float.
# ---------------------------------------------------------------------------


class MetricSurface:
    """distance / similarity / normalized_distance / normalized_similarity,
    each with optional ``score_cutoff`` (Option-returning) and an ignored
    ``score_hint`` (a performance hint in the reference; semantics-free —
    /root/reference/src/distance/levenshtein.rs:1069-1088)."""

    def __init__(
        self,
        dist_fn: Callable[..., float],
        maximum_fn: Callable[..., float],
        integral: bool = True,
        bounded_dist_fn: Optional[Callable[..., float]] = None,
    ) -> None:
        self._dist = dist_fn
        self._maximum = maximum_fn
        self.integral = integral
        # bounded_dist_fn(s1, s2, k, **kw): exact distance when <= k, else
        # any value > k — lets a metric route tiny bounds to a cheap
        # enumeration kernel (mbleven) without changing observable results.
        self._bounded = bounded_dist_fn

    def _dist_under(self, s1: Seq, s2: Seq, bound, **kw):
        """Distance, allowed to be approximate (any value > bound) when it
        exceeds ``bound``; exact otherwise."""
        if self._bounded is not None and bound is not None:
            return self._bounded(s1, s2, bound, **kw)
        return self._dist(s1, s2, **kw)

    def distance(self, s1: Seq, s2: Seq, *, score_cutoff=None, score_hint=None, **kw):
        bound = None
        if score_cutoff is not None and self.integral:
            bound = int(score_cutoff)
        raw = self._dist_under(s1, s2, bound, **kw)
        if score_cutoff is not None and raw > score_cutoff:
            return None
        return raw

    def similarity(self, s1: Seq, s2: Seq, *, score_cutoff=None, score_hint=None, **kw):
        maximum = self._maximum(s1, s2, **kw)
        bound = None
        if score_cutoff is not None and self.integral:
            bound = int(maximum - score_cutoff)  # sim >= c  <=>  dist <= max - c
        raw = maximum - self._dist_under(s1, s2, bound, **kw)
        if score_cutoff is not None and raw < score_cutoff:
            return None
        return raw

    def normalized_distance(self, s1: Seq, s2: Seq, *, score_cutoff=None, score_hint=None, **kw):
        import math

        maximum = self._maximum(s1, s2, **kw)
        bound = None
        if score_cutoff is not None and self.integral:
            # nd <= c  <=>  dist <= max * c (dist integral -> ceil is safe,
            # reference details/distance.rs:230-236); exact recheck below
            bound = int(math.ceil(maximum * score_cutoff))
        d = self._dist_under(s1, s2, bound, **kw)
        nd = (d / maximum) if maximum else 0.0
        if score_cutoff is not None and nd > score_cutoff:
            return None
        return nd

    def normalized_similarity(self, s1: Seq, s2: Seq, *, score_cutoff=None, score_hint=None, **kw):
        import math

        maximum = self._maximum(s1, s2, **kw)
        bound = None
        if score_cutoff is not None and self.integral:
            bound = int(math.ceil(maximum * (1.0 - score_cutoff)))
        d = self._dist_under(s1, s2, bound, **kw)
        nd = (d / maximum) if maximum else 0.0
        ns = 1.0 - nd
        if score_cutoff is not None and ns < score_cutoff:
            return None
        return ns
