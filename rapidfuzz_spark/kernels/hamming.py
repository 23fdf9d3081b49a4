"""Hamming distance.

Semantics match /root/reference/src/distance/hamming.rs: positional
mismatch count; unequal lengths raise unless ``pad=True``, in which case
the length surplus counts as mismatches (hamming.rs:19-22,41-118,232-235).
maximum = max(len1, len2) (hamming.rs:166-169). Cutoff is applied after the
kernel, as in the reference (hamming.rs:171-186).
"""

from __future__ import annotations

from typing import Sequence, Union

from .common import MetricSurface

Seq = Union[str, Sequence[int]]


class DifferentLengthArgs(ValueError):
    """Unequal lengths with pad=False (hamming.rs DifferentLengthArgs)."""


def hamming_distance_raw(s1: Seq, s2: Seq, pad: bool = False) -> int:
    if len(s1) != len(s2) and not pad:
        raise DifferentLengthArgs(
            f"hamming requires equal lengths (got {len(s1)}, {len(s2)}); use pad=True"
        )
    n = min(len(s1), len(s2))
    dist = max(len(s1), len(s2)) - n
    for i in range(n):
        if s1[i] != s2[i]:
            dist += 1
    return dist


def _dist(s1: Seq, s2: Seq, pad: bool = False) -> int:
    return hamming_distance_raw(s1, s2, pad)


def _maximum(s1: Seq, s2: Seq, pad: bool = False) -> int:
    return max(len(s1), len(s2))


surface = MetricSurface(_dist, _maximum)
