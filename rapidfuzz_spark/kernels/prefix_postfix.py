"""Prefix / Postfix similarity.

Semantics match /root/reference/src/distance/prefix.rs and postfix.rs:
similarity = length of the common prefix (resp. suffix);
maximum = max(len1, len2) (prefix.rs:47-49, postfix.rs:48-50);
distance = maximum - similarity.
"""

from __future__ import annotations

from typing import Sequence, Union

from .common import MetricSurface, common_prefix_len, common_suffix_len

Seq = Union[str, Sequence[int]]


def _maximum(s1: Seq, s2: Seq) -> int:
    return max(len(s1), len(s2))


def _prefix_dist(s1: Seq, s2: Seq) -> int:
    return _maximum(s1, s2) - common_prefix_len(s1, s2)


def _postfix_dist(s1: Seq, s2: Seq) -> int:
    return _maximum(s1, s2) - common_suffix_len(s1, s2)


prefix_surface = MetricSurface(_prefix_dist, _maximum)
postfix_surface = MetricSurface(_postfix_dist, _maximum)
