"""fuzz::ratio — the flagship fuzzy score.

Semantics match /root/reference/src/fuzz.rs:48-86:
ratio(s1, s2) = indel.normalized_similarity(s1, s2)
              = 1 - indel_distance / (len1 + len2),
with both-empty -> 1.0 (maximum 0 guard). Returned on the reference's 0..1
scale (fuzz.rs returns f64 in [0, 1]).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from .lcs_indel import indel_raw_distance

Seq = Union[str, Sequence[int]]


def ratio(s1: Seq, s2: Seq, *, score_cutoff=None) -> Optional[float]:
    maximum = len(s1) + len(s2)
    ns = 1.0 - (indel_raw_distance(s1, s2) / maximum) if maximum else 1.0
    if score_cutoff is not None and ns < score_cutoff:
        return None
    return ns
