"""rapidfuzz_spark — a PySpark-native record-linkage / fuzzy-matching engine.

Re-expresses the string-metric kernels of rapidfuzz-rs (reference at
/root/reference, studied for behavior only) as NumPy/Python kernels lifted
into Arrow-vectorized pandas UDFs, plus a Spark-first blocking → scoring →
clustering entity-resolution pipeline.
"""

__version__ = "0.1.0"

from . import api  # noqa: F401
from .api import (  # noqa: F401
    damerau_levenshtein,
    fuzz,
    hamming,
    indel,
    jaro,
    jaro_winkler,
    lcs_seq,
    levenshtein,
    osa,
    postfix,
    prefix,
)
