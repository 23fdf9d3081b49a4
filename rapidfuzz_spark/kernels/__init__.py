from . import (  # noqa: F401
    common,
    damerau,
    fuzz,
    hamming,
    jaro,
    lcs_indel,
    levenshtein,
    osa,
    prefix_postfix,
)
