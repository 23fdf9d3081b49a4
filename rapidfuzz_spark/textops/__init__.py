"""Large-scale training-data operators over document / embedding tables.

Everything here is Catalyst-native (built-in pyspark.sql.functions —
higher-order array functions, window functions, joins) so plans stay in
whole-stage codegen and scale by partitioning; there is NO Python in the
hot path except where Arrow-batched by design (multimodal decode).

Modules:
- dedup:      exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
- ann:        brute-force + LSH-bucketed approximate nearest neighbours
- quality:    language-ID, quality scoring, token counting, winnowing
              fingerprints
- multimodal: binary media columns with typed metadata; Arrow-batched
              decode/feature plumbing (decode itself is a deterministic
              stub — codec libs are out of scope)
"""

from . import (  # noqa: F401
    ann,
    curation,
    dedup,
    multimodal,
    quality,
    sampling,
    softtfidf,
    training,
)
