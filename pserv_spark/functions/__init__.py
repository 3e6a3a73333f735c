"""Column-expression library (the engine's scalar/array "function" layer).

Everything here returns a :class:`pyspark.sql.Column` built from JVM-side
built-ins (no Python UDFs) so expressions stay inside whole-stage
codegen and push down through Catalyst.  The deterministic-hash helpers
(md5-based) are the cross-engine anchors used by the dedup / LSH /
fingerprint operators (SURVEY §2.2 `fn_hash_md5` is the validated
primitive).
"""

from .text import (
    tokens,
    distinct_tokens,
    char_shingles,
    token_hash32,
    minhash_expr,
    fingerprint_key,
    rolling_hash,
    jaccard,
)
from .vector import dot, l2_norm, cosine
from .setjoin import encode_sets, jaccard_pairs, prefix_filter_candidates

__all__ = [
    "prefix_filter_candidates",
    "encode_sets",
    "jaccard_pairs",
    "tokens",
    "distinct_tokens",
    "char_shingles",
    "token_hash32",
    "minhash_expr",
    "fingerprint_key",
    "rolling_hash",
    "jaccard",
    "dot",
    "l2_norm",
    "cosine",
]
