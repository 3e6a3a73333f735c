"""Text primitives: tokenization, shingles, deterministic hashing.

Cross-engine determinism notes (SURVEY §4.5 discipline):

- ``md5`` emits identical lowercase hex in Spark and DuckDB — it is the
  only hash primitive shared by both engines, so every
  dedup/LSH/fingerprint operator bottoms out in it.
- ``token_hash32`` maps a token to a 32-bit integer via the first 8 hex
  chars of its md5.  Spark parses hex with ``conv``; the DuckDB oracle
  (which has no ``conv``) re-derives the same integer with a Horner fold
  over the hex digits — see operators/textanalysis.py.
- All arithmetic stays in BIGINT ranges (max intermediate in
  ``rolling_hash`` is ~3.7e10) so neither engine overflows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for the rolling (Karp–Rabin style) fingerprint.
ROLLING_MOD = 1_000_000_007


def tokens(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization (the corpus' canonical split)."""
    return F.split(col, sep)


def distinct_tokens(col: Column | str, sep: str = " ") -> Column:
    return F.array_distinct(F.split(col, sep))


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-gram shingles of a string column.

    ``transform(sequence(1, len-n+1), i -> substr(s, i, n))`` — pure
    built-ins, stays in codegen.  For strings shorter than ``n`` the
    whole string is the single shingle.
    """
    c = F.col(col) if isinstance(col, str) else col
    upper = F.greatest(F.length(c) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), upper), lambda i: c.substr(i, F.lit(n)))
    )


def token_shingles(col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Distinct token n-gram shingles (order-sensitive features).

    The standard MinHash/SimHash feature set for text dedup: raw-token
    sets are too coarse when documents share a vocabulary; word n-grams
    encode local order.  Documents with fewer than ``n`` tokens collapse
    to a single whole-document shingle.

    NULL text yields a NULL array (so ``explode`` drops the document),
    never a manufactured ``[NULL]`` shingle: a single shared sentinel
    shingle would make every NULL document a near-duplicate of every
    other — at 100 TB, one corrupt ingest batch would snowball into a
    giant spurious duplicate cluster.  DuckDB's ``unnest(NULL)`` emits
    zero rows, so the oracle side agrees by construction.
    """
    toks = tokens(col, sep)
    # zip_with fold, NOT element_at(toks, i+k) inside a transform
    # lambda: Spark re-evaluates a non-attribute expression embedded in
    # a higher-order-function body PER ELEMENT, so the index form
    # re-splits the text O(tokens) times — O(tokens²) per document
    # (found by the round-7 megabyte-document stress: a 200k-token doc
    # burned 15 min; this form takes seconds).  zip_with children are
    # evaluated once per ROW; the fold costs n split evaluations total.
    joined = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        joined = F.zip_with(
            joined, shifted, lambda a, b: F.concat_ws("_", a, b)
        )
    # positions past size-(n-1) hold partial grams (NULL-padded zips);
    # the slice keeps full grams only, matching the sequence-form count
    joined = F.slice(joined, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    shingles = F.array_distinct(
        F.when(F.size(toks) >= n, joined).otherwise(
            F.array(F.array_join(toks, "_"))
        )
    )
    return F.when(toks.isNotNull(), shingles)


def token_hash32(col: Column | str) -> Column:
    """Deterministic 32-bit integer hash of a token (md5-anchored)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def minhash_expr(token_col: Column | str, seed: str) -> Column:
    """One MinHash component: ``MIN(md5(seed || token))`` over a group.

    Aggregate expression — use under ``groupBy(doc).agg(...)``.  A
    family of k seeds gives a k-component signature; identical in the
    DuckDB oracle because md5 and min-of-strings agree byte-for-byte.
    """
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    return F.min(F.md5(F.concat(F.lit(seed), c)))


def fingerprint_key(col: Column | str, sep: str = " ") -> Column:
    """Collision-key fingerprint: md5 of the sorted distinct token set.

    The classic key-collision normalization (sort + dedup + rejoin)
    used for near-identical record clustering.
    """
    return F.md5(F.array_join(F.array_sort(distinct_tokens(col, sep)), sep))


def rolling_hash(col: Column | str, sep: str = " ") -> Column:
    """Polynomial rolling hash over the token stream (order-sensitive).

    ``acc = (acc*31 + hash32(token)) mod 1e9+7`` folded left-to-right
    with ``aggregate`` — complements :func:`fingerprint_key` (which is
    order-insensitive) for document fingerprinting.
    """
    return F.aggregate(
        F.transform(tokens(col, sep), lambda w: token_hash32(w)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % ROLLING_MOD,
    )


def jaccard(a: Column, b: Column) -> Column:
    """Token-set Jaccard similarity of two array columns (as DOUBLE)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b))
    return inter / union
