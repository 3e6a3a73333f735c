"""Property tests pinning the functions library to pure-Python
references — the md5-anchored primitives must compute exactly what
their oracles re-derive, on arbitrary inputs (not just the corpus).

One seeded batch of random documents is pushed through Spark once and
compared value-by-value against reference implementations in plain
Python (hashlib/itertools) — batch-style property testing, since a
per-example Spark round-trip would be prohibitively slow.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from pyspark.sql import functions as F

from pserv_spark.functions import (
    fingerprint_key,
    jaccard,
    rolling_hash,
    token_hash32,
)
from pserv_spark.functions.text import ROLLING_MOD, char_shingles, token_shingles

VOCAB = ["alpha", "beta", "gamma", "delta", "x1", "y2", "zz", "q", "longword9"]


@pytest.fixture(scope="module")
def docs():
    rng = random.Random(1234)
    out = []
    for i in range(60):
        n = rng.randint(1, 12)
        out.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return out


@pytest.fixture(scope="module")
def computed(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        "text",
        token_hash32(F.lit("probe")).alias("h_const"),
        rolling_hash("text").alias("rfp"),
        fingerprint_key("text").alias("fp"),
        token_shingles("text").alias("shingles"),
        char_shingles("text", 5).alias("cgrams"),
    ).collect()
    return {r.doc_id: r for r in rows}


def _py_hash32(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)


def test_token_hash32_matches_python(computed):
    expected = _py_hash32("probe")
    for r in computed.values():
        assert r.h_const == expected


def test_rolling_hash_matches_python(docs, computed):
    for doc_id, text in docs:
        acc = 0
        for w in text.split(" "):
            acc = (acc * 31 + _py_hash32(w)) % ROLLING_MOD
        assert computed[doc_id].rfp == acc, f"doc {doc_id}"


def test_fingerprint_is_order_insensitive_md5(docs, computed):
    for doc_id, text in docs:
        key = " ".join(sorted(set(text.split(" "))))
        assert computed[doc_id].fp == hashlib.md5(key.encode()).hexdigest()


def test_token_shingles_match_python(docs, computed):
    for doc_id, text in docs:
        toks = text.split(" ")
        if len(toks) >= 3:
            ref = list(dict.fromkeys(
                "_".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            ))
        else:
            ref = ["_".join(toks)]
        assert computed[doc_id].shingles == ref, f"doc {doc_id}"


def test_char_shingles_match_python(docs, computed):
    for doc_id, text in docs:
        upper = max(len(text) - 4, 1)
        ref = list(dict.fromkeys(text[i : i + 5] for i in range(upper)))
        assert computed[doc_id].cgrams == ref, f"doc {doc_id}"


def test_jaccard_bounds_and_symmetry(spark):
    rng = random.Random(99)
    pairs = []
    for i in range(40):
        a = [rng.choice(VOCAB) for _ in range(rng.randint(1, 8))]
        b = [rng.choice(VOCAB) for _ in range(rng.randint(1, 8))]
        pairs.append((i, sorted(set(a)), sorted(set(b))))
    df = spark.createDataFrame(pairs, "i long, a array<string>, b array<string>")
    rows = df.select(
        "i",
        "a",
        "b",
        jaccard(F.col("a"), F.col("b")).alias("jab"),
        jaccard(F.col("b"), F.col("a")).alias("jba"),
    ).collect()
    for r in rows:
        sa, sb = set(r.a), set(r.b)
        expected = len(sa & sb) / len(sa | sb)
        assert r.jab == pytest.approx(expected)
        assert r.jab == pytest.approx(r.jba)
        assert 0.0 <= r.jab <= 1.0


@pytest.mark.parametrize("t", [0.5, 0.7, 0.9])
def test_jaccard_size_band_is_lossless(t):
    """The size band added to the quadratic jaccard paths (J >= t
    implies |A|/|B| within [t, 1/t], since J <= min/max) must never
    drop a qualifying pair — banded and unbanded pair sets are equal
    at every threshold, not just the shipped 0.9."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    base = (
        "WITH tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts "
        "FROM documents), tn AS (SELECT doc_id, ts, len(ts) AS n FROM tok) "
        "SELECT a.doc_id, b.doc_id FROM tn a JOIN tn b ON a.doc_id < b.doc_id {band} "
        "WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / "
        f"len(list_distinct(list_concat(a.ts, b.ts))) >= {t}"
    )
    unbanded = set(map(tuple, con.execute(base.format(band="")).fetchall()))
    banded = set(
        map(
            tuple,
            con.execute(
                base.format(band=f"AND a.n >= b.n * {t} AND b.n >= a.n * {t}")
            ).fetchall(),
        )
    )
    assert banded == unbanded and unbanded
