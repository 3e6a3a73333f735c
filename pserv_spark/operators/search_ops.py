"""Ranked retrieval over the documents corpus: BM25 + phrase search.

The reference fronts a SQL engine whose text capability is LIKE-level
(MySQL standing in for Qserv — public repo python/desc/pserv/Pserv.py,
SURVEY §0/§3.1); a training-data pipeline needs real retrieval.  Two
classic IR operators, both expressed as inverted-index algebra over an
exploded token relation (Robertson & Spärck Jones BM25; positional
postings for phrases):

- ``text_bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75) for a fixed query
  term set, top-10 docs.  Postings are built by explode → filter to
  the query terms *before* any shuffle (the filter is the index probe
  — at 100 TB only rows for the 3 query terms ever leave the map
  side); doc lengths come from one groupBy; df/N/avgdl are
  scalar-subquery broadcasts.
- ``text_phrase_search`` — positional phrase matching ("hash join"):
  adjacency is decided by LAG over (doc_id, pos) — one window on the
  per-doc ordered postings, no positions self-join.

Determinism (SURVEY §4.5): the BM25 per-term score uses ``ln`` (Java
Math.log vs libm log differ in the last ulp), so per-(doc,term) scores
are floor-quantized to integer millionths before the cross-term SUM —
the Stetson/DFT pattern; the summed score is exact BIGINT.  Ranking
orders by (score_q DESC, doc_id) — a total order.  tf/df/dl/N are
exact integers; avgdl is a single exact-operand division, identical
expression text in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables
from ._oracle import inline_views

_QUERY_TERMS = ("hash", "merge", "window")
_K1 = 1.2
_B = 0.75
_TOPK = 10

#: Dialect-specific (doc_id, token) postings relation.
_SPARK_TOKS = (
    "SELECT doc_id, token FROM documents"
    " LATERAL VIEW explode(split(text, ' ')) t AS token"
)
_DUCK_TOKS = (
    "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
)

#: Dialect-specific (doc_id, pos, token) positional postings (pos 1-based).
_SPARK_POS = (
    "SELECT doc_id, pos + 1 AS pos, token FROM documents"
    " LATERAL VIEW posexplode(split(text, ' ')) t AS pos, token"
)
_DUCK_POS = (
    "SELECT doc_id, i AS pos, (string_split(text, ' '))[i] AS token"
    " FROM documents, unnest(generate_series(1,"
    " len(string_split(text, ' ')))) AS t(i)"
)


def _bm25_sql(toks_clause: str) -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
    # Per-(doc,term) BM25 term score; every input is an exact integer
    # or the shared avgdl double — only ln() can drift by 1 ulp, which
    # the floor-quantization absorbs.
    term_score = (
        "ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)"
        f" * (tf.tf * ({_K1} + 1.0))"
        f" / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / st.avgdl))"
    )
    return (
        f"WITH toks AS ({toks_clause}),"
        " dl AS ("
        "  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id"
        "), st AS ("
        "  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,"
        "    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl"
        "), tf AS ("
        f"  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf"
        f"  FROM toks WHERE token IN ({terms}) GROUP BY doc_id, token"
        "), df AS ("
        "  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token"
        "), scored AS ("
        "  SELECT tf.doc_id,"
        "    CAST(COUNT(*) AS BIGINT) AS n_terms_hit,"
        f"   CAST(SUM(CAST(FLOOR(({term_score}) * 1000000.0) AS BIGINT)) AS BIGINT)"
        "      AS score_q"
        "  FROM tf JOIN df ON tf.token = df.token"
        "  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st"
        "  GROUP BY tf.doc_id"
        "), top AS ("
        # ORDER BY + LIMIT → TakeOrderedAndProject (distributed
        # per-partition top-k + driver merge); the ROW_NUMBER below
        # ranks only the <= _TOPK survivors.
        "  SELECT doc_id, n_terms_hit, score_q FROM scored"
        f"  ORDER BY score_q DESC, doc_id LIMIT {_TOPK}"
        ") SELECT doc_id, n_terms_hit,"
        "    ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS rk,"
        "    CAST(score_q AS DOUBLE) / 1000000.0 AS bm25"
        "  FROM top"
    )


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval for a fixed 3-term query."""
    load_tables(spark, sf_dir)
    return spark.sql(_bm25_sql(_SPARK_TOKS))


_PHRASE = ("hash", "join")


def _phrase_sql(pos_clause: str) -> str:
    """Docs containing the exact phrase, with occurrence counts, via
    LAG adjacency on positional postings."""
    return (
        f"WITH pos AS ({pos_clause}),"
        " adj AS ("
        "  SELECT doc_id, token,"
        "    LAG(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_tok"
        "  FROM pos"
        ") SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occur"
        f"  FROM adj WHERE prev_tok = '{_PHRASE[0]}' AND token = '{_PHRASE[1]}'"
        "  GROUP BY doc_id"
    )


def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search for "hash join"."""
    load_tables(spark, sf_dir)
    return spark.sql(_phrase_sql(_SPARK_POS))


_RAKE_STOPS = ("the", "a")
_RAKE_TOPK = 10


def _rake_full(pos_clause: str, phrase_agg: str, resplit: str) -> str:
    """Assembled RAKE query; ``resplit`` is a full SELECT expanding
    each distinct phrase back to (phrase, n_occur, w) word rows."""
    stops = ", ".join(f"'{s}'" for s in _RAKE_STOPS)
    return (
        f"WITH toks AS ({pos_clause}),"
        " flagged AS ("
        "  SELECT doc_id, pos, token,"
        f"   CASE WHEN token IN ({stops}) THEN 1 ELSE 0 END AS is_stop,"
        f"   CAST(SUM(CASE WHEN token IN ({stops}) THEN 1 ELSE 0 END)"
        "     OVER (PARTITION BY doc_id ORDER BY pos"
        "       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id"
        "  FROM toks"
        "), occurrences AS ("
        f"  SELECT doc_id, run_id, {phrase_agg} AS phrase,"
        "    CAST(COUNT(*) AS BIGINT) AS plen"
        "  FROM flagged WHERE is_stop = 0 GROUP BY doc_id, run_id"
        "), pw AS ("
        "  SELECT /*+ MERGE(w) */ o.phrase, o.plen, w.token FROM occurrences o"
        "  JOIN flagged w ON w.doc_id = o.doc_id AND w.run_id = o.run_id"
        "  WHERE w.is_stop = 0"
        "), wstat AS ("
        "  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,"
        "    CAST(SUM(plen) AS BIGINT) AS deg"
        "  FROM pw GROUP BY token"
        "), pocc AS ("
        "  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occur FROM occurrences"
        "  GROUP BY phrase"
        f"), pexp AS ({resplit}),"
        " scored AS ("
        "  SELECT /*+ MERGE(ws) */ pexp.phrase, pexp.n_occur,"
        "    CAST(SUM(CAST(FLOOR(CAST(ws.deg AS DOUBLE) / ws.freq"
        "      * 1000000000.0) AS BIGINT)) AS BIGINT) AS score_q"
        "  FROM pexp JOIN wstat ws ON ws.token = pexp.w"
        "  GROUP BY pexp.phrase, pexp.n_occur"
        "), top AS ("
        "  SELECT phrase, n_occur, score_q FROM scored"
        f"  ORDER BY score_q DESC, phrase LIMIT {_RAKE_TOPK}"
        ") SELECT phrase, n_occur,"
        "    CAST(score_q AS DOUBLE) / 1000000000.0 AS rake_score"
        "  FROM top"
    )


def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE top-10 keyphrases over the corpus."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _rake_full(
            _SPARK_POS,
            "array_join(transform(array_sort(collect_list(struct(pos, token))),"
            " x -> x.token), ' ')",
            "SELECT p.phrase, p.n_occur, w FROM pocc p"
            " LATERAL VIEW explode(split(p.phrase, ' ')) t AS w",
        )
    )


def _ndcg_sql(toks_clause: str) -> str:
    """NDCG@10 of the deployed BM25 ranking — the retrieval-quality
    measurement the search family was missing (ANN has recall_eval,
    LSH dedup has lsh_eval; this is the IR analogue).

    Graded relevance is ranker-independent by construction: rel(doc) =
    number of DISTINCT query terms the document contains (0–3), i.e.
    pure term-coverage ground truth that never looks at BM25 scores.
    DCG@10 uses the standard (2^rel − 1)/log2(pos+1) gains over the
    ACTUAL `text_bm25_topk` ordering; IDCG@10 re-sorts the corpus-wide
    relevance multiset under (rel DESC, doc_id).

    Determinism (§4.5): rel and positions are exact integers;
    2^rel − 1 is IEEE-exact; only log2 can drift by an ulp, so each
    per-position gain is floor-quantized to integer billionths before
    the cross-row SUM (the BM25/Stetson pattern); NDCG is one final
    BIGINT/BIGINT division.  Scale: the ranked side is the top-10
    rows; the ideal side is a TakeOrdered top-10 over the rel table —
    nothing quadratic, nothing driver-side."""
    terms = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
    gain = "CAST(FLOOR(1000000000.0 * (POWER(2.0, rel) - 1.0) / LOG2(rk + 1.0)) AS BIGINT)"
    return (
        f"WITH toks AS ({toks_clause}),"
        " relt AS ("
        "  SELECT doc_id, CAST(COUNT(DISTINCT token) AS BIGINT) AS rel"
        f"  FROM toks WHERE token IN ({terms}) GROUP BY doc_id"
        "), ranked AS ("
        f"  SELECT doc_id, rk FROM ({_bm25_sql(toks_clause)}) b"
        "), j AS ("
        "  SELECT ranked.rk, COALESCE(relt.rel, 0) AS rel"
        "  FROM ranked LEFT JOIN relt ON ranked.doc_id = relt.doc_id"
        "), dcg AS ("
        f"  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranked,"
        f"    CAST(SUM({gain}) AS BIGINT) AS dcg_q FROM j"
        "), ideal_top AS ("
        # ORDER BY + LIMIT → TakeOrderedAndProject; the ROW_NUMBER
        # below ranks only the <= _TOPK survivors (same pattern as
        # _bm25_sql — never a global window over the full rel table).
        f"  SELECT doc_id, rel FROM relt ORDER BY rel DESC, doc_id LIMIT {_TOPK}"
        "), ideal AS ("
        "  SELECT rel, CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id)"
        "      AS BIGINT) AS rk"
        "  FROM ideal_top"
        "), idcg AS ("
        f"  SELECT CAST(SUM({gain}) AS BIGINT) AS idcg_q FROM ideal"
        ") SELECT n_ranked, "
        "  ROUND(CAST(dcg_q AS DOUBLE) / 1000000000.0, 6) AS dcg,"
        "  ROUND(CAST(idcg_q AS DOUBLE) / 1000000000.0, 6) AS idcg,"
        "  ROUND(CAST(dcg_q AS DOUBLE) / idcg_q, 6) AS ndcg"
        "  FROM dcg CROSS JOIN idcg"
    )


def text_bm25_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the deployed BM25 ranking vs term-coverage
    relevance."""
    load_tables(spark, sf_dir)
    return spark.sql(_ndcg_sql(_SPARK_TOKS))


QUERIES = {
    "text_bm25_ndcg": text_bm25_ndcg,
    "text_bm25_topk": text_bm25_topk,
    "text_phrase_search": text_phrase_search,
    "text_rake_keyphrases": text_rake_keyphrases,
}

ORACLES = {
    "text_bm25_ndcg": inline_views(_ndcg_sql(_DUCK_TOKS)),
    "text_bm25_topk": inline_views(_bm25_sql(_DUCK_TOKS)),
    "text_phrase_search": inline_views(_phrase_sql(_DUCK_POS)),
    "text_rake_keyphrases": inline_views(
        _rake_full(
            _DUCK_POS,
            "string_agg(token, ' ' ORDER BY pos)",
            "SELECT p.phrase, p.n_occur,"
            " unnest(string_split(p.phrase, ' ')) AS w FROM pocc p",
        )
    ),
}
