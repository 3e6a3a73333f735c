"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline text layer (BASELINE.json extension
surface): language identification, quality scoring, token counting and
document fingerprinting — all as pure built-in column expressions
(JVM-side, codegen-friendly; no Python in the hot path).

- ``text_langid``        — lexicon-overlap n-gram heuristic: score each
  document against five fixed per-language lexicons, predict argmax
  (deterministic tiebreak on language code).
- ``text_quality_score`` — length / punctuation / stopword /
  alpha-ratio heuristics with a boolean keep-flag.
- ``text_token_count``   — whitespace tokens + BPE-ish regex tokens
  (letter runs, digit runs, single punctuation marks).
- ``text_fingerprint``   — order-insensitive key-collision fingerprint
  (md5 of sorted distinct tokens) + order-sensitive polynomial rolling
  hash (Karp–Rabin style, md5-anchored per-token values).

At 100 TB each is a single narrow map over the scan (no shuffle except
the final aggregation-free project), so they pipeline with any
downstream dedup/filter stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions import fingerprint_key, rolling_hash, tokens
from ..functions.text import ROLLING_MOD
from ._oracle import duck_hash32

#: Fixed per-language lexicons (constants of the operator, not learned
#: from data — the synthetic corpus shares one vocabulary, so the
#: prediction is a deterministic scoring exercise, which is exactly
#: what the oracle gate needs).
LEXICONS: dict[str, list[str]] = {
    "de": ["hash", "merge", "join", "group", "stream"],
    "en": ["the", "a", "fast", "big", "small"],
    "es": ["data", "row", "sort", "filter", "batch"],
    "fr": ["table", "part", "value", "column", "line"],
    "zh": ["spark", "scan", "query", "window", "vector"],
}

STOPWORDS = ["the", "a", "of", "and", "to"]

BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.table(spark, sf_dir, "documents")


def _lexicon_score(lex: list[str]) -> F.Column:
    lex_arr = F.array(*[F.lit(w) for w in lex])
    return F.size(
        F.filter(tokens("text"), lambda t: F.array_contains(lex_arr, t))
    ).cast("long")


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted language = argmax lexicon-occurrence score."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lang).alias("pred_lang"),
                        _lexicon_score(lex).alias("score"),
                    )
                    for lang, lex in sorted(LEXICONS.items())
                ]
            )
        ).alias("s"),
    ).select("doc_id", "s.pred_lang", "s.score")
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("pred_lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select("doc_id", "pred_lang", "score")
    )


def _langid_oracle() -> str:
    branches = []
    for lang, lex in sorted(LEXICONS.items()):
        arr = "[" + ", ".join(f"'{w}'" for w in lex) + "]"
        branches.append(
            f"SELECT doc_id, '{lang}' AS pred_lang, "
            f"CAST(len(list_filter(string_split(text, ' '), t -> list_contains({arr}, t))) AS BIGINT) AS score "
            "FROM documents"
        )
    union = " UNION ALL ".join(branches)
    return (
        f"WITH scored AS ({union}) "
        "SELECT doc_id, pred_lang, score FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, pred_lang) AS rn "
        "FROM scored) t WHERE rn = 1"
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals + keep-flag per document."""
    docs = _docs(spark, sf_dir)
    toks = tokens("text")
    n_tokens = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alpha_chars = F.length(F.regexp_replace("text", "[^a-z]", ""))
    avg_tok_len = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    # NULLIF: an EMPTY document has length 0 (ANSI division throws —
    # hostile-text audit, round 7); its alpha_ratio is honestly NULL and
    # keep stays FALSE because n_tokens >= 10 already fails (FALSE AND
    # NULL = FALSE in both engines).  n_tokens is never 0: split('')
    # yields [''].
    n_chars = F.nullif(F.length("text"), F.lit(0))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(alpha_chars.cast("double") / n_chars, 6).alias("alpha_ratio"),
        (
            (n_tokens >= 10)
            & (n_tokens <= 500)
            & (alpha_chars.cast("double") / n_chars > 0.7)
        ).alias("keep"),
    )


_QUALITY_ORACLE = (
    "SELECT doc_id, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
    "ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len, "
    "ROUND(CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the','a','of','and','to'], t))) AS DOUBLE) "
    "/ len(string_split(text, ' ')), 6) AS stopword_ratio, "
    "ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / NULLIF(length(text), 0), 6) AS alpha_ratio, "
    "(len(string_split(text, ' ')) >= 10 AND len(string_split(text, ' ')) <= 500 "
    "AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / NULLIF(length(text), 0) > 0.7) AS keep "
    "FROM documents"
)


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).cast("long").alias(
            "bpe_tokens"
        ),
    )


_TOKEN_COUNT_ORACLE = (
    "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens, "
    f"CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS bpe_tokens "
    "FROM documents"
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-collision fingerprint + rolling polynomial hash per doc."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        fingerprint_key("text").alias("fp"),
        rolling_hash("text").alias("rfp"),
    )


def _fingerprint_oracle() -> str:
    hv = duck_hash32("w")
    return (
        "SELECT doc_id, "
        "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp, "
        # NULL text -> NULL fingerprint, explicitly: DuckDB's
        # list_prepend(0, NULL) yields [0] (the fold would return 0)
        # where Spark's aggregate over a NULL array yields NULL
        "CASE WHEN text IS NULL THEN NULL ELSE "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(text, ' '), w -> {hv})), "
        f"(a, h) -> (a * 31 + h) % {ROLLING_MOD}) END AS rfp "
        "FROM documents"
    )


def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language — corpus-level n-gram statistics
    (the vocabulary/frequency pass an LLM-data pipeline runs before
    filtering).  Bigrams are built array-side (transform over the token
    array — no self-join), then one explode → partial-aggregated
    groupBy; top-k per language is a window with a full tiebreak
    (count DESC, bigram ASC — SURVEY §4.5 rule 4)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = tokens("text")
    # zip_with, not element_at-inside-a-lambda: the embedded split would
    # re-evaluate per element — O(tokens²) per doc (round-7 finding)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    zipped = F.zip_with(toks, shifted, lambda a, b: F.concat_ws("_", a, b))
    bigrams = F.slice(zipped, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    counts = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "bigram", "n", F.col("rank").cast("int").alias("rnk"))
    )


_NGRAM_FREQ_ORACLE = (
    "WITH toks AS (SELECT lang, string_split(text, ' ') AS ws FROM documents), "
    "bg AS (SELECT lang, UNNEST(list_transform(generate_series(1, len(ws) - 1), "
    "i -> concat_ws('_', ws[i], ws[i + 1]))) AS bigram FROM toks), "
    "counts AS (SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM bg GROUP BY lang, bigram) "
    "SELECT lang, bigram, n, CAST(ROW_NUMBER() OVER "
    "(PARTITION BY lang ORDER BY n DESC, bigram) AS INT) AS rnk "
    "FROM counts QUALIFY rnk <= 5"
)


#: PMI vocabulary bounds: a token must appear in [2%, 100%] of documents
#: to enter the pair join (caps per-doc pair fan-out at |kept vocab|²),
#: and a pair needs ≥5 co-occurrences to be reported.  On a natural
#: corpus the upper bound would be ~0.5 (stopwords carry no PMI signal);
#: the synthetic corpus shares one flat ~30-word vocabulary with df
#: ≈ 0.78 across the board, so the cap is open here.
_PMI_DF_LO = 0.02
_PMI_DF_HI = 1.0
_PMI_MIN_PAIRS = 5


def text_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in a
    document — the phrase-mining / collocation statistic
    (PMI = ln(P(a,b) / (P(a)·P(b))) over document-level occurrence).

    Scale shape: document frequencies are one map-side-combinable
    aggregation; the vocabulary is bounded to mid-frequency tokens
    *before* the pair join, so the per-document pair fan-out is capped
    by the kept-vocabulary size, not raw token count; the pair join is
    an equi-join on doc_id (shuffle-bounded, never all-pairs across
    docs); the df lookup join broadcasts (vocabulary ≪ corpus).

    Determinism: counts are integers; PMI is one ln() on an exact
    rational per row, ROUNDed at 6 dp (SURVEY §4.5 rule 2 — noisy
    transcendental, measure-zero tie risk).
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    n_docs = docs.count()  # driver-side scalar; one tiny job
    lo, hi = _PMI_DF_LO * n_docs, _PMI_DF_HI * n_docs
    df = (
        tok.groupBy("w")
        .agg(F.count("*").cast("long").alias("df"))
        .where((F.col("df") >= lo) & (F.col("df") <= hi))
    )
    kept = tok.join(F.broadcast(df), "w")
    a = kept.select("doc_id", F.col("w").alias("w1"), F.col("df").alias("df1"))
    b = kept.select("doc_id", F.col("w").alias("w2"), F.col("df").alias("df2"))
    pairs = (
        a.join(b.hint("merge"), "doc_id")
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.count("*").cast("long").alias("n_docs_both"),
            F.max("df1").alias("df1"),
            F.max("df2").alias("df2"),
        )
        .where(F.col("n_docs_both") >= _PMI_MIN_PAIRS)
    )
    pmi = F.log(
        F.col("n_docs_both").cast("double")
        * F.lit(float(n_docs))
        / (F.col("df1") * F.col("df2"))
    )
    return pairs.select(
        "w1", "w2", "n_docs_both", F.round(pmi, 6).alias("pmi")
    )


_PMI_ORACLE = (
    "WITH tok AS (SELECT DISTINCT doc_id, w FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)), "
    "nd AS (SELECT COUNT(*) AS n FROM documents), "
    "df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY w), "
    f"kept AS (SELECT tok.doc_id, tok.w, df.df FROM tok JOIN df USING (w) CROSS JOIN nd "
    f"WHERE df.df >= {_PMI_DF_LO} * nd.n AND df.df <= {_PMI_DF_HI} * nd.n), "
    "pairs AS (SELECT a.w AS w1, b.w AS w2, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs_both, MAX(a.df) AS df1, MAX(b.df) AS df2 "
    "FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.w < b.w "
    f"GROUP BY a.w, b.w HAVING COUNT(*) >= {_PMI_MIN_PAIRS}) "
    "SELECT w1, w2, n_docs_both, "
    "ROUND(LN(CAST(n_docs_both AS DOUBLE) * (SELECT n FROM nd) / (df1 * df2)), 6) AS pmi "
    "FROM pairs"
)


def _url_sql(vchar: str) -> str:
    """Web-pipeline URL canonicalization — the normalization pass that
    precedes URL-keyed dedup at crawl scale (lowercase the host, drop
    the fragment and tracking params, keep stable query params).

    The driver schema has no URL column, so a deterministic mixed-case
    URL is synthesized per document from (source, doc_id) — the
    normalization logic itself is the operator.  Pure per-row string
    algebra (regexp_extract is arg-compatible across engines, SURVEY
    §2.2 fn_regex): no shuffle, fused into the scan.
    """
    url = (
        "concat('HTTPS://WWW.', source, '.Example.COM/docs/D',"
        f" CAST(doc_id AS {vchar}),"
        f" '?utm_source=feed&id=', CAST(doc_id AS {vchar}), '&utm_medium=x#sec-2')"
    )
    return (
        # a NULL source cannot synthesize a URL — and CONCAT diverges
        # on NULL args (Spark propagates, DuckDB skips), so the row
        # must be excluded, not left to produce engine-shaped garbage
        f"WITH u AS (SELECT doc_id, {url} AS url FROM documents"
        " WHERE source IS NOT NULL)"
        " SELECT doc_id,"
        "  lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host,"
        "  regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1) AS path,"
        "  regexp_extract(url, '[?&]id=([0-9]+)', 1) AS id_param,"
        "  concat('https://',"
        "    lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),"
        "    regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1),"
        "    '?id=', regexp_extract(url, '[?&]id=([0-9]+)', 1)) AS canonical"
        " FROM u"
    )


def text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize synthetic crawl URLs (host case, tracking params,
    fragments) for URL-keyed dedup."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(_url_sql("STRING"))


def _zipf_sql(toks: str) -> str:
    """Zipf-law fit of the corpus rank-frequency curve: OLS slope of
    ln f vs ln r (natural text ≈ −1; the synthetic near-uniform vocab
    fits much flatter — which is itself the diagnostic: Zipf-slope
    drift flags generated/templated text in a crawl).

    One count aggregation → a vocab-sized rank window → quantized
    log-log moment sums → closed-form slope/intercept from exact
    integers (the OLS-moments pattern of ``ml_ols_normal_eq``)."""
    return (
        f"WITH tok AS ({toks}),"
        " freq AS ("
        "  SELECT token, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY token"
        "), ranked AS ("
        "  SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, token) AS BIGINT) AS r"
        "  FROM freq"
        "), m AS ("
        "  SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        "    CAST(SUM(CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sx,"
        "    CAST(SUM(CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sy,"
        "    CAST(SUM(CAST(FLOOR(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sxx,"
        "    CAST(SUM(CAST(FLOOR(ln(CAST(r AS DOUBLE)) * ln(CAST(f AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS sxy"
        "  FROM ranked"
        ") SELECT n AS n_vocab,"
        "    CAST(CAST(FLOOR((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1000000000.0)"
        "      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1000000000.0)"
        "      * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS zipf_slope"
        "  FROM m"
    )


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS Zipf slope of the corpus token rank-frequency curve."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(
        _zipf_sql(
            "SELECT token FROM documents"
            " LATERAL VIEW explode(split(text, ' ')) t AS token"
        )
    )



def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the deployed language-ID classifier against
    the corpus ground-truth ``lang`` column — the classifier-quality
    eval of the measurement family (ANN recall / LSH dedup / k-means
    silhouette): per (true, predicted) cell, the count and the row
    share.  Joins the predictions of the ACTUAL operator back to the
    labels; one broadcast-size matrix out."""
    preds = text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    docs = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias("true_lang"))
    cells = docs.join(preds.hint("merge"), "doc_id").groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n")
    )
    row_tot = Window.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(row_tot)).alias("row_share"),
    )


def _langid_confusion_oracle() -> str:
    return (
        f"WITH pred AS ({_langid_oracle()}) "
        "SELECT d.lang AS true_lang, p.pred_lang, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY d.lang) AS row_share "
        "FROM documents d JOIN pred p USING (doc_id) "
        "GROUP BY d.lang, p.pred_lang"
    )

def text_langid_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the deployed language-ID
    classifier — the standard summary derived from the confusion
    matrix (`text_langid_confusion` is the full matrix; this is the
    per-class readout a model card reports).

    Shape: predictions of the ACTUAL operator joined back to labels,
    then three class-keyed aggregations (diagonal, prediction totals,
    truth totals) outer-joined on the class — no class×cell cross
    join, so nothing in the plan is nested-loop.  All counts are exact
    BIGINTs; P/R/F1 are fixed double expressions over them (NULL when
    a class is never predicted, per the usual convention).

    At 100 TB: one equi-join on doc_id plus groupBys over the
    |classes|-sized result — the matrix, not the data, crosses the
    final stage."""
    preds = text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    docs = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias("true_lang"))
    # One doc-scale pass reduces the join to the |classes|² confusion
    # cells; every derived total below aggregates that tiny table, so
    # the join/scan subtree is executed once, not once per total.
    cells = (
        docs.join(preds.hint("merge"), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tp = (
        cells.where(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("lang"))
        .agg(F.sum("n").cast("long").alias("n_tp"))
    )
    truth = cells.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    pred_tot = cells.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    m = (
        truth.join(pred_tot, "lang", "full")
        .join(tp, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_tp", F.lit(0).cast("long")).alias("n_tp"),
            F.coalesce("n_true", F.lit(0).cast("long")).alias("n_true"),
            F.coalesce("n_pred", F.lit(0).cast("long")).alias("n_pred"),
        )
    )
    precision = F.col("n_tp").cast("double") / F.nullif(
        F.col("n_pred"), F.lit(0)
    ).cast("double")
    recall = F.col("n_tp").cast("double") / F.nullif(
        F.col("n_true"), F.lit(0)
    ).cast("double")
    f1 = (
        F.lit(2.0)
        * F.col("n_tp").cast("double")
        / F.nullif(F.col("n_pred") + F.col("n_true"), F.lit(0)).cast("double")
    )
    return m.select(
        "lang",
        "n_tp",
        "n_true",
        "n_pred",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def _langid_prf1_oracle() -> str:
    return (
        f"WITH pred AS ({_langid_oracle()}), "
        "j AS (SELECT d.lang AS true_lang, p.pred_lang "
        "  FROM documents d JOIN pred p USING (doc_id)), "
        "tp AS (SELECT true_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_tp "
        "  FROM j WHERE true_lang = pred_lang GROUP BY 1), "
        "tr AS (SELECT true_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_true "
        "  FROM j GROUP BY 1), "
        "pr AS (SELECT pred_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred "
        "  FROM j GROUP BY 1), "
        "m AS (SELECT COALESCE(tr.lang, pr.lang) AS lang, "
        "  CAST(COALESCE(n_tp, 0) AS BIGINT) AS n_tp, "
        "  CAST(COALESCE(n_true, 0) AS BIGINT) AS n_true, "
        "  CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred "
        "  FROM tr FULL JOIN pr ON tr.lang = pr.lang "
        "  LEFT JOIN tp ON COALESCE(tr.lang, pr.lang) = tp.lang) "
        "SELECT lang, n_tp, n_true, n_pred, "
        "  ROUND(CAST(n_tp AS DOUBLE) / CAST(NULLIF(n_pred, 0) AS DOUBLE), 6) AS precision, "
        "  ROUND(CAST(n_tp AS DOUBLE) / CAST(NULLIF(n_true, 0) AS DOUBLE), 6) AS recall, "
        "  ROUND(2.0 * CAST(n_tp AS DOUBLE) "
        "    / CAST(NULLIF(n_pred + n_true, 0) AS DOUBLE), 6) AS f1 "
        "FROM m"
    )


QUERIES = {
    "text_langid_confusion": text_langid_confusion,
    "text_langid_prf1": text_langid_prf1,
    "text_langid": text_langid,
    "text_quality_score": text_quality_score,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "text_ngram_freq": text_ngram_freq,
    "text_cooccur_pmi": text_cooccur_pmi,
    "text_url_normalize": text_url_normalize,
    "text_zipf_slope": text_zipf_slope,
}

ORACLES = {
    "text_langid_confusion": _langid_confusion_oracle(),
    "text_langid_prf1": _langid_prf1_oracle(),
    "text_url_normalize": _url_sql("VARCHAR"),
    "text_zipf_slope": _zipf_sql(
        "SELECT unnest(string_split(text, ' ')) AS token FROM documents"
    ),
    "text_langid": _langid_oracle(),
    "text_quality_score": _QUALITY_ORACLE,
    "text_token_count": _TOKEN_COUNT_ORACLE,
    "text_fingerprint": _fingerprint_oracle(),
    "text_ngram_freq": _NGRAM_FREQ_ORACLE,
    "text_cooccur_pmi": _PMI_ORACLE,
}
