"""Corpus-quality operators: repetition screening + benchmark decontamination.

Two filters every large-scale LLM training-data pipeline runs between
raw crawl and training shards (BASELINE.json extension surface; the
repetition signals follow the published Gopher/MassiveText heuristics —
Rae et al. 2021, public paper — re-expressed as built-in column
expressions):

- ``text_repetition_ratio`` — per-document duplicate-token /
  duplicate-bigram fractions and top-token concentration, with a
  keep-flag.  Pure narrow map over the scan (array lambdas, JVM-side,
  no shuffle): at 100 TB it pipelines with the scan and costs no
  exchange.
- ``decontaminate_ngram`` — flags training documents sharing any word
  5-gram with a held-out benchmark set (the standard n-gram-overlap
  decontamination pass).  Implemented as an equi-join on the md5 of the
  shingle: benchmark shingles are tiny relative to the corpus, so
  Catalyst broadcasts them and the 100 TB train side is never
  shuffled — the plan audit in tests/test_plans.py pins this.

Both have exact DuckDB oracles (SURVEY §5.2 strategy 1); the reference
has no analog (it is an ETL tool — SURVEY §2.1), these extend the
pipeline surface required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..functions import tokens
from ._oracle import inline_views

#: Word-n-gram order for the decontamination pass (13 in the published
#: recipes; 5 here so the ~25-token synthetic docs can overlap at all).
_NGRAM_N = 5

#: Benchmark split: the synthetic corpus' ``source`` column stands in
#: for the train/eval provenance tag.
_BENCH_SOURCE = "src0"

#: Gopher-style keep thresholds (fractions).
_MAX_DUP_BIGRAM_FRAC = 0.2
_MAX_TOP_WORD_FRAC = 0.3


def _bigrams(toks) -> F.Column:
    """Bigram list: ``greatest(n-1, 1)`` entries; a 1-token document's
    degenerate "bigram" is the lone token (the NULL-padded zip's
    concat_ws skips the NULL) — exactly what the DuckDB oracle's
    NULL-on-overrun list indexing + concat_ws produces.

    zip_with, NOT element_at-inside-a-lambda: an embedded non-attribute
    expression is re-evaluated per element (O(tokens²) per doc when
    ``toks`` is the split itself — round-7 megabyte-doc finding)."""
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    zipped = F.zip_with(toks, shifted, lambda a, b: F.concat_ws("_", a, b))
    sliced = F.slice(zipped, 1, F.greatest(F.size(toks) - 1, F.lit(1)))
    # NULL text: one '' bigram, NOT a NULL array — the established
    # engine/oracle contract for this op (both sides' NULL-skipping
    # greatest() yields a single empty gram, so dup_bigram_frac = 0.0)
    return F.when(toks.isNull(), F.array(F.lit(""))).otherwise(sliced)


def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals + keep flag.

    dup_word_frac   = 1 - |distinct tokens| / |tokens|
    dup_bigram_frac = 1 - |distinct bigrams| / |bigrams|
    top_word_frac   = max token multiplicity / |tokens|
    """
    # Materialize the token array ONCE as a projection column: every
    # downstream lambda then references a bound attribute instead of
    # re-splitting the text per element (round-7 megabyte-doc finding).
    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    toks = F.col("toks")
    bgs = _bigrams(toks)
    n_tok = F.size(toks).cast("double")
    # max token multiplicity as a LINEAR run-length pass over the
    # sorted array — the distinct×filter form is O(|distinct|·|tokens|)
    # comparisons per doc, quadratic on high-entropy documents.  The
    # lit("") init prev is harmless: matching it makes the first run 1
    # (0+1), which is what a first occurrence scores anyway.
    top_count = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    dup_word = 1.0 - F.size(F.array_distinct(toks)) / n_tok
    dup_bigram = 1.0 - F.size(F.array_distinct(bgs)) / F.size(bgs)
    top_word = top_count / n_tok
    return docs.select(
        "doc_id",
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(dup_bigram, 6).alias("dup_bigram_frac"),
        F.round(top_word, 6).alias("top_word_frac"),
        (
            (dup_bigram <= _MAX_DUP_BIGRAM_FRAC) & (top_word <= _MAX_TOP_WORD_FRAC)
        ).alias("keep"),
    )


def _ngrams_df(docs: DataFrame, n: int) -> DataFrame:
    # token_shingles IS this op's gram set: distinct word n-grams with
    # the whole-document fallback for sub-n docs (its zip_with fold is
    # linear in tokens — round-7 megabyte-doc finding; its NULL-padded
    # partial-gram handling is the hostile-text fix).
    from ..functions.text import token_shingles

    grams = token_shingles("text", n)
    return docs.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", F.md5("gram").alias("gh")
    )


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing ≥1 word 5-gram with the benchmark split.

    Output per contaminated train doc: number of distinct shared
    shingles and number of distinct benchmark docs hit.  The benchmark
    side is orders of magnitude smaller than the corpus, so the join is
    a broadcast — the train side streams through map-side with no
    shuffle; the only exchange is the final per-doc aggregation.
    """
    docs = catalog.table(spark, sf_dir, "documents")
    train = _ngrams_df(docs.where(F.col("source") != _BENCH_SOURCE), _NGRAM_N)
    bench = _ngrams_df(docs.where(F.col("source") == _BENCH_SOURCE), _NGRAM_N)
    hits = train.join(
        F.broadcast(bench.select(F.col("gh"), F.col("doc_id").alias("bench_doc"))),
        "gh",
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("gh").cast("long").alias("n_shared_ngrams"),
        F.countDistinct("bench_doc").cast("long").alias("n_bench_docs"),
    )


_DUCK_TOKS = "string_split(text, ' ')"
_DUCK_BIGRAMS = (
    f"list_transform(generate_series(1, greatest(len({_DUCK_TOKS}) - 1, 1)), "
    f"i -> concat_ws('_', ({_DUCK_TOKS})[i], ({_DUCK_TOKS})[i + 1]))"
)

_REPETITION_ORACLE = (
    "SELECT doc_id, "
    f"ROUND(1.0 - len(list_distinct({_DUCK_TOKS})) / CAST(len({_DUCK_TOKS}) AS DOUBLE), 6) AS dup_word_frac, "
    f"ROUND(1.0 - len(list_distinct({_DUCK_BIGRAMS})) / CAST(len({_DUCK_BIGRAMS}) AS DOUBLE), 6) AS dup_bigram_frac, "
    f"ROUND(list_max(list_transform(list_distinct({_DUCK_TOKS}), "
    f"t -> len(list_filter({_DUCK_TOKS}, x -> x = t)))) / CAST(len({_DUCK_TOKS}) AS DOUBLE), 6) AS top_word_frac, "
    f"((1.0 - len(list_distinct({_DUCK_BIGRAMS})) / CAST(len({_DUCK_BIGRAMS}) AS DOUBLE)) <= {_MAX_DUP_BIGRAM_FRAC} "
    f"AND (list_max(list_transform(list_distinct({_DUCK_TOKS}), "
    f"t -> len(list_filter({_DUCK_TOKS}, x -> x = t)))) / CAST(len({_DUCK_TOKS}) AS DOUBLE)) <= {_MAX_TOP_WORD_FRAC}) AS keep "
    "FROM documents"
)


def _duck_ngrams(n: int) -> str:
    # text IS NOT NULL: a NULL document has no shingles (token_shingles'
    # NULL contract) — without the filter, DuckDB's NULL-skipping
    # greatest() manufactures one '' gram per NULL doc and every pair of
    # NULL docs "contaminates" each other through the empty sentinel
    parts = ", ".join(f"ts[i + {k}]" for k in range(n))
    return (
        f"SELECT doc_id, md5(UNNEST(list_distinct("
        f"list_transform(generate_series(1, greatest(len(ts) - {n - 1}, 1)), "
        f"i -> concat_ws('_', {parts}))))) AS gh "
        f"FROM (SELECT doc_id, {_DUCK_TOKS} AS ts FROM documents "
        f"WHERE text IS NOT NULL AND source {{op}} '{_BENCH_SOURCE}')"
    )


_DECONTAM_ORACLE = (
    f"WITH train AS ({_duck_ngrams(_NGRAM_N).format(op='<>')}), "
    f"bench AS ({_duck_ngrams(_NGRAM_N).format(op='=')}) "
    "SELECT t.doc_id, "
    "CAST(COUNT(DISTINCT t.gh) AS BIGINT) AS n_shared_ngrams, "
    "CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs "
    "FROM train t JOIN bench b ON t.gh = b.gh GROUP BY t.doc_id"
)


# ------------------------------------------------------------- PII redaction

#: Portable regexes (Java regex ∩ RE2 — no lookaround, no backrefs).
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_RE_IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: replace emails / phone numbers / IPv4
    addresses with typed placeholder tags and count what was removed.

    The synthetic corpus contains no PII, so each document is first
    augmented with a deterministic contact line derived from doc_id —
    this keeps the redaction path *provably exercised* (the oracle
    must reproduce both the augmentation and the scrub; a regex that
    silently stopped matching would hash-mismatch immediately, not
    pass vacuously).  Pure narrow map — three sequential
    ``regexp_replace`` passes pipelined with the scan, no shuffle, so
    at 100 TB it costs one read.  Patterns are restricted to the
    Java-regex ∩ RE2 subset so engine and oracle match byte-for-byte.
    """
    docs = catalog.load_tables(spark, sf_dir)["documents"]
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id") * 7, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".0.1"),
    )
    with_aug = docs.select("doc_id", aug.alias("raw"))
    n_red = (
        F.regexp_count("raw", F.lit(_RE_EMAIL))
        + F.regexp_count("raw", F.lit(_RE_PHONE))
        + F.regexp_count("raw", F.lit(_RE_IP))
    ).cast("long")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("raw", _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE,
            "<PHONE>",
        ),
        _RE_IP,
        "<IP>",
    )
    return with_aug.select(
        "doc_id", n_red.alias("n_redactions"), clean.alias("clean_text")
    )


_PII_ORACLE = (
    "WITH aug AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com or +1-555-' "
    "|| lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') "
    "|| ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS raw FROM documents) "
    "SELECT doc_id, "
    f"CAST(len(regexp_extract_all(raw, '{_RE_EMAIL}')) "
    f"+ len(regexp_extract_all(raw, '{_RE_PHONE}')) "
    f"+ len(regexp_extract_all(raw, '{_RE_IP}')) AS BIGINT) AS n_redactions, "
    f"regexp_replace(regexp_replace(regexp_replace(raw, '{_RE_EMAIL}', '<EMAIL>', 'g'), "
    f"'{_RE_PHONE}', '<PHONE>', 'g'), '{_RE_IP}', '<IP>', 'g') AS clean_text "
    "FROM aug"
)


#: Dialect-specific (doc_id, pos, token) positional postings.
_SPARK_POS_TOKS = (
    "SELECT doc_id, pos + 1 AS pos, token FROM documents"
    " LATERAL VIEW posexplode(split(text, ' ')) t AS pos, token"
)
_DUCK_POS_TOKS = (
    "SELECT doc_id, wp AS pos, (string_split(text, ' '))[wp] AS token"
    " FROM documents, unnest(generate_series(1,"
    " len(string_split(text, ' ')))) AS t(wp)"
)


def _bigram_lm_sql(pos_clause: str) -> str:
    """Corpus-trained bigram language-model scoring — the KenLM-style
    perplexity filter of LLM data pipelines (docs whose token stream
    is improbable under the corpus's own bigram statistics get low
    avg log-prob and high perplexity).

    Unsmoothed MLE: P(w₂|w₁) = c(w₁w₂)/c(w₁·) — no zeros, since the
    scored stream is the training stream.  The count tables are NOT
    broadcast-pinned: distinct bigrams grow roughly linearly with
    corpus size (Heaps' law), so at 100 TB neither c12 nor c1 is
    reliably broadcast-sized — the scoring joins carry MERGE hints
    that pin the partitioned sort-merge plan (the same
    exploded-broadcast-safe choice as the ppjoin family; AQE never
    downgrades a static broadcast, so a hard BROADCAST(c12) hint is
    exactly the estimate trap plans/inspect.py defends against).
    Per-bigram ln terms are
    floor-quantized at 1e-9 before the per-doc SUM (DFT/Stetson
    pattern); avg log-prob is one exact-operand division, and
    perplexity exp(−avg) is floor-quantized at 1e-6.
    """
    return (
        f"WITH toks AS ({pos_clause}),"
        " big AS ("
        "  SELECT /*+ MERGE(b) */ a.doc_id, a.token AS w1, b.token AS w2"
        "  FROM toks a JOIN toks b"
        "    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"
        "), c12 AS ("
        "  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY w1, w2"
        "), c1 AS ("
        "  SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot FROM c12 GROUP BY w1"
        "), scored AS ("
        "  SELECT /*+ MERGE(c12), MERGE(c1) */ big.doc_id,"
        "    CAST(COUNT(*) AS BIGINT) AS n_bigrams,"
        "    CAST(SUM(CAST(FLOOR(ln(CAST(c12.c AS DOUBLE) / c1.ctot)"
        "      * 1000000000.0) AS BIGINT)) AS BIGINT) AS lp_q"
        "  FROM big JOIN c12 ON big.w1 = c12.w1 AND big.w2 = c12.w2"
        "  JOIN c1 ON big.w1 = c1.w1"
        "  GROUP BY big.doc_id"
        ") SELECT doc_id, n_bigrams,"
        "    CAST(lp_q AS DOUBLE) / 1000000000.0 / n_bigrams AS avg_logprob,"
        "    CAST(CAST(FLOOR(exp(-(CAST(lp_q AS DOUBLE) / 1000000000.0 / n_bigrams))"
        "      * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS perplexity"
        "  FROM scored WHERE doc_id % 10 = 0"
    )


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM avg log-prob + perplexity per document (sampled)."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(_bigram_lm_sql(_SPARK_POS_TOKS))


def _composite_sql(splitfn: str, distinctfn: str, filterfn: str, lenfn: str) -> str:
    """The filtering pipeline's verdict op: every quality signal in
    ONE scan, folded into a keep/drop decision with an auditable
    first-failing-rule reason (what a curation run logs per document).
    Signals are exact-integer counts and exact quotients — no
    rounding anywhere (§4.5 rule 2)."""
    toks = f"{splitfn}(text, ' ')"
    nt = f"{lenfn}({toks})"
    nd = f"{lenfn}({distinctfn}({toks}))"
    stop = f"{lenfn}({filterfn}({toks}, t -> t = 'the' OR t = 'a'))"
    return (
        "WITH s AS ("
        f"  SELECT doc_id, CAST({nt} AS BIGINT) AS n_tokens,"
        f"    CAST({nd} AS DOUBLE) / {nt} AS distinct_ratio,"
        f"    CAST({stop} AS DOUBLE) / {nt} AS stop_ratio"
        "  FROM documents"
        ") SELECT doc_id, n_tokens, distinct_ratio, stop_ratio,"
        "    CASE WHEN n_tokens < 15 THEN 'too_short'"
        "         WHEN n_tokens > 500 THEN 'too_long'"
        "         WHEN distinct_ratio < 0.35 THEN 'low_diversity'"
        "         WHEN stop_ratio > 0.12 THEN 'stopword_heavy'"
        "         ELSE 'ok' END AS reason,"
        "    CASE WHEN n_tokens >= 15 AND n_tokens <= 500"
        "         AND distinct_ratio >= 0.35 AND stop_ratio <= 0.12"
        "         THEN TRUE ELSE FALSE END AS keep"
        "  FROM s"
    )


def quality_composite_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop verdict per document with the first failing rule."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(_composite_sql("split", "array_distinct", "filter", "size"))


QUERIES = {
    "text_repetition_ratio": text_repetition_ratio,
    "decontaminate_ngram": decontaminate_ngram,
    "text_pii_redact": text_pii_redact,
    "text_bigram_logprob": text_bigram_logprob,
    "quality_composite_filter": quality_composite_filter,
}

ORACLES = {
    "quality_composite_filter": _composite_sql(
        "string_split", "list_distinct", "list_filter", "len"
    ),
    "text_repetition_ratio": _REPETITION_ORACLE,
    "decontaminate_ngram": _DECONTAM_ORACLE,
    "text_pii_redact": _PII_ORACLE,
    "text_bigram_logprob": _bigram_lm_sql(_DUCK_POS_TOKS),
}


# ---------------------------------------------------------------------------
# Embedding-space decontamination (round 2)
# ---------------------------------------------------------------------------

#: Benchmark membership rule (deterministic, scale-free) and the
#: similarity threshold for the contamination flag.
_EDECON_MOD = 11
_EDECON_TAU = 0.25


def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination in embedding space — the semantic
    complement of ``decontaminate_ngram`` (paraphrased benchmark items
    share no 5-grams but sit close in embedding space; this is the
    screen modern pipelines run alongside the n-gram one).

    Benchmark set = vectors with ``vec_id % 11 == 0`` (a fixed
    evaluation suite — always tiny next to the corpus).  Every corpus
    vector scores its nearest benchmark item by cosine; rows with
    similarity ≥ τ are flagged.  The winner is chosen under the §4.5
    total order (ROUND(cos, 6) DESC, bench_id ASC).

    Scale shape: broadcast(benchmark) × corpus is a LINEAR scan of the
    corpus with a constant-size inner loop — the correct 100 TB plan
    (the benchmark side never grows with the data); per-vector norms
    are hoisted out of the pair loop exactly like ``vec_knn``.
    """
    from ..functions.vector import dot, l2_norm
    from pyspark.sql import Window

    emb = catalog.v_emb(spark, sf_dir).withColumn("nrm", l2_norm(F.col("emb")))
    bench = emb.where(F.col("vec_id") % _EDECON_MOD == 0).select(
        F.col("vec_id").alias("bench_id"),
        F.col("emb").alias("bemb"),
        F.col("nrm").alias("bnrm"),
    )
    corp = emb.where(F.col("vec_id") % _EDECON_MOD != 0)
    cos = F.round(
        dot(F.col("emb"), F.col("bemb")) / (F.col("nrm") * F.col("bnrm")), 6
    )
    scored = corp.crossJoin(F.broadcast(bench)).select(
        "vec_id", "bench_id", cos.alias("cos_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "bench_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("bench_id").alias("nearest_bench_id"),
            F.col("cos_sim").alias("max_cos"),
            (F.col("cos_sim") >= _EDECON_TAU).alias("contaminated"),
        )
    )


_EDECON_ORACLE = inline_views(
    "WITH bench AS (SELECT vec_id AS bench_id, emb AS bemb FROM v_emb "
    f"WHERE vec_id % {_EDECON_MOD} = 0), "
    "scored AS (SELECT c.vec_id, b.bench_id, "
    "ROUND(list_dot_product(c.emb, b.bemb) / "
    "(SQRT(list_dot_product(c.emb, c.emb)) * SQRT(list_dot_product(b.bemb, b.bemb))), 6) AS cos_sim "
    f"FROM v_emb c CROSS JOIN bench b WHERE c.vec_id % {_EDECON_MOD} != 0), "
    "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
    "ORDER BY cos_sim DESC, bench_id) AS rn FROM scored) "
    "SELECT vec_id, bench_id AS nearest_bench_id, cos_sim AS max_cos, "
    f"cos_sim >= {_EDECON_TAU} AS contaminated FROM ranked WHERE rn = 1"
)

QUERIES["decontaminate_embedding"] = decontaminate_embedding
ORACLES["decontaminate_embedding"] = _EDECON_ORACLE
