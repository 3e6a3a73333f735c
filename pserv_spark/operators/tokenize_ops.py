"""BPE tokenizer training + application over the ``documents`` table.

The missing first-class piece of the training-data text layer
(``text_token_count`` counts regex tokens; real pipelines *learn* the
tokenizer): byte-pair-encoding merge training in the published
Sennrich, Haddow & Birch 2016 structure —

1. **dict extraction (the data-scale stage)**: one distributed scan
   aggregates the corpus to a word-frequency dictionary and keeps the
   top ``VOCAB`` heavy hitters under a total order (freq DESC, word).
   At 100 TB this is the only stage that touches the corpus, and it is
   a plain partial→final count aggregation.
2. **merge loop (the model-scale stage)**: ``K`` greedy merges run on
   the extracted dictionary — ~10² rows — which is exactly how the
   published algorithm is specified (training iterates over the word
   dict, never the corpus).  Like ``ml_ols_normal_eq``'s normal-
   equation solve, the model crosses the shuffle, not the data.
   Every count is an exact integer; the best pair is chosen under the
   total order (count DESC, pair ASC), so training is deterministic.
3. **apply (distributed again)**: ``text_bpe_apply`` broadcast-joins
   the learned segmentations onto the exploded document words and
   counts BPE tokens per document (dictionary miss ⇒ character-level
   fallback, len+1 for the end-of-word marker).

Merge semantics (pinned precisely — ADVICE r2): symbols are
space-delimited; applying a merge is exactly TWO passes of
left-to-right non-overlapping ``replace(' a b ', ' ab ')``.  Because
adjacent occurrences share a delimiting space, a pass that merges a
pair cannot merge the immediately following symbol — so for runs of
≥6 identical symbols this is NOT byte-identical to the textbook
greedy token-list merge (``'aaaaaa'`` → ``[aa,a,aa,a]`` here vs
greedy ``[aa,aa,aa]``; the second pass exists to catch pairs the
shared-space skip deferred).  What matters for correctness is that
all three engines share ONE semantics: Python's ``str.replace``,
Spark's ``replace`` and DuckDB's ``replace`` all scan-and-skip
identically, the unit replay (tests/test_extensions.py) simulates the
same skip rule, and the unrolled-CTE DuckDB oracle applies the same
double replace — so the gate is exact by construction, not by luck.
The '_' end-of-word symbol cannot collide: vocabulary words are
``^[a-z]+$``.

Oracle: the FULL pipeline replayed in DuckDB as an unrolled chain of
``K`` (pair-count → arg-best → merge-apply) CTE triples over the same
top-``VOCAB`` dictionary.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

K_MERGES = 6
VOCAB = 150
_WORD_RE = "^[a-z]+$"
_APPLY_DOCS = 300  # doc_id bound for the apply op's output slice


def _dict_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w").rlike(_WORD_RE) & F.length("w").between(2, 12))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(VOCAB)
    )


def _train(sf_dir: str) -> tuple[tuple, tuple]:
    """(merge table rows, final (word, n_tokens) rows) — deterministic
    per corpus, cached across the train/apply ops of one run.

    The cache key includes the corpus content fingerprint (ADVICE r2:
    keyed by path alone, a regenerated ``/root/testdata`` under the
    same path would serve stale merges for the process lifetime).
    """
    from ..fixtures import fixture_key

    return _train_cached(sf_dir, fixture_key(sf_dir))


@lru_cache(maxsize=8)
def _train_cached(sf_dir: str, _corpus_fingerprint: str) -> tuple[tuple, tuple]:
    """Needs an active session; the registry always calls through
    ``text_bpe_train``/``text_bpe_apply`` which provide one."""
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    dict_rows = [(r.w, r.freq) for r in _dict_frame(spark, sf_dir).collect()]
    if not dict_rows:
        # pruned-to-empty corpus: no vocabulary, no merges — the
        # oracle's CTE chain is empty for the same reason
        return (), ()

    seqs = {w: " " + " ".join(w) + " _ " for w, _f in dict_rows}
    freqs = dict(dict_rows)
    merges = []
    for k in range(1, K_MERGES + 1):
        cnt: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            syms = seqs[w].split()
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + f
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        for w in seqs:
            seqs[w] = seqs[w].replace(pat, rep).replace(pat, rep)
        merges.append((k, f"{a} {b}", a + b, c))
    ntok = tuple((w, len(s.split())) for w, s in seqs.items())
    return tuple(merges), ntok


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (merge_rank, pair, merged, pair_count)."""
    merges, _ntok = _train(sf_dir)
    return spark.createDataFrame(
        list(merges), "merge_rank int, pair string, merged string, pair_count long"
    )


def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under the learned merges.

    Distributed apply: exploded document words broadcast-join the
    ``VOCAB``-row segmentation dict; misses fall back to
    character-level (len+1 for the end marker).  One corpus scan, one
    broadcast join, one keyed aggregation — the 100 TB inference shape.
    """
    _merges, ntok = _train(sf_dir)
    dict_df = F.broadcast(
        spark.createDataFrame(list(ntok), "w string, nt int")
    )
    docs = catalog.table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _APPLY_DOCS
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w").rlike(_WORD_RE) & F.length("w").between(2, 12))
    return (
        words.join(dict_df, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.coalesce(F.col("nt"), F.length("w") + 1))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def _oracle_ctes() -> list[tuple[str, str]]:
    ctes = [
        (
            "words",
            "SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM "
            "(SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) "
            f"WHERE regexp_matches(w, '{_WORD_RE}') AND len(w) BETWEEN 2 AND 12 "
            f"GROUP BY w ORDER BY freq DESC, w LIMIT {VOCAB}",
        ),
        (
            "v0",
            "SELECT w, freq, ' ' || array_to_string(list_transform("
            "generate_series(1, len(w)), i -> substr(w, i, 1)), ' ') || ' _ ' AS seq "
            "FROM words",
        ),
    ]
    for k in range(1, K_MERGES + 1):
        prev = f"v{k - 1}"
        ctes.append(
            (
                f"p{k}",
                "SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM ("
                "SELECT freq, unnest(list_transform(generate_series(1, "
                "len(string_split(trim(seq), ' ')) - 1), "
                "i -> string_split(trim(seq), ' ')[i] || ' ' || "
                f"string_split(trim(seq), ' ')[i + 1])) AS pair FROM {prev}) "
                "GROUP BY pair",
            )
        )
        ctes.append((f"b{k}", f"SELECT pair, cnt FROM p{k} ORDER BY cnt DESC, pair LIMIT 1"))
        ctes.append(
            (
                f"v{k}",
                "SELECT w, freq, replace(replace(seq, "
                "' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '), "
                "' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ') AS seq "
                f"FROM {prev} CROSS JOIN b{k}",
            )
        )
    return ctes


def _train_oracle() -> str:
    ctes = _oracle_ctes()
    body = " UNION ALL ".join(
        f"SELECT {k} AS merge_rank, pair, replace(pair, ' ', '') AS merged, "
        f"cnt AS pair_count FROM b{k}"
        for k in range(1, K_MERGES + 1)
    )
    return "WITH " + ", ".join(f"{n} AS ({q})" for n, q in ctes) + " " + body


def _apply_oracle() -> str:
    ctes = _oracle_ctes()
    ctes.append(
        (
            "dict",
            "SELECT w, CAST(len(string_split(trim(seq), ' ')) AS INT) AS nt "
            f"FROM v{K_MERGES}",
        )
    )
    ctes.append(
        (
            "dw",
            "SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split(lower(text), ' ')) AS w FROM documents "
            f"WHERE doc_id < {_APPLY_DOCS}) "
            f"WHERE regexp_matches(w, '{_WORD_RE}') AND len(w) BETWEEN 2 AND 12",
        )
    )
    body = (
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(COALESCE(nt, len(w) + 1)) AS BIGINT) AS n_bpe_tokens "
        "FROM dw LEFT JOIN dict USING (w) GROUP BY doc_id"
    )
    return "WITH " + ", ".join(f"{n} AS ({q})" for n, q in ctes) + " " + body




def text_bpe_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage of the learned BPE dict per language — the
    tokenizer-health readout that decides whether a mixture needs
    retraining: per language, how many word occurrences hit the
    learned dictionary vs fall back to character-level (OOV).

    One corpus scan + the same broadcast dict as ``text_bpe_apply``;
    the OOV rate is an exact small-int quotient."""
    _merges, ntok = _train(sf_dir)
    dict_df = F.broadcast(spark.createDataFrame(list(ntok), "w string, nt int"))
    docs = catalog.table(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w").rlike(_WORD_RE) & F.length("w").between(2, 12))
    return (
        words.join(dict_df, "w", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.col("nt").isNull().cast("long")).cast("long").alias("n_oov"),
            (
                F.sum(F.col("nt").isNull().cast("long")).cast("double")
                / F.count("*")
            ).alias("oov_rate"),
        )
    )


def _coverage_oracle() -> str:
    ctes = _oracle_ctes()
    ctes.append(("dict", f"SELECT w FROM v{K_MERGES}"))
    ctes.append(
        (
            "dw",
            "SELECT lang, w FROM (SELECT lang, "
            "unnest(string_split(lower(text), ' ')) AS w FROM documents) "
            f"WHERE regexp_matches(w, '{_WORD_RE}') AND len(w) BETWEEN 2 AND 12",
        )
    )
    body = (
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(CASE WHEN dict.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
        "CAST(SUM(CASE WHEN dict.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate "
        "FROM dw LEFT JOIN dict ON dw.w = dict.w GROUP BY lang"
    )
    return "WITH " + ", ".join(f"{n} AS ({q})" for n, q in ctes) + " " + body


QUERIES = {
    "text_bpe_train": text_bpe_train,
    "text_bpe_apply": text_bpe_apply,
    "text_bpe_vocab_coverage": text_bpe_vocab_coverage,
}

ORACLES = {
    "text_bpe_train": _train_oracle(),
    "text_bpe_apply": _apply_oracle(),
    "text_bpe_vocab_coverage": _coverage_oracle(),
}
