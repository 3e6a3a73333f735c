"""Deterministic distributed sketches with exact cross-engine oracles.

Engine-native sketches (``approx_count_distinct``) use private seeded
hash families, so their estimates can never hash-match another engine —
that is why the corpus declares the HLL probe rows-only (SURVEY §2.2).
These operators rebuild the sketches from first principles on the
md5 anchor (SURVEY §4.5): every register/counter is a pure function of
the data, both engines replay the identical algorithm, and the oracle
match is exact — the estimate itself, not just row counts.

- ``sketch_hll_estimate`` — a 256-register HyperLogLog over
  ``user_id`` per event type (Flajolet et al. 2007, with the standard
  small-range correction).  Register index = first 8 md5 bits, rank =
  leading-zero count of the next 60 bits + 1.  The 2^-M register sum
  is accumulated as an *integer* (2^(61-M) summed in DECIMAL(38,0)) —
  summing the doubles directly would round once the exponent spread
  exceeds the 53-bit mantissa, making the total order-dependent and
  the oracle flaky.
- ``sketch_countmin_topk`` — a 4×1024 count-min sketch over document
  tokens + point estimates (min over the 4 rows) for every token, with
  the top-10 by estimate.  Depth-row bucket = md5(seed‖token) — the
  same seeded-md5 family as the MinHash operator.

Scale shape (the reason sketches exist at 100 TB): both are one scan +
one groupBy whose output is the *sketch size* (256 registers / 4096
counters), independent of input cardinality; registers merge by MAX
and counters by SUM, so partial aggregation is map-side combinable and
cross-partition / cross-day sketch union is exact.  The exact
COUNT(DISTINCT) carried alongside for error context is the one
non-mergeable expression (it is the thing the sketch replaces at
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..catalog import load_tables
from ._oracle import duck_hash32, inline_views

_HLL_M = 256  # registers (first 2 hex digits of md5)
_HLL_WBITS = 60  # rank field: next 15 hex digits
#: alpha_256 per the HLL paper (m >= 128 branch).
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def _duck_hex_fold(expr: str, start: int, n: int) -> str:
    """DuckDB: integer from hex digits [start, start+n) of md5(expr)
    (Horner fold — DuckDB 1.0 has no conv())."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series({start}, {start + n - 1}), i -> "
        f"CAST(strpos('0123456789abcdef', substr(md5({expr}), i, 1)) - 1 AS BIGINT))), "
        "(a, b) -> a * 16 + b)"
    )


def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a deterministic
    256-register HLL, with the exact count for error context."""
    ev = catalog.v_events(spark, sf_dir).select("event_type", "user_id")
    h = F.md5(F.col("user_id").cast("string"))
    j = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    # rank = leading zeros of the 60-bit field + 1; bin() drops leading
    # zeros so bit-length = length(bin(w)); w = 0 -> all 60 zero bits.
    rho = F.when(w == 0, _HLL_WBITS + 1).otherwise(
        _HLL_WBITS + 1 - F.length(F.bin(w))
    )
    regs = (
        ev.select("event_type", j.alias("j"), rho.alias("rho"))
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("m_j"))
    )
    # integer-exact register sum: sum(2^(61-M)) then descale by 2^61.
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - m_j)")
    per_type = regs.groupBy("event_type").agg(
        F.sum(pow2.cast("decimal(38,0)")).alias("s"),
        F.count("*").cast("long").alias("nonzero"),
    )
    denom = (
        F.col("s").cast("double") / F.lit(float(2 ** (_HLL_WBITS + 1)))
        + (_HLL_M - F.col("nonzero")).cast("double")  # empty registers: 2^0
    )
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / denom
    v = _HLL_M - F.col("nonzero")
    corrected = F.when(
        (raw <= 2.5 * _HLL_M) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            F.round(corrected, 4).alias("est_distinct"),
            "exact_distinct",
            F.col("nonzero").cast("long").alias("n_registers_set"),
        )
    )


def _hll_oracle() -> str:
    j = _duck_hex_fold("CAST(user_id AS VARCHAR)", 1, 2)
    w = _duck_hex_fold("CAST(user_id AS VARCHAR)", 3, 15)
    wb = _HLL_WBITS
    m = _HLL_M
    return (
        "WITH ev AS (SELECT event_type, user_id FROM v_events), "
        f"hashed AS (SELECT event_type, {j} AS j, {w} AS w FROM ev), "
        f"ranked AS (SELECT event_type, j, CASE WHEN w = 0 THEN {wb + 1} "
        f"ELSE {wb + 1} - length(printf('%b', w)) END AS rho FROM hashed), "
        "regs AS (SELECT event_type, j, MAX(rho) AS m_j FROM ranked GROUP BY event_type, j), "
        "per_type AS (SELECT event_type, "
        f"SUM(CAST((CAST(1 AS BIGINT) << ({wb + 1} - m_j)) AS DECIMAL(38,0))) AS s, "
        "COUNT(*) AS nonzero FROM regs GROUP BY event_type), "
        "est AS (SELECT event_type, nonzero, "
        f"{(_HLL_ALPHA * m * m)!r} / "
        f"(CAST(s AS DOUBLE) / {float(2 ** (wb + 1))!r} + ({m} - nonzero)) AS raw "
        "FROM per_type), "
        "corrected AS (SELECT event_type, nonzero, "
        f"CASE WHEN raw <= {2.5 * m} AND nonzero < {m} "
        f"THEN {float(m)!r} * LN({float(m)!r} / ({m} - nonzero)) ELSE raw END AS e "
        "FROM est), "
        "exact AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct "
        "FROM ev GROUP BY event_type) "
        "SELECT c.event_type, ROUND(c.e, 4) AS est_distinct, x.exact_distinct, "
        "CAST(c.nonzero AS BIGINT) AS n_registers_set "
        "FROM corrected c JOIN exact x USING (event_type)"
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 1024
_CMS_TOPK = 10


def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document tokens: build the 4×1024 counter
    table, point-estimate every distinct token (min over depth rows),
    report the top-10 by (estimate DESC, token ASC).

    The overestimate bias (estimate ≥ true count, within εN at the
    sketch's guarantee) is visible against true_count in the output.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    buckets = [
        F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(str(d)), F.col("w"))), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(_CMS_WIDTH),
        ).alias(f"b{d}")
        for d in range(_CMS_DEPTH)
    ]
    hashed = tok.select("w", *buckets)
    # counter table: one groupBy per depth row, unioned — output is
    # depth*width counters regardless of input size.
    counters = None
    for d in range(_CMS_DEPTH):
        part = (
            hashed.groupBy(F.col(f"b{d}").alias("bucket"))
            .agg(F.count("*").alias("c"))
            .select(F.lit(d).alias("row"), "bucket", "c")
        )
        counters = part if counters is None else counters.unionAll(part)
    # point estimates: join each distinct token's buckets to its counters.
    distinct_toks = hashed.groupBy("w", *[f"b{d}" for d in range(_CMS_DEPTH)]).agg(
        F.count("*").cast("long").alias("true_count")
    )
    est = distinct_toks
    for d in range(_CMS_DEPTH):
        cd = counters.where(F.col("row") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("c").alias(f"c{d}")
        )
        est = est.join(F.broadcast(cd), f"b{d}")
    estimate = F.least(*[F.col(f"c{d}") for d in range(_CMS_DEPTH)]).cast("long")
    ranked = est.select(
        "w", estimate.alias("est_count"), "true_count"
    ).orderBy(F.col("est_count").desc(), "w").limit(_CMS_TOPK)
    return ranked


def _cms_oracle() -> str:
    width = _CMS_WIDTH
    bucket_exprs = ", ".join(
        f"{_duck_hex_fold(repr(str(d)) + ' || w', 1, 8)} % {width} AS b{d}"
        for d in range(_CMS_DEPTH)
    )
    counter_ctes = ", ".join(
        f"cnt{d} AS (SELECT b{d} AS bucket, COUNT(*) AS c{d} FROM hashed GROUP BY b{d})"
        for d in range(_CMS_DEPTH)
    )
    joins = " ".join(f"JOIN cnt{d} ON t.b{d} = cnt{d}.bucket" for d in range(_CMS_DEPTH))
    least = ", ".join(f"c{d}" for d in range(_CMS_DEPTH))
    group_bs = ", ".join(f"b{d}" for d in range(_CMS_DEPTH))
    return (
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), "
        f"hashed AS (SELECT w, {bucket_exprs} FROM tok), "
        f"{counter_ctes}, "
        f"toks AS (SELECT w, {group_bs}, CAST(COUNT(*) AS BIGINT) AS true_count "
        f"FROM hashed GROUP BY w, {group_bs}) "
        f"SELECT w, CAST(LEAST({least}) AS BIGINT) AS est_count, true_count "
        f"FROM toks t {joins} "
        f"ORDER BY est_count DESC, w LIMIT {_CMS_TOPK}"
    )


_BLOOM_K = 3
#: build side: high-value orders (the selective semi-join the filter
#: stands in for).
_BLOOM_PRED = "o_totalprice > 450000"


def _bloom_positions(col, m: int):
    """The k md5-anchored bit positions of a key (engine side)."""
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"b{i}:"), col.cast("string"))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        )
        for i in range(_BLOOM_K)
    ]


def sketch_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: build a 3-hash bloom filter
    over a selective dimension key set, probe the fact table with it,
    and report every surviving row labelled true-match vs
    false-positive.

    This is the manual, deterministic form of Spark's runtime bloom
    join filter (spark.sql.optimizer.runtime.bloomFilter): the bit
    set broadcasts to every scan task and drops non-joining fact rows
    *before* any fact shuffle, which is the entire win.  The filter
    SIZES ITSELF from the build cardinality — m = 16·n positions, so
    the load factor (and the ~0.5% false-positive rate,
    (1−e^{−3/16})³) is scale-invariant where a fixed-m filter would
    saturate at 10× the keys.  The probe is a chain of three
    broadcast LEFT SEMI joins on the hash positions (hash lookups per
    row, no fact exchange).  No false negative is possible — the
    oracle replays the same positions and would catch a lost match
    as a missing row.
    """
    t = load_tables(spark, sf_dir)
    build_keys = t["orders"].where(F.expr(_BLOOM_PRED)).select("o_orderkey")
    n_keys = build_keys.count()
    m = 16 * n_keys  # both engines derive m from the same COUNT
    pos_b = _bloom_positions(F.col("o_orderkey"), m)
    bits = None
    for c in pos_b:
        part = build_keys.select(c.alias("p"))
        bits = part if bits is None else bits.unionAll(part)
    bits = bits.distinct()
    li = t["lineitem"].select("l_orderkey", "l_linenumber")
    probed = li.select(
        "l_orderkey",
        "l_linenumber",
        *[c.alias(f"p{i}") for i, c in enumerate(_bloom_positions(F.col("l_orderkey"), m))],
    )
    for i in range(_BLOOM_K):
        probed = probed.join(
            F.broadcast(bits.withColumnRenamed("p", f"p{i}")), f"p{i}", "left_semi"
        )
    truth = build_keys.withColumnRenamed("o_orderkey", "l_orderkey").distinct()
    return (
        probed.join(truth.withColumn("is_true_match", F.lit(True)), "l_orderkey", "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce("is_true_match", F.lit(False)).alias("is_true_match"),
        )
    )


def _bloom_oracle() -> str:
    def pos(i: int, key: str) -> str:
        fold = _duck_hex_fold(f"'b{i}:' || CAST({key} AS VARCHAR)", 1, 8)
        return f"({fold}) % (SELECT m FROM msize)"

    probe_conds = " AND ".join(
        f"{pos(i, 'l_orderkey')} IN (SELECT p FROM bits)" for i in range(_BLOOM_K)
    )
    pos_union = " UNION ".join(
        f"SELECT {pos(i, 'o_orderkey')} AS p FROM build" for i in range(_BLOOM_K)
    )
    return (
        f"WITH build AS (SELECT o_orderkey FROM orders WHERE {_BLOOM_PRED}), "
        "msize AS (SELECT 16 * COUNT(*) AS m FROM build), "
        f"bits AS ({pos_union}) "
        f"SELECT l_orderkey, l_linenumber, "
        f"l_orderkey IN (SELECT o_orderkey FROM build) AS is_true_match "
        f"FROM lineitem WHERE {probe_conds}"
    )



# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct sketch + set-operation estimates
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SCALE = float(1 << 60)  # hash domain: 60-bit ints from 15 hex digits


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketches (Bar-Yossef et al. 2002) over the
    distinct users of the 'click' and 'view' event streams, plus
    union / intersection estimates from the *merged sketches* — the
    theta-sketch-style set algebra that exact COUNT(DISTINCT) cannot
    do without re-scanning both inputs.

    Estimator: with U_(K) the K-th smallest normalized hash,
    D-hat = (K-1)/U_(K); union from the merged K-min list; intersection
    via the Jaccard fraction of merged values present in both sketches.

    Scale shape: the sketch is built in TWO phases — per (type, salt)
    partial K-min arrays (map-side bounded at K values each), then a
    merge of 32 arrays per type — so no single reducer ever sees more
    than 32·K values, and the same merge runs across days/partitions
    for incremental maintenance.  Exact distinct counts are carried for
    error context.  Everything is md5-anchored (SURVEY §4.5): both
    engines replay identical integer hash lists, so estimates
    hash-match exactly.
    """
    ev = catalog.v_events(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    w = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 3, 15), 16, 10).cast(
        "long"
    )
    # Phase 1: partial K-min per (type, salt-of-hash).
    partial = (
        ev.select("event_type", w.alias("w"))
        .groupBy("event_type", (F.col("w") % 32).alias("salt"))
        .agg(F.slice(F.array_sort(F.collect_set("w")), 1, _KMV_K).alias("mins"))
    )
    # Phase 2: merge partials -> one K-min array per type (+ exact count).
    sk = partial.groupBy("event_type").agg(
        F.slice(F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))), 1, _KMV_K).alias(
            "mins"
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    sk = sk.join(exact, "event_type")

    def est(arr):
        # Standard KMV: a sketch holding fewer than K values has seen
        # the whole distinct set -> its size IS the exact count.
        kth = F.element_at(arr, F.least(F.lit(_KMV_K), F.size(arr))).cast("double")
        return F.when(
            F.size(arr) < _KMV_K, F.size(arr).cast("double")
        ).otherwise(
            F.round(F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SCALE) / kth, 4)
        )

    per_type = sk.select(
        F.col("event_type").alias("set_expr"),
        F.col("n_exact"),
        est(F.col("mins")).alias("estimate"),
    )

    # Global aggregates (never filters of maybe-absent grouped rows):
    # each side ALWAYS emits exactly one row — NULL sketch if the type
    # is missing — so the set-algebra rows below survive an input where
    # one or both streams were pruned to nothing (the oracle's scalar
    # subqueries behave identically).  A filter+crossJoin here would
    # silently drop the union/intersection estimates the moment one
    # event type is absent from a partition-pruned scan.
    # F.min, not F.first: sk carries at most one row per event_type, but
    # min is order-insensitive by contract (arrays compare lexically),
    # so a future edit that keeps per-salt partials can't silently make
    # this non-deterministic the way first() would.
    a = sk.where(F.col("event_type") == "click").agg(
        F.min("mins").alias("ma")
    )
    b = sk.where(F.col("event_type") == "view").agg(
        F.min("mins").alias("mb")
    )
    both = a.crossJoin(b).select(
        "ma",
        "mb",
        F.slice(F.array_sort(F.array_union("ma", "mb")), 1, _KMV_K).alias("mu"),
    )
    union_est = est(F.col("mu"))
    jacc = F.size(
        F.filter(
            "mu",
            lambda x: F.array_contains("ma", x) & F.array_contains("mb", x),
        )
    ).cast("double") / F.least(F.lit(_KMV_K), F.size("mu")).cast("double")
    ev_exact = catalog.v_events(spark, sf_dir)
    n_union = (
        ev_exact.where(F.col("event_type").isin("click", "view"))
        .agg(F.countDistinct("user_id").cast("long").alias("n"))
    )
    n_inter = (
        ev_exact.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .where(F.col("nt") == 2)
        .agg(F.count("*").cast("long").alias("n"))
    )
    setops = (
        both.crossJoin(n_union.select(F.col("n").alias("nu")))
        .crossJoin(n_inter.select(F.col("n").alias("ni")))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("click|view").alias("set_expr"),
                        F.col("nu").alias("n_exact"),
                        union_est.alias("estimate"),
                    ),
                    F.struct(
                        F.lit("click&view").alias("set_expr"),
                        F.col("ni").alias("n_exact"),
                        F.round(jacc * union_est, 4).alias("estimate"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
    )
    return per_type.unionByName(setops)


def _kmv_oracle() -> str:
    w = _duck_hex_fold("CAST(user_id AS VARCHAR)", 3, 15)
    k = _KMV_K
    scale = f"{_KMV_SCALE!r}"
    return inline_views(
        "WITH hashes AS (SELECT DISTINCT event_type, "
        f"{w} AS w FROM v_events WHERE event_type IN ('click', 'view')), "
        "ranked AS (SELECT event_type, w, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY w) AS rn FROM hashes), "
        f"sk AS (SELECT event_type, list(w ORDER BY w) AS mins FROM ranked "
        f"WHERE rn <= {k} GROUP BY event_type), "
        "exact AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact "
        "FROM v_events WHERE event_type IN ('click', 'view') GROUP BY event_type), "
        "per_type AS (SELECT s.event_type AS set_expr, e.n_exact, "
        f"CASE WHEN len(s.mins) < {k} THEN CAST(len(s.mins) AS DOUBLE) "
        f"ELSE ROUND({k - 1} * {scale} / CAST(s.mins[len(s.mins)] AS DOUBLE), 4) END AS estimate "
        "FROM sk s JOIN exact e ON s.event_type = e.event_type), "
        "ab AS (SELECT (SELECT mins FROM sk WHERE event_type = 'click') AS ma, "
        "(SELECT mins FROM sk WHERE event_type = 'view') AS mb), "
        "mg AS (SELECT ma, mb, "
        f"(list_sort(list_distinct(ma || mb)))[1:{k}] AS mu FROM ab), "
        "nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM v_events "
        "WHERE event_type IN ('click', 'view')), "
        "ni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM "
        "(SELECT user_id FROM v_events WHERE event_type IN ('click', 'view') "
        "GROUP BY user_id HAVING COUNT(DISTINCT event_type) = 2)), "
        "setops AS ("
        "SELECT 'click|view' AS set_expr, (SELECT n FROM nu) AS n_exact, "
        f"CASE WHEN len(mu) < {k} THEN CAST(len(mu) AS DOUBLE) "
        f"ELSE ROUND({k - 1} * {scale} / CAST(mu[len(mu)] AS DOUBLE), 4) END AS estimate FROM mg "
        "UNION ALL "
        "SELECT 'click&view', (SELECT n FROM ni), "
        f"ROUND(CAST(len(list_filter(mu, x -> list_contains(ma, x) AND "
        f"list_contains(mb, x))) AS DOUBLE) / CAST(least({k}, len(mu)) AS DOUBLE) * "
        f"(CASE WHEN len(mu) < {k} THEN CAST(len(mu) AS DOUBLE) "
        f"ELSE ROUND({k - 1} * {scale} / CAST(mu[len(mu)] AS DOUBLE), 4) END), 4) FROM mg) "
        "SELECT * FROM per_type UNION ALL SELECT * FROM setops"
    )


# ---------------------------------------------------------------------------
# Deterministic hash-sampled quantile estimation
# ---------------------------------------------------------------------------

_SAMPLE_PCT = 5  # keep ~5% of rows


def sketch_sampled_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile estimates from a deterministic ~5% key-hash
    sample, with the exact full-data quantiles for error context.

    The scale story: exact interpolated percentiles need a per-group
    sort of the full fact table; a hash sample bounds that sort to
    SAMPLE_PCT of the data while staying reproducible (pure function
    of the key — no RNG, no seed state, identical on every engine,
    run, and partitioning).  Both engines select the identical sample
    rows and share interpolated-percentile semantics (validated by the
    corpus ``agg_percentile``), so the oracle match is exact.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    keyh = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber"))
            ),
            1,
            8,
        ),
        16,
        10,
    )
    samp = li.where(keyh % 100 < _SAMPLE_PCT)
    est = samp.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_sample"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("est_p50"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("est_p90"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("est_p99"),
    )
    true = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("true_p50"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("true_p90"),
    )
    return est.join(true, "l_returnflag")


def _sampled_quantile_oracle() -> str:
    keyh = duck_hash32(
        "concat(CAST(l_orderkey AS VARCHAR), '_', CAST(l_linenumber AS VARCHAR))"
    )
    return (
        f"WITH samp AS (SELECT * FROM lineitem WHERE {keyh} % 100 < {_SAMPLE_PCT}), "
        "est AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_sample, "
        "quantile_cont(l_extendedprice, 0.5) AS est_p50, "
        "quantile_cont(l_extendedprice, 0.9) AS est_p90, "
        "quantile_cont(l_extendedprice, 0.99) AS est_p99 "
        "FROM samp GROUP BY l_returnflag), "
        "tru AS (SELECT l_returnflag, "
        "quantile_cont(l_extendedprice, 0.5) AS true_p50, "
        "quantile_cont(l_extendedprice, 0.9) AS true_p90 "
        "FROM lineitem GROUP BY l_returnflag) "
        "SELECT e.l_returnflag, e.n_sample, e.est_p50, e.est_p90, e.est_p99, "
        "t.true_p50, t.true_p90 FROM est e JOIN tru t USING (l_returnflag)"
    )


# ---------------------------------------------------------------------------
# Bitmap-index rollup (bit_or presence bitmaps)
# ---------------------------------------------------------------------------


def agg_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-bitmap-style distinct rollup: per (event_type, day) a
    presence bitmap of user hash-buckets (60 buckets in one BIGINT —
    shift 63 overflows DuckDB's signed <<), OR-merged across days
    into per-type monthly bitmaps.

    The OLAP bitmap trick: COUNT(DISTINCT) does not re-aggregate
    (distinct users per day cannot be summed into distinct users per
    month), but presence *bitmaps* merge with a pure bit OR — so a
    100 TB store can keep tiny per-(dim, day) bitmaps and answer
    distinct-bucket questions over any date range without touching raw
    events.  Both the daily bitmaps and the OR-merge are exact integer
    ops (`shiftleft`/`bit_or`/`bit_count`), hence the exact oracle.
    Bucket count is the precision dial; a production bitmap uses 2^k
    words of the same construction.
    """
    ev = catalog.v_events(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("bm:"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 60
    ).cast("int")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            bucket.alias("b"),
        )
        # shiftleft's PySpark wrapper only takes a literal shift; the
        # SQL form accepts a column.
        .withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .groupBy("event_type", "day")
        .agg(F.bit_or("bit").alias("bm"))
    )
    return daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.bit_count(F.bit_or("bm")).cast("int").alias("n_buckets_month"),
        F.max(F.bit_count("bm")).cast("int").alias("max_buckets_day"),
    )


def _bitmap_oracle() -> str:
    b = duck_hash32("concat('bm:', CAST(user_id AS VARCHAR))")
    return inline_views(
        "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        f"bit_or(CAST(1 AS BIGINT) << CAST({b} % 60 AS INT)) AS bm "
        "FROM v_events GROUP BY 1, 2) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days, "
        "CAST(bit_count(bit_or(bm)) AS INT) AS n_buckets_month, "
        "CAST(MAX(bit_count(bm)) AS INT) AS max_buckets_day "
        "FROM daily GROUP BY event_type"
    )


QUERIES = {
    "sketch_hll_estimate": sketch_hll_estimate,
    "sketch_countmin_topk": sketch_countmin_topk,
    "sketch_bloom_prune": sketch_bloom_prune,
    "sketch_kmv_distinct": sketch_kmv_distinct,
    "sketch_sampled_quantile": sketch_sampled_quantile,
    "agg_bitmap_rollup": agg_bitmap_rollup,
}

ORACLES = {
    "sketch_hll_estimate": inline_views(_hll_oracle()),
    "sketch_countmin_topk": _cms_oracle(),
    "sketch_bloom_prune": _bloom_oracle(),
    "sketch_kmv_distinct": _kmv_oracle(),
    "sketch_sampled_quantile": _sampled_quantile_oracle(),
    "agg_bitmap_rollup": _bitmap_oracle(),
}
