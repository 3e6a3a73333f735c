"""Remaining declared-surface operators (SURVEY §2.2 loose ends).

- ``fn_map_props`` — MapType surface: ``from_json`` the ``props`` JSON
  into ``map<string,int>``, then map functions (keys, lookup).  Exact
  oracle via DuckDB's json functions.
- ``agg_approx_distinct`` — HyperLogLog++ ``approx_count_distinct``.
  Declared **rows-only** (SURVEY §2.2): HLL estimates are
  engine-specific, so no oracle entry — the driver records the weaker
  check, which is the honest contract for a sketch.  The exact twin
  (``agg_distinct``) is the corpus query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..catalog import load_tables
from ._oracle import inline_views


def fn_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    # Parse as map<string,string> and cast the ONE field we need: with
    # map<string,int>, a single non-int value (production props carry
    # mixed types) nulls the ENTIRE parsed map — keys and all — where
    # the oracle's json_keys still sees them (hostile-text audit, r7).
    m = F.from_json("props", "map<string,string>")
    # k_val semantics (ADVICE r8 #3): floor of the numeric value of
    # props.k, NULL if non-numeric — normalized through DOUBLE on both
    # sides.  A direct string->int cast diverges between the engines
    # on fractional payloads (DuckDB ROUNDS '5.7'->6 even from
    # varchar; Spark try_cast NULLs it); going value->double->floor is
    # representation-insensitive (Spark's map<string,string> renders
    # 1e2 as "100.0", exactly DuckDB's json_extract_string) and makes
    # bare 5.7, quoted "5.7", 5.0, and 1e2 agree — pinned by the
    # hostile-text tier's fractional/exponent/boolean props payloads.
    # try_cast, not cast: ANSI mode (Spark 4 default) would throw.
    return ev.where(F.col("user_id") < 40).select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.floor(F.try_element_at(m, F.lit("k")).try_cast("double"))
        .cast("int")
        .alias("k_val"),
    )


_MAP_ORACLE = (
    "WITH v_events AS (SELECT event_id, user_id, props FROM events "
    "WHERE ts IS NOT NULL) "
    "SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') AS keys, "
    "CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS INT) AS k_val "
    "FROM v_events WHERE user_id < 40"
)


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").cast("long").alias("approx_supp")
    )


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery (AND/OR/XOR/shifts/popcount) — bit-packed flag
    columns are the cheapest filter representation at scale."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a, b = F.col("l_orderkey"), F.col("l_partkey")
    return li.where(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        a.bitwiseAND(b).alias("band"),
        a.bitwiseOR(b).alias("bor"),
        a.bitwiseXOR(b).alias("bxor"),
        F.shiftleft("l_linenumber", 3).cast("long").alias("shl"),
        F.shiftright("l_suppkey", 1).cast("long").alias("shr"),
        F.bit_count("l_suppkey").cast("int").alias("pop"),
    )


_BITWISE_ORACLE = (
    "SELECT l_orderkey, l_linenumber, "
    "l_orderkey & l_partkey AS band, l_orderkey | l_partkey AS bor, "
    "xor(l_orderkey, l_partkey) AS bxor, "
    "CAST(l_linenumber << 3 AS BIGINT) AS shl, "
    "CAST(l_suppkey >> 1 AS BIGINT) AS shr, "
    "CAST(bit_count(l_suppkey) AS INT) AS pop "
    "FROM lineitem WHERE l_orderkey < 100"
)


def source_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator source (``spark.range``): rows from no input files —
    the spine/driver-table primitive (DuckDB ``generate_series``).
    Range is a leaf the planner can split into N partitions with no
    scan, so derived tables cost nothing at any scale."""
    del sf_dir  # source op: no input data
    return spark.range(0, 500).select(
        "id",
        ((F.col("id") * F.col("id")) % 97).alias("sq_mod"),
        F.expr("id DIV 7").alias("bucket7"),
    )


_SERIES_ORACLE = (
    "SELECT i AS id, (i * i) % 97 AS sq_mod, i // 7 AS bucket7 "
    "FROM generate_series(0, 499) t(i)"
)


def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (ordinality-preserving flatten) — token
    position is load-bearing for windowed text ops downstream."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.where(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "word")
    )


_POSEXPLODE_ORACLE = (
    "SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS word FROM "
    "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20), "
    "LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) t"
)


def dim_scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 effective ranges: each (user, event_type) observation
    becomes a [eff_from_us, eff_to_us) validity interval closed by the
    next observation (NULL = current).  The dimension-history build
    step of any warehouse load; one window shuffle on the entity key."""
    from pyspark.sql import Window

    from .. import catalog

    ev = catalog.v_events(spark, sf_dir).where(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("eff_from_us"),
        F.lead("ts_us").over(w).alias("eff_to_us"),
    )


_SCD2_ORACLE = (
    "SELECT user_id, event_type, ts_us AS eff_from_us, "
    "LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS eff_to_us "
    "FROM v_events WHERE user_id < 40"
)


def _scd2_pit_sql() -> str:
    """Point-in-time (AS OF) join of the purchase facts onto the SCD2
    attribute history: each fact picks the dimension version whose
    [eff_from, eff_to) interval covers the fact's event time — what a
    warehouse query does instead of joining the mutable dimension
    (which would leak future attribute values into past facts).

    Scale shape: both sides hash-partition on the entity key (ONE
    exchange pair); within a user the interval check is a residual on
    the equi-join — never a cross join.  Output aggregates fact counts
    per dimension version-attribute, all integers.
    """
    return (
        "WITH dim AS ("
        # attribute history = the NON-purchase events (a purchase must
        # pick up the attribute in effect before it, never itself)
        "  SELECT user_id, event_type AS attr, ts_us AS eff_from_us,"
        "    LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
        "      AS eff_to_us"
        "  FROM v_events WHERE user_id < 40 AND event_type <> 'purchase'"
        "), fact AS ("
        "  SELECT user_id, ts_us, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents"
        "  FROM v_events WHERE event_type = 'purchase' AND user_id < 40"
        ") SELECT d.attr AS dim_attr_at_purchase,"
        "    CAST(COUNT(*) AS BIGINT) AS n_facts,"
        "    CAST(SUM(f.cents) AS BIGINT) AS cents"
        "  FROM fact f JOIN dim d ON f.user_id = d.user_id"
        "  AND f.ts_us >= d.eff_from_us"
        "  AND (d.eff_to_us IS NULL OR f.ts_us < d.eff_to_us)"
        "  GROUP BY d.attr"
    )


def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join of purchases onto the SCD2 history."""
    load_tables(spark, sf_dir)
    return spark.sql(_scd2_pit_sql())


def _json_struct_sql(parse: str, field: str) -> str:
    """Typed JSON parsing (``from_json`` to a declared struct — the
    schema-on-read contract, vs the stringly get_json_object in the
    corpus ``fn_json``): parse, extract the typed field, aggregate.
    All integers."""
    return (
        f"WITH j AS (SELECT event_id, {parse} AS k FROM v_events)"
        f" SELECT {field} % 10 AS k_bucket,"
        "    CAST(COUNT(*) AS BIGINT) AS n,"
        f"   CAST(SUM({field}) AS BIGINT) AS sum_k,"
        f"   CAST(MIN({field}) AS BIGINT) AS min_k,"
        f"   CAST(MAX({field}) AS BIGINT) AS max_k"
        "  FROM j GROUP BY 1"
    )


def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared struct schema + typed aggregation."""
    load_tables(spark, sf_dir)
    # from_json at DOUBLE + FLOOR (r9): the declared-struct lane is
    # STRICT — quoted numbers and booleans are NOT coerced (field
    # nulls).  The oracle mirrors that with a json_type() guard.
    return spark.sql(
        _json_struct_sql(
            "CAST(FLOOR(from_json(props, 'k DOUBLE').k) AS INT)", "k"
        )
    )


def _collation_mixed(vchar: str) -> str:
    """Deterministic case-diversified lang column.

    NULL lang stays NULL on the leading branch: Spark's CONCAT
    propagates a NULL argument while DuckDB's skips it (yielding ''),
    so the title-case arm must never see a NULL."""
    return (
        "CASE WHEN lang IS NULL THEN NULL"
        " WHEN doc_id % 3 = 0 THEN UPPER(lang)"
        " WHEN doc_id % 3 = 1 THEN CONCAT(UPPER(SUBSTR(lang, 1, 1)),"
        f" CAST(SUBSTR(lang, 2) AS {vchar}))"
        " ELSE lang END"
    )


def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitive grouping via
    ``COLLATE UTF8_LCASE`` (the ANSI collation surface MySQL gives the
    reference via ci collations).  The group representative is the
    plain-binary MIN of the group's members — deterministic; the
    oracle reproduces the grouping with lower()."""
    load_tables(spark, sf_dir)
    mixed = _collation_mixed("STRING")
    return spark.sql(
        f"WITH d AS (SELECT doc_id, {mixed} AS mixed_lang FROM documents)"
        " SELECT MIN(mixed_lang) AS rep, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM d GROUP BY mixed_lang COLLATE UTF8_LCASE"
    )


def _collation_oracle() -> str:
    mixed = _collation_mixed("VARCHAR")
    return (
        f"WITH d AS (SELECT doc_id, {mixed} AS mixed_lang FROM documents)"
        " SELECT MIN(mixed_lang) AS rep, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM d GROUP BY lower(mixed_lang)"
    )


def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` into the open VARIANT
    encoding, typed extraction via ``variant_get`` — the semi-
    structured path that replaces stringly JSON at scale (binary
    encoding, no re-parse per access).  Oracle: DuckDB's typed
    json_extract produces the same values."""
    load_tables(spark, sf_dir)
    # try_variant_get at DOUBLE + FLOOR (r9): the variant cast lane
    # COERCES booleans (true -> 1.0) and quoted numbers ("5.7" ->
    # 5.7), exactly DuckDB's JSON-typed cast — identical on the
    # all-integer real corpus, divergence-free on the hostile tier.
    return spark.sql(
        "WITH j AS (SELECT event_id,"
        " CAST(FLOOR(try_variant_get(parse_json(props), '$.k', 'double'))"
        " AS INT) AS k FROM v_events)"
        " SELECT k % 7 AS k_mod7, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(k) AS BIGINT) AS sum_k"
        " FROM j GROUP BY 1"
    )


_VARIANT_ORACLE = (
    "WITH j AS (SELECT event_id,"
    " CAST(FLOOR(TRY_CAST(json_extract(props, '$.k') AS DOUBLE)) AS INT)"
    " AS k FROM v_events)"
    " SELECT k % 7 AS k_mod7, CAST(COUNT(*) AS BIGINT) AS n,"
    " CAST(SUM(k) AS BIGINT) AS sum_k"
    " FROM j GROUP BY 1"
)


def merge_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 MERGE — the warehouse's dimension-history
    WRITE path: given the materialized history (built from the early
    half of the attribute stream) and a late change batch, close each
    entity's open row at its first new observation and append the new
    versions.  Closed history rows pass through UNTOUCHED (the
    incremental property); only open rows and changes are recomputed.
    The oracle rebuilds ranges from the full stream, so a hash match
    proves incremental == rebuild."""
    from pyspark.sql import Window

    from .. import catalog

    ev = (
        catalog.v_events(spark, sf_dir)
        .where((F.col("user_id") < 40) & (F.col("event_type") != "purchase"))
        .select("user_id", F.col("event_type").alias("attr"), "ts_us", "event_id")
    )
    bounds = ev.agg(
        ((F.min("ts_us") + F.max("ts_us")) / 2).cast("long").alias("mid")
    ).collect()[0]
    early = ev.where(F.col("ts_us") <= bounds.mid)
    late = ev.where(F.col("ts_us") > bounds.mid)

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hist = early.select(
        "user_id", "attr", "ts_us", "event_id",
        F.lead("ts_us").over(w).alias("eff_to_us"),
    )
    closed = hist.where(F.col("eff_to_us").isNotNull()).select(
        "user_id", "attr", F.col("ts_us").alias("eff_from_us"), "eff_to_us"
    )
    open_rows = hist.where(F.col("eff_to_us").isNull()).select(
        "user_id", "attr", "ts_us", "event_id"
    )
    merged = open_rows.unionByName(late).select(
        "user_id", "attr", "ts_us", "event_id",
        F.lead("ts_us").over(w).alias("eff_to_us"),
    ).select(
        "user_id", "attr", F.col("ts_us").alias("eff_from_us"), "eff_to_us"
    )
    return closed.unionByName(merged)


_SCD2_APPLY_ORACLE = (
    "SELECT user_id, event_type AS attr, ts_us AS eff_from_us, "
    "LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS eff_to_us "
    "FROM v_events WHERE user_id < 40 AND event_type <> 'purchase'"
)




def _nullsafe_sql(op: str) -> str:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other — the semantics an equi-join silently drops.
    Keys are NULLIF-seeded so genuine NULLs exist on both sides; the
    output proves the NULL-key group joins (its pair count is the
    product of the two sides' NULL counts)."""
    return (
        "WITH a AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS k,"
        "  CAST(COUNT(*) AS BIGINT) AS na FROM orders WHERE o_orderkey < 500 GROUP BY 1),"
        " b AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS k,"
        "  CAST(COUNT(*) AS BIGINT) AS nb FROM orders"
        "  WHERE o_orderkey >= 500 AND o_orderkey < 1000 GROUP BY 1)"
        f" SELECT a.k AS key, a.na, b.nb FROM a JOIN b ON a.k {op} b.k"
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join via Spark's <=> operator."""
    load_tables(spark, sf_dir)
    return spark.sql(_nullsafe_sql("<=>"))




def _skyline_sql() -> str:
    """2-D skyline (SKYLINE OF price MIN, quantity MIN): the Pareto
    front of order lines — no other point is ≤ in both coordinates
    with one strict.  The O(N log N) sweep form: sort by (price, qty)
    and keep a point iff every preceding point has strictly larger
    qty (a running MIN over the sorted prefix) — the self-join
    dominance test never materializes.  Bounded input slice (the
    production form range-partitions the sort and merges per-partition
    fronts).  All-integer after dollar-flooring."""
    return (
        "WITH pts AS ("
        "  SELECT DISTINCT CAST(FLOOR(l_extendedprice) AS BIGINT) AS px,"
        "    CAST(FLOOR(l_quantity) AS BIGINT) AS qty"
        # a point missing either coordinate cannot participate in
        # dominance (and NULL sort placement differs per engine)
        "  FROM lineitem WHERE l_orderkey < 2000"
        "    AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL"
        "), swept AS ("
        "  SELECT px, qty,"
        "    MIN(qty) OVER (ORDER BY px, qty"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev"
        "  FROM pts"
        ") SELECT px, qty FROM swept"
        " WHERE best_prev IS NULL OR qty < best_prev"
    )


def win_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front (minimize price AND quantity) of order lines."""
    load_tables(spark, sf_dir)
    return spark.sql(_skyline_sql())


def merge_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO: apply a changelog to a snapshot with
    last-writer-wins upserts and delete markers.

    The events stream is split at its time midpoint: the early half
    collapses to a per-user snapshot (latest value), the late half is
    the change feed.  MERGE semantics: a user's latest post-split
    event wins ('updated' / 'inserted'), an 'error'-typed latest event
    is a delete marker (row dropped), untouched users survive as
    'kept' — i.e. the batch equivalent of Delta/Iceberg MERGE INTO
    with deduplicated CDC input.

    Scale shape: both halves reduce via one row_number window on the
    merge key before the single full-outer equi-join on that key —
    the join carries one row per user per side, never raw events.
    Determinism: latest-wins ordering carries the (ts_us DESC,
    event_id DESC) total tiebreak (SURVEY §4.5 rule 4).
    """
    from pyspark.sql import Window

    from .. import catalog

    ev = catalog.v_events(spark, sf_dir).select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
    bounds = ev.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"))
    sided = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "late", F.col("ts_us") * 2 > F.col("lo") + F.col("hi")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )

    def latest(side):
        return (
            side.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "value", "ts_us")
        )

    snap = latest(sided.where(~F.col("late"))).alias("s")
    delta = latest(sided.where(F.col("late"))).alias("d")
    merged = snap.join(delta, "user_id", "full")
    return (
        merged.where(
            F.col("d.event_type").isNull() | (F.col("d.event_type") != "error")
        )
        .select(
            "user_id",
            F.coalesce("d.value", "s.value").alias("value"),
            F.coalesce("d.ts_us", "s.ts_us").alias("as_of_us"),
            F.when(F.col("s.value").isNull(), "inserted")
            .when(F.col("d.value").isNull(), "kept")
            .otherwise("updated")
            .alias("action"),
        )
    )


_MERGE_ORACLE = (
    "WITH ev AS (SELECT user_id, event_id, ts_us, event_type, value FROM v_events), "
    "b AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM ev), "
    "sided AS (SELECT ev.*, ts_us * 2 > lo + hi AS late FROM ev CROSS JOIN b), "
    "snap AS (SELECT user_id, event_type, value, ts_us FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
    "ORDER BY ts_us DESC, event_id DESC) AS rn FROM sided WHERE NOT late) WHERE rn = 1), "
    "delta AS (SELECT user_id, event_type, value, ts_us FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
    "ORDER BY ts_us DESC, event_id DESC) AS rn FROM sided WHERE late) WHERE rn = 1) "
    "SELECT COALESCE(s.user_id, d.user_id) AS user_id, "
    "COALESCE(d.value, s.value) AS value, "
    "COALESCE(d.ts_us, s.ts_us) AS as_of_us, "
    "CASE WHEN s.value IS NULL THEN 'inserted' "
    "WHEN d.value IS NULL THEN 'kept' ELSE 'updated' END AS action "
    "FROM snap s FULL OUTER JOIN delta d USING (user_id) "
    "WHERE d.event_type IS NULL OR d.event_type != 'error'"
)


def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break (count DESC, value
    ASC) — engine-native ``mode()`` breaks ties arbitrarily, which can
    never pass a cross-engine oracle; this form always can."""
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n"))
    # NULLS LAST pinned: a NULL source group must lose count-ties the
    # same way in both engines (Spark ASC defaults nulls FIRST)
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.asc_nulls_last("source")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("lang", F.col("source").alias("mode_source"), "n")
    )


_MODE_ORACLE = (
    "SELECT lang, source AS mode_source, n FROM ("
    "SELECT lang, source, COUNT(*) AS n, "
    "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, source NULLS LAST) AS rn "
    "FROM documents GROUP BY lang, source) t WHERE rn = 1"
)


def _setall_sides(spark: SparkSession, sf_dir: str):
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.where(F.col("l_orderkey") % 4 == 0).select("l_suppkey", "l_returnflag")
    b = li.where(F.col("l_orderkey") % 4 == 2).select("l_suppkey", "l_returnflag")
    return a, b


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the sides) —
    the corpus validates only the DISTINCT set ops; training-data
    bookkeeping (shard overlap audits) needs the multiset forms.
    Catalyst plans both as a single aggregate-style join on the row
    value, one shuffle per side."""
    a, b = _setall_sides(spark, sf_dir)
    return a.intersectAll(b)


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity = left minus right,
    floored at zero)."""
    a, b = _setall_sides(spark, sf_dir)
    return a.exceptAll(b)


_SETALL_A = (
    "SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_orderkey % 4 = 0"
)
_SETALL_B = (
    "SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_orderkey % 4 = 2"
)
_INTERSECT_ALL_ORACLE = f"({_SETALL_A}) INTERSECT ALL ({_SETALL_B})"
_EXCEPT_ALL_ORACLE = f"({_SETALL_A}) EXCEPT ALL ({_SETALL_B})"


_MULTI_PS = (0.25, 0.5, 0.75, 0.95)


def _pctl_multi_sql(fn: str) -> str:
    """Multi-quantile profile of purchase values in ONE aggregation
    pass (the per-column quantile block of an OPTIMIZE/ANALYZE stats
    collection).  Spark ``percentile`` and DuckDB ``quantile_cont``
    share exact linear-interpolation semantics (verified by the corpus
    ``agg_percentile``); each quantile is a column of the same
    aggregate, stacked to rows afterwards — one scan, one shuffle of
    4 doubles per group."""
    cols = ", ".join(
        f"{fn}(value, {p}) AS q{int(p * 100)}" for p in _MULTI_PS
    )
    stacked = " UNION ALL ".join(
        f"SELECT event_type, CAST({p} AS DOUBLE) AS p, q{int(p * 100)} AS v FROM a"
        for p in _MULTI_PS
    )
    return (
        f"WITH a AS (SELECT event_type, {cols} FROM v_events"
        "  WHERE event_type IN ('purchase', 'click') GROUP BY event_type)"
        f" {stacked}"
    )


def agg_percentile_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p25/p50/p75/p95 of event value per type, single-pass."""
    load_tables(spark, sf_dir)
    return spark.sql(_pctl_multi_sql("percentile"))


def _running_distinct_sql() -> str:
    """Running distinct-user count per event type over days — COUNT
    (DISTINCT) OVER is unsupported in both engines, so the portable
    (and shuffle-equivalent) form is the first-occurrence-flag trick:
    mark each (type, user)'s first day via MIN, roll up flags per day,
    then a running SUM over the per-type day series (metadata-sized).
    All integers."""
    return (
        "WITH firsts AS ("
        f"  SELECT event_type, user_id,"
        f"    CAST(MIN(FLOOR(ts_us / {86_400_000_000}.0)) AS BIGINT) AS first_day"
        "  FROM v_events GROUP BY event_type, user_id"
        "), per_day AS ("
        "  SELECT event_type, first_day AS day,"
        "    CAST(COUNT(*) AS BIGINT) AS new_users"
        "  FROM firsts GROUP BY event_type, first_day"
        ") SELECT event_type, day, new_users,"
        "    CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        "      AS distinct_users_to_date"
        "  FROM per_day"
    )


def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day."""
    load_tables(spark, sf_dir)
    return spark.sql(_running_distinct_sql())


def _try_arith_sql(safe_div: str, safe_int_div: str) -> str:
    """TRY-arithmetic semantics: division by zero yields NULL, not an
    error (the ANSI-mode-safe ingestion arithmetic; Spark ``try_divide``
    — the oracle composes the same semantics from NULLIF).  Per-row
    only, fused into the scan."""
    return (
        "SELECT l_orderkey, l_linenumber,"
        f" {safe_div} AS price_per_above17,"
        f" {safe_int_div} AS key_per_line3"
        " FROM lineitem WHERE l_orderkey < 300"
    )


def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide: NULL on zero denominators."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _try_arith_sql(
            "try_divide(l_extendedprice, l_quantity - 17.0)",
            "try_divide(CAST(l_orderkey AS DOUBLE), l_linenumber - 3)",
        )
    )


_TRY_ARITH_ORACLE = _try_arith_sql(
    "l_extendedprice / NULLIF(l_quantity - 17.0, 0.0)",
    "CAST(l_orderkey AS DOUBLE) / NULLIF(l_linenumber - 3, 0)",
)



def fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface — Spark 4's ``from_xml`` with a declared
    schema (the fourth semi-structured lane after JSON-string
    ``fn_json``, struct ``fn_json_struct`` and VARIANT
    ``fn_variant_json``; instrument/metadata feeds are still XML in
    practice).  Events are serialized to XML records (integer cents so
    the text form is engine-identical), parsed back with ``from_xml``,
    and typed fields extracted.  DuckDB has no XML parser — the oracle
    builds the SAME record text and extracts with anchored
    ``regexp_extract``, so a hash match proves the parse is lossless.
    Single narrow map over the scan; no shuffle."""
    ev = catalog.v_events(spark, sf_dir).where(F.col("event_id") < 2000)
    xml = F.concat(
        F.lit("<rec><id>"), F.col("event_id").cast("string"),
        F.lit("</id><u>"), F.col("user_id").cast("string"),
        F.lit("</u><t>"), F.col("event_type"),
        F.lit("</t><c>"), F.floor(F.col("value") * 100 + 0.5).cast("long").cast("string"),
        F.lit("</c></rec>"),
    )
    parsed = ev.select(
        F.from_xml(xml, "id BIGINT, u BIGINT, t STRING, c BIGINT").alias("p")
    )
    return parsed.select(
        F.col("p.id").alias("event_id"),
        F.col("p.u").alias("user_id"),
        F.col("p.t").alias("event_type"),
        F.col("p.c").alias("cents"),
    )


_XML_ORACLE = (
    "WITH x AS (SELECT '<rec><id>' || CAST(event_id AS VARCHAR) || '</id><u>' || "
    "CAST(user_id AS VARCHAR) || '</u><t>' || event_type || '</t><c>' || "
    "CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS VARCHAR) || '</c></rec>' AS xml "
    "FROM v_events WHERE event_id < 2000) "
    "SELECT CAST(regexp_extract(xml, '<id>([0-9]+)</id>', 1) AS BIGINT) AS event_id, "
    "CAST(regexp_extract(xml, '<u>([0-9]+)</u>', 1) AS BIGINT) AS user_id, "
    "regexp_extract(xml, '<t>([a-z]+)</t>', 1) AS event_type, "
    "CAST(regexp_extract(xml, '<c>(-?[0-9]+)</c>', 1) AS BIGINT) AS cents FROM x"
)


def _weighted_pctl_sql() -> str:
    """Exact weighted percentiles (quantity-weighted price) — the
    inventory-weighted price statistic plain ``percentile`` cannot
    express.  Lower-weighted-percentile definition: the smallest value
    whose running weight reaches p·W under the §4.5 total order
    (value, orderkey, linenumber).  Weights are exact integer
    centi-units, so every threshold comparison is integer arithmetic —
    no float boundary anywhere.

    Scale: the exact form needs the per-group sort (one range-
    partitioned window); the sampled/sketched path for 100 TB is
    ``sketch_sampled_quantile``.  Group count is tiny so the window
    partitions are balanced by the returnflag key."""
    return (
        "WITH w AS ("
        "  SELECT l_returnflag, l_extendedprice AS v,"
        "    CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS wt,"
        "    l_orderkey, l_linenumber FROM lineitem"
        # a line missing the value or the weight cannot contribute to
        # a weighted percentile (and NULL sort placement differs per
        # engine under ORDER BY v)
        "  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL"
        "), c AS ("
        "  SELECT l_returnflag, v, wt,"
        "    SUM(wt) OVER (PARTITION BY l_returnflag"
        "      ORDER BY v, l_orderkey, l_linenumber"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,"
        "    SUM(wt) OVER (PARTITION BY l_returnflag) AS tw"
        "  FROM w"
        ") SELECT l_returnflag,"
        "  CAST(SUM(wt) AS BIGINT) AS total_weight,"
        "  MIN(CASE WHEN cw * 2 >= tw THEN v END) AS w_median,"
        "  MIN(CASE WHEN cw * 10 >= tw * 9 THEN v END) AS w_p90"
        "  FROM c GROUP BY l_returnflag"
    )


def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median / p90 of extendedprice per returnflag."""
    load_tables(spark, sf_dir)
    return spark.sql(_weighted_pctl_sql())

def agg_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType *construction* surface (SURVEY §2.2 map note — the
    counterpart of the read-side ``fn_map_props``): per order priority,
    half-year status-count maps are built with ``map_from_entries``
    over grouped counts, merged across halves with ``map_concat``
    (key spaces disjoint by construction: keys are ``h1|STATUS`` /
    ``h2|STATUS``, so concat can never hit a duplicate key), screened
    with ``map_filter`` (drop entries below a support threshold), and
    finally **exploded back to primitive entry rows** — which is what
    makes the oracle exact: DuckDB needs no map type at all, just the
    equivalent GROUP BY + HAVING, and the driver hash sees only
    (string, string, string, long) columns per the §4.5 rule-7 output
    policy.

    Scale: two map-side-combined groupBys on (priority, status) — a
    handful of groups regardless of fact size; the maps are bounded by
    |status| and live only between the two shuffles.  No collect, no
    UDF; map_from_entries/map_concat/map_filter/explode are all JVM
    expressions inside whole-stage codegen.
    """
    orders = load_tables(spark, sf_dir)["orders"]

    def half_map(tag: str, pred):
        c = (
            orders.where(pred)
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        return c.groupBy("o_orderpriority").agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.concat(F.lit(f"{tag}|"), F.col("o_orderstatus")).alias("k"),
                        F.col("n").alias("v"),
                    )
                )
            ).alias(f"m_{tag}")
        )

    month = F.month("o_orderdate")
    h1 = half_map("h1", month <= 6)
    h2 = half_map("h2", month > 6)
    empty = F.expr("cast(map() as map<string,bigint>)")
    merged = (
        h1.join(h2, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.map_concat(
                F.coalesce("m_h1", empty), F.coalesce("m_h2", empty)
            ).alias("m"),
        )
        .select(
            "o_orderpriority",
            F.map_filter("m", lambda k, v: v >= F.lit(5)).alias("m"),
        )
    )
    return merged.selectExpr(
        "o_orderpriority", "explode(m) as (entry_key, n)"
    ).select(
        "o_orderpriority",
        F.substring_index("entry_key", "|", 1).alias("half"),
        F.substring_index("entry_key", "|", -1).alias("status"),
        F.col("n").cast("long").alias("n"),
    )


_MAP_ENTRIES_ORACLE = (
    # an undated order belongs to NO half-year (the engine's two
    # predicates month<=6 / month>6 are both NULL for it); a bare
    # CASE ELSE would silently file it under h2
    "SELECT o_orderpriority, "
    "CASE WHEN month(o_orderdate) <= 6 THEN 'h1' ELSE 'h2' END AS half, "
    "o_orderstatus AS status, COUNT(*) AS n "
    "FROM orders WHERE o_orderdate IS NOT NULL "
    "GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5"
)


QUERIES = {
    "agg_map_entries": agg_map_entries,
    "agg_weighted_percentile": agg_weighted_percentile,
    "fn_xml_extract": fn_xml_extract,
    "set_intersect_all": set_intersect_all,
    "set_except_all": set_except_all,
    "fn_map_props": fn_map_props,
    "agg_approx_distinct": agg_approx_distinct,
    "fn_bitwise": fn_bitwise,
    "source_generate_series": source_generate_series,
    "fn_posexplode": fn_posexplode,
    "dim_scd2_ranges": dim_scd2_ranges,
    "merge_cdc_upsert": merge_cdc_upsert,
    "agg_mode_deterministic": agg_mode_deterministic,
    "agg_percentile_multi": agg_percentile_multi,
    "win_running_distinct": win_running_distinct,
    "fn_try_arith": fn_try_arith,
    "join_scd2_pit": join_scd2_pit,
    "fn_json_struct": fn_json_struct,
    "fn_collation_ci": fn_collation_ci,
    "fn_variant_json": fn_variant_json,
    "merge_scd2_apply": merge_scd2_apply,
    "join_null_safe": join_null_safe,
    "win_skyline_2d": win_skyline_2d,
}

# agg_approx_distinct intentionally absent: rows-only by declaration.
ORACLES = {
    "agg_map_entries": _MAP_ENTRIES_ORACLE,
    "agg_weighted_percentile": _weighted_pctl_sql(),
    "fn_xml_extract": inline_views(_XML_ORACLE),
    "set_intersect_all": _INTERSECT_ALL_ORACLE,
    "set_except_all": _EXCEPT_ALL_ORACLE,
    "fn_map_props": _MAP_ORACLE,
    "fn_bitwise": _BITWISE_ORACLE,
    "source_generate_series": _SERIES_ORACLE,
    "fn_posexplode": _POSEXPLODE_ORACLE,
    "dim_scd2_ranges": inline_views(_SCD2_ORACLE),
    "merge_cdc_upsert": inline_views(_MERGE_ORACLE),
    "agg_mode_deterministic": _MODE_ORACLE,
    "agg_percentile_multi": inline_views(_pctl_multi_sql("quantile_cont")),
    "win_running_distinct": inline_views(_running_distinct_sql()),
    "fn_try_arith": _TRY_ARITH_ORACLE,
    "join_scd2_pit": inline_views(_scd2_pit_sql()),
    "fn_collation_ci": _collation_oracle(),
    "fn_variant_json": inline_views(_VARIANT_ORACLE),
    "merge_scd2_apply": inline_views(_SCD2_APPLY_ORACLE),
    "join_null_safe": _nullsafe_sql("IS NOT DISTINCT FROM"),
    "win_skyline_2d": _skyline_sql(),
    "fn_json_struct": inline_views(
        _json_struct_sql(
            "CASE WHEN json_type(json_extract(props, '$.k'))"
            " IN ('BIGINT','UBIGINT','DOUBLE') THEN"
            " CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k')"
            " AS DOUBLE)) AS INT) END",
            "k",
        )
    ),
}
