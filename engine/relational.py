"""Driver-checked query surface: SURVEY.md §2 operators over the star schema,
plus the training-data-pipeline operators (dedup / similarity / text analysis).

Every entry pairs an idiomatic-Spark DataFrame builder with an equivalent
DuckDB SQL oracle; the driver runs both at sf=0.01 and compares row count +
schema + order-insensitive value hash (see __spark_entry__.py).  Conventions
that make the hashes comparable:

- every computed column is aliased IDENTICALLY on both sides;
- money math is integer cents (``floor(x*100)`` of the identical IEEE
  product, summed as int64) → bit-deterministic on both engines; per-row
  decimal ROUNDING ties and parallel double summation both drift otherwise;
- integer sums are cast back to BIGINT in the SQL (DuckDB widens to HUGEINT);
- timestamps are emitted as formatted strings (Spark session TZ pinned UTC);
- similarity scores are rounded to 4 decimals and ordered by the rounded
  value with a deterministic id tiebreak.

Reference citations map each query to the SURVEY §2 row it exercises.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass(frozen=True)
class Q:
    name: str
    survey: str  # SURVEY.md §2 row(s) this exercises
    build: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    priority: int = 50  # registry() sort key; lower = earlier on the scoreboard


_REGISTRY: list[Q] = []

# The driver's correctness harness checks only the FIRST ``DRIVER_QUERY_CAP``
# registered queries — adding a query past the cap silently evicts an attested
# one (this cost x_table_parse_service its round-3 row).  Two guards:
# registry() orders by explicit priority (flagship end-to-end pipeline queries
# first, regardless of module import order), and tests/test_oracle_parity.py
# asserts len(registry()) <= DRIVER_QUERY_CAP.
DRIVER_QUERY_CAP = 50

# priority bands (lower sorts first; ties keep registration order)
PRIORITY_FLAGSHIP = 10  # end-to-end pipeline / pixel-path / audit queries
PRIORITY_DEFAULT = 50


def _q(name: str, survey: str, sql: str | None, priority: int = PRIORITY_DEFAULT):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY.append(Q(name, survey, fn, sql, priority))
        return fn

    return deco


def registry() -> list[Q]:
    return sorted(_REGISTRY, key=lambda q: q.priority)  # stable: ties keep order


# Oracle'd but OUTSIDE the driver's 50-row window.  Window policy
# (COVERAGE.md §"Query-window budget"): the scoreboard is a fixed-size
# budget, so a retired query moves HERE — it keeps its DuckDB oracle and is
# run through the driver-identical compare by
# tests/test_oracle_parity.py::test_local_query_matches_oracle every
# session.  Retirement never means untested (round-4 lesson: four functions
# sat unregistered with zero coverage).
_LOCAL_REGISTRY: list[Q] = []


def _local_q(name: str, survey: str, sql: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _LOCAL_REGISTRY.append(Q(name, survey, fn, sql, priority=10_000))
        return fn

    return deco


def local_registry() -> list[Q]:
    return sorted(_LOCAL_REGISTRY, key=lambda q: q.name)


def _cents(col):
    """Exact money math across engines: floor(x*100) as int64.

    Per-row double→decimal *rounding* ties break differently between Spark
    (exact-binary HALF_UP) and DuckDB (double-math round), so sums drift by
    cents; floor of the identical IEEE product is bit-deterministic on both.
    Aggregate the cents, divide by 100.0 at the end.
    """
    return F.floor(col * 100).cast("long")


# =========================================================================
# A. Scans / filters / projections (S1, P2, P3, P6-P9)
# =========================================================================


@_q(
    "s1_scan_filter_project",
    "S1/P2/P9 — source scan with predicate pushdown + column pruning",
    """
    SELECT l_returnflag,
           count(*) AS cnt,
           sum(CAST(floor(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity > 30
    GROUP BY l_returnflag
    """,
)
def s1_scan_filter_project(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_quantity") > 30))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
        )
    )


@_q(
    "p3_mode_router",
    "P3 — 5-way first-match-wins CASE router (pdf_processor.py:962-1076 analogue)",
    """
    SELECT CASE WHEN o_orderstatus = 'F' AND o_totalprice > 200000 THEN 'janzour'
                WHEN o_orderstatus = 'O' AND o_orderpriority LIKE '1-%' THEN 'massara'
                WHEN o_orderpriority LIKE '5-%' THEN 'skip'
                ELSE 'default' END AS mode,
           count(*) AS cnt,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY mode
    """,
)
def p3_mode_router(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    mode = (
        F.when((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000), "janzour")
        .when((F.col("o_orderstatus") == "O") & F.col("o_orderpriority").like("1-%"), "massara")
        .when(F.col("o_orderpriority").like("5-%"), "skip")
        .otherwise("default")
    )
    return (
        o.withColumn("mode", mode)
        .groupBy("mode")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total"),
        )
    )


@_q(
    "p6_skip_filter",
    "P6/P7 — literal-contains skip filters routed to reasons, never dropped silently",
    """
    SELECT CASE WHEN position('spark' IN text) > 0 THEN 'skip_spark'
                WHEN position('merge' IN text) > 0 THEN 'skip_merge'
                ELSE 'keep' END AS status,
           count(*) AS cnt
    FROM documents GROUP BY status
    """,
)
def p6_skip_filter(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    status = (
        F.when(F.col("text").contains("spark"), "skip_spark")
        .when(F.col("text").contains("merge"), "skip_merge")
        .otherwise("keep")
    )
    return d.withColumn("status", status).groupBy("status").agg(F.count("*").alias("cnt"))


# =========================================================================
# B. Scalar functions (F2, F3, F6, F8, F18, F20)
# =========================================================================


@_local_q(
    "f2_regexp_extract",
    "F2 — first regex group extraction (text_utils.py:17-26); retired to the "
    "local registry late r5 (f20 precedent: the regex-extract path is "
    "driver-attested through x_header_parse_massara / "
    "x_invoice_header_adjacency, whose parsers are regexp_extract "
    "compositions) to free the slot for x_curate_interleaved_spans",
    r"""
    SELECT nxt, count(*) AS cnt FROM (
      SELECT regexp_extract(text, 'scan (\w+)', 1) AS nxt FROM documents
    ) WHERE nxt <> '' GROUP BY nxt
    """,
)
def f2_regexp_extract(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.regexp_extract("text", r"scan (\w+)", 1).alias("nxt"))
        .filter(F.col("nxt") != "")
        .groupBy("nxt")
        .agg(F.count("*").alias("cnt"))
    )


@_local_q(
    "f3_date_bucket",
    "F3/F5 — date normalization + formatting (text_utils.py:29-65); retired "
    "to the local registry r5 (F3 stays driver-attested through the "
    "x_header_parse_massara flagship) to free the window slot for "
    "dedup_incremental, the suite's only state-carry operator",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS cnt,
           sum(CAST(floor(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY month
    """,
)
def f3_date_bucket(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("month")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total"),
        )
    )


# (f5_multiformat_dates retired round 4 to fit the driver's 50-query window:
# its oracle restated both sides from the same strftime — the Spark-side
# normalize_jz_date exercise is covered by x_header_parse_massara and
# tests/test_textops.py.)


@_q(
    "f6_rlike_filter",
    "F6 — regex-class membership predicate (text_utils.py:68-70)",
    r"""
    SELECT lang, regexp_matches(text, '\bwindow\b') AS has_window, count(*) AS cnt
    FROM documents GROUP BY lang, has_window
    """,
)
def f6_rlike_filter(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("has_window", F.col("text").rlike(r"\bwindow\b"))
        .groupBy("lang", "has_window")
        .agg(F.count("*").alias("cnt"))
    )


@_local_q(  # retired to the local registry end-r5 (slot ceded to
    # text_dsir_select, the suite's only data-selection operator).  F8's
    # coercion path stays driver-attested through the table-parse flagships:
    # coerce_price runs inside a5_footer_total_guard (parse.py:330) and the
    # x_table_parse_service item columns.  Same precedent as f2/f3/f20.
    "f8_price_coercion",
    "F8 — dirty-number cleanup + cast (table_parser.py:130-135,228-234)",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(regexp_replace(
                 CAST(l_partkey AS VARCHAR) || ' ' || CAST(l_suppkey AS VARCHAR) || '/',
                 '[ ,/]', '', 'g') AS BIGINT)) AS BIGINT) AS coerced_sum
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f8_price_coercion(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    dirty = F.concat(
        F.col("l_partkey").cast("string"), F.lit(" "), F.col("l_suppkey").cast("string"), F.lit("/")
    )
    clean = F.regexp_replace(dirty, "[ ,/]", "").cast("bigint")
    return li.groupBy("l_returnflag").agg(F.sum(clean).alias("coerced_sum"))


@_q(
    "f18_json_extract",
    "F18 — JSON field extraction with cast (tasks.py:191-195)",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def f18_json_extract(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(F.sum(k).alias("sum_k"), F.count("*").alias("cnt"))


@_local_q(  # retired to the local registry end of r5 — slot went to text_decontaminate
    "f20_id_pattern",
    "F20 — ACA-xxxx-xxxxx-xxx ID extraction, zeros preserved (pdf_processor.py:634-640)",
    r"""
    SELECT o_orderkey,
           regexp_extract(
             'ref ACA-' || lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0') || '-' ||
             lpad(CAST(o_custkey % 100000 AS VARCHAR), 5, '0') || '-A1B trailer',
             'ACA-\d{4}-\d{5}-[A-Za-z0-9]{3}', 0) AS id
    FROM orders
    """,
)
def f20_id_pattern(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    cand = F.concat(
        F.lit("ref ACA-"),
        F.lpad((F.col("o_orderkey") % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad((F.col("o_custkey") % 100000).cast("string"), 5, "0"),
        F.lit("-A1B trailer"),
    )
    return o.select(
        "o_orderkey", F.regexp_extract(cand, r"ACA-\d{4}-\d{5}-[A-Za-z0-9]{3}", 0).alias("id")
    )


# =========================================================================
# C. Joins (J1, J4, J5)
# =========================================================================


@_q(
    "j1_join_broadcast_dims",
    "J1 — equi inner hash joins, small dims broadcast (tasks.py:574-595 analogue)",
    """
    SELECT r_name, n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
           count(*) AS cnt
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j1_join_broadcast_dims(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg((F.sum(rev) / 100.0).alias("revenue"), F.count("*").alias("cnt"))
    )


@_q(
    "j4_semi_anti_join",
    "J4 — completeness membership both ways in one scoreboard row: left SEMI "
    "join (docs with results, tasks.py:283-291 analogue) unioned with left "
    "ANTI join (missing-docs audit), tagged by membership",
    """
    SELECT membership, c_mktsegment, count(*) AS cnt FROM (
      SELECT 'present' AS membership, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'missing' AS membership, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) GROUP BY membership, c_mktsegment
    """,
)
def j4_semi_anti_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.lit("present").alias("membership"), "c_mktsegment"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("missing").alias("membership"), "c_mktsegment"
    )
    return (
        semi.unionByName(anti)
        .groupBy("membership", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


@_q(
    "j5_union_lineage",
    "J5/T2 — processed+skipped branch reunion via unionByName (pdf_processor.py:1232-1235)",
    """
    SELECT status, reason, count(*) AS cnt,
           sum(CAST(floor(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM (
      SELECT 'kept' AS status, CAST(NULL AS VARCHAR) AS reason, value
      FROM events WHERE value > 50
      UNION ALL
      SELECT 'skipped' AS status, 'low_value' AS reason, value
      FROM events WHERE value <= 50
    ) GROUP BY status, reason
    """,
)
def j5_union_lineage(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    kept = e.filter(F.col("value") > 50).select(
        F.lit("kept").alias("status"), "value"
    )
    skipped = e.filter(F.col("value") <= 50).select(
        F.lit("skipped").alias("status"), F.lit("low_value").alias("reason"), "value"
    )
    return (
        kept.unionByName(skipped, allowMissingColumns=True)
        .groupBy("status", "reason")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("sum_value"),
        )
    )


# =========================================================================
# D. Aggregations (A1, A4, A5, A6)
# =========================================================================


@_q(
    "a1_hash_agg_pricing",
    "A1/A3 — grouped hash aggregation (TPC-H Q1 shape; tasks.py:469-511 analogue)",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(floor(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) / 100.0 AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_hash_agg_pricing(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(_cents(disc)) / 100.0).alias("sum_disc_price"),
            (F.sum(_cents(disc * (1 + F.col("l_tax")))) / 100.0).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


# Retired from the driver window round 4 (GROUP BY ROLLUP is a Spark
# built-in with zero custom work here — A1 stays attested by
# a1_hash_agg_pricing; rollup had a green r3 row); local-oracle'd since r5.
@_local_q(
    "a1_rollup_pricing",
    "A1 note — metrics rollup via GROUP BY ROLLUP (built-in, zero custom work; "
    "the metrics-table rollup from SURVEY §2.5)",
    """
    SELECT coalesce(l_returnflag, '∅') AS rf, coalesce(l_linestatus, '∅') AS ls,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base,
           count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a1_rollup_pricing(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base"),
            F.count("*").alias("cnt"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("∅")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("∅")).alias("ls"),
            "sum_base",
            "cnt",
        )
    )


@_q(
    "a4_conditional_agg",
    "A4 — conditional tallies sum(when(...)) (pdf_processor.py:1293-1311 analogue)",
    """
    SELECT o_orderpriority,
           sum(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(floor(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) / 100.0 AS f_total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           count(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def a4_conditional_agg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        (F.sum(F.when(is_f, _cents(F.col("o_totalprice"))).otherwise(F.lit(0))) / 100.0).alias(
            "f_total"
        ),
        F.sum(F.when(is_f, 1).otherwise(0)).alias("f_cnt"),
        F.count("*").alias("cnt"),
    )


@_q(
    "a5_footer_total_guard",
    "A5 — guarded total: computed sum vs explicit grand total (pdf_processor.py:165-179)",
    """
    SELECT flag, count(*) AS cnt FROM (
      SELECT CASE WHEN CAST(floor(o_totalprice * 100) AS BIGINT) >= computed
                  THEN 'explicit_ge' ELSE 'computed_gt' END AS flag
      FROM orders JOIN (
        SELECT l_orderkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS computed
        FROM lineitem GROUP BY l_orderkey
      ) ON o_orderkey = l_orderkey
    ) GROUP BY flag
    """,
)
def a5_footer_total_guard(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    computed = li.groupBy("l_orderkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("computed")
    )
    flag = F.when(
        _cents(F.col("o_totalprice")) >= F.col("computed"), "explicit_ge"
    ).otherwise("computed_gt")
    return (
        o.join(computed, o.o_orderkey == computed.l_orderkey)
        .select(flag.alias("flag"))
        .groupBy("flag")
        .agg(F.count("*").alias("cnt"))
    )


@_q(
    "a6_value_histogram",
    "A6 — confidence-histogram bucketing (north_star metrics requirement)",
    """
    SELECT greatest(least(CAST(floor(value / 10) AS INTEGER), 9), 0) AS bucket,
           count(*) AS cnt
    FROM events GROUP BY bucket
    """,
)
def a6_value_histogram(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    bucket = F.greatest(
        F.least(F.floor(F.col("value") / 10).cast("int"), F.lit(9)), F.lit(0)
    )
    return e.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


# =========================================================================
# E. Windows (W1, W4, W5)
# =========================================================================

_W_SQL_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"


@_q(
    "w1_lag_dedup",
    "W1 — consecutive-duplicate removal via lag (pdf_processor.py:555-566)",
    f"""
    SELECT event_type, count(*) AS cnt FROM (
      SELECT event_type, lag(event_type) OVER ({_W_SQL_ORDER}) AS prev
      FROM events
    ) WHERE prev IS NULL OR prev <> event_type
    GROUP BY event_type
    """,
)
def w1_lag_dedup(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


@_q(
    "w4_first_occurrence",
    "W4 — first-occurrence-wins per key (pdf_processor.py:66-71 rule)",
    f"""
    SELECT event_type, count(*) AS cnt FROM (
      SELECT event_type, row_number() OVER ({_W_SQL_ORDER}) AS rn FROM events
    ) WHERE rn = 1 GROUP BY event_type
    """,
)
def w4_first_occurrence(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


@_q(
    "w5_last_nonzero",
    "W5 — last row with a non-zero value per key (pdf_processor.py:296-304)",
    """
    SELECT user_id, event_id AS last_event_id, value AS last_value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE value <> 0
    ) WHERE rn = 1
    """,
)
def w5_last_nonzero(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.filter(F.col("value") != 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"), F.col("value").alias("last_value"))
    )


# =========================================================================
# F. Sort / limit (T1)
# =========================================================================


@_q(
    "w3_ordered_reassembly",
    "W3/A2 — ordered re-nest: collect_list + array_sort by event time, exactly "
    "the spans_out reassembly shape (tasks.py:513-531)",
    """
    SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS seq,
           count(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def w3_ordered_reassembly(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    return e.groupBy("user_id").agg(
        F.array_join(F.transform(ordered, lambda s: s["event_type"]), "|").alias("seq"),
        F.count("*").alias("cnt"),
    )


# Retired from the driver window round 5 to free a scoreboard slot for
# train_corpus_filtered/text_repetition (COVERAGE.md §window budget): the
# 2-row invariant is the weakest signal in the window; stays local-oracle'd.
@_local_q(
    "j2_positional_zip",
    "J2 — positional pairing: per-order line numbers must form the contiguous "
    "sequence 1..n (zip(batch_jobs, raw_results) invariant, "
    "janzour_processor.py:391)",
    """
    SELECT contiguous, count(*) AS cnt FROM (
      SELECT l_orderkey,
             (list_sort(list(l_linenumber)) =
              list_transform(generate_series(1, count(*)::INT), x -> x::INT)) AS contiguous
      FROM lineitem GROUP BY l_orderkey
    ) GROUP BY contiguous
    """,
)
def j2_positional_zip(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    contiguous = F.array_sort(F.collect_list("l_linenumber")) == F.sequence(
        F.lit(1), F.count("*").cast("int")
    )
    return (
        li.groupBy("l_orderkey")
        .agg(contiguous.alias("contiguous"))
        .groupBy("contiguous")
        .agg(F.count("*").alias("cnt"))
    )


@_local_q(  # retired to the local registry end-r5 (slot ceded to
    # train_corpus_ccnet, the CCNet end-to-end composition).  W2's
    # dedup_consecutive_words stays driver-attested through the flagship
    # text branch — it runs inside normalize_span_text (textops.py:178),
    # which x_text_branch_extraction value-checks.  f2/f3/f8/f20 precedent.
    "w2_word_dedup",
    "W2 — consecutive-duplicate word removal (text_utils.py:79-105): tokens "
    "removed per source (regex backreference in Spark, indexed list_filter in "
    "the oracle — same semantics, different mechanism)",
    """
    SELECT source,
           CAST(sum(len(string_split(text, ' ')) -
               len(list_filter(string_split(text, ' '),
                               (x, i) -> i = 1 OR x <> string_split(text, ' ')[i - 1]))
           ) AS BIGINT) AS removed,
           count(*) AS cnt
    FROM documents GROUP BY source
    """,
)
def w2_word_dedup(spark, sf_dir):
    from engine.textops import dedup_consecutive_words

    d = load(spark, sf_dir, "documents")
    before = F.size(F.split("text", " "))
    after = F.size(F.split(dedup_consecutive_words(F.col("text")), " "))
    return d.groupBy("source").agg(
        F.sum(before - after).alias("removed"), F.count("*").alias("cnt")
    )


# Retired from the driver window round 5 (COVERAGE.md §window budget): T1's
# 0-exchange TakeOrdered shape + values stay pinned locally
# (test_oracle_parity: local parity + test_topk_plan_is_take_ordered).
@_local_q(
    "t1_topk_orders",
    "T1 — deterministic top-k (only sort in the system is per-doc ordering; "
    "exposed relationally as global top-k)",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def t1_topk_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), "o_orderkey").select(
        "o_orderkey", "o_totalprice"
    ).limit(10)
