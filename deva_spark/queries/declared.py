"""The 35 declared queries (SURVEY.md §2.12): q01-q35.

Scan/filter/project, group aggregates (exact DECIMAL money), joins
(inner/left/semi/anti/multiway/positional/as-of), windows (sliding,
tumbling, rank, lag, sessionization), set ops, string/regex/date/math
scalar functions, percentiles, rollup, z-score anomalies, exact dedup.
"""

from __future__ import annotations

from deva_spark.operators import aggregates as agg
from deva_spark.operators import anomaly
from deva_spark.operators import dedup
from deva_spark.operators import joins
from deva_spark.operators import windows
from deva_spark.operators.aggregates import money_sum
from deva_spark.operators.aggregates import round_money
from pyspark.sql import functions as F
from deva_spark.queries._infra import _t, query

@query(
    "q01_scan_project",
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS q
       FROM lineitem ORDER BY l_orderkey, l_linenumber""",
)
def q01(spark, sf):
    # map/pluck analog (core/core.py:1326-1463, ops.py:526-566): projection
    # prunes the parquet scan to 3 columns.
    return _t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("q"),
    )


@query(
    "q02_filter",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_discount > 0.05 AND l_returnflag <> 'R'
       ORDER BY l_orderkey, l_linenumber""",
)
def q02(spark, sf):
    # filter/remove analog (core/core.py:1521-1554, 811-813): both predicates
    # push down to the parquet scan.
    return (
        _t(spark, sf, "lineitem")
        .filter((F.col("l_discount") > 0.05) & (F.col("l_returnflag") != "R"))
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "q03_group_agg",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
              CAST(SUM(l_quantity) AS BIGINT) AS sq,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS rev
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q03(spark, sf):
    # frequencies/naja group-agg analog: hash aggregate with map-side partial
    # combine; revenue summed in DECIMAL for order-independence.
    return _t(spark, sf, "lineitem").transform(
        agg.group_agg(
            ["l_returnflag", "l_linestatus"],
            {
                "c": F.count(F.lit(1)),
                "sq": F.sum("l_quantity").cast("bigint"),
                # cast operands to DECIMAL *before* multiplying: the whole
                # revenue computation is exact, so the sum is independent of
                # partition order (100 TB determinism).
                "rev": round_money(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,6)")
                        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
                    )
                ),
            },
        )
    )


@query(
    "q04_avg_min_max",
    """SELECT o_orderpriority,
              CAST((2 * SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) + COUNT(*))
                   // (2 * COUNT(*)) AS DOUBLE) / 100.0 AS avg_price,
              ROUND(MIN(o_totalprice), 2) AS min_price,
              ROUND(MAX(o_totalprice), 2) AS max_price
       FROM orders GROUP BY 1 ORDER BY 1""",
)
def q04(spark, sf):
    # prices are 2-decimal: averaging in exact integer cents with rational
    # half-up rounding removes the last sum-order float dependency (same
    # scheme as q16); min/max are order-independent already.
    return (
        _t(spark, sf, "orders")
        .withColumn("_cents", F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .groupBy("o_orderpriority")
        .agg(
            (
                F.expr("(2 * sum(_cents) + count(*)) div (2 * count(*))").cast("double")
                / F.lit(100.0)
            ).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query("q05_distinct", "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1")
def q05(spark, sf):
    # as_set analog (pipe.py:600-602).
    return _t(spark, sf, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# M3 — dedup & event-order operators over events
# ---------------------------------------------------------------------------


@query(
    "q06_dedup_first_seen",
    """SELECT user_id, event_type, value FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) rn
         FROM events) t
       WHERE rn = 1 ORDER BY user_id, event_type""",
)
def q06(spark, sf):
    # unique(key=...)/pipe dedup analog (ops.py:402-486, pipe.py:336-375).
    return (
        _t(spark, sf, "events")
        .transform(dedup.first_seen(["user_id", "event_type"], ["ts", "event_id"]))
        .select("user_id", "event_type", "value")
    )


@query(
    "q07_consecutive_dedup",
    """SELECT event_id FROM (
         SELECT event_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) p
         FROM events) t
       WHERE p IS NULL OR p <> event_type ORDER BY event_id""",
)
def q07(spark, sf):
    # uniq analog (pipe.py:377-423): collapse consecutive duplicates per user.
    return (
        _t(spark, sf, "events")
        .transform(windows.consecutive_change_filter("event_type", "user_id"))
        .select("event_id")
    )


# ---------------------------------------------------------------------------
# M2 — joins
# ---------------------------------------------------------------------------


@query(
    "q08_inner_join",
    """SELECT c.c_custkey, n.n_name, ROUND(c.c_acctbal, 2) AS bal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       ORDER BY c.c_custkey""",
)
def q08(spark, sf):
    # naja dimension merge analog (entry.py:682-698): nation broadcast.
    return (
        _t(spark, sf, "customer")
        .transform(joins.enrich(_t(spark, sf, "nation"), on=F.expr("c_nationkey = n_nationkey"), how="inner"))
        .select("c_custkey", "n_name", F.round("c_acctbal", 2).alias("bal"))
    )


@query(
    "q09_left_join_coalesce",
    """SELECT o.o_orderkey, COALESCE(c.c_name, 'UNKNOWN') AS c_name
       FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY o.o_orderkey""",
)
def q09(spark, sf):
    orders = _t(spark, sf, "orders")
    customer = _t(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        orders.transform(
            joins.enrich(customer, on=F.expr("o_custkey = c_custkey"), how="left")
        )
        .select("o_orderkey", F.coalesce("c_name", F.lit("UNKNOWN")).alias("c_name"))
    )


@query(
    "q10_semi_join",
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
       ORDER BY 1""",
)
def q10(spark, sf):
    big_orders = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        _t(spark, sf, "customer")
        .transform(joins.semi_join(big_orders, on=F.expr("c_custkey = o_custkey")))
        .select("c_custkey")
    )


@query(
    "q11_anti_join",
    """SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY 1""",
)
def q11(spark, sf):
    return (
        _t(spark, sf, "customer")
        .transform(
            joins.anti_join(_t(spark, sf, "orders"), on=F.expr("c_custkey = o_custkey"))
        )
        .select("c_custkey")
    )


@query(
    "q12_multiway_join",
    """SELECT r_name, COUNT(*) AS c
       FROM customer JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       GROUP BY 1 ORDER BY 1""",
)
def q12(spark, sf):
    # Multi-way star join: both dims broadcast — the fact table never
    # shuffles until the final tiny aggregation.
    return (
        _t(spark, sf, "customer")
        .transform(
            joins.enrich(_t(spark, sf, "nation"), on=F.expr("c_nationkey = n_nationkey"), how="inner")
        )
        .transform(
            joins.enrich(_t(spark, sf, "region"), on=F.expr("n_regionkey = r_regionkey"), how="inner")
        )
        .transform(agg.group_agg(["r_name"], {"c": F.count(F.lit(1))}))
    )


@query(
    "q13_positional_zip",
    """WITH a AS (SELECT event_id, ROW_NUMBER() OVER (ORDER BY ts, event_id) rn
                  FROM events WHERE event_type = 'click'),
            b AS (SELECT event_id, ROW_NUMBER() OVER (ORDER BY ts, event_id) rn
                  FROM events WHERE event_type = 'view')
       SELECT a.event_id AS id_a, b.event_id AS id_b
       FROM a JOIN b USING (rn) ORDER BY rn""",
)
def q13(spark, sf):
    # zip analog (ops.py:178-288): i-th click paired with i-th view.
    ev = _t(spark, sf, "events")
    return joins.positional_zip(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
        order=["ts", "event_id"],
        left_cols={"event_id": "id_a"},
        right_cols={"event_id": "id_b"},
    ).select("id_a", "id_b")


@query(
    "q14_asof_combine_latest",
    """SELECT event_id, last_v FROM (
         SELECT event_id, event_type,
                LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) last_v
         FROM events) t
       WHERE event_type = 'click' AND last_v IS NOT NULL ORDER BY event_id""",
)
def q14(spark, sf):
    # combine_latest/zip_latest analog (ops.py:290-354, 617-679): each click
    # sees the latest purchase value for its user.
    return (
        _t(spark, sf, "events")
        .transform(
            joins.asof_latest(
                F.when(F.col("event_type") == "purchase", F.col("value")),
                partition="user_id",
                order=["ts", "event_id"],
                out="last_v",
            )
        )
        .filter((F.col("event_type") == "click") & F.col("last_v").isNotNull())
        .select("event_id", "last_v")
    )


@query(
    "q15_running_fold",
    """SELECT event_id,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rs
       FROM events ORDER BY event_id""",
)
def q15(spark, sf):
    # accumulate/scan analog (ops.py:738-824); DECIMAL running sum so the
    # result is independent of the window evaluator's accumulation scheme.
    return (
        _t(spark, sf, "events")
        .transform(
            windows.running_fold(
                F.sum(F.col("value").cast(agg.MONEY)), out="rs", partition="user_id"
            )
        )
        .select("event_id", F.round("rs", 2).cast("double").alias("rs"))
    )


@query(
    "q16_sliding_window_avg",
    """SELECT event_id,
              CAST((2 * SUM(cents) OVER w + COUNT(*) OVER w) // (2 * COUNT(*) OVER w) AS DOUBLE) / 100.0 AS slide_avg
       FROM (SELECT event_id, user_id, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events) c
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       ORDER BY event_id""",
)
def q16(spark, sf):
    # sliding_window(3, return_partial=True) analog (ops.py:924-973).
    # value is a 2-decimal quantity: averaging in integer cents with exact
    # rational half-up rounding ((2s+n) div 2n) removes every float boundary
    # — a double AVG of 3 values can land exactly on .xx5 and flip between
    # engines (observed at sf0.01).
    ev = _t(spark, sf, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    ev = ev.transform(
        windows.sliding_count_window(F.sum("cents"), out="sc", n=3, partition="user_id")
    ).transform(
        windows.sliding_count_window(F.count(F.lit(1)), out="n", n=3, partition="user_id")
    )
    return ev.select(
        "event_id",
        (
            F.expr("(2 * sc + n) div (2 * n)").cast("double") / F.lit(100.0)
        ).alias("slide_avg"),
    )


@query(
    "q17_partition_chunks",
    """SELECT g, COUNT(*) AS cnt, CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sv
       FROM (SELECT value, CAST(floor((ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1) / 10) AS BIGINT) g
             FROM events) t
       GROUP BY g HAVING COUNT(*) = 10 ORDER BY g""",
)
def q17(spark, sf):
    # partition(10) analog (ops.py:874-922): non-overlapping 10-chunks,
    # tail dropped via HAVING.
    ev = _t(spark, sf, "events").transform(windows.chunk(10, drop_tail=False))
    return (
        ev.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            round_money(money_sum(F.col("value"))).alias("sv"),
        )
        .filter(F.col("cnt") == 10)
    )


@query(
    "q18_tumbling_time_window",
    """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w, event_type,
              COUNT(*) AS cnt,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sv
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q18(spark, sf):
    # timed_window analog (ops.py:975-1026) upgraded to event time; identical
    # expression runs as the streaming twin with a watermark.
    return _t(spark, sf, "events").transform(
        windows.tumbling_time_window(
            "ts",
            "1 hour",
            ["event_type"],
            {
                "cnt": F.count(F.lit(1)),
                "sv": round_money(money_sum(F.col("value"))),
            },
        )
    )


@query(
    "q19_rank_topk_per_key",
    """SELECT user_id, event_id FROM (
         SELECT user_id, event_id,
                RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) r
         FROM events) t
       WHERE r <= 3 ORDER BY user_id, event_id""",
)
def q19(spark, sf):
    return (
        _t(spark, sf, "events")
        .transform(
            windows.rank_top_per_key(
                3, "user_id", [F.col("value").desc(), F.col("event_id")]
            )
        )
        .select("user_id", "event_id")
    )


@query(
    "q20_lag_diff",
    """SELECT event_id,
              ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS d
       FROM events ORDER BY event_id""",
)
def q20(spark, sf):
    return (
        _t(spark, sf, "events")
        .transform(windows.lag_diff("value", out="d", partition="user_id"))
        .select("event_id", F.round("d", 2).alias("d"))
    )


@query(
    "q21_topk",
    """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q21(spark, sf):
    # sort|head top-k: planned as TakeOrderedAndProject (per-partition heap).
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@query(
    "q22_slice",
    """SELECT event_id FROM (
         SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) rn FROM events) t
       WHERE rn >= 100 AND rn < 200 AND (rn - 100) % 5 = 0 ORDER BY event_id""",
)
def q22(spark, sf):
    # slice(100, 200, 5) analog (ops.py:826-872).
    return (
        _t(spark, sf, "events")
        .transform(windows.positional_slice(100, 200, 5, order=["event_id"]))
        .select("event_id")
    )


@query(
    "q23_union",
    """SELECT * FROM (
         SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
         UNION ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
       ORDER BY k LIMIT 500""",
)
def q23(spark, sf):
    a = (
        _t(spark, sf, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("k"))
    )
    return a.unionByName(b).orderBy("k").limit(500)


@query(
    "q24a_intersect",
    """SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders ORDER BY 1""",
)
def q24a(spark, sf):
    return (
        _t(spark, sf, "customer")
        .select("c_custkey")
        .intersect(_t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey")))
    )


@query(
    "q24b_except",
    """SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders ORDER BY 1""",
)
def q24b(spark, sf):
    return (
        _t(spark, sf, "customer")
        .select("c_custkey")
        .subtract(_t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey")))
    )


# ---------------------------------------------------------------------------
# M5 — scalar functions / text
# ---------------------------------------------------------------------------


@query(
    "q25_string_fns",
    """SELECT doc_id, LENGTH(TRIM(text)) AS n, LOWER(SUBSTRING(text, 1, 20)) AS h
       FROM documents ORDER BY doc_id""",
)
def q25(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.length(F.trim("text")).alias("n"),
        F.lower(F.substring("text", 1, 20)).alias("h"),
    )


@query(
    "q26_regexp_extract",
    """SELECT doc_id, REGEXP_EXTRACT(text, '([0-9]+)', 1) AS num FROM documents
       WHERE REGEXP_EXTRACT(text, '([0-9]+)', 1) <> '' ORDER BY doc_id""",
)
def q26(spark, sf):
    num = F.regexp_extract("text", r"([0-9]+)", 1)
    return (
        _t(spark, sf, "documents")
        .select("doc_id", num.alias("num"))
        .filter(F.col("num") != "")
    )


@query(
    "q27_date_trunc",
    """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m, COUNT(*) AS cnt
       FROM orders GROUP BY 1 ORDER BY 1""",
)
def q27(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("m"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q28_math_fns",
    """SELECT l_orderkey, l_linenumber,
              CAST(ROUND(ABS(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))
                             - CAST(l_tax AS DECIMAL(18,6))), 2) AS DOUBLE) AS v
       FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""",
)
def q28(spark, sf):
    # DECIMAL arithmetic end-to-end: double products can land exactly on a
    # .005 rounding boundary and flip between engines; exact decimals can't.
    d = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return (
        _t(spark, sf, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(d("l_extendedprice") * d("l_discount") - d("l_tax")), 2)
            .cast("double")
            .alias("v"),
        )
    )


@query(
    "q29_explode_words",
    """SELECT doc_id, w FROM (
         SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
         WHERE doc_id <= 50) t
       WHERE LENGTH(w) > 0 ORDER BY doc_id, w""",
)
def q29(spark, sf):
    # flatten/traverse analog (ops.py:356-400): explode is a narrow generate.
    return (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") <= 50)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
    )


@query(
    "q30_frequencies",
    """SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1
       ORDER BY c DESC, event_type""",
)
def q30(spark, sf):
    # frequencies analog (core/core.py:841-846).
    return _t(spark, sf, "events").transform(agg.frequencies("event_type"))


@query(
    "q31_percentile",
    """SELECT event_type, ROUND(QUANTILE_CONT(value, 0.05), 2) AS p5
       FROM events GROUP BY 1 ORDER BY 1""",
)
def q31(spark, sf):
    # noise-filter p5 analog (noise_filter.py:249): exact interpolated
    # percentile (percentile_approx is the sketch path for unbounded groups).
    return (
        _t(spark, sf, "events")
        .transform(agg.percentile_exact("event_type", "value", 0.05))
        .select("event_type", F.round("p", 2).alias("p5"))
    )


@query(
    "q32_rollup",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem
       GROUP BY ROLLUP(l_returnflag, l_linestatus)
       ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
)
def q32(spark, sf):
    return _t(spark, sf, "lineitem").transform(
        agg.rollup_count("l_returnflag", "l_linestatus")
    )


@query(
    "q33_zscore_anomaly",
    """WITH s AS (SELECT user_id, AVG(value) m, STDDEV_SAMP(value) sd, COUNT(*) c
                  FROM events GROUP BY 1)
       SELECT e.event_id FROM events e JOIN s USING (user_id)
       WHERE s.c >= 30 AND s.sd > 0 AND ABS((e.value - s.m) / s.sd) >= 3
       ORDER BY e.event_id""",
)
def q33(spark, sf):
    # Welford z-score analog (radar/engine.py:264-298), two-pass batch form.
    return (
        _t(spark, sf, "events")
        .transform(anomaly.zscore_flags("user_id", "value", min_obs=30, threshold=3.0))
        .select("event_id")
    )


@query(
    "q34_exact_text_dedup",
    """SELECT MIN(doc_id) AS keep, COUNT(*) AS dups FROM documents
       GROUP BY MD5(TRIM(text)) HAVING COUNT(*) > 1 ORDER BY keep""",
)
def q34(spark, sf):
    # deduplicate_webpages exact tier (utils/simhash.py:342-358).
    return _t(spark, sf, "documents").transform(dedup.exact_text_groups())


@query(
    "q35_sessionization",
    """SELECT user_id, sess, COUNT(*) AS cnt FROM (
         SELECT user_id, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) sess
         FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                   > INTERVAL 30 MINUTE
                              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         THEN 1 ELSE 0 END new_s FROM events) a) b
       GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q35(spark, sf):
    # session windows (gap 30 min); streaming twin uses session_window().
    return (
        _t(spark, sf, "events")
        .transform(windows.sessionize(30))
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Extended training-data-pipeline operators (BASELINE.json north star)
# ---------------------------------------------------------------------------

_STOPS_SQL = "('the','a','of','and','to','in','is','that','it','on')"


