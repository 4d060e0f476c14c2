"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (broadcast star join) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
keyed by the §2 operator id it demonstrates.
``oracle_sql()`` — matching ANSI SQL for the DuckDB oracle.

Aggregate float outputs are rounded in BOTH engines so the driver's
value-hash is bitwise-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from drugbankner_spark.functions import identifiers as I
from drugbankner_spark.functions import normalize as N
from drugbankner_spark.operators import relational as R
from drugbankner_spark.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: regional revenue star join (TPC-H Q5 shape) on sf0.001."""
    sf = "/root/testdata/sf0.001"
    t = {n: load_table(spark, sf, n) for n in
         ("region", "nation", "customer", "supplier", "orders", "lineitem")}
    return R.regional_revenue(
        t["region"], t["nation"], t["customer"], t["supplier"],
        t["orders"], t["lineitem"],
    )


# ---------------------------------------------------------------------------
# Query catalog. Each builder takes (spark, sf_dir) → DataFrame.
# ---------------------------------------------------------------------------

def _q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    return R.pricing_summary(load_table(spark, sf, "lineitem"))


def _q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    return R.shipping_priority(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _q5_regional_revenue(spark: SparkSession, sf: str) -> DataFrame:
    return R.regional_revenue(
        load_table(spark, sf, "region"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    )


def _j1_dim_lookup(spark: SparkSession, sf: str) -> DataFrame:
    # J1 (node_synonymizer.py:67-86): key-normalized broadcast dim lookup.
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    step1 = R.dim_lookup_join(cust, nation, "c_nationkey", "n_nationkey")
    step2 = R.dim_lookup_join(step1, region, "n_regionkey", "r_regionkey")
    return step2.select("c_custkey", "c_name", "n_name", "r_name")


def _j2_mode_vote(spark: SparkSession, sf: str) -> DataFrame:
    # A1/J2 (node_synonymizer.py:371-379): modal cluster per name.
    orders = load_table(spark, sf, "orders")
    return R.mode_vote(orders, "o_custkey", "o_orderpriority")


def _j4_coalesce_fallback(spark: SparkSession, sf: str) -> DataFrame:
    # J4 (node_synonymizer.py:229-234): primary lookup, fallback on miss.
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("pk"), F.col("c_name").alias("primary_name")
    )
    supp = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("fk"), F.col("s_name").alias("fallback_name")
    )
    out = R.coalesce_fallback_join(
        orders.select("o_orderkey", "o_custkey"),
        cust, supp, "o_custkey", "pk", "fk",
        "primary_name", "fallback_name", "resolved_name",
    )
    return out.select("o_orderkey", "o_custkey", "resolved_name")


def _j5_prefix_expansion(spark: SparkSession, sf: str) -> DataFrame:
    # J5 (node_synonymizer.py:43-56): suffix × literal prefixes → inner join.
    nation = load_table(spark, sf, "nation")
    suffixes = nation.select(F.col("n_name").alias("suffix")).distinct()
    dim = nation.select(
        F.concat_ws(":", F.lit("N"), F.col("n_name")).alias("dim_key"),
        F.col("n_nationkey"),
    )
    hit = R.prefix_expansion_join(suffixes, "suffix", ["N", "X"], dim, "dim_key")
    return hit.select("suffix", "candidate", "n_nationkey")


def _j9_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return R.semi_join(cust, orders, "c_custkey", "o_custkey").select(
        "c_custkey", "c_name"
    )


def _u3_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    # U3: inputs with no match (node_synonymizer.py:144-146). The right side
    # is selective (high-value orders) so the result is non-trivial.
    cust = load_table(spark, sf, "customer")
    big = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return R.anti_join(cust, big, "c_custkey", "o_custkey").select(
        "c_custkey", "c_name"
    )


def _a2_longest_value(spark: SparkSession, sf: str) -> DataFrame:
    # A2 (perform_NER.py:39-53): longest surface name per entity group.
    docs = load_table(spark, sf, "documents")
    return R.longest_value_argmax(docs, "lang", "text")


def _a4_category_histogram(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    return R.category_histogram(cust, "c_nationkey", "c_mktsegment")


def _a5_distinct(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return R.distinct_rows(orders, ["o_orderstatus", "o_orderpriority"])


def _a6_first_writer_wins(spark: SparkSession, sf: str) -> DataFrame:
    events = load_table(spark, sf, "events")
    out = R.first_writer_wins(
        events.select("user_id", "ts", "event_id", "event_type"),
        ["user_id"], ["ts", "event_id"],
    )
    return out.select("user_id", "event_id", "event_type")


def _o1_topk(spark: SparkSession, sf: str) -> DataFrame:
    supp = load_table(spark, sf, "supplier")
    return R.top_k(
        supp.select("s_suppkey", "s_name", "s_acctbal"),
        [F.desc("s_acctbal"), F.asc("s_suppkey")], 10,
    )


def _u1_union_merge(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    b1 = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    b2 = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return R.union_merge([b1, b2], ["c_custkey"])


def _w1_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


def _w2_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


def _w3_rank(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


def _w_window_suite(spark: SparkSession, sf: str) -> DataFrame:
    # W1+W2+W3 consolidated (VERDICT r01 #1: fit the driver's 50-entry
    # correctness window): running sum, lag/lead, rank/dense_rank in ONE
    # query — one partitioning key (user_id), so Catalyst plans a single
    # Exchange feeding both sort orders.
    from pyspark.sql import Window

    events = load_table(spark, sf, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rnk = Window.partitionBy("user_id").orderBy("event_type")
    return events.select(
        "user_id", "event_id",
        F.round(F.sum("value").over(w_seq), 6).alias("running_value"),
        F.lag("value").over(w_seq).alias("prev_value"),
        F.lead("value").over(w_seq).alias("next_value"),
        # event_type repeats per user → real rank-vs-dense_rank gaps
        F.rank().over(w_rnk).alias("type_rank"),
        F.dense_rank().over(w_rnk).alias("type_dense_rank"),
    )


def _f_name_normalize(spark: SparkSession, sf: str) -> DataFrame:
    # F1+F2+F3 consolidated, plus the O2 ordering (sort by uppercased
    # key → position column) — all four normalization kernels over one
    # scan of documents. The global position column is the O2 demo (the
    # reference sorts an entire output list, node_synonymizer.py:280-281);
    # it runs through the two-phase scale.sharded_row_number (round 12)
    # — the corpus never funnels through one window task.
    from drugbankner_spark.operators.scale import sharded_row_number

    docs = load_table(spark, sf, "documents")
    tagged = F.concat(
        F.lit("["), F.col("source"), F.lit("] "), F.substring(F.col("text"), 1, 60)
    )
    step = docs.select(
        "doc_id",
        N.remove_brackets(tagged).alias("cleaned"),
        N.strip_sentence_marks(F.substring(F.col("text"), 1, 60)).alias("stripped"),
        N.simplify_name(F.substring(F.col("text"), 1, 40)).alias("name_simplified"),
    )
    return sharded_row_number(
        step, [], [F.upper("name_simplified"), F.asc("doc_id")],
        out_col="pos",
    )


def _e1_dedup_survivor(spark: SparkSession, sf: str) -> DataFrame:
    # E1 deterministic-survivor dedup (VERDICT r01 #4): per (lang,
    # source), the surviving row is pinned by min doc_id — exercised with
    # a non-key carried column (n_chars) so survivor CHOICE is what the
    # oracle hash checks.
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    return D.exact_dedup(
        docs.select("doc_id", "lang", "source", "n_chars"),
        ["lang", "source"], order_cols=["doc_id"],
    )


def _o2_sort_upper(spark: SparkSession, sf: str) -> DataFrame:
    # O2 (node_synonymizer.py:280-281): deterministic ordering by
    # uppercased key, materialized as a position column.
    from pyspark.sql import Window
    nation = load_table(spark, sf, "nation")
    w = Window.orderBy(F.upper("n_name"), "n_nationkey")
    return nation.select(
        "n_name", F.row_number().over(w).alias("pos")
    )


def _a7_count(spark: SparkSession, sf: str) -> DataFrame:
    # A7 (perform_NER.py:106,112): corpus counts.
    return load_table(spark, sf, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def _a8_explode_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # A8 (node_synonymizer.py:238): union of id sets across rows.
    from drugbankner_spark.fixtures import mini_synonymizer_frames
    _, clusters, _ = mini_synonymizer_frames(spark)
    return clusters.select(
        F.explode("member_ids").alias("member_id")
    ).distinct()


_SQL_Q10 = """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def _sql_api_q10(spark: SparkSession, sf: str) -> DataFrame:
    # E5: the engine's SQL surface — identical text runs on spark.sql and
    # the DuckDB oracle (ANSI subset, TPC-H Q10 shape).
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_Q10)


def _q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    # E5: HAVING + semi-join shape (TPC-H Q18): customers with any order
    # whose line quantity total exceeds a threshold.
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


def _q_correlated_avg(spark: SparkSession, sf: str) -> DataFrame:
    # E5: correlated-subquery shape — parts larger than their type's
    # average size (decorrelated by Catalyst into an aggregate + join).
    part = load_table(spark, sf, "part")
    part.createOrReplaceTempView("part")
    return spark.sql("""
        SELECT p_partkey, p_type, p_size
        FROM part p
        WHERE p_size > (SELECT avg(p2.p_size) FROM part p2
                        WHERE p2.p_type = p.p_type)
    """)


def _q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    # E5: two-nation volume shipping (TPC-H Q7 shape) — self-joined dim
    # (nation twice), OR-pair predicate, year extraction.
    supp = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9")
    ) | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") <= "1996-12-31")
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def _agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    # E5: CUBE grouping sets (superset of rollup — all 4 combinations).
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def _q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q6 shape — tight range+band filter, single global agg.
    # Every predicate pushes to the parquet scan; the agg is one partial
    # + one final row. (Shipdate window shifted to this dataset's
    # 1995+ date range.)
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


def _q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q14 shape — conditional aggregation over a broadcast
    # fact-dim join (share of promo revenue in one month).
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .agg(
            F.round(
                100
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
                        0.0
                    )
                )
                / F.sum(disc),
                6,
            ).alias("promo_revenue")
        )
    )


def _q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q2 shape — the last uncovered TPC-H number: per-part
    # ARGMIN supplier within a region (correlated min subquery).
    # Supply cost derives from lineitem (no partsupp in this dataset):
    # min extendedprice per (part, supplier) — a MIN, not a SUM, so
    # every value is exact and the equality re-join on the min is
    # deterministic. All ties kept, as in the reference query.
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(
        F.col("p_size") % 10 == 5
    )
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    supp_r = (
        supp.join(F.broadcast(nat),
                  supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_r),
              F.col("l_suppkey") == F.col("s_suppkey"))
    )
    minc = cost.groupBy("p_partkey").agg(
        F.min("cost").alias("min_cost")
    ).withColumnRenamed("p_partkey", "_mp")
    return (
        cost.join(
            F.broadcast(minc),
            (F.col("p_partkey") == F.col("_mp"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select("p_partkey", "p_type", "s_name", "n_name",
                "s_acctbal", F.round("cost", 2).alias("supply_cost"))
    )


def _q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q4 shape — EXISTS correlated on a non-key condition,
    # planned as a LEFT SEMI join (no fact-row duplication). Condition
    # adapted to this dataset's columns: a lineitem shipped >30 days
    # after the order date.
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    cond = (li.l_orderkey == quarter.o_orderkey) & (
        li.l_shipdate > quarter.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        quarter.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def _a9_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    # Engine extra: exact interpolated percentiles per group (Spark
    # `percentile` == DuckDB `quantile_cont`). approx_percentile is the
    # sketch variant for 100 TB (rows-only checkable, like HLL).
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias(
            "p95_price"
        ),
    )


def _q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q8 shape — one supplier nation's share of a regional
    # market (ASIA customers, PROMO parts) by order year. Conditional
    # share over a 7-table star join; every dim side broadcast.
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n1 = load_table(spark, sf, "nation")
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(region), n1.n_regionkey == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0)
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def _q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q9 shape — profit by supplier nation × order year for a
    # part-name pattern. No partsupp table in this star schema, so
    # supply cost is approximated as 10% of retail price × quantity
    # (the join/agg shape — fact × 2 dims × nation — is what matters).
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    nation = load_table(spark, sf, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


def _q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q11 shape — parts whose stocked value exceeds a fraction
    # of the GLOBAL total (scalar-subquery HAVING). Value derives from
    # lineitem (no partsupp); the single-row total is cross-joined back
    # (broadcast — a 1-row build side, never a real cartesian).
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier").filter(F.col("s_nationkey") < 5)
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


def _q12_late_priority(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q12 shape — conditional counts split by order priority
    # over a lateness predicate (shipped >30 days after ordering; this
    # schema has no shipmode/commitdate, so returnflag is the band).
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            & (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def _q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q13 shape — customer order-count distribution via LEFT
    # OUTER join (zero-order customers must appear with count 0) and a
    # two-level aggregation.
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def _q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q15 shape — supplier(s) with the maximum quarterly
    # revenue. The per-supplier revenue frame is persisted (one
    # lineitem scan) and the max rides back as a broadcast 1-row agg —
    # no unpartitioned window (the supplier DIM is still ~10⁸ rows at
    # the 100 TB point; one window task over it is a needless funnel).
    # Ties all surface. Caller releases via release_shared_caches().
    from drugbankner_spark.caching import shared_persist

    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    rev = shared_persist(rev)
    mx = rev.crossJoin(
        F.broadcast(rev.agg(F.max("total_revenue").alias("_max")))
    ).filter(F.col("total_revenue") == F.col("_max"))
    return mx.join(supp, mx.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def _q16_supplier_counts(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q16 shape — distinct-supplier counts per part attribute
    # combo, with a NOT-IN exclusion (negative-balance suppliers)
    # planned as a broadcast LEFT ANTI join. The part↔supplier
    # association comes from lineitem (no partsupp in this schema).
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 4, 9, 14, 23)
    )
    bad = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    assoc = li.select("l_partkey", "l_suppkey").distinct()
    return (
        assoc.join(F.broadcast(part), assoc.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), assoc.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q19 shape — OR of AND-blocks mixing fact and dim
    # predicates. Written as one boolean expression so Catalyst can
    # push the dim-only parts (brand+size) below the join.
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    blocks = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(blocks)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def _q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q17 shape — revenue from orders of less than 20% of a
    # part's average quantity. The correlated per-part scalar subquery
    # becomes one aggregation over lineitem (per-part threshold) joined
    # back; the filtered part dim is broadcast. Quantities are integral
    # doubles, so the threshold compare is engine-exact.
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    thresholds = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def _q20_pattern_shippers(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q20 shape — nested IN-subqueries re-expressed as
    # broadcast-semi-join → aggregate-threshold → join: suppliers who
    # shipped >300 units of name-pattern parts in 1996, with their
    # nation. (The reference Q20 also consults partsupp availability;
    # the harness has no partsupp table, so the threshold is absolute —
    # the plan shape, nested-subquery elimination, is the point.)
    part = load_table(spark, sf, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "semi")
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > 300)
    )
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "qty")
    )


def _q21_late_sole_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q21 shape — suppliers who were the SOLE late shipper on
    # a multi-supplier order. The reference formulation is
    # EXISTS/NOT-EXISTS self-joins; here it is one aggregation per
    # (order, supplier) + one per order, both shuffling on l_orderkey —
    # co-partitioned, and linear instead of quadratic in suppliers/order.
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf, "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    # persisted: per_pair feeds both the per-order rollup and the final
    # join — without it the lineitem⋈orders subtree runs twice; the
    # registry gives long-lived sessions a release path (ADVICE r04)
    from drugbankner_spark.caching import shared_persist

    per_pair = shared_persist(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    return (
        per_pair.join(per_order, "l_orderkey")
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def _q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    # E5: TPC-H Q22 shape — customers above the global positive-balance
    # average (scalar subquery → 1-row broadcast) with no RECENT order
    # (correlated NOT EXISTS → LEFT ANTI join against the filtered
    # order set), grouped by market segment. "Recent" because this
    # synthetic star has no order-less customers at all.
    cust = load_table(spark, sf, "customer")
    recent = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01"
    )
    segs = ("BUILDING", "MACHINERY", "FURNITURE")
    in_seg = cust.filter(F.col("c_mktsegment").isin(*segs))
    avg_bal = in_seg.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        in_seg.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, in_seg.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def _u2_intersect(spark: SparkSession, sf: str) -> DataFrame:
    # U2 (NER.py:36-37): set intersection, relational form.
    cust = load_table(spark, sf, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


def _u4_union_prefer_first(spark: SparkSession, sf: str) -> DataFrame:
    # U4 (node_synonymizer.py:119, 206): merge two result sets, rows from
    # the first source winning on key collision.
    cust = load_table(spark, sf, "customer")
    primary = cust.filter(F.col("c_acctbal") > 8000).select(
        "c_custkey", F.lit("high_balance").alias("reason")
    )
    secondary = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", F.lit("machinery").alias("reason")
    )
    merged = primary.withColumn("_rank", F.lit(0)).unionByName(
        secondary.withColumn("_rank", F.lit(1))
    )
    return R.first_writer_wins(merged, ["c_custkey"], ["_rank"]).select(
        "c_custkey", "reason"
    )


def _approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # Sketch aggregate (engine-native; no cross-engine hash parity
    # possible → rows-only). HLL++ relative error 1% default.
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("approx_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.95)").alias("approx_p95"),
    )


def _agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    # §2.4 note: grouping-set aggregates (free from Catalyst; the
    # reference has none).
    li = load_table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def _f1_bracket_strip(spark: SparkSession, sf: str) -> DataFrame:
    # F1 (utils.py:47-53): non-greedy [..] removal; brackets synthesized
    # around `source` so the op has real work to do.
    docs = load_table(spark, sf, "documents")
    tagged = F.concat(
        F.lit("["), F.col("source"), F.lit("] "), F.substring(F.col("text"), 1, 60)
    )
    return docs.select("doc_id", N.remove_brackets(tagged).alias("cleaned"))


def _f2_strip_marks(spark: SparkSession, sf: str) -> DataFrame:
    # F2 (NER.py:99-100): remove .,;:?! before NER.
    events = load_table(spark, sf, "events")
    return events.select(
        "event_id", N.strip_sentence_marks(F.col("props")).alias("stripped")
    )


def _f3_simplify_name(spark: SparkSession, sf: str) -> DataFrame:
    # F3 (node_synonymizer.py:425-429): the name_simplified join key.
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        N.simplify_name(F.substring(F.col("text"), 1, 40)).alias("name_simplified"),
    )


def _f4_curie_prefix_upper(spark: SparkSession, sf: str) -> DataFrame:
    # F4 (node_synonymizer.py:387-390): uppercase prefix, preserve tail.
    part = load_table(spark, sf, "part")
    curie = F.concat_ws(":", F.lower(F.col("p_brand")), F.col("p_name"))
    return part.select(
        "p_partkey", N.capitalize_curie_prefix(curie).alias("id_simplified")
    )


def _f5_sentence_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    # F5+P3+P4 composite (perform_NER.py:22-28): naive '.'-split →
    # length-band filter → long-token removal. Periods synthesized by
    # replacing a common token so the split has real sentence structure.
    docs = load_table(spark, sf, "documents")
    dotted = F.regexp_replace(F.col("text"), " the ", ". ")
    sent = docs.select(
        "doc_id", F.explode(N.split_sentences(dotted)).alias("sentence")
    )
    kept = sent.filter(N.sentence_length_ok(F.col("sentence"), 15, 80))
    return kept.select(
        "doc_id", N.delete_long_tokens(F.col("sentence"), 6).alias("sentence")
    )


def _f7_identifier_extract(spark: SparkSession, sf: str) -> DataFrame:
    # F7 (look_for_identifiers.py:27-31): per-database regex scan; the
    # candidate CURIE uses the FULL text, one row per match occurrence.
    events = load_table(spark, sf, "events")
    return I.extract_identifier_candidates(
        events.select("event_id", "props"), "props", ["event_id"]
    )


def _f10_prefix_extract(spark: SparkSession, sf: str) -> DataFrame:
    # F10 (CONSTANTS.py:64-67): distinct prefixes of constructed curies.
    events = load_table(spark, sf, "events")
    cands = I.extract_identifier_candidates(
        events.select("event_id", "props"), "props", ["event_id"]
    )
    return cands.select(
        N.curie_prefix(F.col("candidate_curie")).alias("prefix")
    ).distinct()


# ---------------------------------------------------------------------------
# Driver-window suites (round 4). The driver records correctness for at
# most 50 registry entries, so trivially-stable demonstrations are
# consolidated into tagged-union suites — each branch reuses the ORIGINAL
# query function (still individually registered in all_queries and
# hash-checked per-entry by tests/test_oracle_parity.py), and the suite's
# single driver hash covers every branch. Values are stringified into a
# common (op, k, v) schema; numeric formatting-sensitive columns
# (doubles) are excluded from v rather than risking engine-specific
# rendering.
# ---------------------------------------------------------------------------

def _u_set_suite(spark: SparkSession, sf: str) -> DataFrame:
    # A5 distinct + U2 intersect + U3 anti + A8 explode-distinct +
    # O1 top-k + J9 semi — the set/ordering family in one driver row.
    null_s = F.lit(None).cast("string")
    branches = [
        _a5_distinct(spark, sf).select(
            F.lit("a5").alias("op"),
            F.col("o_orderstatus").alias("k"),
            F.col("o_orderpriority").alias("v"),
        ),
        _u2_intersect(spark, sf).select(
            F.lit("u2").alias("op"),
            F.col("c_custkey").cast("string").alias("k"),
            null_s.alias("v"),
        ),
        _u3_anti_join(spark, sf).select(
            F.lit("u3").alias("op"),
            F.col("c_custkey").cast("string").alias("k"),
            F.col("c_name").alias("v"),
        ),
        _a8_explode_distinct(spark, sf).select(
            F.lit("a8").alias("op"),
            F.col("member_id").alias("k"),
            null_s.alias("v"),
        ),
        _o1_topk(spark, sf).select(
            F.lit("o1").alias("op"),
            F.col("s_suppkey").cast("string").alias("k"),
            F.col("s_name").alias("v"),
        ),
        _j9_semi_join(spark, sf).select(
            F.lit("j9").alias("op"),
            F.col("c_custkey").cast("string").alias("k"),
            F.col("c_name").alias("v"),
        ),
        # round 5: U1 union-merge + U4 merge-prefer-first join the family
        _u1_union_merge(spark, sf).select(
            F.lit("u1").alias("op"),
            F.col("c_custkey").cast("string").alias("k"),
            null_s.alias("v"),
        ),
        _u4_union_prefer_first(spark, sf).select(
            F.lit("u4").alias("op"),
            F.col("c_custkey").cast("string").alias("k"),
            F.col("reason").alias("v"),
        ),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def _f_curie_suite(spark: SparkSession, sf: str) -> DataFrame:
    # F4 prefix-uppercase + F10 prefix-extract in one driver row.
    null_s = F.lit(None).cast("string")
    return _f4_curie_prefix_upper(spark, sf).select(
        F.lit("f4").alias("op"),
        F.col("p_partkey").cast("string").alias("k"),
        F.col("id_simplified").alias("v"),
    ).unionByName(
        _f10_prefix_extract(spark, sf).select(
            F.lit("f10").alias("op"),
            F.col("prefix").alias("k"),
            null_s.alias("v"),
        )
    )


# Round-5 suites: same tagged-union mechanism, extended with a DOUBLE
# ``v_num`` column so numeric branches (counts, similarities) stay
# hash-checked as numbers — doubles are rounded identically on both
# engines, exactly like the standalone oracles they came from.

def _okv(op: str, k, v=None, v_num=None):
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    return [
        F.lit(op).alias("op"),
        k.cast("string").alias("k"),
        (v if v is not None else null_s).cast("string").alias("v"),
        (v_num if v_num is not None else null_d).cast("double").alias("v_num"),
    ]


def _union_all(branches: list[DataFrame]) -> DataFrame:
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def _syn_suite(spark: SparkSession, sf: str) -> DataFrame:
    # The EP3 synonymizer family in one driver row: J1/J2 canonical
    # lookups, J3 equivalent nodes, A4 per-cluster category histogram,
    # and the full normalizer-node projection.
    return _union_all([
        _syn_canonical(spark, sf).select(*_okv(
            "canonical",
            F.concat_ws("§", "via", "entity"),
            F.concat_ws("§", "preferred_curie", "preferred_name",
                        "preferred_category"),
        )),
        _syn_equivalent_nodes(spark, sf).select(*_okv(
            "equiv", F.col("entity"), F.col("equivalent_id"),
        )),
        _syn_category_histogram(spark, sf).select(*_okv(
            "cathist", F.concat_ws("§", "cluster_id", "category"),
            v_num=F.col("cnt"),
        )),
        _syn_normalizer_nodes(spark, sf).select(*_okv(
            "norm", F.concat_ws("§", "cluster_id", "equivalent_id"),
            F.concat_ws(
                "§", "entity", "label", "category", "major_branch",
                "name_sri", F.col("in_sri").cast("string"), "category_sri",
                "name_kg2pre", F.col("in_kg2pre").cast("string"),
                "category_kg2pre", "cluster_preferred_name",
            ),
        )),
    ])


def _j_join_suite(spark: SparkSession, sf: str) -> DataFrame:
    # J2 mode vote + J4 coalesce fallback + J5 prefix expansion.
    return _union_all([
        _j2_mode_vote(spark, sf).select(*_okv(
            "j2", F.col("o_custkey"), F.col("modal_value"),
            F.col("modal_count"),
        )),
        _j4_coalesce_fallback(spark, sf).select(*_okv(
            "j4", F.concat_ws("§", F.col("o_orderkey").cast("string"),
                              F.col("o_custkey").cast("string")),
            F.col("resolved_name"),
        )),
        _j5_prefix_expansion(spark, sf).select(*_okv(
            "j5", F.concat_ws("§", "suffix", "candidate"),
            v_num=F.col("n_nationkey"),
        )),
    ])


def _a_agg_suite(spark: SparkSession, sf: str) -> DataFrame:
    # A2 longest-argmax + A4 histogram + A6 first-writer-wins.
    return _union_all([
        _a2_longest_value(spark, sf).select(*_okv(
            "a2", F.col("lang"), F.col("longest_value"),
            F.col("longest_len"),
        )),
        _a4_category_histogram(spark, sf).select(*_okv(
            "a4", F.concat_ws("§", F.col("c_nationkey").cast("string"),
                              "c_mktsegment"),
            v_num=F.col("cnt"),
        )),
        _a6_first_writer_wins(spark, sf).select(*_okv(
            "a6", F.col("user_id"),
            F.concat_ws("§", F.col("event_id").cast("string"),
                        "event_type"),
        )),
    ])


def _e1_near_dup_suite(spark: SparkSession, sf: str) -> DataFrame:
    # SimHash + n-gram Jaccard + embedding-cosine near-dup in one row.
    return _union_all([
        _e1_simhash(spark, sf).select(*_okv(
            "simhash", F.col("doc_id"), F.col("simhash").cast("string"),
        )),
        _e1_ngram_jaccard(spark, sf).select(*_okv(
            "ngram", F.concat_ws("§", F.col("id_a").cast("string"),
                                 F.col("id_b").cast("string")),
            F.col("n_common").cast("string"), F.col("jaccard"),
        )),
        _e1_embedding_near_dup(spark, sf).select(*_okv(
            "embed", F.concat_ws("§", F.col("id_a").cast("string"),
                                 F.col("id_b").cast("string")),
            v_num=F.col("cos_sim"),
        )),
    ])


def _e3_docmeta_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Language-ID + rolling-hash fingerprint per document.
    return _union_all([
        _e3_lang_id(spark, sf).select(*_okv(
            "lang", F.col("doc_id"), F.col("predicted_lang"),
            F.col("n_stopword_hits"),
        )),
        _e3_fingerprint(spark, sf).select(*_okv(
            "fp", F.col("doc_id"), F.col("min_fingerprint").cast("string"),
            F.col("n_chunks"),
        )),
    ])


def _e4_media_suite(spark: SparkSession, sf: str) -> DataFrame:
    # PNG round-trip decode + media metadata extraction in one row.
    return _union_all([
        _e4_png_decode(spark, sf).select(*_okv(
            "png", F.col("media_id"),
            F.concat_ws("§", F.col("width").cast("string"),
                        F.col("height").cast("string"),
                        F.col("n_bytes").cast("string"),
                        "decoded_sha256"),
        )),
        _e4_media_metadata(spark, sf).select(*_okv(
            "meta", F.col("media_id"),
            F.concat_ws("§", "mime_type",
                        F.col("n_bytes").cast("string"), "payload_sha256"),
        )),
    ])


def _e2_ann_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-6-prep consolidation (round 5 late): the three long-green
    # ANN top-k rows share one schema — exact cosine, banded LSH, IVF.
    def melt(df: DataFrame, op: str) -> DataFrame:
        return df.select(*_okv(
            op, F.concat_ws("§", F.col("query_id").cast("string"),
                            F.col("neighbor_id").cast("string")),
            F.col("rank").cast("string"), F.col("cos_sim"),
        ))

    return _union_all([
        melt(_e2_cosine_topk(spark, sf), "cosine"),
        melt(_e2_lsh_topk(spark, sf), "lsh"),
        melt(_e2_ivf_topk(spark, sf), "ivf"),
    ])


def _e1_dedup_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Five long-green E1 rows in one: exact digests, survivor set,
    # minhash pairs, decontamination flags, star-CC clusters.
    return _union_all([
        _e1_exact_dedup(spark, sf).select(*_okv(
            "exact", F.col("content_sha"),
            F.col("canonical_id").cast("string"), F.col("n_copies"),
        )),
        _e1_dedup_survivor(spark, sf).select(*_okv(
            "survivor", F.col("doc_id"),
            F.concat_ws("§", "lang", "source"), F.col("n_chars"),
        )),
        _e1_minhash_near_dup(spark, sf).select(*_okv(
            "minhash", F.concat_ws("§", F.col("id_a").cast("string"),
                                   F.col("id_b").cast("string")),
        )),
        _e1_decontaminate(spark, sf).select(*_okv(
            "decon", F.col("doc_id"),
            F.col("contaminated").cast("string"),
            F.col("n_overlapping"),
        )),
        _e1_dup_clusters_star(spark, sf).select(*_okv(
            "cluster", F.col("doc_id"),
            F.concat_ws("§", F.col("cluster_id").cast("string"),
                        F.col("is_singleton").cast("string")),
        )),
    ])


def _e3_qual_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Quality stats (per-measure melt so every float stays a DOUBLE in
    # v_num), BPE token stats, and document chunking in one row.
    q = _e3_text_quality(spark, sf)
    q_melt = q.select(
        F.col("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(m).alias("m"), F.col(m).cast("double").alias("x"))
            for m in ["n_chars", "n_tokens", "mean_token_len",
                      "digit_ratio", "upper_ratio",
                      "distinct_token_ratio"]
        ])).alias("e"),
    ).select(*_okv(
        "quality", F.concat_ws("§", F.col("doc_id").cast("string"),
                               F.col("e.m")),
        v_num=F.col("e.x"),
    ))
    b = _e3_bpe_tokens(spark, sf)
    b_melt = b.select(
        F.col("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(m).alias("m"), F.col(m).cast("double").alias("x"))
            for m in ["ws_tokens", "bpe_tokens", "pieces_per_word"]
        ])).alias("e"),
    ).select(*_okv(
        "bpe", F.concat_ws("§", F.col("doc_id").cast("string"),
                           F.col("e.m")),
        v_num=F.col("e.x"),
    ))
    chunks = _e3_chunk_documents(spark, sf).select(*_okv(
        "chunk", F.concat_ws("§", F.col("doc_id").cast("string"),
                             F.col("chunk_index").cast("string")),
        F.col("chunk_text"), F.col("n_chunk_tokens"),
    ))
    return _union_all([q_melt, b_melt, chunks])


def _f_text_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Name-normalization chain (F1+F2+F3+O2) + sentence pipeline (F5)
    # in one row.
    return _union_all([
        _f_name_normalize(spark, sf).select(*_okv(
            "name", F.col("doc_id"),
            F.concat_ws("§", "cleaned", "stripped", "name_simplified"),
            F.col("pos"),
        )),
        _f5_sentence_pipeline(spark, sf).select(*_okv(
            "sent", F.col("doc_id"), F.col("sentence"),
        )),
    ])


# ---------------------------------------------------------------------------
# Synonymizer queries (EP3): run the engine's Synonymizer over the mini
# fixture; oracles embed the same rows as VALUES so semantics are
# hash-checked (joins, mode vote, biolink prefixing, None-for-miss).
# ---------------------------------------------------------------------------

def _syn(spark: SparkSession):
    from drugbankner_spark.fixtures import mini_synonymizer_frames
    from drugbankner_spark.operators.synonymizer import Synonymizer

    nodes, clusters, edges = mini_synonymizer_frames(spark)
    return Synonymizer(nodes, clusters, edges)


def _entities(spark: SparkSession, vals: list[str]) -> DataFrame:
    return spark.createDataFrame([(v,) for v in vals], ["entity"])


_SYN_CURIE_INPUTS = ["chebi:100", "Drugbank:200", "MESH:999", "CHEBI:101", "umls:600"]
_SYN_NAME_INPUTS = ["Aspirin", "A S P I R I N!!", "TIEBREAK", "Ecotrin",
                    "head ache", "nope"]
_SYN_EQ_INPUTS = ["chebi:100", "Aspirin", "CHEBI:101", "miss"]
_SYN_NORM_INPUTS = ["Aspirin", "umls:600"]


def _syn_canonical(spark: SparkSession, sf: str) -> DataFrame:
    # J1+J2 consolidated (get_canonical_curies serves BOTH input kinds,
    # NER.py:64-68): the curie probe and the name probe over their input
    # sets, tagged with the lookup path taken.
    syn = _syn(spark)
    by_curie = syn.canonical_from_curies(
        _entities(spark, _SYN_CURIE_INPUTS), "entity"
    ).withColumn("via", F.lit("curie"))
    by_name = syn.canonical_from_names(
        _entities(spark, _SYN_NAME_INPUTS), "entity"
    ).withColumn("via", F.lit("name"))
    return by_curie.unionByName(by_name)


def _syn_canonical_curie(spark: SparkSession, sf: str) -> DataFrame:
    syn = _syn(spark)
    return syn.canonical_from_curies(_entities(spark, _SYN_CURIE_INPUTS), "entity")


def _syn_canonical_name(spark: SparkSession, sf: str) -> DataFrame:
    syn = _syn(spark)
    return syn.canonical_from_names(_entities(spark, _SYN_NAME_INPUTS), "entity")


def _syn_equivalent_nodes(spark: SparkSession, sf: str) -> DataFrame:
    syn = _syn(spark)
    return syn.equivalent_nodes(
        _entities(spark, _SYN_EQ_INPUTS), "entity", explode=True
    )


def _syn_category_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return _syn(spark).cluster_category_counts()


def _syn_normalizer_nodes(spark: SparkSession, sf: str) -> DataFrame:
    syn = _syn(spark)
    return syn.normalizer_nodes(_entities(spark, _SYN_NORM_INPUTS), "entity")


# ---------------------------------------------------------------------------
# EP1/EP2 pipeline queries. The NER UDF itself is not SQL-expressible, but
# the stub model is deterministic: its detections over the mini XML are
# frozen in fixtures_ner (drift-tested against the live pipeline), so the
# DuckDB oracles start from those rows and hash-check the ENTIRE downstream
# relational assembly (J7 + A2/A6/U1, then J8 + F7 + A6).
# ---------------------------------------------------------------------------

from drugbankner_spark.fixtures_ner import (
    EP1_LEXICON,
    EP1_LEXICON_ALT,
    MINI_XML as _MINI_XML,
)


def _ep1_bundle(spark: SparkSession):
    # TWO stub configs unioned (U1 at hash grade): the reference runs
    # five NER configs per sentence and folds the hits
    # (perform_NER.py:79-99); the oracle's frozen detected set is the
    # union of both configs' fixtures, so the hash checks the
    # cross-config merge (incl. the ALT config's longer GO:0815 surface
    # winning the longest-name upgrade).
    from drugbankner_spark import pipelines as P
    from drugbankner_spark.operators.ner import make_stub_model_factory

    syn_obj = _syn(spark)
    out = P.run_ep1(spark, _MINI_XML, syn_obj,
                    [make_stub_model_factory(EP1_LEXICON),
                     make_stub_model_factory(EP1_LEXICON_ALT)])
    out["syn"] = syn_obj
    return out


def _ep1_drug_records(spark: SparkSession, sf: str) -> DataFrame:
    # S1+J6+P1/P2+A5: XML ingest through the KG2 anchor join; arrays
    # flattened to counts for a stable scalar schema.
    r = _ep1_bundle(spark)["records"]
    return r.select(
        "kg2_id", "name", "category", "drug_bank_id",
        F.size(F.col("targets")["names"]).alias("n_target_names"),
        F.size(F.col("pathway_ids")).alias("n_pathways"),
    )


def _ep1_mechanistic_nodes(spark: SparkSession, sf: str) -> DataFrame:
    # X1(stub)+J7+A2/A3/A6: the full NER stage end to end.
    b = _ep1_bundle(spark)
    return b["mechanistic_nodes"]


def _ep2_aligned_nodes(spark: SparkSession, sf: str) -> DataFrame:
    # J8+F7+A6: EP2 merge over EP1 output.
    from drugbankner_spark import pipelines as P

    b = _ep1_bundle(spark)
    return P.run_ep2(b["records"], b["mechanistic_nodes"], b["syn"])


def _t_seasonal(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): classical additive seasonal decomposition
    # (statsmodels convention — 2xMA half-weight trend for the even
    # period, per-phase means re-centered to sum 0) per event type, 6 h
    # buckets x period 4 = daily seasonality. No float ever gates a
    # comparison, so 6dp output rounding is the whole parity story.
    from drugbankner_spark.operators.timeseries import seasonal_decompose

    ev = load_table(spark, sf, "events")
    return seasonal_decompose(
        ev, ["event_type"], step_seconds=21600, period=4
    )


def _e5_dp_histogram(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): the Laplace-mechanism DP histogram
    # release, deterministic via the md5 hash kernel — completes the
    # privacy family (k-anon gate / suppression / pseudonymize /
    # DP aggregate release).
    from drugbankner_spark.operators.privacy import dp_noisy_histogram

    ev = load_table(spark, sf, "events")
    return dp_noisy_histogram(
        ev, ["event_type"], epsilon=0.5, salt="r7"
    )


def _e5_dp_histogram_user(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (VERDICT r07 next #6): USER-level ε-DP histogram — each
    # user's rows clamped to 3 contributions across the whole release
    # (deterministic group-key-order budget spend), noise Laplace(3/ε).
    # Row-level adjacency (the r7 face) stays as e5_dp_histogram; this
    # is the honest release over per-user event streams.
    from drugbankner_spark.operators.privacy import dp_noisy_histogram

    ev = load_table(spark, sf, "events")
    return dp_noisy_histogram(
        ev, ["event_type"], epsilon=0.5, salt="r8u",
        contributor_col="user_id", max_contributions=3,
    )


def _e2_hamming_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): 1-bit quantization + exact Hamming top-k
    # — the rerank-funnel first stage. Integer-only end to end, so the
    # oracle needs no rounding convention at all.
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    codes = SIM.binary_quantize(emb)
    return SIM.hamming_topk(codes, codes.filter(F.col("vec_id") < 5), k=5)


def _e2_srp_sketch(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: signed-random-projection codes (SimHash for dense
    # embeddings — angle-preserving, unlike per-coordinate
    # binary_quantize) + the top-k composition over them, in one
    # tagged row: 'code' rows carry the packed words (melted so no
    # array column reaches the hash), 'topk' rows prove the codes
    # drop straight into the integer Hamming machinery.
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    codes = SIM.srp_sketch(emb, n_bits=64, dim=64)
    melted = codes.select(
        "vec_id", F.posexplode("code").alias("word", "cw")
    ).select(*_okv(
        "code",
        F.concat_ws("§", F.col("vec_id").cast("string"),
                    F.col("word").cast("string")),
        v_num=F.col("cw").cast("double"),
    ))
    topk = SIM.hamming_topk(
        codes, codes.filter(F.col("vec_id") < 5), k=5
    ).select(*_okv(
        "topk",
        F.concat_ws("§", F.col("query_id").cast("string"),
                    F.col("rank").cast("string")),
        v_num=(F.col("neighbor_id") * F.lit(10000)
               + F.col("hamming")).cast("double"),
    ))
    return melted.unionByName(topk)


def _e2_rerank_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): the rerank funnel — integer Hamming
    # shortlist (20) → exact cosine top-5 on the survivors.
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    return SIM.rerank_topk(
        emb, emb.filter(F.col("vec_id") < 5), shortlist_k=20, k=5
    )


def _e2_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (round-9 pool): fully-relational distributed Lloyd's
    # k-means — grid-integer geometry (ARCHITECTURE §7i, float-parity
    # law), hash-seeded deterministic init, k=8 over the embeddings
    # table, 3 iterations replayed as chained CTEs in the oracle.
    from drugbankner_spark.operators.clustering import kmeans_lloyd

    emb = load_table(spark, sf, "embeddings")
    return kmeans_lloyd(emb, k=8, n_iters=3)


def _e2_cluster_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (round-9 pool): cluster-balanced sampling over the
    # k-means fit — at most 12 vectors per cluster by deterministic
    # hash rank; the diversity draw SemDeDup-style curation uses.
    from drugbankner_spark.operators.clustering import (
        cluster_balanced_sample,
    )

    emb = load_table(spark, sf, "embeddings")
    return cluster_balanced_sample(emb, k=8, per_cluster=12, n_iters=3)


def _e2_assign_stream(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (round-9 pool): the STREAMING routing face of the
    # k-means fit — embeddings re-arrive as a readStream (two file
    # chunks, availableNow) and route to the fitted centroids via the
    # stateless grid-integer argmin; over the finite input this equals
    # the batch assignment bit-for-bit, so the oracle is e2_kmeans's
    # replay verbatim (one oracle, two names — the established
    # streaming-parity pattern).
    import tempfile

    from drugbankner_spark.operators.clustering import kmeans_fit
    from drugbankner_spark.streaming import streams as S

    emb = load_table(spark, sf, "embeddings")
    _assigned, centroids = kmeans_fit(emb, k=8, n_iters=3)
    key = (spark.sparkContext.applicationId, sf, "emb")
    if key not in _STREAM_SRC:
        d = tempfile.mkdtemp(prefix="emb_stream_")
        emb.select("vec_id", "embedding").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        _STREAM_SRC[key] = d
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).option("maxFilesPerTrigger", 1).parquet(_STREAM_SRC[key])
    n = next(_STREAM_SEQ)
    return S.run_to_memory(
        S.cluster_assign_stream(stream, centroids),
        f"e2_assign_stream_{n}",
    )


def _e1_semantic_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (round-9 pool): the SEMANTIC face of benchmark
    # decontamination — train vectors flagged when any benchmark
    # vector's cosine reaches 0.9; completes the family (exact n-gram
    # + bloom + semantic). Benchmark = vec_id < 20, train = the rest.
    from drugbankner_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = load_table(spark, sf, "embeddings")
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 20),
        emb.filter(F.col("vec_id") < 20),
        threshold=0.9,
    )


def _e5_fim_transform(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (round-9 pool): deterministic Fill-in-the-Middle
    # rendering (PSM) — hash-drawn cut points, pure projection.
    from drugbankner_spark.operators.sft import fim_transform

    docs = load_table(spark, sf, "documents")
    return fim_transform(docs, salt="r8-fim")


def _e2_semdedup_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (round-9 pool): SemDeDup in the paper's cluster-scoped
    # shape — within-k-means-cell cosine pairs (threshold 0.92) →
    # connected components → min-id survivor; the quadratic search is
    # local to each cell, which is the method's scaling argument.
    from drugbankner_spark.operators.clustering import semdedup_clustered

    emb = load_table(spark, sf, "embeddings")
    return semdedup_clustered(emb, k=8, threshold=0.92, n_iters=3)


def _e2_hamming_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (VERDICT r07 next #7): banded corpus×corpus Hamming
    # pairs — every vector gets a 1-bit-flip clone planted (dim 1
    # negated), and the banded join (4 bands of 16 bits over the
    # 2-word codes; pigeonhole covers radius <= 3) must surface every
    # pair the oracle's brute-force all-pairs scan finds.
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings").filter(
        F.col("vec_id") < 300
    ).select("vec_id", "embedding")
    clone = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (v, i) -> "
            "CASE WHEN i = 1 THEN -v ELSE v END)"
        ).alias("embedding"),
    )
    codes = SIM.binary_quantize(emb.unionByName(clone))
    return SIM.hamming_band_pairs(codes, max_hamming=3, band_bits=16)


def _g_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): PageRank (the CommonCrawl domain-
    # authority curation signal) on a deterministic supplier→part
    # graph; 5 unrolled power iterations, dangling mass redistributed.
    # Oracle = the same 5 iterations as chained CTEs (the g_label_prop
    # replay pattern); 6dp rounding only at the END — damping contracts
    # any sub-6dp float-sum-order drift.
    from drugbankner_spark.operators.graph import pagerank

    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_orderkey") < 3000
    )
    edges = li.select(
        (F.col("l_suppkey") % 50).alias("src"),
        (F.col("l_partkey") % 50).alias("dst"),
    ).distinct()
    pr = pagerank(edges, n_iters=5)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _g_ppr(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): PERSONALIZED PageRank — teleport +
    # dangling mass to seeds {0, 7}; same graph/replay as g_pagerank.
    from drugbankner_spark.operators.graph import personalized_pagerank

    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_orderkey") < 3000
    )
    edges = li.select(
        (F.col("l_suppkey") % 50).alias("src"),
        (F.col("l_partkey") % 50).alias("dst"),
    ).distinct()
    pr = personalized_pagerank(edges, [0, 7], n_iters=5)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _e1_suffix_array(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): distributed suffix array by prefix
    # doubling over the first 20 documents — log N rounds of (position
    # self-join + two-phase global dense-rank), no suffix string ever
    # materialized engine-side. The oracle sorts the actual suffix
    # strings (bounded probe corpus), so every rank is content-checked.
    from drugbankner_spark.operators.suffixarray import suffix_array

    docs = load_table(spark, sf, "documents").filter(
        F.col("doc_id") < 20
    ).select("doc_id", "text")
    sa = suffix_array(docs)
    return sa.select(
        F.col("gpos").cast("long").alias("gpos"),
        "doc_id",
        F.col("local_pos").cast("long").alias("local_pos"),
        F.col("sa_rank").cast("long").alias("sa_rank"),
    )


def _sa_planted_docs(spark: SparkSession, sf: str) -> DataFrame:
    # The SA probe corpus (shared by e1_sa_dup_spans / e1_sa_dedup and
    # the _SA_PLANTED_CTES oracle twin): 12 documents, a 48-char slice
    # of doc 0 planted at the tail of every doc_id % 4 == 1 document.
    docs = load_table(spark, sf, "documents").filter(
        F.col("doc_id") < 12
    ).select("doc_id", "text")
    tail = docs.filter(F.col("doc_id") == 0).select(
        F.substring("text", 16, 48).alias("_tail")
    )
    return docs.crossJoin(F.broadcast(tail)).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.col("text"), F.lit(" "), F.col("_tail")),
        ).otherwise(F.col("text")).alias("text"),
    )


def _e1_sa_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    # Round 7 (round-8 pool): exact substring duplication via the
    # suffix array (Lee et al. 2022) — every >= 40-char duplicated span
    # (planted + natural, cross- and intra-document) must surface as
    # adjacent-suffix pairs.
    from drugbankner_spark.operators.suffixarray import duplicated_spans

    spans = duplicated_spans(_sa_planted_docs(spark, sf), min_len=40)
    return spans.select(
        "doc_id",
        F.col("local_pos").cast("long").alias("local_pos"),
        "other_doc_id",
        F.col("other_pos").cast("long").alias("other_pos"),
        "prefix",
    )


def _e1_suffix_array_bench(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (VERDICT r07 next #3): the SA at an SF-PROPORTIONAL
    # corpus slice (1% of documents — ~15k chars at sf0.1, 10x at sf1)
    # so BENCH records a slope; output is the bounded per-doc rank
    # checksum (sum of sa_rank x local_pos mod p), which the oracle's
    # direct sorted-suffix construction reproduces exactly — a content
    # check, not just a timing probe.
    from drugbankner_spark.operators.suffixarray import suffix_array

    docs = load_table(spark, sf, "documents").filter(
        F.col("doc_id") % 100 == 0
    ).select("doc_id", "text")
    sa = suffix_array(docs)
    return (
        sa.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_positions"),
            F.pmod(
                F.sum(F.col("sa_rank") * F.col("local_pos")),
                F.lit(1000000007),
            ).cast("long").alias("rank_checksum"),
        )
    )


def _linker_corpus_mentions(spark: SparkSession, sf: str):
    # Corpus-scale linker probe shapes (VERDICT r07 next #4), built
    # ONLY from the documents table so the sf1/sf3 bench corpora serve
    # them: mentions = distinct token trigrams of the doc_id % 50 == 0
    # slice; aliases = distinct token trigrams of the doc_id % 70 == 3
    # slice, alias_id = the md5-derived 32-bit hash (SQL twin
    # _sql_hash32). The corpus's duplicate structure guarantees exact
    # and near matches across the two slices. Slice design: cost is
    # sum over grams of (mention postings x alias postings), so both
    # sides scaling with sf would give a QUADRATIC slope by
    # construction; the mention slice is therefore PINNED to the base
    # ids (doc_id < 5000 — replica 0 of the sf1/sf3 corpora) while the
    # alias dim scales with sf. The recorded slope measures what the
    # serving path actually scales with: the ontology.
    from drugbankner_spark.operators.dedup import content_hash32

    def trigrams(docs):
        toks = docs.select(
            F.expr("filter(split(text, '\\\\s+'), t -> t <> '')")
            .alias("_toks")
        )
        return toks.select(
            F.explode(F.expr(
                """transform(
                    CASE WHEN size(_toks) >= 3
                         THEN sequence(1, size(_toks) - 2)
                         ELSE array() END,
                    i -> array_join(slice(_toks, i, 3), ' '))"""
            )).alias("gram")
        ).distinct()

    from drugbankner_spark.caching import shared_persist

    d = load_table(spark, sf, "documents")
    # persisted: the linker's broadcast-size guards and fit both act on
    # these dims several times — unpersisted, every action re-runs the
    # scan+explode+distinct (~3.5 s each at sf0.1, ~6 actions)
    mentions = shared_persist(
        trigrams(d.filter(
            (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 5000)
        )).select(F.col("gram").alias("mention"))
    )
    aliases = shared_persist(
        trigrams(d.filter(F.col("doc_id") % 70 == 3)).select(
            F.col("gram").alias("alias"),
            content_hash32(F.col("gram")).alias("alias_id"),
        )
    )
    return mentions, aliases


def _x1_linker_corpus(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (VERDICT r07 next #4): the TF-IDF linker at corpus scale
    # — tens of thousands of mentions against an sf-scaled alias dim,
    # no max_df pruning (the skew-exposed baseline).
    from drugbankner_spark.operators.linker import link_by_tfidf

    mentions, aliases = _linker_corpus_mentions(spark, sf)
    return link_by_tfidf(
        mentions, "mention", aliases, "alias", "alias_id",
        threshold=0.6, k=1,
    )


def _x1_linker_corpus_maxdf(spark: SparkSession, sf: str) -> DataFrame:
    # The same probe with max_df = 0.1: stop-grams (the posting join's
    # hot keys AND the least-informative dimensions) pruned before the
    # join — the skew knob VERDICT r07 next #4 asks to exercise and
    # time against the unpruned baseline.
    from drugbankner_spark.operators.linker import link_by_tfidf

    mentions, aliases = _linker_corpus_mentions(spark, sf)
    return link_by_tfidf(
        mentions, "mention", aliases, "alias", "alias_id",
        threshold=0.6, k=1, max_df_ratio=0.1,
    )


#: Persisted alias-index paths, keyed like _LSH_INDEX.
_ALIAS_INDEX: dict[tuple[str, str], str] = {}


def _ensure_alias_index(spark: SparkSession, sf: str) -> str:
    """Build the persisted alias index ONCE per (session, sf) — the
    fit step a serving deployment pays at publish time, NOT per probe.
    BENCH de-conflation (VERDICT r09 next #3): bench.py calls this
    explicitly BEFORE timing the probe and reports the fit seconds as
    its own line, so the x1_linker_indexed number is probe-only.
    The index is fit with max_df_ratio=0.1 — the same stop-gram
    posture as x1_linker_corpus_maxdf, the inline baseline the probe
    is timed against (serving an UNPRUNED index would compare a
    different query)."""
    import tempfile

    from drugbankner_spark.operators.linker import save_alias_index

    _mentions, aliases = _linker_corpus_mentions(spark, sf)
    key = (spark.sparkContext.applicationId, sf)
    if key not in _ALIAS_INDEX:
        path = tempfile.mkdtemp(prefix="alias_index_") + "/idx"
        save_alias_index(
            aliases, "alias", "alias_id", path, max_df_ratio=0.1
        )
        _ALIAS_INDEX[key] = path
    return _ALIAS_INDEX[key]


def _x1_linker_indexed(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9/10: the linker's SERVING face — the ontology fit
    # persisted once per (session, sf) as a gram-bucket-partitioned
    # index (one file per bucket, max_df=0.1); each run probes it,
    # pruning the postings/idf scans to the mention grams' buckets.
    # Results are bit-identical to the inline x1_linker_corpus_maxdf
    # (shared oracle); what the probe buys is the COST shape: the
    # inline fit scales with the ALIAS dim (~6.6x per 10x aliases),
    # the probe with the mention batch.
    from drugbankner_spark.operators.linker import link_with_alias_index

    mentions, _aliases = _linker_corpus_mentions(spark, sf)
    # prune_buckets=False: this is the BULK re-link shape — tens of
    # thousands of distinct mentions touch every gram bucket, so the
    # bucket pre-pass (a full mention-gram job) would be pure
    # overhead. Small-batch serving keeps the default pruning.
    # Round 13: under the weight-policy index the champion auto-gate
    # no longer keys on prune_buckets — impact-thresholded champion
    # tables are a small fraction of the postings, so candidate-gen
    # beats the flat join on the bulk shape too once n_aliases clears
    # the crossover (measured 29.9 s vs 185 s flat at sf10 bulk,
    # certified 1.0; at the driver's sf0.01 the tiny ontology keeps
    # the gate off and this row serves the flat pruned join). The
    # serving shape keeps its own window row (x1_linker_served).
    return link_with_alias_index(
        spark, _ensure_alias_index(spark, sf), mentions, "mention",
        threshold=0.6, k=1, prune_buckets=False,
    )


def _serving_batch_mentions(spark: SparkSession, sf: str):
    # The SMALL-batch serving shape: trigram mentions of five pinned
    # documents (~200 distinct mentions at every SF) — the query-time
    # face of the linker, where bucket pruning + champion lists earn
    # their keep against an sf-scaled ontology.
    d = load_table(spark, sf, "documents").filter(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 250)
    )
    toks = d.select(
        F.expr("filter(split(text, '\\\\s+'), t -> t <> '')")
        .alias("_toks")
    )
    return toks.select(
        F.explode(F.expr(
            """transform(
                CASE WHEN size(_toks) >= 3
                     THEN sequence(1, size(_toks) - 2)
                     ELSE array() END,
                i -> array_join(slice(_toks, i, 3), ' '))"""
        )).alias("mention")
    ).distinct()


def _x1_linker_served(spark: SparkSession, sf: str) -> DataFrame:
    # Round 12: the serving probe on its OWN shape — a ~200-mention
    # batch against the persisted (bucket-partitioned, max_df=0.1,
    # default-champion_c — see ALIAS_CHAMPION_C / the fit-time df
    # sizing in save_alias_index) index, prune_buckets=True so the scans prune to
    # the mention grams' buckets. use_champions auto-resolves by the
    # index meta's n_aliases (CHAMPION_AUTO_MIN_ALIASES crossover):
    # OFF at sf0.01/sf0.1 (3.5k aliases — flat pruned join wins
    # outright), ON at the bench's sf1 section (35.6k aliases —
    # champion candidate-gen + rerank beats the flat join there,
    # measured 5.1 s vs 6.2 s). Exact on EVERY path (the certificate
    # routes uncertified mentions through the full join, reusing the
    # persisted mention vectors) — hash-oracled against the same
    # TF-IDF SQL as the bulk probes, mention set restricted to the
    # serving slice, so the oracle is strategy-independent.
    from drugbankner_spark.operators.linker import link_with_alias_index

    return link_with_alias_index(
        spark, _ensure_alias_index(spark, sf),
        _serving_batch_mentions(spark, sf), "mention",
        threshold=0.6, k=1,
    )


def _e1_sa_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (VERDICT r07 next #2): the Lee-et-al exact-span REMOVAL
    # composed end to end — keeper = corpus-first occurrence per
    # duplicated 40-char window, every other occurrence's span merged
    # (gaps-and-islands) and stripped from its document.
    from drugbankner_spark.operators.suffixarray import sa_dedup_corpus

    return sa_dedup_corpus(_sa_planted_docs(spark, sf), min_len=40)


#: x1_tfidf_linker probe mentions: the distinct surfaces the frozen
#: stub detections spot, plus fuzzy probes the lexicon CAN'T serve —
#: a typo, a double-space variant, and a hyphen-free alias form. The
#: linker resolving these is exactly what a substring lexicon can't do.
_TFIDF_MENTIONS = [
    "headache", "treats headache", "fever", "cyclooxygenase",
    "hepatic metabolism", "aspirin", "ecotrin",
    "hepatic metabolism with token", "inhibits cyclooxygenase",
    "reduces fever",
    "asprin", "head  ache", "acetyl salicylic acid",
]


def _x1_tfidf_linker(spark: SparkSession, sf: str) -> DataFrame:
    # X1 gap closure (VERDICT r06 next #5): the in-engine scispaCy-style
    # char-3gram TF-IDF linker over the mini-KB alias table —
    # deterministic arithmetic end to end, hash-oracled against a full
    # TF-IDF replication in SQL. threshold=0.5/k=3 so ranks and the
    # near-miss band are both exercised.
    from drugbankner_spark.fixtures import mini_synonymizer_frames
    from drugbankner_spark.operators.linker import link_by_tfidf

    nodes, _clusters, _edges = mini_synonymizer_frames(spark)
    mentions = spark.createDataFrame(
        [(m,) for m in _TFIDF_MENTIONS], ["mention"]
    )
    return link_by_tfidf(
        mentions, "mention", nodes.select("id", "name"), "name", "id",
        threshold=0.5, k=3,
    )


def _ep1_tfidf_mechanistic_nodes(spark: SparkSession, sf: str) -> DataFrame:
    # EP1 end to end with the IN-ENGINE linker (VERDICT r06 next #5):
    # the stub configs are stripped to pure mention SPOTTING (every
    # surface keeps an empty link set), and linking happens relationally
    # — char-3gram TF-IDF against the synonymizer's node-name alias
    # table at the reference's threshold=0.7 / max_entities=1
    # (NER.py:42-51) — before the unchanged J7 alignment and A2/A6
    # merge. The stub can no longer smuggle kb ids: every link in the
    # output came from the TF-IDF arithmetic.
    from drugbankner_spark import pipelines as P
    from drugbankner_spark.fixtures_ner import (
        EP1_LEXICON,
        EP1_LEXICON_ALT,
        MINI_XML,
    )
    from drugbankner_spark.operators import ner as NER
    from drugbankner_spark.operators.drugbank import extract_drug_records
    from drugbankner_spark.sources.xml_source import (
        normalize_drugs,
        read_drugbank_xml,
    )

    syn = _syn(spark)
    records = extract_drug_records(
        normalize_drugs(read_drugbank_xml(spark, MINI_XML)), syn
    )
    spotting = [
        NER.make_stub_model_factory({k: [] for k in EP1_LEXICON}),
        NER.make_stub_model_factory({k: [] for k in EP1_LEXICON_ALT}),
    ]
    return NER.text_to_kg2_nodes(
        records, P.mechanistic_text(), ["kg2_id"], syn, spotting,
        NER.MECHANISTIC_CATEGORIES,
        linker_aliases=syn.nodes.select("id", "name"),
        linker_threshold=0.7, linker_k=1,
    )


def _ep1_spotted_nodes(spark: SparkSession, sf: str) -> DataFrame:
    # Round 8 (VERDICT r07 next #8): EP1 with ZERO stub factories —
    # mention DETECTION is the relational dictionary spotter (token
    # n-grams vs the synonymizer's alias surface forms), LINKING is
    # the TF-IDF char-3gram linker, then the unchanged J7 alignment
    # and A2/A6 merge. Every detection and every kb link in the output
    # comes from engine arithmetic; the only remaining X1 gap is the
    # neural model itself (no model download in the sandbox).
    from drugbankner_spark import pipelines as P
    from drugbankner_spark.fixtures_ner import MINI_XML
    from drugbankner_spark.operators import ner as NER
    from drugbankner_spark.operators.drugbank import extract_drug_records
    from drugbankner_spark.sources.xml_source import (
        normalize_drugs,
        read_drugbank_xml,
    )

    syn = _syn(spark)
    records = extract_drug_records(
        normalize_drugs(read_drugbank_xml(spark, MINI_XML)), syn
    )
    sentences = NER.prepare_sentences(
        records, P.mechanistic_text(), ["kg2_id"]
    ).filter(
        # X3 parity with the frozen oracle fixture: the mini XML plants
        # one sentence whose only purpose is to raise inside the stub
        # model (detect_entities swallows it, NER.py X3), so the
        # fixture's sentence inventory excludes it. The relational
        # spotter has no error path — apply the same exclusion so both
        # engines see the post-X3 sentence set.
        ~F.col("sentence").contains("TRIGGER_NER_ERROR")
    )
    detected = NER.spot_mentions(
        sentences, "sentence", ["kg2_id"],
        syn.nodes.select("name"), "name", max_tokens=4,
    )
    detected = NER.link_entities_tfidf(
        detected, syn.nodes.select("id", "name"), threshold=0.7, k=1
    )
    aligned = NER.align_detected(detected, syn, ["kg2_id"])
    return NER.merge_longest_name(
        aligned, ["kg2_id"], NER.MECHANISTIC_CATEGORIES
    )


# ---------------------------------------------------------------------------
# E1-E4: dedup / similarity / text analysis / multimodal queries.
# ---------------------------------------------------------------------------

def _e1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    return D.hash_canonical_dedup(docs, "text", "doc_id")


def _doc_shingles(spark: SparkSession, sf: str):
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    return D.token_shingles(docs, "text", "doc_id", n=3)


def _e1_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    # shuffle-free signature computation (per-row array expressions)
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    return D.minhash_signatures_rowwise(docs, "text", "doc_id", 16)


def _e1_minhash_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    # single-shuffle near-dup candidates (the band join)
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    cpus = int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "32"))
    return D.minhash_band_pairs_rowwise(
        docs, "text", "doc_id", 16, parallelism=cpus
    )


def _e1_minhash_near_dup_xxh(spark: SparkSession, sf: str) -> DataFrame:
    # Production-kernel variant (xxhash64 shingle hash): same band-join
    # plan, ~no hex/crypto per shingle. Bench-only — candidate recall vs
    # the md5 oracle kernel is pinned by
    # tests/test_ext_operators.py::test_xxhash_kernel_identical_recall.
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    cpus = int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "32"))
    return D.minhash_band_pairs_rowwise(
        docs, "text", "doc_id", 16, parallelism=cpus, kernel="xxhash64"
    )


def _e1_simhash(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    return D.simhash_signatures(docs, "text", "doc_id")


def _e1_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import dedup as D

    return D.ngram_jaccard_pairs(_doc_shingles(spark, sf), "doc_id", 0.05)


def _e2_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    return SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


def _e2_mean_pool(spark: SparkSession, sf: str) -> DataFrame:
    # Chunk->doc embedding rollup (round 6 late): 8 consecutive
    # vectors per synthetic doc, element-wise mean at 6dp.
    from drugbankner_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    emb = load_table(spark, sf, "embeddings").withColumn(
        "doc", F.expr("vec_id div 8")
    )
    pooled = mean_pool_embeddings(emb, "doc")
    # the hash compare needs scalars: fixed '%.6f' per element (the
    # elements are already 6dp-rounded, so the format is lossless and
    # identical in Java and C printf)
    return pooled.select(
        "doc",
        F.array_join(
            F.transform(
                "embedding",
                lambda v: F.format_string("%.6f", v),
            ), ",",
        ).alias("embedding"),
        "n_vecs",
    )


def _e2_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    # Hard-negative mining (round 6 late): top-5 cosine negatives per
    # query after anti-joining the labeled positives (q, q+1) and
    # (q, q+2), skipping rank 1 (the false-negative hedge) — the
    # DPR/Sentence-BERT recipe as one broadcast join + anti-join +
    # window, oracled by brute force with NOT EXISTS.
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    pos = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.array(F.col("vec_id") + 1, F.col("vec_id") + 2)
        ).alias("pos_id"),
    )
    return SIM.hard_negatives(emb, queries, pos, k=5, skip_top=1)


#: Built LSH index paths keyed by (applicationId, sf dir) — build once,
#: probe many (the ANN serving amortization; results are identical to
#: inline lsh_topk, tested in tests/test_partitioning.py). applicationId,
#: not id(spark): object addresses are reused after GC, so an id-keyed
#: cache could serve a new session an index bound to a dead one.
_LSH_INDEX: dict[tuple[str, str], str] = {}


def _e2_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Amortized serving form: the corpus' bucket assignment is
    # materialized ONCE per (session, sf) as a bucket-partitioned layout;
    # each run probes it, reading only the query buckets' partitions.
    # Same results as the inline operator — the oracle is unchanged.
    import tempfile

    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf)
    if key not in _LSH_INDEX:
        path = tempfile.mkdtemp(prefix="lsh_index_") + "/idx"
        SIM.build_lsh_index(emb, path, num_planes=8, dim=64)
        _LSH_INDEX[key] = path
    return SIM.probe_lsh_index(
        spark, _LSH_INDEX[key], emb.filter(F.col("vec_id") < 5), k=5,
        num_planes=8, dim=64,
    )


#: Incrementally-maintained LSH index paths (build half, append half),
#: keyed like _LSH_INDEX.
_LSH_APPEND_INDEX: dict[tuple[str, str], str] = {}
_IVFPQ_APPEND_INDEX: dict[tuple[str, str], str] = {}


def _e2_lsh_append_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Incremental index maintenance under the driver (VERDICT r03 next
    # #6): build the bucket-partitioned index from HALF the corpus, then
    # append_to_lsh_index the other half — append touches only the new
    # vectors' bucket partitions, never rebuilding. A probe of the
    # maintained index must equal a probe of a fresh full build, so the
    # oracle is e2_lsh_topk's, unchanged.
    import tempfile

    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    key = (spark.sparkContext.applicationId, sf)
    if key not in _LSH_APPEND_INDEX:
        path = tempfile.mkdtemp(prefix="lsh_append_") + "/idx"
        SIM.build_lsh_index(
            emb.filter(F.col("vec_id") % 2 == 0), path, num_planes=8, dim=64
        )
        SIM.append_to_lsh_index(
            emb.filter(F.col("vec_id") % 2 == 1), path, num_planes=8, dim=64
        )
        _LSH_APPEND_INDEX[key] = path
    return SIM.probe_lsh_index(
        spark, _LSH_APPEND_INDEX[key], emb.filter(F.col("vec_id") < 5), k=5,
        num_planes=8, dim=64,
    )


def _e2_ivfpq_append_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Incremental IVF-PQ maintenance under the driver (VERDICT r04 next
    # #4, completing the LSH/IVF append family): build the
    # cell-partitioned codes-only index from HALF the corpus, append the
    # other half, probe with n_probe = n_centroids. With all cells
    # probed the IVF layer prunes nothing, so the result must equal
    # pq_adc_topk over the full corpus — the oracle is
    # e2_pq_adc_topk's, unchanged (append==fresh-build==flat-ADC).
    import tempfile

    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    books = SIM.pq_codebooks(dim=64, m=8, ksub=16)
    key = (spark.sparkContext.applicationId, sf)
    if key not in _IVFPQ_APPEND_INDEX:
        path = tempfile.mkdtemp(prefix="ivfpq_append_") + "/idx"
        SIM.build_ivfpq_index(
            emb.filter(F.col("vec_id") % 2 == 0), path, books, n_centroids=8
        )
        SIM.append_to_ivfpq_index(
            emb.filter(F.col("vec_id") % 2 == 1), path, books, n_centroids=8
        )
        _IVFPQ_APPEND_INDEX[key] = path
    return SIM.probe_ivfpq_index(
        spark, _IVFPQ_APPEND_INDEX[key], emb.filter(F.col("vec_id") < 5),
        books, k=5, n_centroids=8, n_probe=8,
    )


_TEXT_INDEX_CACHE: dict = {}


def _e2_retrieval_topk(spark: SparkSession, sf: str) -> DataFrame:
    # End-to-end RAG-shape retrieval under the driver (VERDICT r05 next
    # #8): documents → chunk → hashed-TF vectorize → bucket-partitioned
    # LSH index on disk → probe with query TEXT → hydrate chunk text.
    # The oracle composes the already-proven chunk / hashed-TF / LSH
    # replicas: both engines derive vectors as n/sqrt(Σn²) from exact
    # integer counts and dot them in index order, so the rounded cosine
    # hashes match bitwise. Query ids offset by +100 so they can never
    # collide with chunk ids (doc 0's chunks are 0..9).
    import tempfile

    from drugbankner_spark.operators.retrieval import (
        build_text_index,
        retrieve,
    )

    docs = load_table(spark, sf, "documents")
    key = (spark.sparkContext.applicationId, sf)
    if key not in _TEXT_INDEX_CACHE:
        path = tempfile.mkdtemp(prefix="text_idx_") + "/idx"
        build_text_index(docs, path, chunk_tokens=32, overlap=8)
        _TEXT_INDEX_CACHE[key] = path
    queries = docs.filter(F.col("doc_id").isin(1, 2, 3)).select(
        (F.col("doc_id") + 100).alias("query_id"),
        F.col("text").alias("query_text"),
    )
    return retrieve(
        spark, _TEXT_INDEX_CACHE[key], queries, k=5,
    )


def _e2_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Product quantization with deterministic codebooks: encode the
    # corpus to m=8 codes, score queries via ADC lookup tables — float
    # vectors never touched at probe time. The oracle replicates encode
    # + ADC arithmetic exactly in SQL (codebooks are shared literals).
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    books = SIM.pq_codebooks(dim=64, m=8, ksub=16)
    codes = SIM.pq_encode(emb, books)
    return SIM.pq_adc_topk(
        codes, emb.filter(F.col("vec_id") < 5), books, k=5
    )


def _e2_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    return SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5,
                        n_centroids=8, n_probe=3, dim=64)


def _e2_pandas_topk(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import similarity as SIM

    emb = load_table(spark, sf, "embeddings")
    qpdf = emb.filter(F.col("vec_id") < 5).toPandas()
    return SIM.cosine_topk_pandas(emb, qpdf, k=5)


def _e1_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import similarity as SIM

    # The synthetic corpus has no true near-dups (max pairwise cosine
    # ≈0.51), so demonstrate with a permissive threshold + fewer planes;
    # production near-dup settings (θ≈0.9+, stacked bands) are exercised
    # on planted data in tests/test_ext_operators.py.
    emb = load_table(spark, sf, "embeddings")
    return SIM.embedding_near_dup_pairs(
        emb, threshold=0.4, num_planes=4
    )


def _e5_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic 10% sample keyed on event_id — stable across runs,
    # partitionings, and engines (md5-bucket, not RNG).
    from drugbankner_spark.operators.sampling import hash_sample

    ev = load_table(spark, sf, "events")
    return hash_sample(ev, "event_id", 0.10).select(
        "event_id", "user_id", "event_type"
    )


def _e5_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    # Leak-proof train/valid/test split by doc_id bucket ranges;
    # verified via per-split aggregate (count + char mass).
    from drugbankner_spark.operators.sampling import hash_split

    docs = load_table(spark, sf, "documents")
    split = hash_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _e5_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Exact-fraction-per-stratum draw: within each lang, the top
    # ceil(n*0.2) docs by deterministic key hash survive — class balance
    # holds exactly, unlike binomial hash_sample yields (ADVICE r03).
    from drugbankner_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf, "documents")
    return stratified_sample(docs, ["lang"], "doc_id", 0.2).select(
        "doc_id", "lang", "n_chars"
    )


def _e1_intradoc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Intra-document repeated 8-gram removal (round 5, Lee et al.) —
    # later occurrences of any repeated token 8-gram melt out of each
    # document; corpus-level structure untouched.
    from drugbankner_spark.operators.corpus import dedup_repeated_ngrams

    docs = load_table(spark, sf, "documents")
    return dedup_repeated_ngrams(docs, n=8)


_PIVOT_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def _e5_pivot(spark: SparkSession, sf: str) -> DataFrame:
    # Relational completeness: PIVOT (wide-format reshaping) — order
    # counts per status × priority. Explicit value list (no extra
    # distinct scan); absent combinations coalesce to 0 to match SQL
    # conditional-count semantics.
    orders = load_table(spark, sf, "orders")
    p = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PIVOT_PRIORITIES)
        .count()
    )
    return p.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(f"pri_{i + 1}")
            for i, v in enumerate(_PIVOT_PRIORITIES)
        ],
    )


def _e5_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    # The reshaping inverse: UNPIVOT the pivoted wide table back to
    # long (o_orderstatus, priority, n_orders) via the native unpivot
    # API — round-trips the e5_pivot result.
    wide = _e5_pivot(spark, sf)
    return wide.unpivot(
        ["o_orderstatus"],
        [f"pri_{i + 1}" for i in range(len(_PIVOT_PRIORITIES))],
        "priority", "n_orders",
    )


def _q_tpch_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-6 rotation prep: the 14 TPC-H-shape queries that have only
    # ever been pytest-oracled, consolidated into ONE tagged-union row
    # (the established suite mechanism) so a single future driver slot
    # hash-verifies the whole sweep. Branches reuse the ORIGINAL query
    # functions; every original stays individually runnable +
    # per-entry hash-checked in tests/test_oracle_parity.py.
    cw = F.concat_ws
    branches = [
        _q4_order_priority(spark, sf).select(*_okv(
            "q4", F.col("o_orderpriority"), v_num=F.col("order_count"))),
        _q6_forecast_revenue(spark, sf).select(*_okv(
            "q6", F.lit("revenue"), v_num=F.col("revenue"))),
        _q7_volume_shipping(spark, sf).select(*_okv(
            "q7", cw("§", "supp_nation", "cust_nation",
                     F.col("l_year").cast("string")),
            v_num=F.col("revenue"))),
        _q8_market_share(spark, sf).select(*_okv(
            "q8", F.col("o_year"), v_num=F.col("mkt_share"))),
        _q9_product_profit(spark, sf).select(*_okv(
            "q9", cw("§", "nation", F.col("o_year").cast("string")),
            v_num=F.col("sum_profit"))),
        _q11_important_parts(spark, sf).select(*_okv(
            "q11", F.col("l_partkey"), v_num=F.col("part_value"))),
        _q12_late_priority(spark, sf).select(*_okv(
            "q12", F.col("l_returnflag"),
            F.col("high_line_count").cast("string"),
            F.col("low_line_count"))),
        _q13_order_count_distribution(spark, sf).select(*_okv(
            "q13", F.col("c_count"), v_num=F.col("custdist"))),
        _q14_promo_revenue(spark, sf).select(*_okv(
            "q14", F.lit("promo"), v_num=F.col("promo_revenue"))),
        _q15_top_supplier(spark, sf).select(*_okv(
            "q15", F.col("s_suppkey"), F.col("s_name"),
            F.col("total_revenue"))),
        _q16_supplier_counts(spark, sf).select(*_okv(
            "q16", cw("§", "p_brand", "p_type",
                      F.col("p_size").cast("string")),
            v_num=F.col("supplier_cnt"))),
        _q19_disjunctive_revenue(spark, sf).select(*_okv(
            "q19", F.lit("revenue"), v_num=F.col("revenue"))),
        _q21_late_sole_supplier(spark, sf).select(*_okv(
            "q21", F.col("s_name"), v_num=F.col("numwait"))),
        _q22_idle_customers(spark, sf).select(*_okv(
            "q22", F.col("c_mktsegment"),
            F.col("numcust").cast("string"), F.col("totacctbal"))),
    ]
    return _union_all(branches)


def _e3_packed_sequences_rows(spark: SparkSession, sf: str) -> DataFrame:
    # The materialized training sequences themselves (round 5 last
    # mile): (seq_id, joined text, n_tokens) — the oracle recomputes
    # the concatenated-stream windows with one global SQL window.
    from drugbankner_spark.operators.corpus import (
        materialize_packed_sequences,
    )

    docs = load_table(spark, sf, "documents")
    out = materialize_packed_sequences(docs, seq_len=512)
    return out.select(
        "seq_id",
        F.array_join("tokens", " ").alias("seq_text"),
        "n_tokens",
    )


def _e5_cluster_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    # Contamination-proof train/valid/test split (round 5): near-dup
    # CLUSTERS (same CC as e1_dup_clusters) are the split unit, so a
    # clique of near-dups can never straddle train and test. The oracle
    # recomputes the CC fixpoint + the md5 hash-split on cluster ids.
    from drugbankner_spark.operators import dedup as D
    from drugbankner_spark.operators.sampling import cluster_safe_split

    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_band_pairs_rowwise(docs, "text", "doc_id", 16)
    return cluster_safe_split(
        docs, pairs, {"train": 0.8, "valid": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def _e3_charlm(spark: SparkSession, sf: str) -> DataFrame:
    # Character-trigram LM self-perplexity (round 5, the CCNet quality
    # signal): train counts on the documents corpus, score the SAME
    # corpus — (doc_id, n_grams, mean char logprob). Model dim is
    # bounded by charset^3, broadcast at scoring.
    from drugbankner_spark.caching import shared_persist
    from drugbankner_spark.operators.textanalysis import (
        _char_ngram_pairs,
        char_lm_logprob,
        train_char_lm,
    )

    docs = load_table(spark, sf, "documents")
    # self-perplexity (round 15): ONE persisted fused explode feeds
    # training gram counts, training context counts AND the scoring
    # occurrences (the former shape persisted only the trigram pass
    # and re-ran a full bigram corpus explode per consuming action);
    # the bounded model dim persists too, so the broadcast-size count
    # and the scoring join read it instead of re-aggregating
    occ = shared_persist(_char_ngram_pairs(docs, "text", "doc_id"))
    occ3 = occ.filter(F.length("g3") == 3).select(
        "doc_id", F.col("g3").alias("gram")
    )
    model = shared_persist(train_char_lm(
        docs, grams=occ3,
        ctx_grams=occ.select(F.col("g2").alias("gram")),
    ))
    return char_lm_logprob(docs, model, occ=occ3)


def _e5_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    # Domain-mixture draw (round 5): exactly N docs per language in
    # deterministic hash-rank order — the corpus-mixing step of a
    # Pile/Dolma-style recipe. Targets over-ask 'zh' on purpose: a
    # target above the stratum size keeps the whole stratum.
    from drugbankner_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf, "documents")
    return mixture_sample(
        docs, "lang", "doc_id",
        {"en": 40, "de": 25, "zh": 100_000},
    ).select("doc_id", "lang", "n_chars")


def _g_kcore(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: coreness by SYNCHRONIZED h-index iteration (Lü et al.
    # 2016) on the shared Z_97 graph — the graph-density curation
    # signal (spam rings / templated link farms concentrate in high
    # cores). FIXED 4 rounds so the chained-CTE oracle replays the
    # identical integer arithmetic round by round; convergence of the
    # iteration to the exact peeling coreness (kcore_decomposition,
    # round 6 — data-dependent fixpoint, not statically SQL-
    # expressible) is pinned separately in tests/test_graph.py.
    from drugbankner_spark.operators.graph import coreness_hindex

    docs = load_table(spark, sf, "documents")
    return coreness_hindex(_graph_edges(docs), rounds=4)


def _g_modularity(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: Newman modularity of the 3-round LPA communities on the
    # Z_97 graph — exact BIGINT numerators (4·m·m_c − d_c²) over the
    # shared 4m² denominator; the only float is one IEEE division per
    # community. Scores the clustering the g_graph_suite's LPA row
    # produces — labels alone say nothing about quality.
    from drugbankner_spark.operators.graph import (
        label_propagation,
        modularity_score,
    )

    docs = load_table(spark, sf, "documents")
    edges = _graph_edges(docs)
    labels = label_propagation(edges, iterations=3)
    return modularity_score(edges, labels)


def _g_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    # Exact triangle counting (round 6): deterministic synthetic graph
    # over Z_97 derived from doc ids (two edges per doc). The Spark
    # side runs the degree-oriented compact-forward algorithm; the
    # oracle counts canonically-ordered (a<b<c) closed triples — the
    # same number by construction, so a hash match proves the
    # orientation machinery exact.
    from drugbankner_spark.operators.graph import triangle_count

    docs = load_table(spark, sf, "documents")
    return triangle_count(_graph_edges(docs))


def _g_common_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    # Link-prediction scores (round 6) on the same synthetic Z_97
    # graph as g_triangle_count: non-edge pairs with ≥2 shared
    # neighbors, exact common-neighbor count + 6dp Jaccard.
    from drugbankner_spark.operators.graph import common_neighbor_scores

    docs = load_table(spark, sf, "documents")
    return common_neighbor_scores(_graph_edges(docs), min_common=2)


def _graph_edges(docs: DataFrame):
    # the shared deterministic Z_97 synthetic graph (two edges per doc)
    # used by every g_* entry
    e1 = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
    )
    e2 = docs.select(
        ((F.col("doc_id") * 3 + 5) % 97).alias("src"),
        ((F.col("doc_id") * 5 + 11) % 97).alias("dst"),
    )
    return e1.unionByName(e2)


def _g_bfs_distances(spark: SparkSession, sf: str) -> DataFrame:
    # Multi-source k-hop BFS (round 6 late) on the Z_97 graph: exact
    # min hop distance from seeds {0,1,2}, capped at 3 hops. The
    # oracle is a recursive CTE enumerating (node, dist) pairs with
    # MIN at the end — the textbook SQL BFS — so a hash match proves
    # the iterative frontier/anti-join machinery exact.
    from drugbankner_spark.operators.graph import bfs_distances

    docs = load_table(spark, sf, "documents")
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    return bfs_distances(_graph_edges(docs), seeds, max_hops=3)


def _g_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    # Synchronous label propagation (round 6 late), 3 fixed iterations
    # with the min-label tiebreak, on the Z_97 graph; the oracle
    # replays the same three synchronous rounds as chained CTEs
    # (mode-vote via max-count window + min tiebreak per round).
    from drugbankner_spark.operators.graph import label_propagation

    docs = load_table(spark, sf, "documents")
    return label_propagation(_graph_edges(docs), iterations=3)


def _g_random_walks(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic DeepWalk corpus (round 6 late) on the Z_97 graph:
    # hash-seeded neighbor choice over sorted adjacency, 2 walks of
    # length 3 per node; the oracle replays both steps as chained CTEs
    # with the same md5 index arithmetic.
    from drugbankner_spark.operators.graph import random_walks

    docs = load_table(spark, sf, "documents")
    return random_walks(
        _graph_edges(docs), walk_len=3, walks_per_node=2
    )


def _e5_prep_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-7 consolidation suite: five round-6-late E5 singles in one
    # tagged-union row (kfold, calibration, tokenize, profile, OLS) —
    # numerics ride v_num per metric so no double ever casts to
    # string (engine repr divergence), strings ride v.
    cal = _e5_calibration(spark, sf)
    cal_rows = _union_all([
        cal.select(*_okv(
            "ece", F.concat_ws("§", F.col("bin").cast("string"),
                               F.lit(m)),
            v_num=F.col(m).cast("double"),
        ))
        for m in ["n", "avg_confidence", "accuracy", "abs_gap", "ece"]
    ])
    ols = _e5_group_ols(spark, sf)
    ols_rows = _union_all([
        ols.select(*_okv(
            "ols", F.concat_ws("§", F.col("l_returnflag"), F.lit(m)),
            v_num=F.col(m).cast("double"),
        ))
        for m in ["n", "slope", "intercept", "r2"]
    ])
    return _union_all([
        _e5_kfold(spark, sf).select(*_okv(
            "kfold", F.col("doc_id"), v_num=F.col("fold"),
        )),
        cal_rows,
        _e5_tokenize(spark, sf).select(*_okv(
            "tok", F.col("c_custkey"), F.col("c_name"),
            F.col("c_nationkey"),
        )),
        _e5_profile(spark, sf).select(*_okv(
            "profile", F.col("column"),
            F.concat_ws(
                "§", F.col("n").cast("string"),
                F.col("n_null").cast("string"),
                F.col("n_distinct").cast("string"),
                "min_value", "max_value", "top_value",
                F.col("top_count").cast("string"),
            ),
        )),
        ols_rows,
    ])


def _g_graph_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-7 consolidation suite: the three round-6-late graph
    # singles (BFS distances, LPA communities, walk corpus) in one
    # tagged-union row.
    return _union_all([
        _g_bfs_distances(spark, sf).select(*_okv(
            "bfs", F.col("node"), v_num=F.col("dist"),
        )),
        _g_label_prop(spark, sf).select(*_okv(
            "lpa", F.col("node"), v_num=F.col("label"),
        )),
        _g_random_walks(spark, sf).select(*_okv(
            "walk",
            F.concat_ws("§", F.col("start").cast("string"),
                        F.col("walk_id").cast("string")),
            F.col("path"),
        )),
    ])


def _num_metric_rows(df, op: str, key_cols: list[str], metrics: list[str]):
    """Tagged-union rows for a numeric-wide relation: one output row
    per (input row, metric), k = key values § metric name, v_num = the
    metric — the e5_prep_suite per-metric pattern, factored out for
    the round-8 consolidation wave."""
    return _union_all([
        df.select(*_okv(
            op,
            F.concat_ws("§", *[F.col(c).cast("string") for c in key_cols],
                        F.lit(m)),
            v_num=F.col(m).cast("double"),
        ))
        for m in metrics
    ])


def _t_ts_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-8 consolidation suite (VERDICT r07 next #1): the three
    # r07-green time-series singles in one tagged-union row; every
    # original stays individually runnable + hash-checked via
    # all_queries.
    anomaly = _t_anomaly(spark, sf)
    return _union_all([
        _num_metric_rows(_t_resample_gapfill(spark, sf), "resample",
                         ["event_type", "bucket_start"],
                         ["n_obs", "value_avg", "locf", "interp"]),
        _num_metric_rows(_t_ewma(spark, sf), "ewma",
                         ["event_type", "bucket_start"], ["ewma"]),
        _num_metric_rows(anomaly, "anomaly",
                         ["event_type", "bucket_start"],
                         ["value_avg", "zscore"]),
        anomaly.select(*_okv(
            "anomaly_flag",
            F.concat_ws("§", F.col("event_type"),
                        F.col("bucket_start").cast("string")),
            F.col("is_anomaly"),
        )),
    ])


def _e6_journey_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-8 consolidation suite: the five r07-green event-journey
    # singles (transition matrix/power, top paths, attribution,
    # co-occurrence) in one tagged-union row.
    att = _e6_attribution(spark, sf)
    return _union_all([
        _num_metric_rows(_e6_transition_matrix(spark, sf), "tm",
                         ["prev_state", "next_state"], ["n", "prob"]),
        _num_metric_rows(_e6_top_paths(spark, sf), "paths",
                         ["path"], ["n_entities"]),
        _num_metric_rows(_e6_transition_power(spark, sf), "power",
                         ["prev_state", "next_state"], ["prob"]),
        _num_metric_rows(att, "att",
                         ["user_id", "conversion_id", "touch_id"],
                         ["position", "n_touches", "first_credit",
                          "last_credit", "linear_credit"]),
        att.select(*_okv(
            "att_touch",
            F.concat_ws("§", F.col("user_id").cast("string"),
                        F.col("conversion_id").cast("string"),
                        F.col("touch_id").cast("string")),
            F.col("touch_type"),
        )),
        _num_metric_rows(_e6_cooccurrence(spark, sf), "cooc",
                         ["item_a", "item_b"],
                         ["n_ab", "n_a", "n_b", "confidence_a_to_b",
                          "lift"]),
    ])


def _e5_eval_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-8 consolidation suite: the five r07-green eval/metric
    # singles (nDCG, retrieval metrics, classification report, NER
    # span eval, IOB tagging) in one tagged-union row.
    return _union_all([
        _num_metric_rows(_e5_ndcg(spark, sf), "ndcg",
                         ["query_id"], ["ndcg_at_k"]),
        _num_metric_rows(_e5_retrieval_metrics(spark, sf), "retr",
                         ["query_id"],
                         ["n_relevant", "n_retrieved_relevant",
                          "recall_at_k", "capped_recall_at_k",
                          "reciprocal_rank"]),
        _num_metric_rows(_e5_class_report(spark, sf), "cls",
                         ["label"],
                         ["support", "precision", "recall", "f1"]),
        _num_metric_rows(_e5_ner_eval(spark, sf), "ner",
                         ["label"],
                         ["tp", "fp", "fn", "precision", "recall",
                          "f1"]),
        _e5_iob_tags(spark, sf).select(*_okv(
            "iob",
            F.concat_ws("§", F.col("doc_id").cast("string"),
                        F.col("pos").cast("string")),
            F.concat_ws("§", F.col("token"), F.col("tag")),
        )),
    ])


def _e1_clean_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-8 consolidation suite: the four r07-green text-cleaning
    # singles (C4 line rules, PII scrub, extraction repair,
    # boilerplate strip) in one tagged-union row — full cleaned texts
    # ride v, so the hash still checks every output character.
    return _union_all([
        _e1_c4_filter(spark, sf).select(*_okv(
            "c4", F.col("doc_id"),
            F.concat_ws("§", "text",
                        F.col("n_lines_kept").cast("string"),
                        F.col("n_lines_dropped").cast("string"),
                        F.col("has_brace").cast("string"),
                        F.col("has_lorem").cast("string"),
                        F.col("keep").cast("string")),
        )),
        _e1_pii_scrub(spark, sf).select(*_okv(
            "pii", F.col("doc_id"),
            F.concat_ws("§", "text",
                        F.col("n_email").cast("string"),
                        F.col("n_ipv4").cast("string"),
                        F.col("n_ssn").cast("string"),
                        F.col("n_phone").cast("string"),
                        F.col("has_pii").cast("string")),
        )),
        _e1_repair_text(spark, sf).select(*_okv(
            "repair", F.col("doc_id"),
            F.concat_ws("§", "text",
                        F.col("n_chars_before").cast("string"),
                        F.col("n_chars_after").cast("string")),
        )),
        _e1_boilerplate_strip(spark, sf).select(*_okv(
            "boiler", F.col("doc_id"),
            F.concat_ws("§", "text_clean",
                        F.col("n_removed").cast("string")),
        )),
    ])


def _e3_lm_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-9 consolidation suite: five r07-green LM / text-statistics
    # singles (Kneser-Ney perplexity, skip-gram pairs, char entropy,
    # Zipf OLS, WordPiece apply) in one tagged-union row; every
    # original stays individually runnable + hash-checked via
    # all_queries.
    return _union_all([
        _num_metric_rows(_e3_kn_ppl(spark, sf), "kn", ["doc_id"],
                         ["n_bigrams", "mean_logprob", "ppl"]),
        _num_metric_rows(_e3_skipgram(spark, sf), "skip",
                         ["center", "context"], ["n"]),
        _num_metric_rows(_e3_char_entropy(spark, sf), "ent", ["doc_id"],
                         ["n_chars", "n_distinct_chars", "entropy"]),
        _num_metric_rows(_e3_zipf(spark, sf), "zipf", ["grp"],
                         ["n", "slope", "intercept", "r2"]),
        _e3_wordpiece_apply(spark, sf).select(*_okv(
            "wp", F.col("doc_id").cast("string"),
            F.concat_ws("§", F.col("n_tokens").cast("string"),
                        F.col("tokens_str")),
        )),
    ])


def _e5_sft_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-9 consolidation suite: four r07-green SFT / data-mixing
    # singles (T5 span corruption, EDA augmentation, temperature
    # mixing, DSIR importance weights) in one tagged-union row.
    return _union_all([
        _e5_span_corrupt(spark, sf).select(*_okv(
            "corrupt", F.col("doc_id").cast("string"),
            F.concat_ws("§", F.col("inputs"), F.col("targets"),
                        F.col("n_spans").cast("string"),
                        F.col("n_noise_tokens").cast("string")),
        )),
        _e5_augment(spark, sf).select(*_okv(
            "aug", F.col("doc_id").cast("string"),
            F.concat_ws("§", F.col("text"),
                        F.col("n_dropped").cast("string"),
                        F.col("n_swapped_pairs").cast("string")),
        )),
        _e5_temperature_mix(spark, sf).select(*_okv(
            "mix", F.col("doc_id").cast("string"), F.col("source"),
        )),
        _num_metric_rows(_e5_dsir_weights(spark, sf), "dsir",
                         ["doc_id"], ["dsir_log_weight"]),
    ])


def _g_count_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-9 consolidation suite: the two r07-green graph-counting
    # singles (global triangle count, common-neighbor/Jaccard link
    # scores) in one tagged-union row.
    return _union_all([
        _num_metric_rows(_g_triangle_count(spark, sf), "tri", [],
                         ["n_triangles", "n_edges", "n_vertices"]),
        _num_metric_rows(_g_common_neighbors(spark, sf), "cn",
                         ["a", "b"], ["n_common", "jaccard"]),
    ])


def _e5_gov_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-9 consolidation suite: four r07-green governance /
    # warehouse singles (k-anonymity risk, winsorization, CDC
    # compaction, cohort retention) in one tagged-union row.
    # Timestamps ride as unix microseconds (Spark unix_micros ==
    # DuckDB epoch_us on the same parquet values) — never as
    # engine-formatted strings.
    cdc = _e5_cdc_apply(spark, sf).withColumn("ts_us",
                                              F.unix_micros("ts"))
    return _union_all([
        _e5_k_anonymity(spark, sf).select(*_okv(
            "kanon",
            F.concat_ws("§", F.col("event_type"),
                        F.col("day_start").cast("string")),
            F.concat_ws("§", F.col("class_size").cast("string"),
                        F.col("l_diversity").cast("string"),
                        F.col("at_risk").cast("string")),
        )),
        _num_metric_rows(_e5_winsorize(spark, sf), "winsor",
                         ["event_type", "event_id"],
                         ["value", "pct_rank", "winsorized"]),
        _num_metric_rows(cdc, "cdc", ["user_id", "ts_us", "event_id"],
                         ["value"]),
        cdc.select(*_okv(
            "cdc_t",
            F.concat_ws("§", F.col("user_id").cast("string"),
                        F.col("ts_us").cast("string"),
                        F.col("event_id").cast("string")),
            F.col("event_type"),
        )),
        _num_metric_rows(
            _e5_cohort_retention(spark, sf).withColumn(
                "cohort_us", F.unix_micros("cohort_period")),
            "cohort", ["cohort_us", "periods_since"], ["n_active"]),
    ])


def _j_er_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-9 consolidation suite: the two r07-green fuzzy-matching
    # singles (Jaro-Winkler match, composed entity resolution) in one
    # tagged-union row.
    return _union_all([
        _j_jw_match(spark, sf).select(*_okv(
            "jw",
            F.concat_ws("§", F.col("c_custkey").cast("string"),
                        F.col("c_name")),
            F.col("matched_v_name"),
            v_num=F.col("jw_sim"),
        )),
        _er_resolve(spark, sf).select(*_okv(
            "er",
            F.concat_ws("§", F.col("id").cast("string"), F.col("name")),
            F.concat_ws("§", F.col("cluster").cast("string"),
                        F.col("canonical_name")),
        )),
    ])


def _e1_pair_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-9 consolidation suite: the two r07-green near-dup pair
    # singles (banded MinHash recall/precision audit, banded SimHash
    # pairs) in one tagged-union row.
    return _union_all([
        _num_metric_rows(_e1_near_dup_recall(spark, sf), "recall", [],
                         ["n_true", "n_candidates", "n_hit", "recall",
                          "precision"]),
        _num_metric_rows(_e1_simhash_pairs(spark, sf), "simhash",
                         ["id_a", "id_b"], ["hamming"]),
    ])


def _e1_sa_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-10 consolidation suite: the four r09-green suffix-array
    # singles (global SA ranks, Lee-et-al duplicate spans, the
    # composed exact-span removal, and the sf-proportional bench
    # slice's rank checksum) in one tagged-union row.
    return _union_all([
        _e1_suffix_array(spark, sf).select(*_okv(
            "sa", F.col("gpos"),
            F.concat_ws("§", F.col("doc_id").cast("string"),
                        F.col("local_pos").cast("string"),
                        F.col("sa_rank").cast("string")),
        )),
        _e1_sa_dup_spans(spark, sf).select(*_okv(
            "spans",
            F.concat_ws("§", F.col("doc_id").cast("string"),
                        F.col("local_pos").cast("string")),
            F.concat_ws("§", F.col("other_doc_id").cast("string"),
                        F.col("other_pos").cast("string"),
                        F.col("prefix")),
        )),
        _e1_sa_dedup(spark, sf).select(*_okv(
            "dedup", F.col("doc_id"),
            F.concat_ws("§", F.col("n_chars_kept").cast("string"),
                        F.col("n_chars_removed").cast("string"),
                        F.col("text")),
        )),
        _e1_suffix_array_bench(spark, sf).select(*_okv(
            "bench", F.col("doc_id"),
            F.concat_ws("§", F.col("n_positions").cast("string"),
                        F.col("rank_checksum").cast("string")),
        )),
    ])


def _g_rank_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-10 consolidation suite: the two r09-green power-iteration
    # singles (PageRank, personalized PageRank) in one tagged row.
    return _union_all([
        _g_pagerank(spark, sf).select(*_okv(
            "pr", F.col("node"), v_num=F.col("rank"))),
        _g_ppr(spark, sf).select(*_okv(
            "ppr", F.col("node"), v_num=F.col("rank"))),
    ])


def _e2_bit_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-10 consolidation suite: the four r09-green 1-bit ANN
    # singles (Hamming top-k, the Hamming→cosine rerank funnel,
    # banded corpus×corpus Hamming pairs, SRP sketches+topk) in one
    # tagged-union row. The srp branch is already in okv form (ops
    # 'code'/'topk') and passes through unchanged.
    return _union_all([
        _e2_hamming_topk(spark, sf).select(*_okv(
            "htop",
            F.concat_ws("§", F.col("query_id").cast("string"),
                        F.col("rank").cast("string")),
            F.col("neighbor_id"),
            v_num=F.col("hamming").cast("double"),
        )),
        _e2_rerank_topk(spark, sf).select(*_okv(
            "rrk",
            F.concat_ws("§", F.col("query_id").cast("string"),
                        F.col("rank").cast("string")),
            F.col("neighbor_id"),
            v_num=F.col("cos_sim"),
        )),
        _e2_hamming_pairs(spark, sf).select(*_okv(
            "hpairs",
            F.concat_ws("§", F.col("id_a").cast("string"),
                        F.col("id_b").cast("string")),
            v_num=F.col("hamming").cast("double"),
        )),
        _e2_srp_sketch(spark, sf),
    ])


def _e5_dp_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-10 consolidation suite: the two r09-green DP-histogram
    # releases (row-level, user-level with per-contributor clamp).
    return _union_all([
        _e5_dp_histogram(spark, sf).select(*_okv(
            "row", F.col("event_type"), F.col("true_count"),
            v_num=F.col("noisy_count").cast("double"))),
        _e5_dp_histogram_user(spark, sf).select(*_okv(
            "user", F.col("event_type"), F.col("true_count"),
            v_num=F.col("noisy_count").cast("double"))),
    ])


def _e2_kmeans_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-10 consolidation suite: the three r09-green k-means-family
    # singles (the Lloyd fit assignments, the cluster-balanced sample,
    # cluster-scoped SemDeDup) in one tagged-union row.
    return _union_all([
        _e2_kmeans(spark, sf).select(*_okv(
            "km", F.col("vec_id"),
            F.concat_ws("§", F.col("cluster_id").cast("string"),
                        F.col("sq_dist").cast("string")),
        )),
        _e2_cluster_sample(spark, sf).select(*_okv(
            "cs", F.col("vec_id"),
            F.concat_ws("§", F.col("cluster_id").cast("string"),
                        F.col("draw_rank").cast("string")),
        )),
        _e2_semdedup_kmeans(spark, sf).select(*_okv(
            "sd", F.col("vec_id"),
            F.concat_ws("§", F.col("kmeans_cluster").cast("string"),
                        F.col("cluster_id").cast("string"),
                        F.col("cluster_size").cast("string"),
                        F.col("is_survivor").cast("int").cast("string")),
        )),
    ])


def _x1_linker_suite(spark: SparkSession, sf: str) -> DataFrame:
    # Round-10 consolidation suite: the two r09-green inline
    # corpus-linker probes (unpruned, max_df=0.1). The serving-index
    # probe keeps its OWN window row (x1_linker_indexed — rotated in
    # this round, never driver-verified).
    return _union_all([
        _x1_linker_corpus(spark, sf).select(*_okv(
            "inline",
            F.concat_ws("§", F.col("mention"),
                        F.col("rank").cast("string")),
            F.col("alias_id"),
            v_num=F.col("score"),
        )),
        _x1_linker_corpus_maxdf(spark, sf).select(*_okv(
            "maxdf",
            F.concat_ws("§", F.col("mention"),
                        F.col("rank").cast("string")),
            F.col("alias_id"),
            v_num=F.col("score"),
        )),
    ])


def _e5_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    # Temperature-weighted mixing (round 6): per-source targets ∝
    # sqrt(n) (alpha=0.5, UniMax/T5-style low-resource upweighting) in
    # EXACT integer arithmetic (isqrt weights, integer division), then
    # the deterministic hash-rank draw. The oracle recomputes the
    # targets in SQL — floor(sqrt(n)) == isqrt(n) for all n < 2^52.
    from drugbankner_spark.operators.sampling import (
        mixture_sample,
        temperature_mixture_targets,
    )

    docs = load_table(spark, sf, "documents")
    targets = temperature_mixture_targets(
        docs, "source", total_budget=200, alpha=0.5
    )
    return mixture_sample(docs, "source", "doc_id", targets).select(
        "doc_id", "source"
    )


def _j_fuzzy_name_match(spark: SparkSession, sf: str) -> DataFrame:
    # Blocked edit-distance join: deterministic typo probes (append one
    # char) resolved back to part names within 2 edits — the
    # typo-tolerant lookup the exact-simplified J-family can't serve.
    from drugbankner_spark.operators.relational import fuzzy_join

    part = load_table(spark, sf, "part")
    names = part.select("p_name").distinct()
    probes = part.select(
        F.concat(F.col("p_name"), F.lit("x")).alias("probe")
    ).distinct()
    return fuzzy_join(probes, names, "probe", "p_name",
                      max_distance=2, block_prefix=1)


def _e5_scd2_user_state(spark: SparkSession, sf: str) -> DataFrame:
    # SCD2 versioning of each user's event_type "state" from the events
    # changelog: no-op repeats collapse, versions carry validity
    # intervals. Windows partitioned by user — scales with users.
    from drugbankner_spark.operators.temporal import scd2_from_changes

    return scd2_from_changes(
        load_table(spark, sf, "events"),
        "user_id", "ts", ["event_type"], tiebreak_cols=["event_id"],
    )


def _e5_constraint_report(spark: SparkSession, sf: str) -> DataFrame:
    # declarative data-quality gate over orders: unique key, null-free
    # fk, value domain, referential integrity vs customer.
    from drugbankner_spark.operators.checks import constraint_report

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    return constraint_report(
        orders,
        not_null=["o_custkey", "o_orderdate"],
        unique=[["o_orderkey"]],
        accepted_values={"o_orderstatus": ["O", "F", "P"]},
        references=[("o_custkey", cust, "c_custkey")],
    )


def _e3_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    # Sequence-packing assignment via bucketed parallel prefix sum; the
    # oracle computes the SAME stream positions with one global window.
    from drugbankner_spark.operators.corpus import pack_sequence_assignments

    return pack_sequence_assignments(
        load_table(spark, sf, "documents"), seq_len=512
    )


def _e3_hashed_tf(spark: SparkSession, sf: str) -> DataFrame:
    # Feature-hashed text vectors (long/sparse oracle-stable view):
    # the model-free bridge from E3 text to the E2 similarity stack.
    from drugbankner_spark.operators.textanalysis import hashed_tf_entries

    return hashed_tf_entries(load_table(spark, sf, "documents"))


def _e5_sketch_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # Mergeable HLL distinct-user counts per event type + the global
    # rollup computed by UNIONING the stored sketches (never rescanning
    # events) — the incremental 100 TB pattern. Approximate by design →
    # rows-only driver check; the ±5% envelope and grouping-invariance
    # are pinned in tests/test_ext_operators.py.
    from drugbankner_spark.operators.sketches import (
        hll_group_sketches,
        hll_rollup,
    )

    ev = load_table(spark, sf, "events")
    per_type = hll_group_sketches(ev, ["event_type"], "user_id")
    total = hll_rollup(per_type).select(
        F.lit("__all__").alias("event_type"), "approx_distinct"
    )
    return hll_rollup(per_type, ["event_type"]).unionByName(total)


def _e3_gopher_filter(spark: SparkSession, sf: str) -> DataFrame:
    # E3: Gopher-style rule filter — one scan, zero shuffles, flags +
    # keep emitted together so drop reasons are auditable.
    from drugbankner_spark.operators.textanalysis import gopher_quality_filter

    return gopher_quality_filter(load_table(spark, sf, "documents"))


def _pipeline_clean_corpus(spark: SparkSession, sf: str) -> DataFrame:
    # Flagship composition: MinHash pairs → duplicate clusters →
    # min-id canonical per cluster → Gopher quality rules on survivors.
    # The whole post-fixpoint pipeline is one lazy Catalyst plan.
    from drugbankner_spark.operators import dedup as D
    from drugbankner_spark.operators.corpus import clean_corpus

    docs = load_table(spark, sf, "documents")
    cpus = int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "32"))
    pairs = D.minhash_band_pairs_rowwise(
        docs, "text", "doc_id", 16, parallelism=cpus
    )
    return clean_corpus(docs, pairs)


def _e3_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    # Token-window chunking with overlap: per-row arrays + one
    # posexplode, zero shuffle (plan-tested).
    from drugbankner_spark.operators.corpus import chunk_documents

    docs = load_table(spark, sf, "documents")
    return chunk_documents(docs, chunk_tokens=16, overlap=4)


def _e1_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    # Benchmark decontamination: flag train docs sharing any 8-gram with
    # the benchmark slice (docs with doc_id % 40 == 0 stand in for an
    # eval set).
    from drugbankner_spark.operators.corpus import decontaminate

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    return decontaminate(docs, bench, n=8)


def _e2_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    # E2 support op: per-label mean-pooled centroid (IVF coarse
    # quantizer / class prototype), long format for stable value-hashes.
    from drugbankner_spark.operators.similarity import label_centroids

    return label_centroids(load_table(spark, sf, "embeddings"))


def _e1_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    # E1 pairs → CLUSTERS: connected components over the MinHash band
    # graph (min-label propagation; see operators/graph.py). The oracle
    # recomputes the same fixpoint with a recursive CTE.
    from drugbankner_spark.operators import dedup as D
    from drugbankner_spark.operators.graph import near_dup_clusters

    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_band_pairs_rowwise(docs, "text", "doc_id", 16)
    return near_dup_clusters(docs, pairs, "doc_id")


def _e1_dup_clusters_star(spark: SparkSession, sf: str) -> DataFrame:
    # Same clustering via the O(log n)-round large-star/small-star
    # algorithm — labels are the component minima either way, so the
    # e1_dup_clusters oracle applies unchanged. Proves the adversarial-
    # graph path end to end, not just on synthetic chains.
    from drugbankner_spark.operators import dedup as D
    from drugbankner_spark.operators.graph import connected_components_star

    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_band_pairs_rowwise(docs, "text", "doc_id", 16)
    comp = connected_components_star(pairs, "id_a", "id_b")
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
            F.col("component").isNull().alias("is_singleton"),
        )
    )


def _t_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    # Temporal engine extra: backward-inclusive as-of join — each
    # purchase picks up the user's most recent click at-or-before it
    # (DuckDB ASOF LEFT JOIN is the oracle). Right side pre-aggregated
    # to one row per (user, ts) — the as-of contract.
    from drugbankner_spark.operators.temporal import asof_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return asof_join(purchases, clicks, on="user_id", left_ts="ts")


def _t_range_join(spark: SparkSession, sf: str) -> DataFrame:
    # Temporal engine extra: interval containment as a binned EQUI join
    # (purchases within 2h of the same user's signup) — avoids the
    # BroadcastNestedLoopJoin a raw inequality join would plan.
    from drugbankner_spark.operators.temporal import range_join_binned

    ev = load_table(spark, sf, "events")
    points = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    intervals = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("event_id").alias("signup_id"),
    )
    return range_join_binned(
        points, intervals, "user_id", "ts", "start_ts", "end_ts", 3600
    )


def _e3_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.bpe_token_stats(load_table(spark, sf, "documents"))


def _e3_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.quality_score(load_table(spark, sf, "documents"))


def _e3_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.predict_language(load_table(spark, sf, "documents"), spark)


def _e3_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.doc_fingerprint(load_table(spark, sf, "documents"))


def _e5_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    # Heavy-hitter profile over the orders fact's customer key — the
    # measurement that decides plain join vs AQE skew vs salted_join.
    from drugbankner_spark.operators import scale as SC

    return SC.key_skew_profile(
        load_table(spark, sf, "orders"), "o_custkey", top_n=20, hot_share=0.0005
    )


def _e3_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.tfidf_scores(load_table(spark, sf, "documents"))


def _e1_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Incremental-ingest dedup: corpus = single-digit sources; the
    # arriving batch re-ingests corpus content under new ids (must be
    # anti-joined away) and brings each new document twice (the
    # within-batch min-id survivor must win).
    from drugbankner_spark.operators import dedup as D

    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("source").rlike("^src[0-9]$"))
    fresh = docs.filter(F.col("source").rlike("^src1[0-9]$"))

    def shifted(df: DataFrame, k: int) -> DataFrame:
        return df.withColumn("doc_id", F.col("doc_id") + k)

    batch = (
        shifted(fresh, 100000)
        .unionByName(shifted(fresh, 200000))
        .unionByName(shifted(corpus, 300000))
    )
    return D.incremental_exact_dedup(batch, corpus)


def _e3_repetition(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.repetition_stats(load_table(spark, sf, "documents"))


def _e3_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import textanalysis as TA

    return TA.redact_pii(load_table(spark, sf, "documents"))


def _e4_media_metadata(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.operators import multimodal as MM

    docs = load_table(spark, sf, "documents")
    return MM.media_metadata(MM.documents_as_media(docs))


def _e4_container_probe(spark: SparkSession, sf: str) -> DataFrame:
    # REAL MP3 + MP4 container layers under an exact oracle (round 5
    # late): per doc, synthesize an MPEG-audio stream (1+doc_id%20
    # Layer-III frames; every third doc alternates 128/160 kbps → VBR)
    # and a single-track MP4 (duration/dims derived from doc_id), then
    # parse both back with the in-repo framing/box walkers
    # (functions/mp3_codec.py, functions/mp4_codec.py). The oracle
    # replicates the derivation arithmetic in SQL without touching
    # bytes — a hash match proves encode→walk round-trips both
    # containers bit-exactly (duration_ms = round(n·1152/44.1k·1000)
    # is never a .5 case: 108n ≡ 441 (mod 882) has no solution).
    import pandas as _pd

    from drugbankner_spark.functions import mp3_codec as mp3
    from drugbankner_spark.functions import mp4_codec as mp4

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("mp3_frames", T.LongType()),
        T.StructField("mp3_duration_ms", T.LongType()),
        T.StructField("mp3_vbr", T.BooleanType()),
        T.StructField("mp3_tag_bytes", T.LongType()),
        T.StructField("mp4_duration_ms", T.LongType()),
        T.StructField("mp4_width", T.LongType()),
        T.StructField("mp4_height", T.LongType()),
        T.StructField("mp4_samples", T.LongType()),
        T.StructField("mp4_codec", T.StringType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 1 + did % 20
                rates = (
                    [128 if i % 2 == 0 else 160 for i in range(n)]
                    if did % 3 == 0 else [128] * n
                )
                audio = mp3.encode_mp3(
                    bitrate_kbps=rates, n_frames=n,
                    id3v2_payload=bytes(did % 64), id3v1=(did % 2 == 0),
                )
                ainfo = mp3.mp3_info(audio)
                video = mp4.encode_mp4(
                    duration_ms=100 * (1 + did % 50),
                    width=16 * (1 + did % 8), height=16 * (1 + did % 5),
                    n_samples=1 + did % 30,
                    mvhd_v1=(did % 5 == 0),
                )
                vinfo = mp4.mp4_info(video)
                (track,) = vinfo["tracks"]
                rows.append((
                    did, ainfo["n_frames"], ainfo["duration_ms"],
                    ainfo["vbr"], ainfo["id3v2_bytes"],
                    vinfo["duration_ms"], track["width"],
                    track["height"], track["n_samples"], track["codec"],
                ))
            yield _pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields],
            )

    docs = load_table(spark, sf, "documents").select("doc_id")
    return docs.mapInPandas(run, out_schema)


def _e4_wav_decode(spark: SparkSession, sf: str) -> DataFrame:
    # REAL stdlib WAV codec under the driver: each embedding's floats
    # become 16-bit PCM samples, encoded to a real WAV and decoded back;
    # the oracle replicates the (floor-based, engine-portable)
    # quantization arithmetic on the raw arrays without touching WAV —
    # a hash match proves the RIFF/PCM encode→decode round-trip.
    import pandas as _pd

    from drugbankner_spark.functions import wav_codec as wav

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak_q", T.LongType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                samples = [float(v) for v in vec]
                a = wav.decode_wav(wav.encode_wav(samples, 16_000, 1))
                # peak × 32768 is the EXACT max |quantized sample| (an
                # integer both engines agree on bit-for-bit; a rounded
                # float peak would tie-break differently across engines
                # since samples are k/32768 — finite decimals)
                rows.append((
                    int(vid), a["n_frames"], a["sample_rate"],
                    round(a["rms"], 6), int(round(a["peak"] * 32768)),
                ))
            yield _pd.DataFrame(
                rows,
                columns=["vec_id", "n_frames", "sample_rate", "rms",
                         "peak_q"],
            )

    return emb.mapInPandas(run, out_schema)


def _e4_image_hashes(spark: SparkSession, sf: str) -> DataFrame:
    # Perceptual-hash pipeline on real PNGs synthesized from doc bytes:
    # encode → aHash/dHash from decoded pixels. Hash bit patterns are
    # not SQL-expressible → rows-only check; goldens live in
    # tests/test_png_codec.py.
    from drugbankner_spark.functions import png_codec as png
    from drugbankner_spark.operators import multimodal as MM

    # deterministic subset — limit() without sort is partitioning-
    # dependent (ADVICE r04), a key predicate is not
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def encode(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                w = 32
                h = max(1, -(-len(data) // w))
                padded = data + b"\x00" * (w * h - len(data))
                p = png.encode_png(padded, w, h, 1)
                rows.append((int(did), p, "image/png", len(p)))
            yield _pd.DataFrame(
                rows, columns=["media_id", "payload", "mime_type", "n_bytes"]
            )

    media = docs.select("doc_id", "text").mapInPandas(encode, out_schema)
    return MM.image_hashes(media)


def _e4_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    # numpy-FFT spectral features over WAVs synthesized from embedding
    # floats — rows-only (FFT magnitudes aren't SQL-expressible);
    # frequency-detection goldens live in tests/test_wav_codec.py.
    from drugbankner_spark.functions import wav_codec as wav
    from drugbankner_spark.operators import multimodal as MM

    # deterministic subset (ADVICE r04 — see _e4_image_hashes)
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def encode(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                p = wav.encode_wav([float(v) for v in vec], 16_000, 1)
                rows.append((int(vid), p, "audio/wav", len(p)))
            yield _pd.DataFrame(
                rows, columns=["media_id", "payload", "mime_type", "n_bytes"]
            )

    media = emb.select("vec_id", "embedding").mapInPandas(encode, out_schema)
    return MM.audio_features(media)


def _e4_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    # REAL stdlib PNG codec under the driver: pack each doc's UTF-8
    # bytes into a grayscale PNG, decode it back, digest the recovered
    # bytes. The oracle digests the ORIGINAL bytes without touching PNG
    # — a hash match proves the encode→decode round-trip is lossless.
    from drugbankner_spark.operators import multimodal as MM

    docs = load_table(spark, sf, "documents")
    return MM.png_roundtrip_digest(MM.documents_as_media(docs))


# ---------------------------------------------------------------------------
# E6: windowed event aggregations (batch kernels; the streaming wrappers
# run the identical plans — tests/test_streaming.py asserts equality).
# ---------------------------------------------------------------------------

def _e6_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.streaming.windows import tumbling_counts

    return tumbling_counts(load_table(spark, sf, "events"))


def _e6_sliding(spark: SparkSession, sf: str) -> DataFrame:
    from drugbankner_spark.streaming.windows import sliding_counts

    return sliding_counts(load_table(spark, sf, "events"))


def _e6_shape_suite(t: DataFrame, s: DataFrame) -> DataFrame:
    """Shared suite shape: tumbling + sliding results tagged and unioned."""
    t = t.select(
        F.lit("tumbling").alias("kind"),
        "window_start",
        (F.col("window_start") + F.expr("INTERVAL 5 MINUTES")).alias("window_end"),
        F.col("event_type").alias("grp"),
        "n_events", "sum_value",
    )
    s = s.select(
        F.lit("sliding").alias("kind"),
        "window_start", "window_end",
        F.lit(None).cast("string").alias("grp"),
        "n_events", "sum_value",
    )
    return t.unionByName(s)


def _e6_windows_batch(spark: SparkSession, sf: str) -> DataFrame:
    # E6 tumbling + sliding consolidated: both window kinds in one
    # union, tagged — same two hash aggregations, one result table.
    from drugbankner_spark.streaming.windows import sliding_counts, tumbling_counts

    events = load_table(spark, sf, "events")
    return _e6_shape_suite(tumbling_counts(events), sliding_counts(events))


#: Normalized micro-batch copies of the events table, keyed by
#: (applicationId, sf dir) — the readStream file source for the e6
#: streaming queries (applicationId, not id(spark): see _LSH_INDEX).
_STREAM_SRC: dict[tuple[str, str], str] = {}
_STREAM_SEQ = __import__("itertools").count()


def _stream_state_width(spark: SparkSession, sf: str) -> int | None:
    """Scale-adaptive state-store width for the bounded event-stream
    replays (round 16, guide §2.2/§5): streaming aggregations cannot
    use AQE coalescing, so the batch-sized session shuffle width
    over-partitions a small replay into that many state stores, each
    paying per-batch setup+commit (measured ~0.3 s of the sessionize
    stream's 1.4 s at sf0.1 under 32 stores). Width derives from the
    INPUT size only (never the core count — the driver benches at two
    core counts); above the session default the estimate returns None
    and the default stands, so at scale this never fires. Only passed
    to partitioning-independent aggregation faces."""
    from drugbankner_spark.tables import est_plan_bytes

    b = est_plan_bytes(load_table(spark, sf, "events"))
    if b is None or b <= 0:
        return None
    width = max(4, -(-b // (32 << 20)))  # one store per ~32 MB
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return int(width) if width < default else None


def _events_stream_dir(spark: SparkSession, sf: str) -> str:
    import tempfile

    key = (spark.sparkContext.applicationId, sf)
    if key not in _STREAM_SRC:
        d = tempfile.mkdtemp(prefix="events_stream_")
        load_table(spark, sf, "events").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        _STREAM_SRC[key] = d
    return _STREAM_SRC[key]


def _e6_windows(spark: SparkSession, sf: str) -> DataFrame:
    # The DRIVER-FACING form runs end-to-end through Structured
    # Streaming (VERDICT r02 next #8): readStream over the events files
    # (two micro-batch chunks) → watermark → the SAME window kernels →
    # memory sink via trigger(availableNow). Two streaming queries (one
    # aggregation each — Spark disallows two aggs in one streaming
    # query), unioned after completion. The result is identical to the
    # batch twin (_e6_windows_batch, kept pytest-oracled), so the
    # oracle is unchanged — CORRECTNESS hash-checks that the streaming
    # wrapper reproduces the batch answer under the driver's harness.
    from drugbankner_spark.streaming import streams as S

    d = _events_stream_dir(spark, sf)
    n = next(_STREAM_SEQ)
    w = _stream_state_width(spark, sf)
    t = S.run_to_memory(
        S.tumbling_stream(S.read_event_stream(spark, d)),
        f"e6_stream_t_{n}", output_mode="complete", state_partitions=w,
    )
    s = S.run_to_memory(
        S.sliding_stream(S.read_event_stream(spark, d)),
        f"e6_stream_s_{n}", output_mode="complete", state_partitions=w,
    )
    return _e6_shape_suite(t, s)


def _e6_sessionize_batch(spark: SparkSession, sf: str) -> DataFrame:
    # Batch twin of _e6_sessionize (pytest-oracled; bench times THIS
    # under the e6_sessionize name for round-over-round comparability —
    # r1-r3 benches measured the kernel, and the streaming face's fixed
    # micro-batch setup cost is timed separately as e6_sessionize_stream).
    from drugbankner_spark.streaming.windows import session_windows

    return session_windows(load_table(spark, sf, "events"))


def _e6_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    # DRIVER-FACING form runs through Structured Streaming like
    # _e6_windows (VERDICT r03 next #4): readStream over the events
    # files → watermark → the SAME session_window kernel → memory sink
    # via trigger(availableNow). Complete mode: each epoch re-emits the
    # full session table, so the final result equals the batch twin
    # (session_windows over the static table — stream==batch is also
    # pinned in tests/test_streaming.py) and the oracle is unchanged.
    from drugbankner_spark.streaming import streams as S

    d = _events_stream_dir(spark, sf)
    n = next(_STREAM_SEQ)
    return S.run_to_memory(
        S.session_stream(S.read_event_stream(spark, d)),
        f"e6_stream_sess_{n}", output_mode="complete",
        state_partitions=_stream_state_width(spark, sf),
    )


def _e6_sessionize_closed(spark: SparkSession, sf: str) -> DataFrame:
    # The PRODUCTION sessionization face (VERDICT r04 next #3): append
    # mode + watermark — each micro-batch emits only sessions closed
    # below the watermark and evicts their state (bounded state, unlike
    # the complete-mode parity demonstration _e6_sessionize). Over the
    # finite driver input this equals the batch session table restricted
    # to session_end <= max(ts) - 10 minutes — exactly what the oracle
    # computes, so the closed-subset contract is hash-checked.
    from drugbankner_spark.streaming import streams as S

    d = _events_stream_dir(spark, sf)
    n = next(_STREAM_SEQ)
    return S.run_to_memory(
        S.closed_sessions_stream(
            S.read_event_stream(spark, d, watermark="10 minutes")
        ),
        f"e6_stream_closed_{n}", output_mode="append",
        state_partitions=_stream_state_width(spark, sf),
    )


def _e5_agreement(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: chance-corrected agreement (multi-class MCC + Cohen's
    # kappa) over the same residue-perturbed label pairs as
    # e5_class_report — integer numerators, sqrt-only MCC denominator,
    # one division each.
    from drugbankner_spark.operators.evals import agreement_metrics

    docs = load_table(spark, sf, "documents")
    preds = docs.select(
        F.col("lang").alias("predicted"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("en"))
        .otherwise(F.col("lang")).alias("gold"),
    )
    return agreement_metrics(preds)


def _e3_fertility(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: tokenizer fertility audit over the frozen-vocab
    # WordPiece apply — tokens per word and chars per token, the
    # standard vocab-fit signal; exact divisions only, oracle composed
    # from the e3_wordpiece_apply replication.
    from drugbankner_spark.operators.textanalysis import (
        tokenizer_fertility,
    )

    docs = load_table(spark, sf, "documents")
    return tokenizer_fertility(
        _e3_wordpiece_apply(spark, sf), docs
    )


def _e6_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: the STREAM-STREAM range join under the driver — each
    # in-flight purchase joins the same user's clicks from the
    # preceding 4 hours (watermark + range condition bound the join
    # state per side). Long watermark over the finite input ⇒ equals
    # the batch range join, which is exactly what the oracle computes;
    # timestamps ride as unix microseconds.
    from drugbankner_spark.streaming import streams as S

    d = _events_stream_dir(spark, sf)
    n = next(_STREAM_SEQ)
    st = S.read_event_stream(spark, d, watermark="400 days")
    left = st.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = st.filter(F.col("event_type") == "click")
    out = S.run_to_memory(
        S.stream_interval_join(left, right, lookback="4 hours"),
        f"e6_stream_ivj_{n}", output_mode="append",
    )
    return out.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"), "value",
        F.unix_micros("r_ts").alias("r_ts_us"), "r_value",
    )


def _e6_props_json(spark: SparkSession, sf: str) -> DataFrame:
    # Stateless transformation under readStream: append mode, no agg —
    # each micro-batch emits its parsed rows; the union over batches
    # equals the batch answer (same oracle).
    from drugbankner_spark.streaming import streams as S

    d = _events_stream_dir(spark, sf)
    n = next(_STREAM_SEQ)
    return S.run_to_memory(
        S.parse_props_stream(S.read_event_stream(spark, d)),
        f"e6_stream_props_{n}", output_mode="append",
    )


def _e1_crossdoc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Cross-document substring removal (round 5, Lee et al.): every
    # 8-gram appearing in >1 documents is cut from all but the
    # minimum-id keeper document. The md5 gram-key kernel makes the
    # DuckDB oracle (which joins on the raw gram string) bit-identical.
    from drugbankner_spark.operators.corpus import crossdoc_span_dedup

    docs = load_table(spark, sf, "documents")
    return crossdoc_span_dedup(docs, n=8, kernel="md5")


def _e1_bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    # Join-free Bloom-bitmap decontamination (round 5): same benchmark
    # slice as e1_decontaminate, but membership comes from a broadcast
    # 128 KiB bitmap probed in-scan instead of a shingle join. The
    # oracle recomputes the md5-derived bit positions, so flags match
    # EXACTLY — false positives included.
    from drugbankner_spark.operators.corpus import bloom_decontaminate

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    return bloom_decontaminate(docs, bench, n=8, m_bits=1 << 20, k=3)


def _e3_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic global training-order shuffle (round 5 late):
    # hash-range sharding + per-shard position — the (shard, pos)
    # composite replays one fixed permutation with no global sort.
    from drugbankner_spark.operators.sampling import training_shuffle_shards

    docs = load_table(spark, sf, "documents")
    return training_shuffle_shards(
        docs, "doc_id", n_shards=8, seed="epoch0"
    ).select("doc_id", "shard", "pos_in_shard")


def _e1_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # SemDeDup-shape pruning (round 5 late): sign-LSH cosine pairs →
    # connected components → min-id survivor. Same permissive
    # (threshold, planes) as e1_embedding_near_dup — the synthetic
    # embeddings have no true near-dups (max cosine ≈0.51), so the
    # cluster structure, not the production threshold, is what the
    # oracle hash-checks; planted-dup recall lives in pytest.
    from drugbankner_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf, "embeddings")
    return semantic_dedup(emb, threshold=0.4, num_planes=4)


def _e3_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    # zlib redundancy signal (round 5 late) — rows-only: zlib isn't
    # SQL-expressible in DuckDB; determinism + separation goldens live
    # in tests/test_ext_operators.py.
    from drugbankner_spark.operators.textanalysis import compression_ratio

    return compression_ratio(load_table(spark, sf, "documents"))


def _e5_countmin_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Count-min sketch point queries (round 5): token frequencies over
    # the corpus compressed into 4x1024 counter cells, then estimated
    # for the deterministic probe set (tokens starting with 'a'). The
    # md5 cell hashing is replicated in DuckDB, so the ESTIMATES —
    # collisions and all — hash-match. Tolerance vs exact counts is
    # covered in tests/test_ext_operators.py.
    from drugbankner_spark.operators.sketches import cm_build, cm_estimate

    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    sketch = cm_build(toks, "tok", width=1024, depth=4)
    items = toks.filter(F.col("tok").startswith("a")).distinct()
    return cm_estimate(sketch, items, "tok", width=1024, depth=4).select(
        "tok", F.col("cm_count").cast("long").alias("cm_count")
    )


def _e5_weighted_upsample(spark: SparkSession, sf: str) -> DataFrame:
    # Fractional-epoch domain replication (round 5 late): en sees 2.3
    # epochs (every doc twice + a deterministic hash-chosen 30% a third
    # time), de a deterministic half-epoch, zh drops, unlisted langs
    # (es/fr) pass through at 1 — the mixture-EXECUTION step after
    # temperature_weights picks the recipe. Zero shuffle (CASE
    # projection + explode); thresholds are integer bucket counts, so
    # the DuckDB oracle replays the draw bit-for-bit.
    from drugbankner_spark.operators.sampling import weighted_upsample

    docs = load_table(spark, sf, "documents")
    return weighted_upsample(
        docs, "lang", "doc_id", {"en": 2.3, "de": 0.5, "zh": 0.0},
    ).select("doc_id", "lang", "copy")


def _e3_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    # Power-of-two length bucketing (round 5 late) — the dynamic-
    # batching prequel to pack_sequences: pad within a magnitude
    # bucket, not to the corpus max. Integer log2 via base-2 digit
    # count (no float log), so bucket edges are engine-exact.
    from drugbankner_spark.operators.corpus import length_buckets

    return length_buckets(load_table(spark, sf, "documents"))


def _e2_int8_quantize(spark: SparkSession, sf: str) -> DataFrame:
    # Symmetric int8 scalar quantization (round 5 late): per-vector
    # max-abs scale + floor-half-up codes — the 4x serving-memory rung
    # below PQ's 64x. Long (vec_id, pos, code) view + scale as an
    # exact floor(1e9*scale) integer so the hash never meets a float.
    from drugbankner_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    emb = load_table(spark, sf, "embeddings")
    q = quantize_embeddings_int8(emb)
    return q.select(
        "vec_id",
        F.floor(F.col("scale") * 1e9).cast("long").alias("scale_e9"),
        F.posexplode("codes").alias("pos", "code"),
    ).select("vec_id", "scale_e9", F.col("pos").cast("long"), "code")


def _e3_ngram_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Corpus boilerplate probe (round 5 late): exact top-10 token
    # trigrams per language — the head of this list IS the shared
    # template text near-dup thresholds miss. One map-side-combinable
    # agg over exploded grams; the window runs on (lang × distinct
    # gram) counts, never documents.
    from drugbankner_spark.operators.textanalysis import ngram_topk

    docs = load_table(spark, sf, "documents")
    out = ngram_topk(docs, "lang", "text", n=3, k=10)
    return out.select(
        "lang", "gram", F.col("n_occurrences").cast("long"),
        F.col("rank").cast("long"),
    )


def _e3_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    # Okapi BM25 lexical retrieval (round 5 late): corpus explodes
    # once, filters to the query's literal term list at the scan, two
    # map-side aggs + 1-row N/avgdl build side; deterministic top-k on
    # (rounded score desc, doc_id).
    from drugbankner_spark.operators.textanalysis import bm25_topk

    docs = load_table(spark, sf, "documents")
    return bm25_topk(docs, ["spark", "window", "hash"], k=25)


def _e3_ppl_buckets(spark: SparkSession, sf: str) -> DataFrame:
    # CCNet head/middle/tail split (round 5 late): char-LM
    # self-perplexity → exact tercile cuts (1-row broadcast build
    # side) → threshold bucketing. No global sort, no ntile window.
    from drugbankner_spark.caching import shared_persist
    from drugbankner_spark.operators.textanalysis import (
        _char_ngram_pairs,
        char_lm_logprob,
        ppl_buckets,
        train_char_lm,
    )

    docs = load_table(spark, sf, "documents")
    # same fused single-explode self-perplexity shape as _e3_charlm
    # (round 15) — see the rationale there
    occ = shared_persist(_char_ngram_pairs(docs, "text", "doc_id"))
    occ3 = occ.filter(F.length("g3") == 3).select(
        "doc_id", F.col("g3").alias("gram")
    )
    model = shared_persist(train_char_lm(
        docs, grams=occ3,
        ctx_grams=occ.select(F.col("g2").alias("gram")),
    ))
    return ppl_buckets(char_lm_logprob(docs, model, occ=occ3))


def _e3_unigram_tokens(spark: SparkSession, sf: str) -> DataFrame:
    # Unigram-LM (SentencePiece-style) tokenizer: train on the corpus,
    # tokenize the corpus. Rows-only by nature — EM probabilities are
    # iterative floats with no SQL twin; the algorithm is parity-tested
    # against an independent reference in tests/test_unigram.py.
    from drugbankner_spark.operators.unigram import (
        apply_unigram,
        train_unigram,
    )

    docs = load_table(spark, sf, "documents")
    model = train_unigram(
        docs, vocab_size=120, max_piece_len=6, seed_size=300,
    )
    toks = apply_unigram(docs, model)
    return toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct"),
    )


def _e6_funnel(spark: SparkSession, sf: str) -> DataFrame:
    # Ordered view→click→purchase funnel over the events log (round 6):
    # each step must occur STRICTLY AFTER the previous one; output per
    # user with progress depth + per-step first timestamps. k filtered
    # min-aggs joined on the entity key — no per-user event arrays.
    from drugbankner_spark.operators.temporal import funnel_analysis

    ev = load_table(spark, sf, "events")
    return funnel_analysis(ev, ["view", "click", "purchase"])


def _e5_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    # Weekly cohort retention triangle (round 6): users grouped by
    # first-activity week; per (cohort_week, weeks_since) the count of
    # active members.
    from drugbankner_spark.operators.temporal import cohort_retention

    ev = load_table(spark, sf, "events")
    return cohort_retention(ev, period="week")


def _e5_retrieval_metrics(spark: SparkSession, sf: str) -> DataFrame:
    # Retrieval-quality metrics (round 6): exact cosine top-5 over the
    # embeddings, judged against a label-match qrels set (same label =
    # relevant) — recall@5 + reciprocal rank per query. The metric
    # layer every ANN tuning loop needs beside ann_recall.
    from drugbankner_spark.operators import similarity as SIM
    from drugbankner_spark.operators.evals import retrieval_metrics

    emb = load_table(spark, sf, "embeddings")
    results = SIM.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5
    ).withColumnRenamed("neighbor_id", "doc_id")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "label"
    )
    qrels = q.join(
        emb.select(F.col("vec_id").alias("doc_id"), "label"), "label"
    ).filter(F.col("doc_id") != F.col("query_id")).select(
        "query_id", "doc_id"
    )
    return retrieval_metrics(results, qrels, k=5)


def _e1_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # SimHash banded near-dup pairs with exact Hamming verification
    # (round 6): 4×8-bit bands → candidate equi join → bit_count
    # filter ≤ 3. Pigeonhole makes recall exactly 1.0 at that radius.
    from drugbankner_spark.operators.dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf, "documents")
    return simhash_near_dup_pairs(docs)


def _e1_near_dup_recall(spark: SparkSession, sf: str) -> DataFrame:
    # Candidate-generation quality metric (round 6): banded-MinHash
    # pairs measured against exact n-gram Jaccard truth at 0.05 —
    # recall/precision as one row. The dedup twin of ann_recall; both
    # legs reuse already-driver-proven oracles.
    from drugbankner_spark.operators.dedup import near_dup_candidate_recall

    docs = load_table(spark, sf, "documents")
    cpus = int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "32"))
    return near_dup_candidate_recall(docs, parallelism=cpus)


def _e5_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    # CDC changelog compaction (round 6): the events log splits into a
    # compacted base snapshot (first half by event_id) and a changelog
    # (second half; 'error' events act as deletes) — per user the
    # latest record wins, deletes drop the key. One union + one
    # keyed window; last-writer ties break on event_id.
    from pyspark.sql import Window

    from drugbankner_spark.operators.temporal import apply_cdc

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    half = ev.filter(F.col("event_id") % 2 == 0)
    snapshot = half.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        ),
    ).filter("_rn = 1").drop("_rn")
    changes = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")),
    )
    return apply_cdc(
        snapshot, changes, "user_id", tiebreak_cols=["event_id"]
    )


def _e5_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    # nDCG@5 over GRADED relevance (round 6): exact cosine top-5 judged
    # by a graded qrels dim (rel = 3 - |label distance|, floor 0) — the
    # third retrieval metric beside recall@k/MRR.
    from drugbankner_spark.operators import similarity as SIM
    from drugbankner_spark.operators.evals import ndcg_at_k

    emb = load_table(spark, sf, "embeddings")
    results = SIM.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5
    ).withColumnRenamed("neighbor_id", "doc_id")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
    )
    qrels = q.crossJoin(
        emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("label").alias("_dl"))
    ).filter(F.col("doc_id") != F.col("query_id")).select(
        "query_id", "doc_id",
        F.greatest(
            F.lit(0), F.lit(3) - F.abs(F.col("_ql") - F.col("_dl"))
        ).alias("rel"),
    )
    return ndcg_at_k(results, qrels, k=5)


def _e5_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    # DSIR importance weights (round 6, Xie et al. 2023): hashed
    # unigram+bigram log-likelihood ratio of target (lang='en') vs the
    # raw pool over 64 buckets — the published data-selection method as
    # one broadcast join + per-doc agg.
    from drugbankner_spark.operators.mlquality import dsir_log_weights

    docs = load_table(spark, sf, "documents")
    # target = a predicate-slice of raw → single-pass fit (round 15):
    # both bucket models fall out of one tokenize+hash scan; results
    # bit-identical (same integer counts, same log expression tree)
    return dsir_log_weights(
        docs, None, dim=64, target_pred=F.col("lang") == "en"
    )


def _t_resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    # Fixed-step resample of events per type (6 h buckets) with
    # explicit gaps, LOCF, and linear interpolation (round 6) — the
    # time_bucket_gapfill/locf/interpolate family as one grid explode +
    # left join + two window passes.
    from drugbankner_spark.operators.timeseries import resample_gapfill

    return resample_gapfill(
        load_table(spark, sf, "events"), ["event_type"],
        step_seconds=21600,
    )


def _t_ewma(spark: SparkSession, sf: str) -> DataFrame:
    # Finite-window EWMA (α=0.5, span=8) of the 6 h bucketed per-type
    # average — the recursive smoother re-expressed as a bounded
    # contribution explode + one hash agg.
    from drugbankner_spark.operators.timeseries import ewma_grid

    return ewma_grid(
        load_table(spark, sf, "events"), ["event_type"],
        step_seconds=21600, alpha=0.5, span=8,
    )


def _t_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    # Trailing z-score anomaly flags (lookback 8 buckets, |z|>3) on the
    # same bucketed series — the monitoring face of the family.
    from drugbankner_spark.operators.timeseries import detect_anomalies

    return detect_anomalies(
        load_table(spark, sf, "events"), ["event_type"],
        step_seconds=21600, lookback=8, z_threshold=3.0,
    )


def _e5_dp_quantile(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: DP quantile release — one Laplace histogram over the
    # PUBLIC domain [0, 500) in 50 bins (width exactly 10.0), then
    # quantiles read off the noisy CDF as integer compares; all
    # post-processing, so the whole release costs the histogram's ε.
    from drugbankner_spark.operators.privacy import dp_quantiles

    return dp_quantiles(
        load_table(spark, sf, "events"), "value",
        lo=0.0, hi=500.0, n_bins=50,
        qs_permille=(250, 500, 750, 900),
        epsilon=0.5, salt="r9q",
    )


def _t_holt(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: Holt linear-trend smoothing to the final (level, trend)
    # + 1/2/3-step forecasts per event_type — one in-executor fold per
    # key over the sorted bucket array; the oracle replays the same
    # IEEE multiply/add sequence as a recursive CTE, so the doubles
    # are bit-identical with no rounding convention.
    from drugbankner_spark.operators.timeseries import holt_linear

    return holt_linear(
        load_table(spark, sf, "events"), ["event_type"],
        step_seconds=21600, alpha=0.5, beta=0.2, horizons=(1, 2, 3),
    )


def _t_acf(spark: SparkSession, sf: str) -> DataFrame:
    # Round 10: sample autocorrelation at lags 1..6 per event_type
    # over 6-hour buckets — the seasonality probe for the smoothing
    # family. Numerator/denominator are exact BIGINTs (centi-unit
    # floor-div bucket means clear x-bar by multiplying through by
    # n^2); acf is ONE IEEE division, so the oracle is exact.
    from drugbankner_spark.operators.timeseries import autocorrelation

    return autocorrelation(
        load_table(spark, sf, "events"), ["event_type"],
        step_seconds=21600, max_lag=6,
    )


def _e6_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # Round 10: the exact-oracle HyperLogLog — distinct users per
    # event_type from 256 deterministic md5-derived registers. The
    # harmonic sum is an exact BIGINT (sum 2^(33-M)); the estimate is
    # one literal/integer IEEE division — the first HLL whose sketch
    # AND estimate hash-match a SQL replay (the cm_build closure,
    # extended to distincts). Registers melt into the output so the
    # driver hash pins the full sketch state, not just the estimate.
    from drugbankner_spark.operators.sketches import (
        hll_exact_estimate,
        hll_exact_registers,
    )

    ev = load_table(spark, sf, "events")
    regs = hll_exact_registers(ev, ["event_type"], "user_id")
    est = hll_exact_estimate(regs, ["event_type"])
    return _union_all([
        regs.select(*_okv(
            "reg",
            F.concat_ws("§", F.col("event_type"),
                        F.col("reg_idx").cast("string")),
            v_num=F.col("reg_max").cast("double"),
        )),
        est.select(*_okv(
            "est", F.col("event_type"),
            F.concat_ws("§", F.col("n_zero_regs").cast("string"),
                        F.col("s_scaled").cast("string")),
            v_num=F.round(F.col("hll_estimate"), 6),
        )),
    ])


def _e5_chi2(spark: SparkSession, sf: str) -> DataFrame:
    # Round 10: chi-square feature selection — top-10 tokens per
    # language by presence/class dependence over the documents table.
    # Counts are exact BIGINTs; the statistic is a pinned-order double
    # expression (every IEEE step correctly rounded, so both engines
    # agree bit-for-bit); ties rank by token text.
    from drugbankner_spark.operators.textanalysis import (
        chi2_feature_selection,
    )

    return chi2_feature_selection(
        load_table(spark, sf, "documents"),
        text_col="text", label_col="lang", id_col="doc_id",
        min_df=5, top_k=10,
    ).select(
        "label", "token", "df_in_class", "df_token",
        F.round(F.col("chi2"), 6).alias("chi2"), "rank",
    )


def _e5_bleu(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: corpus-level BLEU-4 — prediction = the document with
    # every 7th token dropped (a deterministic "lossy decode"),
    # reference = the document itself, so every clipped precision is
    # a non-trivial exact fraction. One row out; the only
    # transcendental (exp of the brevity log-ratio) is left to the
    # caller per the float-parity law.
    from drugbankner_spark.operators.evals import bleu_corpus

    docs = load_table(spark, sf, "documents")
    toks = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")),
            " ",
        ),
        lambda x: x != "",
    )
    pairs = docs.select(
        F.array_join(
            F.filter(toks, lambda x, i: ((i + 1) % 7) != 0), " "
        ).alias("prediction"),
        F.col("text").alias("reference"),
    )
    return bleu_corpus(pairs)


def _t_cusum(spark: SparkSession, sf: str) -> DataFrame:
    # Round 9: two-sided CUSUM change detection on the same bucketed
    # series as t_anomaly — the closed-form window shape (running sum
    # minus clamped running min), BIGINT micro-unit arithmetic end to
    # end, so the oracle is exact with no float convention anywhere.
    from drugbankner_spark.operators.timeseries import cusum_changepoints

    return cusum_changepoints(
        load_table(spark, sf, "events"), ["event_type"],
        step_seconds=21600, slack_micro=0,
        threshold_permille=3000,
    )


def _e5_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    # k-anonymity / l-diversity release gate (round 6): equivalence
    # classes over (event_type, day), sensitive = user_id, k=5 — one
    # hash agg, at_risk flags classes a release would re-identify.
    from drugbankner_spark.operators.privacy import k_anonymity_report

    ev = load_table(spark, sf, "events").withColumn(
        "day_start",
        (F.floor(F.unix_timestamp(F.col("ts")) / 86400) * 86400).cast(
            "long"
        ),
    )
    return k_anonymity_report(
        ev, ["event_type", "day_start"], "user_id", k=5
    )


def _e1_boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    # Cross-doc boilerplate sentence removal (round 6, RefinedWeb-style
    # duplicated-line pass). The synthetic corpus has no natural
    # repeats, so a footer is PLANTED on every doc_id % 3 == 0 (the
    # e5_needle_inject pattern) and must vanish from all of them while
    # original sentences survive.
    from drugbankner_spark.operators.corpus import (
        strip_boilerplate_sentences,
    )

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(". All rights reserved")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return strip_boilerplate_sentences(docs, max_doc_count=2)


def _e6_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    # First-order Markov transitions between event types per user
    # (round 6) — one entity-keyed lag window + pair agg, row-normalized
    # over the bounded |states|² matrix.
    from drugbankner_spark.operators.temporal import transition_matrix

    return transition_matrix(load_table(spark, sf, "events"))


def _e6_top_paths(spark: SparkSession, sf: str) -> DataFrame:
    # Top-20 five-step user journey prefixes (round 6) — discovers the
    # orders funnel_analysis merely hypothesizes.
    from drugbankner_spark.operators.temporal import top_paths

    return top_paths(load_table(spark, sf, "events"), max_len=5, k=20)


def _j_jw_match(spark: SparkSession, sf: str) -> DataFrame:
    # Blocked Jaro–Winkler entity match (round 6): customers vs
    # deterministic variants (last two name chars swapped — a classic
    # transposition — for every third custkey). GENUINE cross-engine
    # kernel parity: the Arrow-batched Python kernel vs DuckDB's
    # built-in jaro_winkler_similarity (the e3_unicode_normalize
    # pattern). Bounded: left capped at custkey ≤ 300.
    from drugbankner_spark.functions.stringsim import jw_blocked_match

    cust = load_table(spark, sf, "customer").filter(
        F.col("c_custkey") <= 300
    ).select("c_custkey", "c_name")
    variants = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 2)"),
            F.reverse(F.expr("substring(c_name, length(c_name) - 1, 2)")),
        ).alias("v_name")
    )
    return jw_blocked_match(
        cust, variants, "c_name", "v_name",
        threshold=0.97, block_prefix=1,
    )


def _e3_gopher_rep(spark: SparkSession, sf: str) -> DataFrame:
    # Gopher §A1.1 repetition signals (round 6 late): line structure is
    # synthesized deterministically (every ' table ' becomes a line
    # break — replace() is left-to-right non-overlapping in BOTH
    # engines), then dup-line fractions and top/dup n-gram char masses
    # for n=2..10 are hash-checked cross-engine from ONE explode.
    from drugbankner_spark.operators.textanalysis import (
        gopher_repetition_signals,
    )

    docs = load_table(spark, sf, "documents")
    synth = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" table "),
                  F.lit("\n")).alias("text"),
    )
    return gopher_repetition_signals(synth)


def _e3_gopher_rep_hash(spark: SparkSession, sf: str) -> DataFrame:
    # production form of e3_gopher_rep: xxhash64 gram keys — the gram
    # TEXT never shuffles. No DuckDB oracle (no xxhash64 there);
    # output equality with the oracle form is pinned in pytest, and
    # bench times both so the shuffle-byte saving is measured, not
    # asserted.
    from drugbankner_spark.operators.textanalysis import (
        gopher_repetition_signals,
    )

    docs = load_table(spark, sf, "documents")
    synth = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" table "),
                  F.lit("\n")).alias("text"),
    )
    return gopher_repetition_signals(synth, key="hash")


def _e1_c4_filter(spark: SparkSession, sf: str) -> DataFrame:
    # C4 cleaning rules (round 6 late) over deterministically
    # synthesized pages: ' table ' -> '.\n' gives terminal-punct line
    # breaks, ' slow ' -> ' javascript ' plants the blocklist word,
    # ' end.' closes the last line, and every 7th doc gets a '{' (page
    # flag). Line keeps, ordered reassembly, and page flags all
    # hash-checked.
    from drugbankner_spark.operators.corpus import c4_filter

    docs = load_table(spark, sf, "documents")
    s1 = F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    s2 = F.replace(s1, F.lit(" slow "), F.lit(" javascript "))
    s3 = F.concat(s2, F.lit(" end."))
    s4 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(s3, F.lit(" {"))
    ).otherwise(s3)
    return c4_filter(docs.select("doc_id", s4.alias("text")))


def _e5_span_corrupt(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic T5 span corruption (round 6 late): hash-seeded
    # span starts/lengths, gaps-and-islands merge, sentinel rendering
    # of inputs/targets — every piece (md5 hash, window island ids,
    # ordered reassembly) replicated in SQL and hash-checked.
    from drugbankner_spark.operators.sft import span_corrupt

    docs = load_table(spark, sf, "documents")
    return span_corrupt(docs)


def _e3_skipgram(spark: SparkSession, sf: str) -> DataFrame:
    # word2vec skip-gram pair counts (round 6 late): symmetric
    # window-2 co-occurrence over the corpus in one explode + one
    # (center, context) agg; the oracle is a double-lateral
    # generate_series.
    from drugbankner_spark.operators.textanalysis import skipgram_counts

    docs = load_table(spark, sf, "documents")
    return skipgram_counts(docs, window=2)


def _e6_attribution(spark: SparkSession, sf: str) -> DataFrame:
    # Multi-touch attribution (round 6 late): purchases credited to
    # the ≤5 most recent touches since the previous purchase —
    # first/last/linear models in one row per touch, hash-checked.
    from drugbankner_spark.operators.temporal import attribution

    ev = load_table(spark, sf, "events")
    return attribution(ev, "purchase", lookback_events=5)


def _e6_transition_power(spark: SparkSession, sf: str) -> DataFrame:
    # Two-step Markov forecast (round 6 late): M^2 of the event
    # transition matrix via one relational matrix multiply over the
    # published 6dp probs.
    from drugbankner_spark.operators.temporal import (
        transition_matrix,
        transition_power,
    )

    ev = load_table(spark, sf, "events")
    return transition_power(transition_matrix(ev), k=2)


def _e6_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    # Market-basket co-occurrence + lift (round 6 late): unordered
    # event-type pairs per user basket — the order-free complement of
    # e6_transition_matrix; exact integer supports, 6dp ratios.
    from drugbankner_spark.operators.temporal import cooccurrence_lift

    ev = load_table(spark, sf, "events")
    return cooccurrence_lift(ev, min_support=2)


def _e5_group_ols(spark: SparkSession, sf: str) -> DataFrame:
    # Per-group closed-form OLS (round 6 late): quantity trend over
    # ship-date day index per returnflag. x and y are INTEGER-valued on
    # purpose — every sum stays below 2^53, so the float sums are
    # EXACT and order-independent and the ratios are bitwise
    # deterministic (no rounding-boundary risk, unlike summing raw
    # prices).
    from drugbankner_spark.operators.relational import group_ols

    li = load_table(spark, sf, "lineitem")
    pts = li.select(
        "l_returnflag",
        F.datediff(F.col("l_shipdate"), F.lit("1996-01-01"))
        .alias("x"),
        F.col("l_quantity").alias("y"),
    )
    return group_ols(pts, "x", "y", ["l_returnflag"])


def _e5_profile(spark: SparkSession, sf: str) -> DataFrame:
    # Deequ-style column profile (round 6 late) over the documents
    # dims: one melt + one (column, value) agg + one window — exact
    # counts, lexicographic min/max on the canonical string form,
    # deterministic mode.
    from drugbankner_spark.operators.checks import profile_columns

    docs = load_table(spark, sf, "documents")
    return profile_columns(docs, ["doc_id", "lang", "source", "n_chars"])


def _e5_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic pseudonymization (round 6 late): customer names
    # replaced by salted sha256 prefixes — join-preserving, exact
    # cross-engine (both engines emit lowercase hex sha256).
    from drugbankner_spark.operators.privacy import tokenize_columns

    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return tokenize_columns(cust, ["c_name"], salt="release-2026")


def _e5_calibration(spark: SparkSession, sf: str) -> DataFrame:
    # ECE / reliability diagram (round 6 late): synthetic predictions
    # in exact integer arithmetic — confidence (doc_id·7919 mod 1001)
    # /1000 (hits 1.0: pins the last-bin rule), correctness correlated
    # with confidence via a second residue — binned report + weighted
    # ECE hash-checked.
    from drugbankner_spark.operators.evals import calibration_report

    docs = load_table(spark, sf, "documents")
    conf = ((F.col("doc_id") * 7919) % 1001) / F.lit(1000.0)
    correct = (
        ((F.col("doc_id") * 104729) % 1000)
        < ((F.col("doc_id") * 7919) % 1001) * 0.8
    ).cast("int")
    preds = docs.select(conf.alias("confidence"),
                        correct.alias("correct"))
    return calibration_report(preds, n_bins=10)


def _e5_kfold(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic k-fold assignment (round 6 late): md5-bucket mod k
    # — stable across engines/partitionings; the oracle recomputes the
    # same hash chain.
    from drugbankner_spark.operators.sampling import kfold_assign

    docs = load_table(spark, sf, "documents")
    return kfold_assign(docs, "doc_id", k=5).select("doc_id", "fold")


def _synth_pages(docs: DataFrame):
    # shared synthesized web-page corpus for the C4/PII/curation
    # entries: deterministic PII appended by doc_id residue, then line
    # structure (' table ' -> '.\n'), the javascript blocklist word,
    # a closing ' end.' line, and a '{' page flag on every 7th doc.
    d = F.col("doc_id")
    extra = F.concat(
        F.when(d % 3 == 0, F.concat(
            F.lit(" u"), d.cast("string"), F.lit("@ex.io")
        )).otherwise(F.lit("")),
        F.when(d % 4 == 1, F.concat(
            F.lit(" at 10."), (d % 256).cast("string"), F.lit(".3.7")
        )).otherwise(F.lit("")),
        F.when(d % 5 == 2, F.concat(
            F.lit(" ssn 123-45-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        )).otherwise(F.lit("")),
        F.when(d % 7 == 3, F.lit(" call +1 555 123 4567"))
        .otherwise(F.lit("")),
    )
    s0 = F.concat(F.col("text"), extra)
    s1 = F.replace(s0, F.lit(" table "), F.lit(".\n"))
    s2 = F.replace(s1, F.lit(" slow "), F.lit(" javascript "))
    s3 = F.concat(s2, F.lit(" end."))
    s4 = F.when(d % 7 == 0, F.concat(s3, F.lit(" {"))).otherwise(s3)
    return docs.select("doc_id", s4.alias("text"))


def _pipeline_curate_corpus(spark: SparkSession, sf: str) -> DataFrame:
    # Second flagship composition (round 6 late): the FineWeb/Dolma
    # curation order — C4 line rules -> PII scrub -> Gopher rules ->
    # exact dedup — end to end over synthesized pages, every stage's
    # verdict hash-checked in one row per document.
    from drugbankner_spark.operators.corpus import curate_corpus

    docs = load_table(spark, sf, "documents")
    return curate_corpus(_synth_pages(docs))


def _pipeline_pretrain_prep(spark: SparkSession, sf: str) -> DataFrame:
    # Third flagship composition (round 7, round-8 pool): curation
    # chain → sequence packing of the SURVIVING scrubbed corpus — the
    # last two stages a training run consumes, one lazy plan, the
    # composed oracle checking the stage hand-off end to end.
    from drugbankner_spark.operators.corpus import pretrain_prep

    docs = load_table(spark, sf, "documents")
    return pretrain_prep(_synth_pages(docs), seq_len=512)


def _e1_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    # PII scrub (round 6 late): deterministic synthetic PII — emails,
    # IPs, SSNs, phones keyed off doc_id residues so docs carry
    # different mixes — then the sequential redaction with per-kind
    # counts, hash-checked against RE2 (DuckDB) running the SAME
    # patterns: genuine cross-dialect regex parity.
    from drugbankner_spark.operators.pii import pii_scrub

    docs = load_table(spark, sf, "documents")
    d = F.col("doc_id")
    extra = F.concat(
        F.when(d % 3 == 0, F.concat(
            F.lit(" u"), d.cast("string"), F.lit("@ex.io")
        )).otherwise(F.lit("")),
        F.when(d % 4 == 1, F.concat(
            F.lit(" at 10."), (d % 256).cast("string"), F.lit(".3.7")
        )).otherwise(F.lit("")),
        F.when(d % 5 == 2, F.concat(
            F.lit(" ssn 123-45-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        )).otherwise(F.lit("")),
        F.when(d % 7 == 3, F.lit(" call +1 555 123 4567"))
        .otherwise(F.lit("")),
    )
    synth = docs.select(
        "doc_id", F.concat(F.col("text"), extra).alias("text")
    )
    return pii_scrub(synth)


def _er_resolve(spark: SparkSession, sf: str) -> DataFrame:
    # Composed entity resolution (round 6 late): block -> Jaro-Winkler
    # -> threshold -> connected components -> canonical rep, end to
    # end in ONE hash-checked row (the Splink/Dedupe skeleton).
    # Records = parts (partkey <= 400) ∪ tail-transposed variants
    # (every third part, id + 100000); identical short names and the
    # planted transpositions both cluster, and the oracle replays the
    # whole pipeline: DuckDB's builtin JW kernel for pairs, a
    # recursive-CTE reachability closure for the components.
    from drugbankner_spark.functions.stringsim import er_cluster

    part = load_table(spark, sf, "part").filter(F.col("p_partkey") <= 400)
    base = part.select(
        F.col("p_partkey").alias("rid"), F.col("p_name").alias("rname")
    )
    variants = part.filter(F.col("p_partkey") % 3 == 0).select(
        (F.col("p_partkey") + 100000).alias("rid"),
        F.concat(
            F.expr("substring(p_name, 1, length(p_name) - 2)"),
            F.reverse(F.expr("substring(p_name, length(p_name) - 1, 2)")),
        ).alias("rname"),
    )
    return er_cluster(
        base.unionByName(variants), "rname", "rid",
        threshold=0.97, block_prefix=1,
    )


def _e5_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    # Robust score normalization (round 6): exact per-type percent_rank
    # + winsorization to the interpolated [p05, p95] of events.value —
    # the outlier guard before thresholds/mixture weights derive from a
    # score. Exact quantiles agree across engines (percentile ≡
    # quantile_cont).
    from drugbankner_spark.operators.relational import percentile_normalize

    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    return percentile_normalize(ev, "value", ["event_type"])


#: Frozen decoded-tone fixture for e4_mpeg_decode's oracle: 80 rows
#: of (doc_id %% 80, layer, sample_rate, n_samples, rms@6dp) computed
#: ONCE by the real encoder+decoder pair (regenerate with
#: tests/test_mpeg_audio.py::test_driver_fixture_is_current).
_MPEG_DECODE_FIXTURE = """(0, 1, 44100, 2304, 0.351743),
                (1, 2, 44100, 2304, 0.350323),
                (2, 3, 44100, 2304, 0.0),
                (3, 1, 44100, 2304, 0.35089),
                (4, 2, 44100, 2304, 0.351647),
                (5, 3, 44100, 2304, 0.0),
                (6, 1, 44100, 2304, 0.350734),
                (7, 2, 44100, 2304, 0.350383),
                (8, 3, 44100, 2304, 0.0),
                (9, 1, 44100, 2304, 0.351402),
                (10, 2, 44100, 2304, 0.351421),
                (11, 3, 44100, 2304, 0.0),
                (12, 1, 44100, 2304, 0.350583),
                (13, 2, 44100, 2304, 0.350695),
                (14, 3, 44100, 2304, 0.0),
                (15, 1, 44100, 2304, 0.35139),
                (16, 2, 44100, 2304, 0.351085),
                (17, 3, 44100, 2304, 0.0),
                (18, 1, 44100, 2304, 0.350764),
                (19, 2, 44100, 2304, 0.351006),
                (20, 3, 44100, 2304, 0.0),
                (21, 1, 44100, 2304, 0.351248),
                (22, 2, 44100, 2304, 0.350832),
                (23, 3, 44100, 2304, 0.0),
                (24, 1, 44100, 2304, 0.350905),
                (25, 2, 44100, 2304, 0.351177),
                (26, 3, 44100, 2304, 0.0),
                (27, 1, 44100, 2304, 0.350894),
                (28, 2, 44100, 2304, 0.350756),
                (29, 3, 44100, 2304, 0.0),
                (30, 1, 44100, 2304, 0.350983),
                (31, 2, 44100, 2304, 0.351168),
                (32, 3, 44100, 2304, 0.0),
                (33, 1, 44100, 2304, 0.350847),
                (34, 2, 44100, 2304, 0.350836),
                (35, 3, 44100, 2304, 0.0),
                (36, 1, 44100, 2304, 0.351072),
                (37, 2, 44100, 2304, 0.351038),
                (38, 3, 44100, 2304, 0.0),
                (39, 1, 44100, 2304, 0.35075),
                (40, 2, 44100, 2304, 0.351731),
                (41, 3, 44100, 2304, 0.0),
                (42, 1, 44100, 2304, 0.349921),
                (43, 2, 44100, 2304, 0.350841),
                (44, 3, 44100, 2304, 0.0),
                (45, 1, 44100, 2304, 0.351532),
                (46, 2, 44100, 2304, 0.350789),
                (47, 3, 44100, 2304, 0.0),
                (48, 1, 44100, 2304, 0.350802),
                (49, 2, 44100, 2304, 0.351315),
                (50, 3, 44100, 2304, 0.0),
                (51, 1, 44100, 2304, 0.35095),
                (52, 2, 44100, 2304, 0.350584),
                (53, 3, 44100, 2304, 0.0),
                (54, 1, 44100, 2304, 0.351017),
                (55, 2, 44100, 2304, 0.351333),
                (56, 3, 44100, 2304, 0.0),
                (57, 1, 44100, 2304, 0.350679),
                (58, 2, 44100, 2304, 0.350697),
                (59, 3, 44100, 2304, 0.0),
                (60, 1, 44100, 2304, 0.351167),
                (61, 2, 44100, 2304, 0.35114),
                (62, 3, 44100, 2304, 0.0),
                (63, 1, 44100, 2304, 0.350723),
                (64, 2, 44100, 2304, 0.350924),
                (65, 3, 44100, 2304, 0.0),
                (66, 1, 44100, 2304, 0.351194),
                (67, 2, 44100, 2304, 0.350919),
                (68, 3, 44100, 2304, 0.0),
                (69, 1, 44100, 2304, 0.350878),
                (70, 2, 44100, 2304, 0.351105),
                (71, 3, 44100, 2304, 0.0),
                (72, 1, 44100, 2304, 0.350904),
                (73, 2, 44100, 2304, 0.3508),
                (74, 3, 44100, 2304, 0.0),
                (75, 1, 44100, 2304, 0.351073),
                (76, 2, 44100, 2304, 0.351153),
                (77, 3, 44100, 2304, 0.0),
                (78, 1, 44100, 2304, 0.350832),
                (79, 2, 44100, 2304, 0.350821),
                (80, 3, 44100, 2304, 0.0),
                (81, 1, 44100, 2304, 0.350379),
                (82, 2, 44100, 2304, 0.350008),
                (83, 3, 44100, 2304, 0.0),
                (84, 1, 44100, 2304, 0.351701),
                (85, 2, 44100, 2304, 0.351528),
                (86, 3, 44100, 2304, 0.0),
                (87, 1, 44100, 2304, 0.350436),
                (88, 2, 44100, 2304, 0.35073),
                (89, 3, 44100, 2304, 0.0),
                (90, 1, 44100, 2304, 0.351418),
                (91, 2, 44100, 2304, 0.350983),
                (92, 3, 44100, 2304, 0.0),
                (93, 1, 44100, 2304, 0.350743),
                (94, 2, 44100, 2304, 0.351129),
                (95, 3, 44100, 2304, 0.0),
                (96, 1, 44100, 2304, 0.351144),
                (97, 2, 44100, 2304, 0.350724),
                (98, 3, 44100, 2304, 0.0),
                (99, 1, 44100, 2304, 0.350931),
                (100, 2, 44100, 2304, 0.351251),
                (101, 3, 44100, 2304, 0.0),
                (102, 1, 44100, 2304, 0.350961),
                (103, 2, 44100, 2304, 0.350717),
                (104, 3, 44100, 2304, 0.0),
                (105, 1, 44100, 2304, 0.351185),
                (106, 2, 44100, 2304, 0.351163),
                (107, 3, 44100, 2304, 0.0),
                (108, 1, 44100, 2304, 0.350772),
                (109, 2, 44100, 2304, 0.350869),
                (110, 3, 44100, 2304, 0.0),
                (111, 1, 44100, 2304, 0.351177),
                (112, 2, 44100, 2304, 0.350986),
                (113, 3, 44100, 2304, 0.0),
                (114, 1, 44100, 2304, 0.350877),
                (115, 2, 44100, 2304, 0.35104),
                (116, 3, 44100, 2304, 0.0),
                (117, 1, 44100, 2304, 0.35113),
                (118, 2, 44100, 2304, 0.350849),
                (119, 3, 44100, 2304, 0.0)"""


def _e4_mpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    # REAL MPEG-1 sample decode (round 6 — VERDICT r05 next #2; round 7
    # adds Layer III): per doc, doc_id % 3 picks the layer — a
    # deterministic tone through the matched-filterbank Layer I/II
    # encoders, or (% 3 == 2) a Layer III SILENCE stream through the
    # real side-info/scalefactor/reservoir/IMDCT/synthesis chain (the
    # spectral Huffman tables are the one documented cut — see
    # mpeg_audio.py's Layer III section).
    # HASH-ORACLED via frozen fixtures: the output depends only on
    # doc_id % 120 (tone on % 40 × layer on % 3), so the 120 decoded
    # rows are frozen as a VALUES dim (_MPEG_DECODE_FIXTURE) and the
    # oracle joins documents against it on the modulus. Round-trip SNR
    # and PR properties are pinned in tests/test_mpeg_audio.py.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = load_table(spark, sf, "documents").select("doc_id")
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("layer", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def run(batches):
        from drugbankner_spark.functions import mpeg_audio as MA

        sr = 44100
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                f = 200.0 + (int(did) % 40) * 37.0
                t = np.arange(1152 * 2)
                x = 0.5 * np.sin(2 * np.pi * f * t / sr)
                sel = int(did) % 3
                if sel == 2:
                    stream = MA.encode_layer3_silence(n_frames=2)
                else:
                    enc = (MA.encode_layer1 if sel == 0
                           else MA.encode_layer2)
                    stream = enc(x)
                d = MA.decode_mpeg_audio(stream)
                mono = d["samples"][:, 0]
                rows.append((
                    int(did), d["layer"], d["sample_rate"],
                    d["n_samples"],
                    round(float(np.sqrt(np.mean(mono ** 2))), 6),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "layer", "sample_rate", "n_samples",
                         "rms"],
            )

    return docs.mapInPandas(run, out_schema)


def _e3_unigram_apply(spark: SparkSession, sf: str) -> DataFrame:
    # Unigram-LM tokenizer APPLY under a full hash oracle (round 6 —
    # VERDICT r05 next #3): the piece table is a frozen fixture
    # (fixtures_unigram.py), and the oracle replicates the per-word
    # Viterbi DP in recursive DuckDB SQL — scores carried as a growing
    # DOUBLE[] per word, candidates via list comprehension over the
    # piece map, ties broken first-max (smallest split point) exactly
    # like viterbi_segment. Log-probs are rendered from PYTHON
    # (repr round-trip) so both engines sum bitwise-identical doubles.
    # EM TRAINING stays pytest-verified against an independent
    # reference (tests/test_unigram.py) — this row hash-grades the
    # serving path.
    from drugbankner_spark.fixtures_unigram import (
        FROZEN_UNIGRAM_PIECES,
        UNIGRAM_MAX_PIECE_LEN,
    )
    from drugbankner_spark.operators.unigram import apply_unigram

    docs = load_table(spark, sf, "documents")
    toks = apply_unigram(
        docs, FROZEN_UNIGRAM_PIECES, max_piece_len=UNIGRAM_MAX_PIECE_LEN
    )
    return toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", " ").alias("tokens_str"),
    )


def _e3_wordpiece_apply(spark: SparkSession, sf: str) -> DataFrame:
    # WordPiece tokenizer APPLY under a full hash oracle (round 6
    # late): the vocab is a frozen fixture (fixtures_wordpiece.py) and
    # the oracle replicates greedy longest-match-first per DISTINCT
    # word in recursive DuckDB SQL — candidates via a list
    # comprehension over the piece map, the longest match taken each
    # step, no-match (or >64-char words) yielding [UNK] for the whole
    # word, exactly like greedy_wordpiece. TRAINING stays
    # pytest-verified on goldens (tests/test_wordpiece.py) — this row
    # hash-grades the serving path, the e3_unigram_apply pattern.
    from drugbankner_spark.fixtures_wordpiece import (
        FROZEN_WORDPIECE_VOCAB,
        WORDPIECE_MAX_PIECE_LEN,
    )
    from drugbankner_spark.operators.wordpiece import apply_wordpiece

    docs = load_table(spark, sf, "documents")
    toks = apply_wordpiece(
        docs, FROZEN_WORDPIECE_VOCAB,
        max_piece_len=WORDPIECE_MAX_PIECE_LEN,
    )
    return toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", " ").alias("tokens_str"),
    )


def _e4_bmp_decode(spark: SparkSession, sf: str) -> DataFrame:
    # REAL BMP codec under an oracle (round 5 late): same format-blind
    # digest contract as e4_png_decode / e4_gif_decode.
    from drugbankner_spark.operators import multimodal as MM

    docs = load_table(spark, sf, "documents")
    return MM.bmp_roundtrip_digest(MM.documents_as_media(docs))


def _s_warc_probe(spark: SparkSession, sf: str) -> DataFrame:
    # WARC source round-trip (round 5 late): each doc's text becomes
    # the HTTP body of a response record in a synthesized archive
    # (gzip-member for every third doc), parsed back with the stdlib
    # WARC walker; the oracle reproduces status/lengths/URI from the
    # text alone — a hash match proves header framing, Content-Length
    # reads, HTTP splitting and gzip members all round-trip.
    import pandas as _pd

    from drugbankner_spark.sources import warc_source as WS

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("http_status", T.LongType()),
        T.StructField("body_len", T.LongType()),
        T.StructField("body_sha256", T.StringType()),
    ])

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = (text or "").encode()
                rec = WS.encode_warc_record(
                    "response", f"https://corpus.example/doc/{did}",
                    WS.encode_http_response(
                        body, content_type="text/plain",
                        status=200 if did % 5 else 404,
                    ),
                )
                archive = WS.encode_warc([rec], gzip_members=did % 3 == 0)
                parsed = WS.parse_warc(archive)
                (r,) = parsed
                status, _hdrs, got = WS.split_http_response(r["payload"])
                rows.append((
                    did, len(parsed), r["headers"]["warc-type"],
                    r["headers"]["warc-target-uri"], status, len(got),
                    hashlib.sha256(got).hexdigest(),
                ))
            yield _pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields],
            )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return docs.mapInPandas(run, out_schema)


def _s_tar_probe(spark: SparkSession, sf: str) -> DataFrame:
    # WebDataset tar round-trip (round 5 late): each doc becomes a
    # 2-member sample shard (.txt + .meta), gzip for every fourth doc,
    # regrouped by webdataset_samples; the oracle derives everything
    # from the text alone.
    import pandas as _pd

    from drugbankner_spark.sources import tar_source as TS

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("n_parts", T.LongType()),
        T.StructField("txt_len", T.LongType()),
        T.StructField("txt_sha256", T.StringType()),
        T.StructField("meta", T.StringType()),
    ])

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = (text or "").encode()
                key = f"{did:08d}"
                shard = TS.encode_tar(
                    [(f"{key}.txt", body),
                     (f"{key}.meta", f"doc={did}".encode())],
                    gzip=did % 4 == 0,
                )
                samples = {}
                for name, payload in TS._iter_members(shard):
                    k, ext = TS._split_key(name)
                    samples.setdefault(k, {})[ext] = payload
                (k, parts), = samples.items()
                rows.append((
                    did, k, len(parts), len(parts["txt"]),
                    hashlib.sha256(parts["txt"]).hexdigest(),
                    parts["meta"].decode(),
                ))
            yield _pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields],
            )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return docs.mapInPandas(run, out_schema)


def _e5_needle_inject(spark: SparkSession, sf: str) -> DataFrame:
    # Needle-in-a-haystack eval construction (round 5 late): per-doc
    # needle inserted at 50% token depth; the oracle rebuilds the
    # spliced text with list_slice/concat.
    from drugbankner_spark.operators.evals import inject_needles

    docs = load_table(spark, sf, "documents")
    needle = F.concat(
        F.lit("NEEDLE-"), (F.col("doc_id") % 7).cast("string")
    )
    return inject_needles(docs, needle, depth_frac=0.5)


def _e5_chat_render(spark: SparkSession, sf: str) -> DataFrame:
    # SFT chat-template rendering (round 5 late): events become
    # deterministic dialogue turns (role by event_id parity, content
    # from event_type + integer-quantized value), grouped per user and
    # rendered in (ts, event_id) total order. The oracle rebuilds the
    # template with string_agg(... ORDER BY ts, event_id).
    from drugbankner_spark.operators.sft import render_chat

    ev = load_table(spark, sf, "events")
    turns = ev.select(
        F.col("user_id").alias("conversation_id"),
        "ts", "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.concat(
            F.col("event_type"), F.lit(":"),
            F.floor(F.col("value") * 100).cast("long").cast("string"),
        ).alias("content"),
    )
    return render_chat(turns)


def _e5_eval_scores(spark: SparkSession, sf: str) -> DataFrame:
    # Evaluation metrics (round 5 late): prediction/reference pairs are
    # synthesized as OVERLAPPING token windows of each doc (tokens
    # [0,12) vs [2,14)) so EM/F1/ROUGE take nontrivial values; the
    # oracle replicates normalization, multiset overlap, and the n-gram
    # recall with DuckDB list functions.
    from drugbankner_spark.operators.evals import eval_scores

    docs = load_table(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 12), " ").alias("prediction"),
        F.array_join(F.slice(toks, 3, 12), " ").alias("reference"),
    )
    return eval_scores(pairs)


def _e3_dict_tag(spark: SparkSession, sf: str) -> DataFrame:
    # Aho-Corasick dictionary tagging (round 5 late): every occurrence
    # (overlaps included — 'ark' fires inside 'spark') of a literal
    # term set, with exact character offsets; the oracle replicates via
    # brute-force substr scanning over generate_series.
    from drugbankner_spark.operators.textanalysis import (
        tag_dictionary_terms,
    )

    docs = load_table(spark, sf, "documents")
    return tag_dictionary_terms(
        docs, ["spark", "ark", "window"]
    ).select("doc_id", "term", "start")


def _e3_wordlm(spark: SparkSession, sf: str) -> DataFrame:
    # Word-bigram stupid-backoff LM (round 5 late): train on the 'en'
    # slice, score EVERY doc — non-en docs hit unseen bigrams, so the
    # backoff path (ln(0.4·n2/N), unseen-word floor) is exercised and
    # hash-checked cross-engine, not just the known-bigram branch.
    from drugbankner_spark.operators.textanalysis import (
        train_word_lm,
        word_lm_logprob,
    )

    docs = load_table(spark, sf, "documents")
    model = train_word_lm(docs.filter(F.col("lang") == "en"))
    return word_lm_logprob(docs, model)


def _e5_augment(spark: SparkSession, sf: str) -> DataFrame:
    # Deterministic EDA augmentation (round 6 late): hash-seeded token
    # drops + disjoint adjacent-pair swaps; the oracle replays the
    # swap as lead/lag over the surviving positions.
    from drugbankner_spark.operators.corpus import augment_text

    docs = load_table(spark, sf, "documents")
    return augment_text(docs)


def _e3_zipf(spark: SparkSession, sf: str) -> DataFrame:
    # Zipf rank-frequency fit per language (round 6 late): ln-ln OLS
    # over the term distribution, deterministic rank tiebreak.
    from drugbankner_spark.operators.textanalysis import zipf_slope

    docs = load_table(spark, sf, "documents")
    return zipf_slope(docs, group_col="lang")


def _e3_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    # Character-distribution Shannon entropy (round 6 late): the cheap
    # gibberish detector, hash-checked per doc.
    from drugbankner_spark.operators.textanalysis import char_entropy

    docs = load_table(spark, sf, "documents")
    return char_entropy(docs)


def _e5_class_report(spark: SparkSession, sf: str) -> DataFrame:
    # sklearn-style classification report (round 6 late): lang as the
    # prediction vs a residue-perturbed gold (every 4th doc's gold
    # flips to 'en'), per-class P/R/F1 + support + accuracy row.
    from drugbankner_spark.operators.evals import classification_report

    docs = load_table(spark, sf, "documents")
    preds = docs.select(
        F.col("doc_id").alias("example_id"),
        F.col("lang").alias("predicted"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("en"))
        .otherwise(F.col("lang")).alias("gold"),
    )
    return classification_report(preds)


def _e5_iob_tags(spark: SparkSession, sf: str) -> DataFrame:
    # Span -> IOB token labels (round 6 late): the same overlapping
    # taggings as e5_ner_eval ('ark' fires inside 'spark' — the
    # longer-span-wins resolution is live on real data), rendered as
    # B/I/O per whitespace token.
    from drugbankner_spark.operators.sft import spans_to_iob
    from drugbankner_spark.operators.textanalysis import (
        tag_dictionary_terms,
    )

    docs = load_table(spark, sf, "documents")
    spans = tag_dictionary_terms(
        docs, ["spark", "ark", "window"]
    ).select(
        "doc_id", "start",
        F.length("term").alias("length"),
        F.when(F.col("term") == "window", F.lit("UI"))
        .otherwise(F.lit("ENGINE")).alias("label"),
    )
    return spans_to_iob(docs, spans)


def _e1_repair_text(spark: SparkSession, sf: str) -> DataFrame:
    # Extraction-artifact repair (round 6 late): deterministic
    # artifacts planted per doc — ' merge ' becomes a line-wrap
    # hyphenation, ' batch ' a tab run, every 3rd doc gains a BEL —
    # then the rule chain, hash-checked against RE2 (including the
    # $1 vs \\1 backreference dialect difference).
    from drugbankner_spark.operators.corpus import repair_text

    docs = load_table(spark, sf, "documents")
    d = F.col("doc_id")
    s1 = F.replace(F.col("text"), F.lit(" merge "), F.lit("-\n"))
    s2 = F.replace(s1, F.lit(" batch "), F.lit("\t\t"))
    s3 = F.when(d % 3 == 0, F.concat(s2, F.lit("\x07"))).otherwise(s2)
    return repair_text(docs.select("doc_id", s3.alias("text")))


def _e5_ner_eval(spark: SparkSession, sf: str) -> DataFrame:
    # NER span evaluation (round 6 late): Aho-Corasick taggings over
    # two overlapping term sets stand in for pred vs gold — 'ark' hits
    # are spurious ENGINE predictions, 'hash' spans are missed gold —
    # CoNLL exact-match P/R/F1 per label + micro, hash-checked.
    from drugbankner_spark.operators.evals import ner_span_metrics
    from drugbankner_spark.operators.textanalysis import (
        tag_dictionary_terms,
    )

    docs = load_table(spark, sf, "documents")

    def spans(terms):
        t = tag_dictionary_terms(docs, terms)
        return t.select(
            "doc_id", "start",
            F.length("term").alias("length"),
            F.when(F.col("term") == "window", F.lit("UI"))
            .otherwise(F.lit("ENGINE")).alias("label"),
        )

    pred = spans(["spark", "ark", "window"])
    gold = spans(["spark", "window", "hash"])
    return ner_span_metrics(pred, gold)


def _e3_kn_ppl(spark: SparkSession, sf: str) -> DataFrame:
    # Interpolated Kneser-Ney bigram perplexity (round 6 late): the
    # smoothing KenLM/CCNet quality filters actually run. Train on the
    # 'en' slice, score EVERY doc so all four branches are hash-checked
    # cross-engine: seen bigram (discounted ML + interpolation), seen
    # context with unseen bigram (pure interpolation mass), unseen
    # context (continuation-only backoff), unseen continuation (0.5
    # pseudo-count floor).
    from drugbankner_spark.operators.textanalysis import (
        kn_lm_logprob,
        train_kn_lm,
    )

    docs = load_table(spark, sf, "documents")
    model = train_kn_lm(docs.filter(F.col("lang") == "en"))
    return kn_lm_logprob(docs, model)


def _e4_gif_decode(spark: SparkSession, sf: str) -> DataFrame:
    # REAL stdlib GIF codec under the driver (round 5 late): each doc's
    # UTF-8 bytes become palette indices, encode through the LZW
    # writer, decode back, digest the recovered bytes; the oracle
    # digests the ORIGINAL bytes without touching GIF — a hash match
    # proves the LZW + container round-trip is lossless on real data.
    from drugbankner_spark.operators import multimodal as MM

    docs = load_table(spark, sf, "documents")
    return MM.gif_roundtrip_digest(MM.documents_as_media(docs))


def _e3_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    # URL canonicalization (round 5 late): pure-codegen normalizer
    # (operators/web.py) over URLs synthesized deterministically from
    # doc_id — upper scheme/host, default port, trailing slash,
    # tracking params and fragment all exercised; the oracle rebuilds
    # the same strings and replicates every normalization step in SQL.
    from drugbankner_spark.operators.web import canonicalize_url, url_host

    docs = load_table(spark, sf, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Dir"), (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("&fbclid=xyz"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    synth = docs.select("doc_id", url.alias("url"))
    return synth.select(
        "doc_id",
        "url",
        canonicalize_url("url").alias("canonical"),
        url_host("url").alias("host"),
    )


def _e3_unicode_normalize(spark: SparkSession, sf: str) -> DataFrame:
    # Unicode NFC + control scrub (round 5 late). The harness corpus is
    # ASCII, so the op would be vacuous on raw text — instead each doc
    # gets a deterministic DECOMPOSED prefix (base letter + combining
    # accent picked by doc_id) and an embedded control char; the oracle
    # builds the identical string with chr() and runs DuckDB's ICU
    # nfc_normalize. A hash match is a real cross-engine Unicode
    # normalization parity check (Python unicodedata vs ICU).
    from drugbankner_spark.operators.textanalysis import normalize_unicode

    docs = load_table(spark, sf, "documents")
    prefix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("e\u0301"))
        .when(F.col("doc_id") % 3 == 1, F.lit("a\u0300"))
        .otherwise(F.lit("o\u0302"))
    )
    synth = docs.select(
        "doc_id",
        F.concat(
            prefix, F.lit("\x07 "), F.substring(F.col("text"), 1, 40)
        ).alias("text"),
    )
    return normalize_unicode(synth)


def _e5_datacard(spark: SparkSession, sf: str) -> DataFrame:
    # Dataset "data card" report (round 5 late): one ROLLUP(source,
    # lang) aggregation → per-slice + per-source + corpus-wide doc
    # counts, exact-dup rate (sha256 distincts) and exact token-length
    # percentiles. Single shuffle on the grouping sets.
    from drugbankner_spark.operators.corpus import corpus_datacard

    return corpus_datacard(load_table(spark, sf, "documents"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver registry — capped at 50 entries so EVERY query lands in
    the driver's observed 50-entry CORRECTNESS window (round 1 registered
    62 and the 12 after position 50 got no correctness row — VERDICT r01
    "What's missing" #1). Round 5 rotation (VERDICT r04 next #1): the 13
    queries never driver-verified go FIRST — the 11 pytest-only round-4
    oracles (e2_pq_adc_topk, j_fuzzy_name_match, e5_scd2_user_state,
    e5_constraint_report, e3_hashed_tf, e3_pack_sequences, e4_wav_decode,
    q17, q20, t_asof_join, t_range_join) plus this round's two new ops
    (e6_sessionize_closed, e2_ivfpq_append_topk). To make room, 19
    long-green demonstrations consolidate into six new tagged-union
    suites (syn_suite, j_join_suite, a_agg_suite, e1_near_dup_suite,
    e3_docmeta_suite, e4_media_suite) and u_set_suite absorbs u1/u4 —
    the established round-4 mechanism; every original remains
    individually runnable via ``all_queries`` and hash-checked in
    tests/test_oracle_parity.py. e6_windows_batch stays pytest-only: its
    oracle SQL is byte-identical to the driver-green e6_windows.

    Round-5 LATE rotation (this session): nine new hash-oracled ops
    (e3_bm25_topk, e3_ppl_buckets, e3_unicode_normalize,
    e3_url_canonicalize, e3_wordlm, e5_datacard, e4_container_probe,
    e4_gif_decode, rows-only e3_unigram_tokens) entered the window by
    consolidating 13 long-green singles into four more tagged-union
    suites (e2_ann_suite = cosine+lsh+ivf; e1_dedup_suite =
    exact+survivor+minhash+decontaminate+clusters; e3_qual_suite =
    quality+bpe+chunking; f_text_suite = name-normalize+sentences) —
    every original stays individually runnable and hash-checked via
    all_queries.

    Round-6 rotation (VERDICT r05 next #1): the ENTIRE 23-entry pool
    enters the window — q_tpch_suite alone converts 14 never-driver-
    verified TPC-H queries into one row — plus this round's two new
    hash-oracled ops (e3_unigram_apply, which supersedes the
    rows-only e3_unigram_tokens slot with a recursive-SQL Viterbi
    oracle, and e2_retrieval_topk). To free the 25 slots, 25 r05-green
    singles demote to pytest-only (the established mechanism: each
    stays individually runnable via ``all_queries`` and hash-checked in
    tests/test_oracle_parity.py, ready to rotate back): e2_pq_adc_topk,
    e2_ivfpq_append_topk, j_fuzzy_name_match, e5_scd2_user_state,
    e5_constraint_report, e3_hashed_tf, e3_pack_sequences,
    e4_wav_decode, q17, q20, t_asof_join, t_range_join, e3_bm25_topk,
    e3_ppl_buckets, e3_unicode_normalize, e3_url_canonicalize,
    e3_wordlm, e5_datacard, e4_container_probe, e4_gif_decode,
    e3_unigram_tokens, e5_stratified_sample, e2_lsh_append_topk,
    complete-mode e6_sessionize (VERDICT r05: the closed/append
    production face keeps the streaming-session slot), and q5.

    Round-7 rotation pool (hash-oracled, pytest-green at both SFs,
    ready for the next window): e6_funnel, e5_cohort_retention,
    e5_retrieval_metrics, e5_cdc_apply, e1_near_dup_recall,
    e1_simhash_pairs, g_triangle_count, g_common_neighbors,
    e5_temperature_mix, e5_ndcg, e5_dsir_weights, t_resample_gapfill,
    t_ewma, t_anomaly, e5_k_anonymity, e1_boilerplate_strip,
    e6_transition_matrix, e6_top_paths, j_jw_match, e5_winsorize,
    e3_wordpiece_apply (third tokenizer family, recursive-SQL greedy
    oracle), e4_mpeg_decode (upgraded from rows-only to a
    frozen-fixture hash oracle), e3_kn_ppl (interpolated Kneser-Ney
    perplexity, the KenLM/CCNet smoothing, all four branches
    hash-checked), g_bfs_distances (multi-source k-hop BFS vs a
    recursive-CTE oracle), g_label_prop (synchronous LPA communities
    vs a chained-CTE replay), er_resolve (composed entity resolution:
    block -> JW -> CC -> canonical rep in one hash-checked row),
    e3_gopher_rep (Gopher §A1.1 repetition signal set, one explode for
    n=2..10), e1_c4_filter (C4 line rules + page flags, pure
    higher-order expressions), e1_pii_scrub (sequential regex PII
    redaction, Java-vs-RE2 dialect parity), e5_span_corrupt
    (deterministic T5 denoising spans, hash-seeded + islands-merged),
    e2_hard_negatives (DPR-style mining: anti-join labeled positives,
    skip-top false-negative hedge), e5_calibration (ECE/reliability
    bins, Guo et al. 2017), e5_kfold (deterministic hash k-fold),
    e5_profile (Deequ-style column profile in one value-keyed
    shuffle), e5_group_ols (closed-form per-group OLS trend with
    exact integer-valued sums), q2_min_cost_supplier (the last
    uncovered TPC-H number — per-part argmin supplier within a
    region; all 22 TPC-H shapes now hash-oracled), e6_cooccurrence
    (market-basket pair support/confidence/lift — the order-free
    complement of the transition matrix), g_random_walks
    (deterministic DeepWalk corpus: hash-seeded steps over sorted
    adjacency), e3_skipgram (word2vec window-pair counts — one explode
    + one pair-keyed agg), pipeline_curate_corpus (the FineWeb/Dolma
    curation chain C4 -> PII -> Gopher -> dedup, per-stage verdicts
    hash-checked end to end), e5_tokenize (salted-sha256
    pseudonymization, join-preserving), e2_mean_pool (chunk->doc
    embedding rollup: per-dim avg + ordered reassembly),
    e6_transition_power (k-step Markov forecast via relational matrix
    multiply), e6_attribution (multi-touch first/last/linear credits
    with per-conversion reset + recency cap), e5_ner_eval (CoNLL
    exact-match span P/R/F1 + micro over Aho-Corasick taggings),
    e1_repair_text (extraction-artifact repair: de-hyphenation,
    control strip, whitespace collapse — $1-vs-\\1 dialect pinned),
    e5_augment (deterministic EDA: hash-seeded drops + disjoint pair
    swaps, lead/lag oracle), e5_iob_tags (span -> B/I/O token labels
    with pairwise-priority overlap resolution), e5_class_report
    (sklearn-style per-class P/R/F1 + accuracy from one pair-count
    agg), e3_char_entropy (character-distribution Shannon entropy, the
    gibberish detector), e3_zipf (per-language Zipf rank-frequency
    OLS, the corpus-authenticity signal) — plus the 24 demoted names
    above. Two ready-made
    consolidation suites compress the wave for the window:
    e5_prep_suite (kfold + calibration + tokenize + profile + OLS) and
    g_graph_suite (BFS + LPA + walk corpus), each a tagged union whose
    branches stay individually hash-checked here.

    Round-7 rotation (VERDICT r06 next #3): the ENTIRE pool above
    enters the window — 43 singles plus the two consolidation suites
    (8 ops in 2 slots). To free the 45 slots, every r06-green row
    except five keepers demotes to pytest-only via ``all_queries`` +
    tests/test_oracle_parity.py — the established mechanism; nothing
    green goes unverified. Keepers: the flagship EP1/EP2 pipelines,
    q_tpch_suite (the 14-query relational surface), and the two
    readStream faces e6_sessionize_closed / e6_windows so Structured
    Streaming is driver-verified every round.

    Round-8 rotation pool (hash-oracled this round, pytest-green at
    both SFs, ready for the next window): x1_tfidf_linker and
    ep1_tfidf_mechanistic_nodes entered the window directly (round-7
    new ops); e1_suffix_array (distributed prefix-doubling suffix
    array, content-checked against a direct suffix-string sort) and
    e1_sa_dup_spans (Lee-et-al exact substring duplication via
    adjacent-suffix pairs), e2_hamming_topk (1-bit quantization +
    integer-exact Hamming top-k), e2_rerank_topk (the composed
    Hamming-shortlist → exact-cosine rerank funnel), and g_pagerank
    (the CommonCrawl domain-authority signal, chained-CTE power-
    iteration oracle), g_ppr (personalized PageRank — seeded teleport,
    the seed-affinity expansion signal), e5_dp_histogram (the
    Laplace-mechanism DP release, deterministic via the md5 hash
    kernel — completes the privacy family), pipeline_pretrain_prep
    (the third flagship
    composition: curation chain → sequence packing of the survivors,
    composed oracle) and t_seasonal (classical additive seasonal
    decomposition, integer-exact micro-unit arithmetic end to end —
    the float/rounding-convention findings are documented on the
    operator) wait in the pool, plus the 47 r06-green rows demoted
    this round.

    Round-8 rotation (VERDICT r07 next #1): all nine pool entries
    above enter the window, plus the four round-8 new ops
    (e1_sa_dedup — the Lee-et-al exact-span REMOVAL composed;
    e2_hamming_pairs — banded corpus×corpus 1-bit pairs;
    e5_dp_histogram_user — user-level DP with the per-contributor
    clamp; ep1_spotted_nodes — EP1 with ZERO stub factories via the
    relational dictionary spotter). The 13 slots come from
    consolidating 17 r07-green singles into four tagged-union suites
    (t_ts_suite, e6_journey_suite, e5_eval_suite, e1_clean_suite) —
    every original stays individually runnable via ``all_queries``
    and hash-checked in tests/test_oracle_parity.py. Round-9 rotation
    pool (hash-oracled this round, never driver-verified):
    e1_suffix_array_bench, x1_linker_corpus, x1_linker_corpus_maxdf
    (the corpus-scale bench probes — BENCH times them every round),
    e2_kmeans (fully-relational distributed Lloyd's k-means —
    grid-integer geometry per the float-parity law, hash-seeded
    deterministic init, chained-CTE replay oracle), e2_cluster_sample
    (the cluster-balanced diversity draw over the same replayed fit)
    e2_semdedup_kmeans (SemDeDup in the paper's cluster-scoped
    shape: within-cell cosine pairs → recursive-CTE components →
    min-id survivor), e1_semantic_decontaminate (the paraphrase face
    of benchmark decontamination — max benchmark cosine per train
    vector, broadcast benchmark dim), e5_fim_transform
    (deterministic Fill-in-the-Middle rendering, hash-drawn cut
    points, pure projection) and e2_assign_stream (the STREAMING
    routing face of the k-means fit — stateless grid-integer argmin
    against the collected centroid literal; equals the batch
    assignment bit-for-bit, so it shares e2_kmeans's oracle).

    Round-9 rotation: the r8 driver artifacts were never produced, so
    the round-8-placed window rows above have NOT yet been
    driver-verified — they all STAY. The slots for the nine round-9
    pool entries (e2_kmeans family, semantic decontamination, FIM,
    the SA/linker bench probes) come instead from consolidating 15
    r07-GREEN singles (driver-verified in CORRECTNESS_r07) into four
    new tagged-union suites: e3_lm_suite (kn_ppl + skipgram +
    char_entropy + zipf + wordpiece_apply), e5_sft_suite
    (span_corrupt + augment + temperature_mix + dsir_weights),
    g_count_suite (triangle_count + common_neighbors), e5_gov_suite
    (k_anonymity + winsorize + cdc_apply + cohort_retention) — the
    established mechanism; every original stays individually
    runnable via ``all_queries`` and hash-checked in
    tests/test_oracle_parity.py. Four of this round's six NEW
    hash-oracled operators (g_kcore — synchronized h-index coreness;
    t_cusum — closed-form CUSUM change detection; e5_bleu — corpus
    BLEU-4; e2_srp_sketch — signed random projection) take the last
    window slots via two more micro-consolidations of r07-green
    singles (j_er_suite = jw_match + er_resolve; e1_pair_suite =
    near_dup_recall + simhash_pairs). Round-10 rotation pool
    (hash-oracled this round, never driver-verified): e5_dp_quantile
    (DP quantiles off one noisy-CDF Laplace release) and t_holt
    (Holt linear-trend smoothing, recursive-CTE replay oracle,
    bit-exact doubles).

    Round-10 rotation (VERDICT r09 next #1/#7): the EIGHT
    never-driver-verified pool entries enter the window —
    g_modularity, e6_interval_join, e5_dp_quantile, t_holt,
    x1_linker_indexed, e3_fertility, e5_agreement, plus e6_windows
    (the r7-keeper readStream face that fell out in the r9 rotation).
    The slots come from consolidating SEVENTEEN r09-GREEN singles
    (all 50 window rows were green in CORRECTNESS_r09) into six new
    tagged-union suites: e1_sa_suite (suffix array + dup spans +
    removal + bench checksum), g_rank_suite (pagerank + ppr),
    e2_bit_suite (hamming topk + rerank + pairs + srp), e5_dp_suite
    (row- + user-level DP histograms), e2_kmeans_suite (lloyd fit +
    cluster sample + semdedup), x1_linker_suite (inline corpus
    linker, unpruned + maxdf) — the established mechanism; every
    original stays individually runnable via ``all_queries`` and
    hash-checked in tests/test_oracle_parity.py. The remaining three
    slots carry this round's new hash-oracled operators (e5_chi2,
    t_acf, e6_hll_distinct).

    Round-12 rotation (VERDICT r11 next #3): the window had been
    identical for two rounds, so the five OLDEST demoted suites —
    driver-verified last in their r6/r7-era windows — rotate back in
    for re-verification at sf0.01 (syn_suite, j_join_suite,
    e1_dedup_suite, e2_ann_suite, e3_qual_suite), plus the round-12
    new op x1_linker_served (the champion-list serving probe on its
    own small-batch shape). The six slots come from demoting six
    TWICE-driver-green singles (green in both CORRECTNESS_r10 and
    _r11 on identical code): t_seasonal, e5_fim_transform, e5_bleu,
    e2_mean_pool, q2_min_cost_supplier, e6_funnel — the established
    mechanism; each stays individually runnable via ``all_queries``
    and hash-checked in tests/test_oracle_parity.py, ready to rotate
    back.

    Round-13 rotation (VERDICT r12 next #4): the six OLDEST
    driver-verified pool rows — r7/r8-era, last driver-green in their
    own windows — rotate back in (e5_retrieval_metrics, e1_c4_filter,
    e1_pii_scrub, t_resample_gapfill, e6_transition_matrix,
    j_jw_match). Slots from demoting the five suites the r12 rotation
    just RE-verified plus the thrice-green e5_agreement; the
    once-green x1_linker_served stays.

    Round-14 rotation (VERDICT r13 next #4): the eight OLDEST demoted
    driver-verified rows by the correctness-history ledger — the
    r6-era consolidation suites, last driver-green in CORRECTNESS_r06
    (a_agg_suite, u_set_suite, f_text_suite, f_curie_suite,
    w_window_suite, e4_media_suite, e3_docmeta_suite,
    e1_near_dup_suite; older than the r9/r10 singles the verdict
    named, which are all still IN the window with 4-5 greens each) —
    rotate back in. Slots from demoting eight 5-6×-green non-keeper
    rows (x1_tfidf_linker, e5_prep_suite, e2_hard_negatives,
    e4_mpeg_decode, e3_gopher_rep, pipeline_curate_corpus,
    g_graph_suite, e5_gov_suite — X1 stays covered by
    ep1_tfidf_mechanistic_nodes + the three x1_linker rows; E4's
    driver presence moves to the rotated-in e4_media_suite); every
    demoted name stays runnable + oracle-backed in ``all_queries``
    and hash-checked in tests/test_oracle_parity.py.

    Round-15 rotation (VERDICT r14 next #3, ledger-driven): the six
    OLDEST demoted driver-verified rows rotate back in —
    e6_props_json (last green r06) and the five r7-demoted
    consolidation suites syn_suite, j_join_suite, e2_ann_suite,
    e1_dedup_suite, e3_qual_suite (last green r12, when the r12
    rotation re-verified them). Slots from demoting six 5-6×-green
    r9/r10-era singles (t_cusum, t_holt, t_acf, e5_dp_quantile,
    e5_chi2, g_kcore — the verdict's named candidates; g_modularity
    and e6_hll_distinct stay one more round so the graph/sketch
    families keep a fresh row each); every demoted name stays
    runnable + oracle-backed in ``all_queries`` and hash-checked in
    tests/test_oracle_parity.py. Window stays exactly 50."""
    return {
        # -- round-15 rotation (VERDICT r14 next #3): the six OLDEST
        # demoted driver-verified rows rotate back in ------------------
        "syn_suite": _syn_suite,
        "j_join_suite": _j_join_suite,
        "e2_ann_suite": _e2_ann_suite,
        "e1_dedup_suite": _e1_dedup_suite,
        "e3_qual_suite": _e3_qual_suite,
        "e6_props_json": _e6_props_json,
        # -- round-14 rotation rows (once-green since, stay one more
        # round before demotion eligibility) ---------------------------
        "a_agg_suite": _a_agg_suite,
        "u_set_suite": _u_set_suite,
        "f_text_suite": _f_text_suite,
        "f_curie_suite": _f_curie_suite,
        "w_window_suite": _w_window_suite,
        "e4_media_suite": _e4_media_suite,
        "e3_docmeta_suite": _e3_docmeta_suite,
        "e1_near_dup_suite": _e1_near_dup_suite,
        # -- round-13 rotation rows (twice-green, stay one more round
        # before demotion eligibility) ---------------------------------
        "e5_retrieval_metrics": _e5_retrieval_metrics,
        "e1_c4_filter": _e1_c4_filter,
        "e1_pii_scrub": _e1_pii_scrub,
        "t_resample_gapfill": _t_resample_gapfill,
        "e6_transition_matrix": _e6_transition_matrix,
        "j_jw_match": _j_jw_match,
        # -- round-12 keeper: the champion serving probe (twice-green) --
        "x1_linker_served": _x1_linker_served,
        # -- round-10 rotation (VERDICT r09 next #1/#7): the eight
        # never-driver-verified pool entries enter the window; the
        # slots come from consolidating 17 r09-GREEN singles into the
        # six tagged-union suites below — the established mechanism:
        # every original stays individually runnable via all_queries
        # and hash-checked in tests/test_oracle_parity.py -------------
        "g_modularity": _g_modularity,
        "e6_interval_join": _e6_interval_join,
        "x1_linker_indexed": _x1_linker_indexed,
        "e3_fertility": _e3_fertility,
        "e6_windows": _e6_windows,
        # -- round-10 consolidation suites (r09-green singles) ---------
        "e1_sa_suite": _e1_sa_suite,
        "g_rank_suite": _g_rank_suite,
        "e2_bit_suite": _e2_bit_suite,
        "e5_dp_suite": _e5_dp_suite,
        "e2_kmeans_suite": _e2_kmeans_suite,
        "x1_linker_suite": _x1_linker_suite,
        # -- round-10 NEW op staying (the sketch family's window row) --
        "e6_hll_distinct": _e6_hll_distinct,
        # -- r09-green rows staying in the window ----------------------
        # (round 15 demotions: t_cusum, t_holt, t_acf, e5_dp_quantile,
        # e5_chi2, g_kcore — all 5-6× driver-green, all still in
        # all_queries; round 14 demotions: e5_gov_suite, e5_prep_suite,
        # g_graph_suite, e4_mpeg_decode, e3_gopher_rep,
        # e2_hard_negatives, pipeline_curate_corpus, x1_tfidf_linker)
        "pipeline_pretrain_prep": _pipeline_pretrain_prep,
        "ep1_spotted_nodes": _ep1_spotted_nodes,
        "t_ts_suite": _t_ts_suite,
        "e6_journey_suite": _e6_journey_suite,
        "e5_eval_suite": _e5_eval_suite,
        "e1_clean_suite": _e1_clean_suite,
        "e3_lm_suite": _e3_lm_suite,
        "e5_sft_suite": _e5_sft_suite,
        "g_count_suite": _g_count_suite,
        "e2_assign_stream": _e2_assign_stream,
        "e1_semantic_decontaminate": _e1_semantic_decontaminate,
        "j_er_suite": _j_er_suite,
        "e1_pair_suite": _e1_pair_suite,
        # -- round-7 new op: the X1-closure composition (the in-engine
        # TF-IDF linker's own row x1_tfidf_linker demoted this round;
        # the composed EP1 face keeps X1 driver-verified) ---------------
        "ep1_tfidf_mechanistic_nodes": _ep1_tfidf_mechanistic_nodes,
        # -- keepers: the EP2 flagship merge (its oracle hash-checks the
        # classic EP1 assembly downstream too), the 14-query TPC-H
        # suite, and a readStream face (streaming stays driver-verified
        # every round) -------------------------------------------------
        "q_tpch_suite": _q_tpch_suite,
        "e6_sessionize_closed": _e6_sessionize_closed,
        "ep2_aligned_nodes": _ep2_aligned_nodes,
    }


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """queries() plus the pre-consolidation forms — NOT shipped to the
    driver (window cap) but still first-class: bench.py times its round-1
    headline list from here, and tests/test_oracle_parity.py hash-checks
    every oracle-backed entry (the legacy oracles stay in oracle_sql)."""
    return {
        **queries(),
        # round-6 rotation: the 25 demoted r05-green singles — each
        # still hash-checked per-entry in tests/test_oracle_parity.py
        # and ready to rotate back into the driver window
        # round-7 rotation: the r06-green window rows demoted to make
        # room for the 45-entry pool — every one stays hash-checked
        # per-entry in tests/test_oracle_parity.py and ready to rotate
        # back (the established mechanism)
        # round-15 rotation: the six demoted 5-6×-green singles stay
        # individually runnable + per-entry hash-checked here
        "t_cusum": _t_cusum,
        "t_holt": _t_holt,
        "t_acf": _t_acf,
        "e5_dp_quantile": _e5_dp_quantile,
        "e5_chi2": _e5_chi2,
        "g_kcore": _g_kcore,
        "a_agg_suite": _a_agg_suite,
        "e1_near_dup_suite": _e1_near_dup_suite,
        "e3_docmeta_suite": _e3_docmeta_suite,
        "e4_media_suite": _e4_media_suite,
        "u_set_suite": _u_set_suite,
        "e2_ann_suite": _e2_ann_suite,
        "e1_dedup_suite": _e1_dedup_suite,
        "e3_qual_suite": _e3_qual_suite,
        "f_text_suite": _f_text_suite,
        "f_curie_suite": _f_curie_suite,
        "e6_props_json": _e6_props_json,
        "e6_windows": _e6_windows,
        "ep1_mechanistic_nodes": _ep1_mechanistic_nodes,
        "w_window_suite": _w_window_suite,
        "f7_identifier_extract": _f7_identifier_extract,
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "q18_large_orders": _q18_large_orders,
        "q_correlated_avg": _q_correlated_avg,
        "agg_rollup": _agg_rollup,
        "sql_api_q10": _sql_api_q10,
        "e2_pq_adc_topk": _e2_pq_adc_topk,
        "e2_ivfpq_append_topk": _e2_ivfpq_append_topk,
        "j_fuzzy_name_match": _j_fuzzy_name_match,
        "e5_scd2_user_state": _e5_scd2_user_state,
        "e5_constraint_report": _e5_constraint_report,
        "e3_hashed_tf": _e3_hashed_tf,
        "e3_pack_sequences": _e3_pack_sequences,
        "e4_wav_decode": _e4_wav_decode,
        "q17_small_quantity_revenue": _q17_small_quantity_revenue,
        "q20_pattern_shippers": _q20_pattern_shippers,
        "e3_bm25_topk": _e3_bm25_topk,
        "e3_ppl_buckets": _e3_ppl_buckets,
        "e3_unicode_normalize": _e3_unicode_normalize,
        "e3_url_canonicalize": _e3_url_canonicalize,
        "e3_wordlm": _e3_wordlm,
        "e3_kn_ppl": _e3_kn_ppl,
        "g_bfs_distances": _g_bfs_distances,
        "g_label_prop": _g_label_prop,
        "er_resolve": _er_resolve,
        "e3_gopher_rep": _e3_gopher_rep,
        "e1_c4_filter": _e1_c4_filter,
        "e1_pii_scrub": _e1_pii_scrub,
        "e5_span_corrupt": _e5_span_corrupt,
        "e2_hard_negatives": _e2_hard_negatives,
        "e5_calibration": _e5_calibration,
        "e5_kfold": _e5_kfold,
        "e5_profile": _e5_profile,
        "e5_group_ols": _e5_group_ols,
        "e6_cooccurrence": _e6_cooccurrence,
        "g_random_walks": _g_random_walks,
        "e3_skipgram": _e3_skipgram,
        "pipeline_curate_corpus": _pipeline_curate_corpus,
        "e5_tokenize": _e5_tokenize,
        "e2_mean_pool": _e2_mean_pool,
        "e6_transition_power": _e6_transition_power,
        "e5_prep_suite": _e5_prep_suite,
        "g_graph_suite": _g_graph_suite,
        "e3_gopher_rep_hash": _e3_gopher_rep_hash,  # rows-only: prod kernel
        "e6_attribution": _e6_attribution,
        "e5_ner_eval": _e5_ner_eval,
        "e1_repair_text": _e1_repair_text,
        "e5_augment": _e5_augment,
        "e5_iob_tags": _e5_iob_tags,
        "e5_class_report": _e5_class_report,
        "e3_char_entropy": _e3_char_entropy,
        "e3_zipf": _e3_zipf,
        "e5_datacard": _e5_datacard,
        "e4_container_probe": _e4_container_probe,
        "e4_gif_decode": _e4_gif_decode,
        "e3_unigram_tokens": _e3_unigram_tokens,  # rows-only by nature
        "e5_stratified_sample": _e5_stratified_sample,
        "e2_lsh_append_topk": _e2_lsh_append_topk,
        "e6_sessionize": _e6_sessionize,
        "q5_regional_revenue": _q5_regional_revenue,
        "j1_dim_lookup": _j1_dim_lookup,
        "q7_volume_shipping": _q7_volume_shipping,
        "agg_cube": _agg_cube,
        "w1_running_sum": _w1_running_sum,
        "w2_lag_lead": _w2_lag_lead,
        "w3_rank": _w3_rank,
        "o2_sort_upper": _o2_sort_upper,
        "a7_count": _a7_count,
        "approx_distinct": _approx_distinct,
        "f1_bracket_strip": _f1_bracket_strip,
        "f2_strip_marks": _f2_strip_marks,
        "f3_simplify_name": _f3_simplify_name,
        "syn_canonical_curie": _syn_canonical_curie,
        "syn_canonical_name": _syn_canonical_name,
        "ep1_drug_records": _ep1_drug_records,
        "e1_minhash_signatures": _e1_minhash_signatures,
        "e1_minhash_near_dup_xxh": _e1_minhash_near_dup_xxh,
        "e2_pandas_topk": _e2_pandas_topk,
        "e6_tumbling": _e6_tumbling,
        "e6_sliding": _e6_sliding,
        "e6_windows_batch": _e6_windows_batch,
        "e6_sessionize_batch": _e6_sessionize_batch,
        # round 2: temporal joins, dedup clustering, E5 widening
        "t_asof_join": _t_asof_join,
        "t_range_join": _t_range_join,
        "e1_dup_clusters": _e1_dup_clusters,
        "e2_label_centroids": _e2_label_centroids,
        "e3_gopher_filter": _e3_gopher_filter,
        "pipeline_clean_corpus": _pipeline_clean_corpus,
        "e5_hash_sample": _e5_hash_sample,
        "e5_hash_split": _e5_hash_split,
        "e3_tfidf": _e3_tfidf,
        "e1_incremental_dedup": _e1_incremental_dedup,
        "e3_repetition": _e3_repetition,
        "e3_redact_pii": _e3_redact_pii,
        "e5_skew_profile": _e5_skew_profile,
        "q6_forecast_revenue": _q6_forecast_revenue,
        "q14_promo_revenue": _q14_promo_revenue,
        "q4_order_priority": _q4_order_priority,
        "a9_percentiles": _a9_percentiles,
        # round 2: full TPC-H-shape sweep over the star schema
        "q8_market_share": _q8_market_share,
        "q9_product_profit": _q9_product_profit,
        "q11_important_parts": _q11_important_parts,
        "q12_late_priority": _q12_late_priority,
        "q13_order_count_distribution": _q13_order_count_distribution,
        "q15_top_supplier": _q15_top_supplier,
        "q16_supplier_counts": _q16_supplier_counts,
        "q19_disjunctive_revenue": _q19_disjunctive_revenue,
        "q21_late_sole_supplier": _q21_late_sole_supplier,
        "q22_idle_customers": _q22_idle_customers,
        "q2_min_cost_supplier": _q2_min_cost_supplier,
        # round 4: the suite-consolidated originals stay individually
        # runnable + per-entry hash-checked here (driver window shows
        # them via u_set_suite / f_curie_suite)
        "a5_distinct": _a5_distinct,
        "u2_intersect": _u2_intersect,
        "u3_anti_join": _u3_anti_join,
        "a8_explode_distinct": _a8_explode_distinct,
        "o1_topk": _o1_topk,
        "j9_semi_join": _j9_semi_join,
        "f4_curie_prefix_upper": _f4_curie_prefix_upper,
        "f10_prefix_extract": _f10_prefix_extract,
        # round 5: exact-target domain mixture draw (hash-oracled)
        "e5_mixture_sample": _e5_mixture_sample,
        # round 5: char-trigram LM perplexity quality signal (hash-oracled)
        "e3_charlm": _e3_charlm,
        # round 5: intra-document repeated-ngram removal (hash-oracled)
        "e1_intradoc_dedup": _e1_intradoc_dedup,
        # round 5: contamination-proof cluster-unit split (hash-oracled)
        "e5_cluster_safe_split": _e5_cluster_safe_split,
        # round 5: materialized packed training sequences (hash-oracled)
        "e3_packed_sequences_rows": _e3_packed_sequences_rows,
        # round 5: PIVOT reshaping + its UNPIVOT inverse (hash-oracled)
        "e5_pivot": _e5_pivot,
        "e5_unpivot": _e5_unpivot,
        # round-6 rotation prep: the whole pytest-only TPC-H sweep as
        # one tagged-union row (hash-oracled at both SFs)
        "q_tpch_suite": _q_tpch_suite,
        # round 5 late: cross-document substring dedup (hash-oracled)
        "e1_crossdoc_dedup": _e1_crossdoc_dedup,
        # round 5 late: join-free Bloom decontamination (hash-oracled,
        # false positives replicated)
        "e1_bloom_decontaminate": _e1_bloom_decontaminate,
        # round 5 late: count-min sketch point queries (hash-oracled —
        # the one sketch family whose cells ARE cross-engine exact)
        "e5_countmin_topk": _e5_countmin_topk,
        # round 5 late: zlib redundancy quality signal (rows-only —
        # zlib has no DuckDB twin; goldens in test_ext_operators.py)
        "e3_compression_ratio": _e3_compression_ratio,
        # round 6: unigram APPLY on the frozen fixture table — the
        # hash-oracled replacement for the rows-only e3_unigram_tokens
        # driver slot (recursive-SQL Viterbi DP oracle)
        "e3_unigram_apply": _e3_unigram_apply,
        # round 6: end-to-end text retrieval (chunk → hashed-TF → LSH
        # index on disk → probe → hydrate) — composed hash oracle
        "e2_retrieval_topk": _e2_retrieval_topk,
        # round 5 late: SemDeDup-shape semantic dedup (hash-oracled via
        # recursive-SQL connected components over the cosine pairs)
        "e1_semantic_dedup": _e1_semantic_dedup,
        # round 5 late: deterministic global training-order shuffle
        # (hash-oracled — md5 hash order replicated in SQL)
        "e3_shuffle_shards": _e3_shuffle_shards,
        # round 5 late: fractional-epoch domain upsampling (hash-oracled)
        "e5_weighted_upsample": _e5_weighted_upsample,
        # round 5 late: pow-2 length bucketing for batching (hash-oracled)
        "e3_length_buckets": _e3_length_buckets,
        # round 5 late: int8 scalar quantization for serving (hash-oracled)
        "e2_int8_quantize": _e2_int8_quantize,
        # round 5 late: per-language boilerplate trigram top-k (hash-oracled)
        "e3_ngram_topk": _e3_ngram_topk,
        # round 5 late: Aho-Corasick dictionary tagging (hash-oracled —
        # brute-force substr oracle; round-6 rotation candidate)
        "e3_dict_tag": _e3_dict_tag,
        # round 5 late: EM/token-F1/ROUGE-n eval metrics (hash-oracled;
        # round-6 rotation candidate)
        "e5_eval_scores": _e5_eval_scores,
        # round 5 late: SFT chat-template rendering (hash-oracled;
        # round-6 rotation candidate)
        "e5_chat_render": _e5_chat_render,
        # round 5 late: NIAH needle injection at controlled depth
        # (hash-oracled; round-6 rotation candidate)
        "e5_needle_inject": _e5_needle_inject,
        # round 5 late: BMP + WARC round-trip probes (hash-oracled;
        # round-6 rotation candidates)
        "e4_bmp_decode": _e4_bmp_decode,
        "s_warc_probe": _s_warc_probe,
        "s_tar_probe": _s_tar_probe,
        # round 5 late: the originals consolidated into the four
        # late-rotation suites (e2_ann_suite / e1_dedup_suite /
        # e3_qual_suite / f_text_suite) — individually runnable and
        # hash-checked here, exactly like the earlier consolidations
        "e2_cosine_topk": _e2_cosine_topk,
        "e2_lsh_topk": _e2_lsh_topk,
        "e2_ivf_topk": _e2_ivf_topk,
        "e1_exact_dedup": _e1_exact_dedup,
        "e1_dedup_survivor": _e1_dedup_survivor,
        "e1_minhash_near_dup": _e1_minhash_near_dup,
        "e1_decontaminate": _e1_decontaminate,
        "e1_dup_clusters_star": _e1_dup_clusters_star,
        "e3_text_quality": _e3_text_quality,
        "e3_bpe_tokens": _e3_bpe_tokens,
        "e3_chunk_documents": _e3_chunk_documents,
        "f_name_normalize": _f_name_normalize,
        "f5_sentence_pipeline": _f5_sentence_pipeline,
        # round 4: mergeable-sketch distinct counts — estimates by
        # design, so tolerance-tested in pytest instead of hash-oracled
        # (rows-only here; see tests/test_ext_operators.py)
        "e5_sketch_distinct": _e5_sketch_distinct,
        # round 4: multimodal ANALYSIS over real codecs — hash/FFT
        # outputs aren't SQL-expressible → rows-only; goldens in
        # tests/test_png_codec.py + tests/test_wav_codec.py
        "e4_image_hashes": _e4_image_hashes,
        "e4_audio_features": _e4_audio_features,
        # round 6: REAL MPEG-1 Layer I/II sample decode (rows-only —
        # the synthesis filterbank has no SQL twin; SNR/PR goldens in
        # tests/test_mpeg_audio.py)
        "e4_mpeg_decode": _e4_mpeg_decode,
        # round-14 demotions (5-6x driver-green; oracles unchanged)
        "x1_tfidf_linker": _x1_tfidf_linker,
        "e5_gov_suite": _e5_gov_suite,
        # round 7 (round-8 pool): distributed suffix array (prefix
        # doubling, two-phase global dense-rank) + Lee-et-al exact
        # substring duplication — both hash-oracled against direct
        # suffix-string sorts in SQL
        "e1_suffix_array": _e1_suffix_array,
        "e1_sa_dup_spans": _e1_sa_dup_spans,
        # round 8 (VERDICT r07 next #2): the composed removal step
        "e1_sa_dedup": _e1_sa_dedup,
        # round 8 (VERDICT r07 next #8): EP1 with the relational
        # dictionary spotter — zero stub factories anywhere
        "ep1_spotted_nodes": _ep1_spotted_nodes,
        # round 7 (round-8 pool): the third flagship composition —
        # curation chain -> sequence packing of the survivors
        "pipeline_pretrain_prep": _pipeline_pretrain_prep,
        # round 7 (round-8 pool): classical seasonal decomposition
        "t_seasonal": _t_seasonal,
        # round 7 (round-8 pool): 1-bit quantization + Hamming top-k,
        # the composed rerank funnel, and PageRank (chained-CTE oracle)
        "e2_hamming_topk": _e2_hamming_topk,
        "e2_rerank_topk": _e2_rerank_topk,
        # round 8 (VERDICT r07 next #7): banded corpus×corpus pairs
        "e2_hamming_pairs": _e2_hamming_pairs,
        # round 8 (round-9 pool): distributed Lloyd's k-means + the
        # cluster-balanced diversity draw over its fit
        "e2_kmeans": _e2_kmeans,
        "e2_cluster_sample": _e2_cluster_sample,
        "e2_semdedup_kmeans": _e2_semdedup_kmeans,
        # round 8 (round-9 pool): the semantic decontamination face +
        # the deterministic FIM pretraining transform
        "e1_semantic_decontaminate": _e1_semantic_decontaminate,
        "e5_fim_transform": _e5_fim_transform,
        # round 8 (round-9 pool): the streaming routing face — equals
        # the batch k-means assignment over the finite input
        "e2_assign_stream": _e2_assign_stream,
        "g_pagerank": _g_pagerank,
        "g_ppr": _g_ppr,
        # round 9 (round-10 pool): coreness by synchronized h-index
        # iteration — fixed rounds, chained-CTE integer replay oracle
        "g_kcore": _g_kcore,
        # round 9 (round-10 pool): Newman modularity of the LPA
        # communities — exact integer numerators, one division per row
        "g_modularity": _g_modularity,
        # round 9 (round-10 pool): stream-stream range join under the
        # driver — watermark-bounded state, batch-equality oracle
        "e6_interval_join": _e6_interval_join,
        # round 9 (round-10 pool): tokenizer fertility audit — exact
        # divisions over the wordpiece apply + doc word/char counts
        "e3_fertility": _e3_fertility,
        # round 9 (round-10 pool): MCC + Cohen's kappa — integer
        # numerators, sqrt-only denominators, one division each
        "e5_agreement": _e5_agreement,
        # round 9 (round-10 pool): two-sided CUSUM change detection —
        # closed-form window shape, BIGINT micro-units end to end
        "t_cusum": _t_cusum,
        # round 9 (round-10 pool): corpus BLEU-4 — exact clipped
        # fractions, sqrt-only geometric mean, BP as a log-ratio
        "e5_bleu": _e5_bleu,
        # round 9 (round-10 pool): signed random projection (angle-
        # preserving 1-bit codes) + its Hamming top-k composition
        "e2_srp_sketch": _e2_srp_sketch,
        # round 9 (round-10 pool): DP quantiles off one noisy CDF —
        # post-processing of a single Laplace histogram release
        "e5_dp_quantile": _e5_dp_quantile,
        # round 9 (round-10 pool): Holt linear-trend smoothing — one
        # fold per key, recursive-CTE replay oracle, bit-exact doubles
        "t_holt": _t_holt,
        "e5_dp_histogram": _e5_dp_histogram,
        # round 8 (VERDICT r07 next #3/#4): bench-grade SA slice +
        # corpus-scale TF-IDF linker probes (max_df off/on)
        "e1_suffix_array_bench": _e1_suffix_array_bench,
        "x1_linker_corpus": _x1_linker_corpus,
        "x1_linker_corpus_maxdf": _x1_linker_corpus_maxdf,
        # round 9 (round-10 pool): the linker serving face — persisted
        # gram-bucket index probe, bit-identical to the inline fit
        "x1_linker_indexed": _x1_linker_indexed,
        # round 8 (VERDICT r07 next #6): user-level DP with the
        # per-contributor clamp
        "e5_dp_histogram_user": _e5_dp_histogram_user,
        # round 6: event-analytics + retrieval-metric widening, all
        # hash-oracled (rotation candidates for the next window)
        "e6_funnel": _e6_funnel,
        "e5_cohort_retention": _e5_cohort_retention,
        "e5_retrieval_metrics": _e5_retrieval_metrics,
        "e5_cdc_apply": _e5_cdc_apply,
        "e1_near_dup_recall": _e1_near_dup_recall,
        "e1_simhash_pairs": _e1_simhash_pairs,
        "e5_temperature_mix": _e5_temperature_mix,
        "g_triangle_count": _g_triangle_count,
        "g_common_neighbors": _g_common_neighbors,
        "e5_ndcg": _e5_ndcg,
        "e5_dsir_weights": _e5_dsir_weights,
        "t_resample_gapfill": _t_resample_gapfill,
        "t_ewma": _t_ewma,
        "t_anomaly": _t_anomaly,
        "e5_k_anonymity": _e5_k_anonymity,
        "e1_boilerplate_strip": _e1_boilerplate_strip,
        "e6_transition_matrix": _e6_transition_matrix,
        "e6_top_paths": _e6_top_paths,
        "j_jw_match": _j_jw_match,
        "e5_winsorize": _e5_winsorize,
        "e3_wordpiece_apply": _e3_wordpiece_apply,
        # round 5: the originals consolidated into the six new suites
        # (driver window shows them via syn_suite / j_join_suite /
        # a_agg_suite / e1_near_dup_suite / e3_docmeta_suite /
        # e4_media_suite / the extended u_set_suite)
        "syn_canonical": _syn_canonical,
        "syn_equivalent_nodes": _syn_equivalent_nodes,
        "syn_category_histogram": _syn_category_histogram,
        "syn_normalizer_nodes": _syn_normalizer_nodes,
        "j2_mode_vote": _j2_mode_vote,
        "j4_coalesce_fallback": _j4_coalesce_fallback,
        "j5_prefix_expansion": _j5_prefix_expansion,
        "a2_longest_value": _a2_longest_value,
        "a4_category_histogram": _a4_category_histogram,
        "a6_first_writer_wins": _a6_first_writer_wins,
        "e1_simhash": _e1_simhash,
        "e1_ngram_jaccard": _e1_ngram_jaccard,
        "e1_embedding_near_dup": _e1_embedding_near_dup,
        "e3_lang_id": _e3_lang_id,
        "e3_fingerprint": _e3_fingerprint,
        "e4_png_decode": _e4_png_decode,
        "e4_media_metadata": _e4_media_metadata,
        "u1_union_merge": _u1_union_merge,
        "u4_union_prefer_first": _u4_union_prefer_first,
    }


def _sql_en_stopwords() -> str:
    """DuckDB list literal of the Gopher filter's English stopwords —
    derived from the SAME constant the Spark operator uses, so the two
    engines can never drift."""
    from drugbankner_spark.operators.textanalysis import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"


_SQL_EN_STOPWORDS = _sql_en_stopwords()


def _punct_ws_sql() -> str:
    """SQL expression for Python's string.punctuation + string.whitespace
    (the F3 char-delete set), control chars via chr()."""
    import string as _s

    printable = "".join(c for c in _s.punctuation if c != "'") + "''" + " "
    ctrl = "||".join(f"chr({ord(c)})" for c in "\t\n\x0b\x0c\r")
    return f"'{printable}'||{ctrl}"


def _f7_oracle() -> str:
    from drugbankner_spark.functions.identifiers import IDENTIFIER_PATTERNS

    stanzas = []
    for db, prefix, pattern in IDENTIFIER_PATTERNS:
        stanzas.append(f"""
            SELECT event_id, database, candidate_curie FROM (
                SELECT event_id, '{db}' AS database,
                       '{prefix}' || ':' || props AS candidate_curie,
                       unnest(regexp_extract_all(props, '{pattern}')) AS m
                FROM events
            )""")
    return "\nUNION ALL\n".join(stanzas)


def _sql_cap(e: str) -> str:
    """F4 in SQL: uppercase prefix before first ':', else whole string."""
    head = f"split_part({e}, ':', 1)"
    return (f"CASE WHEN strpos({e}, ':') > 0 THEN upper({head}) || ':' || "
            f"substr({e}, length({head}) + 2) ELSE upper({e}) END")


def _sql_simplify(e: str) -> str:
    return f"translate(lower({e}), {_punct_ws_sql()}, '')"


def _sql_biolink(e: str) -> str:
    return (f"CASE WHEN {e} IS NOT NULL AND {e} <> '' "
            f"THEN 'biolink:' || {e} ELSE {e} END")


def _sql_inputs(vals: list[str]) -> str:
    body = ", ".join("('" + v.replace("'", "''") + "')" for v in vals)
    return f"(SELECT * FROM (VALUES {body}) AS t(entity))"


def _syn_with(extra: str = "") -> str:
    from drugbankner_spark import fixtures as FX

    return f"""WITH syn_nodes AS {FX.nodes_values_sql()},
        syn_clusters AS {FX.clusters_values_sql()},
        name_counts AS (
            SELECT name_simplified, cluster_id, count(*) AS cnt
            FROM syn_nodes WHERE name_simplified IS NOT NULL
            GROUP BY name_simplified, cluster_id
        ),
        name_best AS (
            SELECT name_simplified, cluster_id FROM (
                SELECT name_simplified, cluster_id,
                       row_number() OVER (
                           PARTITION BY name_simplified
                           ORDER BY cnt DESC, cluster_id
                       ) AS rn
                FROM name_counts
            ) WHERE rn = 1
        ){extra}"""


def _syn_canonical_curie_oracle() -> str:
    return _syn_with() + f"""
        SELECT i.entity,
               n.cluster_id AS preferred_curie,
               c.name AS preferred_name,
               {_sql_biolink('c.category')} AS preferred_category
        FROM {_sql_inputs(_SYN_CURIE_INPUTS)} i
        LEFT JOIN syn_nodes n ON n.id_simplified = {_sql_cap('i.entity')}
        LEFT JOIN syn_clusters c ON c.cluster_id = n.cluster_id
    """


def _syn_canonical_name_oracle() -> str:
    return _syn_with() + f"""
        SELECT i.entity,
               b.cluster_id AS preferred_curie,
               c.name AS preferred_name,
               {_sql_biolink('c.category')} AS preferred_category
        FROM {_sql_inputs(_SYN_NAME_INPUTS)} i
        LEFT JOIN name_best b ON b.name_simplified = {_sql_simplify('i.entity')}
        LEFT JOIN syn_clusters c ON c.cluster_id = b.cluster_id
    """


def _syn_equivalent_nodes_oracle() -> str:
    return _syn_with(f""",
        resolved AS (
            SELECT i.entity, coalesce(n.cluster_id, b.cluster_id) AS cid
            FROM {_sql_inputs(_SYN_EQ_INPUTS)} i
            LEFT JOIN syn_nodes n ON n.id_simplified = {_sql_cap('i.entity')}
            LEFT JOIN name_best b ON b.name_simplified = {_sql_simplify('i.entity')}
        )""") + """
        SELECT entity, equivalent_id FROM (
            SELECT r.entity, unnest(c.member_ids) AS equivalent_id
            FROM resolved r JOIN syn_clusters c ON c.cluster_id = r.cid
        )
    """


def _syn_category_histogram_oracle() -> str:
    return _syn_with() + f"""
        SELECT cluster_id, {_sql_biolink('category')} AS category,
               count(*) AS cnt
        FROM syn_nodes GROUP BY cluster_id, category
    """


def _syn_normalizer_nodes_oracle() -> str:
    return _syn_with(f""",
        resolved AS (
            SELECT i.entity, coalesce(n.cluster_id, b.cluster_id) AS cid
            FROM {_sql_inputs(_SYN_NORM_INPUTS)} i
            LEFT JOIN syn_nodes n ON n.id_simplified = {_sql_cap('i.entity')}
            LEFT JOIN name_best b ON b.name_simplified = {_sql_simplify('i.entity')}
        ),
        eq AS (
            SELECT entity, unnest(c.member_ids) AS equivalent_id, r.cid
            FROM resolved r JOIN syn_clusters c ON c.cluster_id = r.cid
        )""") + f"""
        SELECT eq.entity, eq.equivalent_id,
               n.name AS label,
               {_sql_biolink('n.category')} AS category,
               n.major_branch,
               n.name_sri,
               n.category_sri IS NOT NULL AS in_sri,
               {_sql_biolink('n.category_sri')} AS category_sri,
               n.name_kg2pre,
               n.category_kg2pre IS NOT NULL AS in_kg2pre,
               {_sql_biolink('n.category_kg2pre')} AS category_kg2pre,
               n.cluster_id,
               cr.name AS cluster_preferred_name
        FROM eq
        LEFT JOIN syn_nodes n ON n.id = eq.equivalent_id
        LEFT JOIN syn_clusters cr ON cr.cluster_id = n.cluster_id
    """


# --- EP1/EP2 pipeline oracle builders --------------------------------------

def _mech_cats_sql() -> str:
    from drugbankner_spark.operators.ner import MECHANISTIC_CATEGORIES

    return "(" + ", ".join(f"'{c}'" for c in MECHANISTIC_CATEGORIES) + ")"


def _tfidf_link_cte(
    mentions_rel: str, threshold: float, k: int,
    out_name: str = "tfidf_linked", alias_rel: str = "syn_nodes",
    max_df_ratio: float | None = None,
) -> str:
    """The in-engine TF-IDF char-3gram linker (operators/linker.py)
    replicated term-for-term in SQL: sklearn char_wb grams (lowercase,
    whitespace-split, space-padded tokens), smooth idf
    ln((1+N)/(1+df))+1 fit over DISTINCT alias strings from syn_nodes,
    L2-normalized vectors, cosine as the posting-list join dot product,
    round(6) before threshold/rank — the same arithmetic order the
    Spark operator uses, so the floats agree at 6dp. Emits
    ``{out_name}(mention, alias_id, score, rank)``; expects
    ``syn_nodes`` (from _syn_with) and ``{mentions_rel}(mention)`` in
    scope."""
    df_cut = (
        "" if max_df_ratio is None
        else f" HAVING count(*) <= {max_df_ratio} * n"
    )
    return f""",
        tf_alias_map AS (
            SELECT DISTINCT name AS alias, id AS alias_id
            FROM {alias_rel}
            WHERE name IS NOT NULL AND id IS NOT NULL
        ),
        tf_a_texts AS (SELECT DISTINCT alias FROM tf_alias_map),
        tf_a_toks AS (
            SELECT alias, unnest(list_filter(
                string_split_regex(lower(alias), '\\s+'),
                t -> t <> '')) AS t
            FROM tf_a_texts
        ),
        tf_a_grams AS (
            SELECT alias, substr(' ' || t || ' ', i, 3) AS gram
            FROM tf_a_toks,
                 UNNEST(generate_series(1, length(t))) AS g(i)
        ),
        tf_a_counts AS (
            SELECT alias, gram, count(*) AS tf
            FROM tf_a_grams GROUP BY 1, 2
        ),
        tf_n AS (SELECT count(*) AS n FROM tf_a_texts),
        tf_idf AS (
            SELECT gram, ln((1.0 + n) / (1.0 + count(*))) + 1.0 AS idf
            FROM tf_a_counts, tf_n GROUP BY gram, n{df_cut}
        ),
        tf_a_w AS (
            SELECT alias, gram, tf * idf AS w
            FROM tf_a_counts JOIN tf_idf USING (gram)
        ),
        tf_a_norm AS (
            SELECT alias, sqrt(sum(w * w)) AS nrm FROM tf_a_w GROUP BY alias
        ),
        tf_a_post AS (
            SELECT gram, alias, w / nrm AS w
            FROM tf_a_w JOIN tf_a_norm USING (alias)
        ),
        tf_m_toks AS (
            SELECT mention, unnest(list_filter(
                string_split_regex(lower(mention), '\\s+'),
                t -> t <> '')) AS t
            FROM {mentions_rel}
        ),
        tf_m_grams AS (
            SELECT mention, substr(' ' || t || ' ', i, 3) AS gram
            FROM tf_m_toks,
                 UNNEST(generate_series(1, length(t))) AS g(i)
        ),
        tf_m_counts AS (
            SELECT mention, gram, count(*) AS tf
            FROM tf_m_grams GROUP BY 1, 2
        ),
        tf_m_w AS (
            SELECT mention, gram, tf * idf AS w
            FROM tf_m_counts JOIN tf_idf USING (gram)
        ),
        tf_m_norm AS (
            SELECT mention, sqrt(sum(w * w)) AS nrm
            FROM tf_m_w GROUP BY mention
        ),
        tf_m_vec AS (
            SELECT gram, mention, w / nrm AS mw
            FROM tf_m_w JOIN tf_m_norm USING (mention)
        ),
        tf_scored AS (
            SELECT mention, alias, round(sum(mw * w), 6) AS score
            FROM tf_m_vec JOIN tf_a_post USING (gram) GROUP BY 1, 2
        ),
        tf_per_concept AS (
            SELECT mention, alias_id, max(score) AS score
            FROM tf_scored JOIN tf_alias_map USING (alias) GROUP BY 1, 2
        ),
        {out_name} AS (
            SELECT mention, alias_id, score, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY mention
                    ORDER BY score DESC, alias_id ASC
                ) AS rank
                FROM tf_per_concept WHERE score >= {threshold}
            ) WHERE rank <= {k}
        )"""


def _e2_kmeans_oracle(k: int = 8, n_iters: int = 3, dim: int = 64,
                      scale: int = 10_000,
                      tail: str | None = None,
                      recursive: bool = False) -> str:
    """Chained-CTE replay of kmeans_lloyd (the g_label_prop/g_pagerank
    replay pattern): grid-quantized points, hash-ranked seeds, then per
    iteration one distance CTE + one argmin CTE + one grid-rounded
    centroid CTE — all-integer geometry, so the replay is bitwise."""
    h = _sql_hash32("CAST(id AS VARCHAR)")
    parts = [f"""
        WITH {"RECURSIVE " if recursive else ""}pts AS (
            SELECT vec_id AS id, i - 1 AS dim,
                   CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale}
                              + 0.5) AS BIGINT) AS v
            FROM embeddings,
                 UNNEST(generate_series(1, {dim})) AS g(i)
        ),
        seeds AS (
            SELECT id, rn - 1 AS cid FROM (
                SELECT DISTINCT id,
                       row_number() OVER (ORDER BY {h}, id) AS rn
                FROM (SELECT DISTINCT id FROM pts)
            ) WHERE rn <= {k}
        ),
        cent_0 AS (
            SELECT s.cid, p.dim, p.v AS c
            FROM pts p JOIN seeds s ON s.id = p.id
        )"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
        scored_{i} AS (
            SELECT p.id, c.cid,
                   CAST(sum((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS d
            FROM pts p JOIN cent_{i - 1} c USING (dim)
            GROUP BY 1, 2
        ),
        assign_{i} AS (
            SELECT id, cid, d FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY id ORDER BY d, cid
                ) AS rn FROM scored_{i}
            ) WHERE rn = 1
        )""")
        if i < n_iters:
            parts.append(f""",
        cent_{i} AS (
            SELECT a.cid, p.dim,
                   CAST(floor(CAST(sum(p.v) AS DOUBLE) / count(*)
                              + 0.5) AS BIGINT) AS c
            FROM pts p JOIN assign_{i} a USING (id)
            GROUP BY 1, 2
        )""")
    parts.append(tail if tail is not None else f"""
        SELECT id AS vec_id, cid AS cluster_id,
               CAST(d AS BIGINT) AS sq_dist
        FROM assign_{n_iters}
    """)
    return "".join(parts)


def _x1_linker_corpus_oracle(
    max_df_ratio: float | None,
    mention_pred: str = "doc_id % 50 = 0 AND doc_id < 5000",
) -> str:
    """The corpus-scale linker probe in SQL (VERDICT r07 next #4):
    trigram mentions (doc_id % 50 slice) linked against a trigram
    alias dim (doc_id % 70 == 3 slice, md5-hash ids) through the same TF-IDF
    replication the mini-KB linker oracle uses — parameterized by the
    max_df stop-gram cut so both bench variants hash-check, and by the
    mention slice so the small-batch serving probe (x1_linker_served,
    round 12) shares the same oracle body."""
    trigram = """
            SELECT DISTINCT array_to_string(tk[i:i+2], ' ') AS gram
            FROM (
                SELECT list_filter(
                    string_split_regex(text, '\\s+'), t -> t <> '') AS tk
                FROM documents WHERE {pred}
            ), UNNEST(generate_series(1, len(tk) - 2)) AS ii(i)
    """
    return ("WITH mentions_rel AS (SELECT gram AS mention FROM ("
            + trigram.format(pred=mention_pred)
            + ")), alias_dim AS (SELECT gram AS name, "
            + _sql_hash32("gram")
            + " AS id FROM (" + trigram.format(pred="doc_id % 70 = 3")
            + "))"
            + _tfidf_link_cte(
                "mentions_rel", 0.6, 1,
                alias_rel="alias_dim", max_df_ratio=max_df_ratio,
            )
            + "\nSELECT mention, alias_id, score, rank FROM tfidf_linked")


def _x1_tfidf_linker_oracle() -> str:
    mentions = ", ".join(
        "('" + m.replace("'", "''") + "')" for m in _TFIDF_MENTIONS
    )
    return _syn_with(f""",
        probe_mentions AS (
            SELECT * FROM (VALUES {mentions}) AS t(mention)
        )""" + _tfidf_link_cte("probe_mentions", 0.5, 3)) + """
        SELECT mention, alias_id, score, rank FROM tfidf_linked
    """


def _ep1_tfidf_oracle() -> str:
    """EP1 with the in-engine TF-IDF linker, end to end in SQL: the
    frozen stub detections stripped to SPOTTING rows (distinct surface
    sightings, every kb id dropped), relinked by the TF-IDF CTE at the
    reference's threshold=0.7/k=1, then the UNCHANGED J7 + A2/A6
    assembly over the relinked rows."""
    from drugbankner_spark import fixtures_ner as FN

    return _syn_with(f""",
        detected AS {FN.detected_values_sql()},
        spot AS (
            SELECT DISTINCT kg2_id, sentence, entity_text FROM detected
        ),
        spot_mentions AS (
            SELECT DISTINCT entity_text AS mention FROM spot
            WHERE entity_text IS NOT NULL
        )""" + _tfidf_link_cte("spot_mentions", 0.7, 1) + """,
        relinked AS (
            SELECT s.kg2_id, s.sentence, s.entity_text,
                   l.alias_id AS kb_id
            FROM spot s
            LEFT JOIN tfidf_linked l ON l.mention = s.entity_text
        )""" + _ep1_assembly_sql("relinked")) + """
        SELECT kg2_id, curie, name, category FROM ep1_nodes
    """


def _ep1_spotted_oracle() -> str:
    """EP1 with the relational spotter + TF-IDF linker, end to end in
    SQL (VERDICT r07 next #8): the prepared-sentence set comes from
    the frozen fixture's DISTINCT (kg2_id, sentence) rows (the fixture
    carries the no-detection sentinels, so it is the COMPLETE sentence
    inventory, drift-tested against the live prepare_sentences);
    spotting = token n-grams (n = 1..4) equi-joined to the
    synonymizer's alias surfaces, linking = the TF-IDF CTE at
    threshold 0.7/k=1, then the unchanged J7 + A2/A6 assembly."""
    from drugbankner_spark import fixtures_ner as FN

    return _syn_with(f""",
        detected AS {FN.detected_values_sql()},
        sent AS (SELECT DISTINCT kg2_id, sentence FROM detected),
        stoks AS (
            SELECT kg2_id, sentence,
                   list_filter(
                       string_split_regex(sentence, '\\s+'),
                       t -> t <> '') AS tk
            FROM sent
        ),
        sgrams AS (
            SELECT DISTINCT kg2_id, sentence,
                   array_to_string(tk[i:i+n-1], ' ') AS gram
            FROM stoks,
                 UNNEST(generate_series(1, 4)) AS nn(n),
                 UNNEST(generate_series(1, len(tk))) AS ii(i)
            WHERE i + n - 1 <= len(tk)
        ),
        surf AS (
            SELECT DISTINCT trim(regexp_replace(
                lower(name), '\\s+', ' ', 'g')) AS s
            FROM syn_nodes
            WHERE name IS NOT NULL
              AND trim(regexp_replace(lower(name), '\\s+', ' ', 'g'))
                  <> ''
        ),
        spotted AS (
            SELECT DISTINCT g.kg2_id, g.sentence,
                   g.gram AS entity_text
            FROM sgrams g JOIN surf ON lower(g.gram) = surf.s
        ),
        spot AS (
            SELECT kg2_id, sentence, entity_text FROM spotted
            UNION ALL
            SELECT s.kg2_id, s.sentence, NULL
            FROM sent s
            WHERE NOT EXISTS (
                SELECT 1 FROM spotted p
                WHERE p.kg2_id = s.kg2_id AND p.sentence = s.sentence
            )
        ),
        spot_mentions AS (
            SELECT DISTINCT entity_text AS mention FROM spot
            WHERE entity_text IS NOT NULL
        )""" + _tfidf_link_cte("spot_mentions", 0.7, 1) + """,
        relinked AS (
            SELECT s.kg2_id, s.sentence, s.entity_text,
                   l.alias_id AS kb_id
            FROM spot s
            LEFT JOIN tfidf_linked l ON l.mention = s.entity_text
        )""" + _ep1_assembly_sql("relinked")) + """
        SELECT kg2_id, curie, name, category FROM ep1_nodes
    """


def _ep1_assembly_sql(detected_rel: str) -> str:
    """The J7 + A2/A6 assembly CTEs over an arbitrary detected-shaped
    relation (kg2_id, sentence, entity_text, kb_id) — shared by the
    classic EP1/EP2 oracles (relation: frozen stub detections) and the
    TF-IDF-linked variant (relation: relinked spotting rows)."""
    return f""",
        ner_hits AS (
            SELECT d.kg2_id, d.entity_text,
                   n.cluster_id AS preferred_curie,
                   {_sql_biolink('c.category')} AS preferred_category
            FROM {detected_rel} d
            JOIN syn_nodes n
              ON d.kb_id IS NOT NULL
             AND n.id_simplified = {_sql_cap('d.kb_id')}
            JOIN syn_clusters c ON c.cluster_id = n.cluster_id
            UNION ALL
            SELECT d.kg2_id, d.entity_text, b.cluster_id,
                   {_sql_biolink('c.category')}
            FROM {detected_rel} d
            JOIN name_best b
              ON d.kb_id IS NULL AND d.entity_text IS NOT NULL
             AND b.name_simplified = {_sql_simplify('d.entity_text')}
            JOIN syn_clusters c ON c.cluster_id = b.cluster_id
            UNION ALL
            SELECT d.kg2_id, d.sentence AS entity_text, b.cluster_id,
                   {_sql_biolink('c.category')}
            FROM {detected_rel} d
            JOIN name_best b
              ON d.entity_text IS NULL
             AND b.name_simplified = {_sql_simplify('d.sentence')}
            JOIN syn_clusters c ON c.cluster_id = b.cluster_id
        ),
        ner_aligned AS (
            SELECT DISTINCT kg2_id, entity_text, preferred_curie,
                            preferred_category
            FROM ner_hits
        ),
        ep1_nodes AS (
            SELECT kg2_id, curie, name, category FROM (
                SELECT kg2_id, preferred_curie AS curie,
                       entity_text AS name,
                       preferred_category AS category,
                       row_number() OVER (
                           PARTITION BY kg2_id, preferred_curie
                           ORDER BY length(entity_text) DESC, entity_text
                       ) AS rn
                FROM ner_aligned
                WHERE preferred_category IN {_mech_cats_sql()}
            ) WHERE rn = 1
        )"""


def _ep1_assembly_cte() -> str:
    """J7 + A2/A6 (perform_NER.py:119-134) in SQL, starting from the
    frozen stub detections: curie path / name path / sentence-as-name
    path unioned, distinct per (drug, surface, preferred), then the
    category-filtered longest-surface merge. (Assembly body shared with
    the TF-IDF-linked variant via _ep1_assembly_sql.)"""
    from drugbankner_spark import fixtures_ner as FN

    return (f""",
        detected AS {FN.detected_values_sql()}"""
            + _ep1_assembly_sql("detected"))


def _ep1_mechanistic_oracle() -> str:
    return _syn_with(_ep1_assembly_cte()) + """
        SELECT kg2_id, curie, name, category FROM ep1_nodes
    """


def _ep2_aligned_oracle() -> str:
    """EP2 merge (look_for_identifiers.py:71-105) in SQL: J8 name hits
    (rank 1) + F7 full-text-CURIE id hits (rank 2) unioned under the EP1
    NER nodes (rank 0), first-writer-wins per (drug, curie)."""
    from drugbankner_spark import fixtures_ner as FN
    from drugbankner_spark.functions.identifiers import IDENTIFIER_PATTERNS

    id_stanzas = "\nUNION ALL\n".join(
        f"""SELECT kg2_id, field_rank, candidate FROM (
                SELECT kg2_id, field_rank,
                       '{prefix}' || ':' || value AS candidate,
                       unnest(regexp_extract_all(value, '{pattern}')) AS m
                FROM bioent
                WHERE kind = 'id' AND strpos(value, ':') = 0
            )"""
        for _db, prefix, pattern in IDENTIFIER_PATTERNS
    )
    return _syn_with(_ep1_assembly_cte() + f""",
        bioent AS {FN.bioentities_values_sql()},
        name_hits AS (
            SELECT e.kg2_id, b.cluster_id AS curie, c.name AS name,
                   {_sql_biolink('c.category')} AS category,
                   1 AS _rank, e.field_rank AS _field_rank
            FROM bioent e
            JOIN name_best b ON b.name_simplified = {_sql_simplify('e.value')}
            JOIN syn_clusters c ON c.cluster_id = b.cluster_id
            WHERE e.kind = 'name'
        ),
        id_candidates AS ({id_stanzas}),
        id_hits AS (
            SELECT ic.kg2_id, n.cluster_id AS curie, c.name AS name,
                   {_sql_biolink('c.category')} AS category,
                   2 AS _rank, ic.field_rank AS _field_rank
            FROM id_candidates ic
            JOIN syn_nodes n ON n.id_simplified = {_sql_cap('ic.candidate')}
            JOIN syn_clusters c ON c.cluster_id = n.cluster_id
        ),
        merged AS (
            SELECT kg2_id, curie, name, category,
                   0 AS _rank, -1 AS _field_rank
            FROM ep1_nodes
            UNION ALL
            SELECT kg2_id, curie, name, category, _rank, _field_rank
            FROM name_hits
            UNION ALL
            SELECT kg2_id, curie, name, category, _rank, _field_rank
            FROM id_hits
        )""") + """
        SELECT kg2_id, curie, name, category FROM (
            SELECT kg2_id, curie, name, category,
                   row_number() OVER (
                       PARTITION BY kg2_id, curie
                       ORDER BY _rank, _field_rank, name
                   ) AS rn
            FROM merged
        ) WHERE rn = 1
    """


def _pq_adc_oracle() -> str:
    """PQ encode + ADC replicated in SQL from the SAME deterministic
    codebooks (literal lists; repr round-trips doubles exactly). Ties:
    list_position picks the FIRST minimum = smallest centroid index,
    matching Spark's (dist, idx) struct-min."""
    from drugbankner_spark.operators.similarity import pq_codebooks

    books = pq_codebooks(dim=64, m=8, ksub=16)
    cb = "[" + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(repr(v) for v in cent) + "]" for cent in book
        ) + "]" for book in books
    ) + "]"
    sq = ("round(list_sum(list_transform(generate_series(1, 8), i -> "
          "({v}[(j - 1) * 8 + i] - books[j][c][i])"
          " * ({v}[(j - 1) * 8 + i] - books[j][c][i]))), 9)")
    sq_raw = ("list_sum(list_transform(generate_series(1, 8), i -> "
              "({v}[(j - 1) * 8 + i] - books[j][c][i])"
              " * ({v}[(j - 1) * 8 + i] - books[j][c][i])))")
    # CAST(embedding AS DOUBLE[]): the stored column is FLOAT[] and
    # DuckDB otherwise keeps part of the chain in float32, drifting a
    # full float32-ULP from Spark's float64 arithmetic
    return f"""
        WITH cb AS (SELECT {cb} AS books),
        ev AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings
        ),
        enc AS (
            SELECT vec_id,
                   list_transform(generate_series(1, 8), j ->
                       list_position(
                           list_transform(generate_series(1, 16),
                                          c -> {sq.format(v='emb')}),
                           list_min(
                               list_transform(generate_series(1, 16),
                                              c -> {sq.format(v='emb')})
                           )
                       ) - 1
                   ) AS codes
            FROM ev, cb
        ),
        luts AS (
            SELECT vec_id AS query_id,
                   list_transform(generate_series(1, 8), j ->
                       list_transform(generate_series(1, 16),
                                      c -> CAST(round(
                                          {sq_raw.format(v='emb')} * 1e6
                                      ) AS BIGINT))
                   ) AS lut
            FROM ev, cb
            WHERE vec_id < 5
        ),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   round(list_sum(list_transform(
                       generate_series(1, 8),
                       j -> q.lut[j][e.codes[j] + 1]
                   )) / 1e6, 6) AS adc_dist
            FROM enc e, luts q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, adc_dist, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dist ASC, neighbor_id ASC
            ) AS rank FROM scored
        ) WHERE rank <= 5
    """


# --- E-family oracle builders ----------------------------------------------

#: md5-prefix 32-bit hash in DuckDB SQL (mirrors dedup.content_hash32).
def _unigram_apply_oracle() -> str:
    """Recursive-SQL Viterbi oracle for e3_unigram_apply: per DISTINCT
    word, a recursive CTE grows the DP score/backpointer arrays one
    character position per iteration; candidates come from a list
    comprehension over the frozen piece MAP; the argmax keeps the FIRST
    maximal candidate (ascending j), matching viterbi_segment's
    replace-on-strict-improvement rule; unreachable words fall back to
    per-char pieces exactly like the Python kernel. Backtracking is a
    second recursive CTE; doc assembly re-joins words in position
    order. Log-probs are repr-rendered from Python so DuckDB parses
    the SAME doubles Spark's kernel sums (no cross-libm ln() ulps)."""
    import math

    from drugbankner_spark.fixtures_unigram import (
        FROZEN_UNIGRAM_PIECES,
        UNIGRAM_MAX_PIECE_LEN,
    )

    n = UNIGRAM_MAX_PIECE_LEN
    parts = []
    for p, v in sorted(FROZEN_UNIGRAM_PIECES.items()):
        if v > 0:
            assert "'" not in p and "\\" not in p, p
            parts.append(f"('{p}', {math.log(v)!r})")
    vals = ", ".join(parts)
    return f"""
        WITH RECURSIVE
        pieces(piece, lp) AS (VALUES {vals}),
        pm AS (
            SELECT map(list(piece ORDER BY piece),
                       list(lp ORDER BY piece)) AS m
            FROM pieces
        ),
        words AS (
            SELECT DISTINCT w FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            ) WHERE w <> ''
        ),
        dp AS (
            SELECT w, 1 AS i, [0.0]::DOUBLE[] AS scores,
                   [0]::INT[] AS backs
            FROM words
            UNION ALL
            SELECT w, i + 1, scores || [best.s], backs || [best.j]
            FROM (
                SELECT w, i, scores, backs,
                       list_filter(cands, c -> c.s = mx)[1] AS best
                FROM (
                    SELECT w, i, scores, backs, cands,
                           list_max(list_transform(cands, c -> c.s)) AS mx
                    FROM (
                        SELECT w, i, scores, backs,
                            list_filter(
                                [ {{'s': scores[j + 1]
                                        + CASE WHEN len(m[w[j+1:i]]) = 1
                                               THEN m[w[j+1:i]][1] END,
                                    'j': j }}
                                  for j in generate_series(
                                      greatest(0, i - {n}), i - 1) ],
                                c -> c.s IS NOT NULL) AS cands
                        FROM dp, pm WHERE i <= length(w)
                    )
                )
            )
        ),
        fin AS (SELECT w, scores, backs FROM dp WHERE i = length(w) + 1),
        bt AS (
            SELECT w, length(w) AS i, backs, []::VARCHAR[] AS toks
            FROM fin WHERE scores[length(w) + 1] IS NOT NULL
            UNION ALL
            SELECT w, backs[i + 1], backs,
                   [w[backs[i + 1] + 1 : i]] || toks
            FROM bt WHERE i > 0
        ),
        segs AS (
            SELECT w, toks FROM bt WHERE i = 0
            UNION ALL
            SELECT w, [w[x:x] for x in generate_series(1, length(w))]
            FROM fin
            WHERE scores[length(w) + 1] IS NULL AND length(w) > 0
        ),
        occ AS (
            SELECT doc_id, w, ord FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS ord
                FROM documents
            ) WHERE w <> ''
        ),
        doc_tokens AS (
            SELECT doc_id,
                   CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
                   string_agg(array_to_string(toks, ' '), ' '
                              ORDER BY ord) AS tokens_str
            FROM occ JOIN segs USING (w)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(dt.n_tokens, 0) AS n_tokens,
               COALESCE(dt.tokens_str, '') AS tokens_str
        FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)
    """


def _wordpiece_apply_oracle() -> str:
    """Recursive-SQL greedy matcher for e3_wordpiece_apply: per
    DISTINCT word, each CTE iteration consumes ONE piece — the longest
    vocab entry (## -prefixed past position 0) matching at the cursor,
    via a list comprehension over the frozen piece MAP; no match, or a
    word beyond MAX_WORD_CHARS, yields ['[UNK]'] for the whole word —
    exactly greedy_wordpiece. Doc assembly re-joins words in position
    order (the unigram oracle's occ/doc_tokens tail)."""
    from drugbankner_spark.fixtures_wordpiece import (
        FROZEN_WORDPIECE_VOCAB,
        WORDPIECE_MAX_PIECE_LEN,
    )
    from drugbankner_spark.operators.wordpiece import MAX_WORD_CHARS

    for p in FROZEN_WORDPIECE_VOCAB:
        assert "'" not in p and "\\" not in p, p
    vals = ", ".join(f"('{p}')" for p in sorted(FROZEN_WORDPIECE_VOCAB))
    n = WORDPIECE_MAX_PIECE_LEN
    cap = MAX_WORD_CHARS
    return f"""
        WITH RECURSIVE
        vocab(piece) AS (VALUES {vals}),
        vm AS (
            SELECT map(list(piece ORDER BY piece),
                       list(1 ORDER BY piece)) AS m
            FROM vocab
        ),
        words AS (
            SELECT DISTINCT w FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents
            ) WHERE w <> ''
        ),
        seg AS (
            SELECT w, 0 AS pos, []::VARCHAR[] AS toks, FALSE AS failed
            FROM words WHERE length(w) <= {cap}
            UNION ALL
            SELECT w,
                   CASE WHEN best IS NULL THEN length(w)
                        ELSE best.e END AS pos,
                   CASE WHEN best IS NULL THEN ['[UNK]']
                        ELSE toks || [best.piece] END AS toks,
                   best IS NULL AS failed
            FROM (
                SELECT w, pos, toks,
                       list_filter(cands, c -> c.e = mx)[1] AS best
                FROM (
                    SELECT w, pos, toks, cands,
                           list_max(list_transform(cands, c -> c.e))
                               AS mx
                    FROM (
                        SELECT w, pos, toks,
                            list_filter(
                                [ {{'piece': CASE WHEN pos = 0
                                        THEN w[pos + 1 : e]
                                        ELSE '##' || w[pos + 1 : e] END,
                                    'e': e }}
                                  for e in generate_series(
                                      pos + 1,
                                      least(length(w), pos + {n})) ],
                                c -> len(m[c.piece]) = 1) AS cands
                        FROM seg, vm
                        WHERE pos < length(w) AND NOT failed
                    )
                )
            )
        ),
        segs AS (
            SELECT w, toks FROM seg WHERE pos >= length(w)
            UNION ALL
            SELECT w, ['[UNK]']::VARCHAR[] AS toks
            FROM words WHERE length(w) > {cap}
        ),
        occ AS (
            SELECT doc_id, w, ord FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS ord
                FROM documents
            ) WHERE w <> ''
        ),
        doc_tokens AS (
            SELECT doc_id,
                   CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
                   string_agg(array_to_string(toks, ' '), ' '
                              ORDER BY ord) AS tokens_str
            FROM occ JOIN segs USING (w)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(dt.n_tokens, 0) AS n_tokens,
               COALESCE(dt.tokens_str, '') AS tokens_str
        FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)
    """


def _sql_tracking_param_filter() -> str:
    """DuckDB predicate fragment dropping tracking query params —
    rendered from web.TRACKING_PARAM_PREFIXES so the Spark filter and
    this oracle share one source of truth (ADVICE r05)."""
    from drugbankner_spark.operators.web import TRACKING_PARAM_PREFIXES

    parts = []
    for name in TRACKING_PARAM_PREFIXES:
        probe = name if name.endswith("_") else name + "="
        parts.append(f"AND NOT starts_with(x, '{probe}')")
    return " ".join(parts)


def _sql_hash32(e: str) -> str:
    return (f"CAST(list_sum(list_transform(generate_series(1, 8), i -> "
            f"(strpos('0123456789abcdef', substr(substr(md5({e}), 1, 8), i, 1)) - 1)"
            f" * power(16, 8 - i))) AS BIGINT)")


def _sql_shingles_n(n: int, table: str) -> str:
    """Distinct n-token shingles of a docs relation (DuckDB) — the SQL
    twin of dedup.token_shingles for arbitrary n."""
    return f"""
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                       AS shingle
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM {table}),
                 UNNEST(generate_series(1, greatest(len(toks) - {n - 1}, 1)))
                     AS g(i)
        )
    """


_SQL_SHINGLES = """
    shingles AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
        )
    )
"""

_SQL_MINHASH = f"""
    {_SQL_SHINGLES},
    hashed AS (
        SELECT doc_id, {_sql_hash32('shingle')} AS h FROM shingles
    ),
    sigs AS (
        SELECT doc_id, perm,
               min(((2 * perm + 1) * h + perm * perm + 7) % 4294967311) AS minhash
        FROM hashed, UNNEST(generate_series(0, 15)) AS p(perm)
        GROUP BY doc_id, perm
    )
"""


def _e1_minhash_signatures_oracle() -> str:
    return f"WITH {_SQL_MINHASH} SELECT doc_id, perm, minhash FROM sigs"


def _e1_minhash_near_dup_oracle() -> str:
    return f"""WITH {_SQL_MINHASH},
        banded AS (
            SELECT doc_id, CAST(floor(perm / 4) AS INT) AS band,
                   string_agg(minhash, '-' ORDER BY perm) AS band_key
            FROM sigs GROUP BY CAST(floor(perm / 4) AS INT), doc_id
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    """


def _e1_simhash_oracle() -> str:
    return f"""WITH toks AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
        ),
        hashed AS (SELECT doc_id, {_sql_hash32('tok')} AS h FROM toks),
        votes AS (
            SELECT doc_id, bit,
                   sum(((h >> bit) & 1) * 2 - 1) AS tally
            FROM hashed, UNNEST(generate_series(0, 31)) AS b(bit)
            GROUP BY doc_id, bit
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN tally > 0 THEN (1::BIGINT << bit) ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    """


def _e1_ngram_jaccard_oracle() -> str:
    return f"""WITH {_SQL_SHINGLES},
        sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
            FROM shingles a JOIN shingles b ON a.shingle = b.shingle
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, n_common,
               round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(n_common / (sa.sz + sb.sz - n_common), 6) >= 0.05
    """


_SQL_COSINE = """
    list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))))
"""


#: Planted-duplicate SA probe corpus (e1_sa_dup_spans / e1_sa_dedup
#: share it): 12 documents, a 48-char slice of doc 0 appended to every
#: doc_id % 4 == 1 document, suffix array by direct sorted-suffix rank,
#: 40-char adjacent-suffix windows.
_SA_PLANTED_CTES = """
            WITH d0 AS (
                SELECT substring(text, 16, 48) AS tail
                FROM documents WHERE doc_id = 0
            ),
            d AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 4 = 1
                            THEN text || ' ' || (SELECT tail FROM d0)
                            ELSE text END AS text
                FROM documents WHERE doc_id < 12
            ),
            corpus AS (
                SELECT string_agg(text || chr(1), '' ORDER BY doc_id)
                    AS s
                FROM d
            ),
            offs AS (
                SELECT doc_id, text,
                       COALESCE(sum(length(text) + 1) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ), 0) AS off
                FROM d
            ),
            pos AS (
                SELECT o.doc_id, o.off + i AS gpos, i AS local_pos
                FROM offs o,
                     UNNEST(generate_series(1, length(o.text) + 1))
                         AS g(i)
            ),
            sa AS (
                SELECT p.doc_id, p.local_pos,
                       rank() OVER (
                           ORDER BY substr(c.s, CAST(p.gpos AS INT))
                       ) AS r
                FROM pos p, corpus c
            ),
            win AS (
                SELECT sa.r, sa.doc_id, sa.local_pos,
                       substr(dd.text, CAST(sa.local_pos AS INT), 40)
                           AS w
                FROM sa JOIN d dd USING (doc_id)
            )
"""

#: 1-bit code CTE body (e2_hamming_topk / e2_rerank_topk share it).
_SQL_BINARY_CODES = """
            SELECT vec_id, embedding,
                   list_transform(generate_series(0, 1), w ->
                       CAST(list_sum(list_transform(
                           generate_series(0, 31), i ->
                           CASE WHEN embedding[w * 32 + i + 1] > 0
                                THEN (CAST(1 AS BIGINT) << i)
                                ELSE CAST(0 AS BIGINT) END
                       )) AS BIGINT)) AS code
            FROM embeddings
"""


def _e2_rerank_topk_oracle() -> str:
    return f"""WITH codes AS ({_SQL_BINARY_CODES}),
        ham AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(list_sum(list_transform(
                       generate_series(1, 2), j ->
                       bit_count(xor(q.code[j], c.code[j]))
                   )) AS BIGINT) AS hamming
            FROM codes c, codes q
            WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        ),
        short AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY hamming ASC, neighbor_id ASC
                ) AS hrank FROM ham
            ) WHERE hrank <= 20
        ),
        rescored AS (
            SELECT s.query_id, s.neighbor_id,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM short s
            JOIN embeddings c ON c.vec_id = s.neighbor_id
            JOIN embeddings q ON q.vec_id = s.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS rank FROM rescored
        ) WHERE rank <= 5
    """


def _g_pagerank_oracle(
    n_iters: int = 5, d: float = 0.85, seeds: list | None = None
) -> str:
    """Chained-CTE power-iteration replay (the g_label_prop oracle
    pattern): r0 = teleport vector; each r{{i}} applies the exact Spark
    formula — uniform teleport (1−d)/N + d·(inflow + mass/N) for
    classic PageRank, or (1−d)·tele + d·(inflow + mass·tele) for the
    personalized form; 6dp rounding only at the end — damping
    contracts sub-6dp float-sum-order drift."""
    if seeds is None:
        tele = "1.0 / nn.n"
        r_expr = ("(1.0 - {d}) / nn.n + {d} * "
                  "(COALESCE(c.inflow, 0.0) + dd.mass / nn.n)")
    else:
        in_list = ", ".join(str(s) for s in seeds)
        tele = (f"CASE WHEN node IN ({in_list}) "
                f"THEN 1.0 / {len(seeds)} ELSE 0.0 END")
        r_expr = ("(1.0 - {d}) * b.tele + {d} * "
                  "(COALESCE(c.inflow, 0.0) + dd.mass * b.tele)")
    ctes = [f"""e AS (
            SELECT DISTINCT l_suppkey % 50 AS src, l_partkey % 50 AS dst
            FROM lineitem WHERE l_orderkey < 3000
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
        base AS (
            SELECT node, COALESCE(out_deg, 0) AS out_deg,
                   {tele} AS tele
            FROM nodes LEFT JOIN deg ON node = src, nn
        ),
        r0 AS (
            SELECT node, out_deg, tele AS rank FROM base
        )"""]
    for i in range(1, n_iters + 1):
        ctes.append(f"""d{i} AS (
            SELECT COALESCE(sum(rank), 0.0) AS mass
            FROM r{i - 1} WHERE out_deg = 0
        ),
        c{i} AS (
            SELECT e.dst AS node, sum(r.rank / r.out_deg) AS inflow
            FROM e JOIN r{i - 1} r
              ON r.node = e.src AND r.out_deg > 0
            GROUP BY e.dst
        ),
        r{i} AS (
            SELECT b.node, b.out_deg,
                   {r_expr.format(d=d)} AS rank
            FROM base b
            LEFT JOIN c{i} c USING (node), nn, d{i} dd
        )""")
    return ("WITH " + ",\n        ".join(ctes)
            + f"\n        SELECT node, round(rank, 6) AS rank"
              f" FROM r{n_iters}")


def _e2_cosine_topk_oracle() -> str:
    return f"""WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM embeddings c, embeddings q
            WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """


def _e2_hard_negatives_oracle() -> str:
    return f"""WITH pos AS (
            SELECT vec_id AS query_id, vec_id + 1 AS pos_id
            FROM embeddings WHERE vec_id < 5
            UNION ALL
            SELECT vec_id, vec_id + 2
            FROM embeddings WHERE vec_id < 5
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM embeddings c, embeddings q
            WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
              AND NOT EXISTS (
                  SELECT 1 FROM pos p
                  WHERE p.query_id = q.vec_id
                    AND p.pos_id = c.vec_id
              )
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS r
            FROM scored
        )
        SELECT query_id, neighbor_id, cos_sim,
               CAST(r - 1 AS INTEGER) AS rank
        FROM ranked WHERE r > 1 AND r <= 6
    """


def _lsh_bits_sql(num_planes: int = 8) -> str:
    from drugbankner_spark.operators.similarity import hyperplane

    planes = [hyperplane(64, j) for j in range(num_planes)]
    return " || ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in p)}]) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )


def _e2_lsh_topk_oracle() -> str:
    return f"""WITH bucketed AS (
            SELECT vec_id, embedding, {_lsh_bits_sql()} AS bucket FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM bucketed c JOIN bucketed q ON c.bucket = q.bucket
            WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """


def _e2_retrieval_topk_oracle() -> str:
    """Composed oracle for e2_retrieval_topk: chunking (stride-24 token
    windows, the e1_intradoc list_slice pattern), hashed-TF dense
    vectors (the e3_hashed_tf md5 kernel, densified to DOUBLE[64]),
    LSH bucketing + probe (the e2_lsh_topk bit-string pattern), top-5
    rerank, chunk-text hydration. Vectors are n/sqrt(Σn²) over exact
    integer counts — identical doubles both engines."""
    dense = (
        "[COALESCE(m[i][1], 0) / l2 for i in generate_series(0, 63)]"
    )
    return f"""WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ),
        chunks AS (
            SELECT doc_id * 1000000 + CAST(s / 24 AS INT) AS chunk_id,
                   doc_id, CAST(s / 24 AS INT) AS chunk_index,
                   array_to_string(list_slice(tk, s + 1, s + 32), ' ')
                       AS chunk_text
            FROM tk, UNNEST(generate_series(
                0, greatest(len(tk) - 1, 0), 24)) AS g(s)
        ),
        items AS (
            SELECT 'c' AS side, chunk_id AS id, chunk_text AS txt
            FROM chunks
            UNION ALL
            SELECT 'q', doc_id + 100, text FROM documents
            WHERE doc_id IN (1, 2, 3)
        ),
        toks AS (
            SELECT side, id, unnest(string_split(txt, ' ')) AS tok
            FROM items
        ),
        tf AS (
            SELECT side, id, {_sql_hash32("tok")} % 64 AS bucket,
                   count(*) AS n
            FROM toks WHERE tok <> '' GROUP BY side, id, bucket
        ),
        packed AS (
            SELECT side, id, map(list(bucket), list(n)) AS m,
                   sqrt(sum(n * n)) AS l2
            FROM tf GROUP BY side, id
        ),
        vecs AS (
            SELECT side, id, {dense} AS embedding FROM packed
        ),
        bucketed AS (
            SELECT side, id, embedding, {_lsh_bits_sql()} AS bucket
            FROM vecs
        ),
        scored AS (
            SELECT q.id AS query_id, c.id AS neighbor_id,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM bucketed c JOIN bucketed q ON c.bucket = q.bucket
            WHERE c.side = 'c' AND q.side = 'q' AND c.id <> q.id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        SELECT r.query_id,
               CAST(ch.doc_id AS BIGINT) AS doc_id,
               ch.chunk_index, ch.chunk_text, r.cos_sim, r.rank
        FROM ranked r JOIN chunks ch ON ch.chunk_id = r.neighbor_id
        WHERE r.rank <= 5
    """


def _e2_ivf_topk_oracle() -> str:
    from drugbankner_spark.operators.similarity import hyperplane

    cents = [hyperplane(64, 1000 + j) for j in range(8)]
    structs = ", ".join(
        "{'sim': list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in c)}]), 'cell': {j}}}"
        for j, c in enumerate(cents)
    )
    return f"""WITH scored_cells AS (
            SELECT vec_id, embedding, [{structs}] AS cells FROM embeddings
        ),
        corpus AS (
            SELECT vec_id AS neighbor_id, embedding,
                   list_max(cells).cell AS cell
            FROM scored_cells
        ),
        probes AS (
            SELECT vec_id AS query_id, embedding,
                   unnest(list_transform(
                       list_slice(list_reverse(list_sort(cells)), 1, 3),
                       x -> x.cell)) AS cell
            FROM scored_cells WHERE vec_id < 5
        ),
        scored AS (
            SELECT DISTINCT q.query_id, c.neighbor_id,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM corpus c JOIN probes q USING (cell)
            WHERE c.neighbor_id <> q.query_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """


def _e3_lang_id_oracle() -> str:
    from drugbankner_spark.operators.textanalysis import STOPWORDS

    rows = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
    )
    return f"""WITH sw(sw_lang, sw_word) AS (VALUES {rows}),
        toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        hits AS (
            SELECT doc_id, sw_lang, count(*) AS n_hits
            FROM toks JOIN sw ON tok = sw_word
            GROUP BY doc_id, sw_lang
        ),
        best AS (
            SELECT doc_id, sw_lang AS predicted_lang, n_hits AS n_stopword_hits,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY n_hits DESC, sw_lang ASC
                   ) AS rn
            FROM hits
        )
        SELECT d.doc_id, b.predicted_lang, b.n_stopword_hits
        FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    """


def _e3_fingerprint_oracle() -> str:
    return f"""WITH chunks AS (
            SELECT doc_id,
                   array_to_string(list_slice(toks, i, i + 15), ' ') AS chunk_text
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 UNNEST(generate_series(1, greatest(len(toks) - 15, 1), 16)) AS g(i)
        ),
        hashed AS (
            SELECT doc_id, {_sql_hash32('chunk_text')} AS chunk_hash FROM chunks
        )
        SELECT doc_id, min(chunk_hash) AS min_fingerprint,
               count(*) AS n_chunks
        FROM hashed GROUP BY doc_id
    """


def _e2_srp_oracle(n_bits: int = 64, dim: int = 64,
                   scale: int = 10_000) -> str:
    """SQL twin of e2_srp_sketch: the SAME srp_sign_matrix literals
    (generated once in Python — no per-engine hashing), DuckDB
    1-based indexing, identical pinned addition order."""
    from drugbankner_spark.operators.similarity import srp_sign_matrix

    signs = srp_sign_matrix(n_bits, dim)
    nw = (n_bits + 31) // 32

    def proj(k: int) -> str:
        return " + ".join(
            f"({signs[k][j]} * vi[{j + 1}])" for j in range(dim)
        )

    words = []
    for w in range(nw):
        bits = " + ".join(
            f"(CASE WHEN ({proj(w * 32 + i)}) > 0 THEN {1 << i} "
            f"ELSE 0 END)"
            for i in range(32) if w * 32 + i < n_bits
        )
        words.append(f"CAST({bits} AS BIGINT) AS c{w}")
    code_rows = "\n                UNION ALL ".join(
        f"""SELECT 'code' AS op,
                       CAST(vec_id AS VARCHAR) || '§' || '{w}' AS k,
                       CAST(NULL AS VARCHAR) AS v,
                       CAST(c{w} AS DOUBLE) AS v_num FROM codes"""
        for w in range(nw)
    )
    ham = " + ".join(
        f"bit_count(xor(q.c{w}, c.c{w}))" for w in range(nw)
    )
    return f"""
        WITH vit AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5)
                            AS BIGINT)) AS vi
            FROM embeddings
        ),
        codes AS (
            SELECT vec_id, {", ".join(words)} FROM vit
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST({ham} AS BIGINT) AS hamming
            FROM codes c, codes q
            WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        ),
        topk AS (
            SELECT query_id, neighbor_id, hamming,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY hamming ASC, neighbor_id ASC
                   ) AS rank
            FROM scored
        )
        {code_rows}
        UNION ALL
        SELECT 'topk',
               CAST(query_id AS VARCHAR) || '§' || CAST(rank AS VARCHAR),
               CAST(NULL AS VARCHAR),
               CAST(neighbor_id * 10000 + hamming AS DOUBLE)
        FROM topk WHERE rank <= 5
    """


def oracle_sql() -> dict[str, str]:
    out = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6)      AS avg_qty,
                   round(avg(l_discount), 6)      AS avg_disc,
                   count(*)                       AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   o_orderdate
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate  > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_regional_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM region
            JOIN nation   ON n_regionkey = r_regionkey
            JOIN supplier ON s_nationkey = n_nationkey
            JOIN lineitem ON l_suppkey = s_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "j1_dim_lookup": """
            SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "j2_mode_vote": """
            WITH counted AS (
                SELECT o_custkey, o_orderpriority, count(*) AS cnt
                FROM orders GROUP BY o_custkey, o_orderpriority
            ), ranked AS (
                SELECT o_custkey, o_orderpriority, cnt,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY cnt DESC, o_orderpriority ASC
                       ) AS rn,
                       max(cnt) OVER (PARTITION BY o_custkey) AS modal_count
                FROM counted
            )
            SELECT o_custkey, o_orderpriority AS modal_value, modal_count
            FROM ranked WHERE rn = 1
        """,
        "j4_coalesce_fallback": """
            SELECT o_orderkey, o_custkey,
                   coalesce(c.c_name, s.s_name) AS resolved_name
            FROM orders
            LEFT JOIN customer c ON o_custkey = c.c_custkey
            LEFT JOIN supplier s ON o_custkey = s.s_suppkey
        """,
        "j5_prefix_expansion": """
            WITH suffixes AS (SELECT DISTINCT n_name AS suffix FROM nation),
            expanded AS (
                SELECT suffix, pfx || ':' || suffix AS candidate
                FROM suffixes, UNNEST(['N', 'X']) AS t(pfx)
            ),
            dim AS (SELECT 'N:' || n_name AS dim_key, n_nationkey FROM nation)
            SELECT suffix, candidate, n_nationkey
            FROM expanded JOIN dim ON candidate = dim_key
        """,
        "j9_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "u3_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 300000
            )
        """,
        "a2_longest_value": """
            WITH ranked AS (
                SELECT lang, text,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY length(text) DESC, text ASC
                       ) AS rn,
                       max(length(text)) OVER (PARTITION BY lang) AS longest_len
                FROM documents
            )
            SELECT lang, text AS longest_value, longest_len
            FROM ranked WHERE rn = 1
        """,
        "a4_category_histogram": """
            SELECT c_nationkey, c_mktsegment, count(*) AS cnt
            FROM customer GROUP BY c_nationkey, c_mktsegment
        """,
        "a5_distinct": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        """,
        "a6_first_writer_wins": """
            WITH ranked AS (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS rn
                FROM events
            )
            SELECT user_id, event_id, event_type FROM ranked WHERE rn = 1
        """,
        "o1_topk": """
            SELECT s_suppkey, s_name, s_acctbal FROM supplier
            ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 10
        """,
        "u1_union_merge": """
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
            UNION
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "w1_running_sum": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 6) AS running_value
            FROM events
        """,
        "w2_lag_lead": """
            SELECT user_id, event_id,
                   lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_value,
                   lead(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS next_value
            FROM events
        """,
        "w3_rank": """
            SELECT o_custkey, o_orderkey,
                   rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS price_rank,
                   dense_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC) AS price_dense_rank
            FROM orders
        """,
        "w_window_suite": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 6) AS running_value,
                   lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_value,
                   lead(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS next_value,
                   rank() OVER (PARTITION BY user_id
                                ORDER BY event_type) AS type_rank,
                   dense_rank() OVER (PARTITION BY user_id
                                      ORDER BY event_type) AS type_dense_rank
            FROM events
        """,
        "f_name_normalize": f"""
            WITH step AS (
                SELECT doc_id,
                       regexp_replace('[' || source || '] ' || substr(text, 1, 60),
                                      '\\[.*?\\]', '', 'g') AS cleaned,
                       translate(substr(text, 1, 60), '.,;:?!', '') AS stripped,
                       translate(lower(substr(text, 1, 40)), {_punct_ws_sql()}, '')
                           AS name_simplified
                FROM documents
            )
            SELECT doc_id, cleaned, stripped, name_simplified,
                   row_number() OVER (ORDER BY upper(name_simplified), doc_id)
                       AS pos
            FROM step
        """,
        "e1_dedup_survivor": """
            WITH t AS (
                SELECT doc_id, lang, source, n_chars,
                       row_number() OVER (
                           PARTITION BY lang, source ORDER BY doc_id
                       ) AS rn
                FROM documents
            )
            SELECT doc_id, lang, source, n_chars FROM t WHERE rn = 1
        """,
        "o2_sort_upper": """
            SELECT n_name,
                   row_number() OVER (ORDER BY upper(n_name), n_nationkey) AS pos
            FROM nation
        """,
        "a7_count": """
            SELECT count(*) AS n_rows,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem
        """,
        "a8_explode_distinct": f"""
            WITH syn_clusters AS {__import__('drugbankner_spark.fixtures', fromlist=['x']).clusters_values_sql()}
            SELECT DISTINCT unnest(member_ids) AS member_id FROM syn_clusters
        """,
        "agg_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "sql_api_q10": _SQL_Q10,
        "q18_large_orders": """
            WITH big AS (
                SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING round(sum(l_quantity), 2) > 250
            )
            SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
        """,
        "q7_volume_shipping": """
            SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 2) AS revenue
            FROM (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                       l_extendedprice * (1 - l_discount) AS volume
                FROM supplier
                JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
                    OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
                  AND l_shipdate >= TIMESTAMP '1995-01-01'
                  AND l_shipdate <= TIMESTAMP '1996-12-31'
            )
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "agg_cube": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "q_correlated_avg": """
            SELECT p_partkey, p_type, p_size
            FROM part p
            WHERE p_size > (SELECT avg(p2.p_size) FROM part p2
                            WHERE p2.p_type = p.p_type)
        """,
        "u2_intersect": """
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        """,
        "u4_union_prefer_first": """
            WITH merged AS (
                SELECT c_custkey, 'high_balance' AS reason, 0 AS r
                FROM customer WHERE c_acctbal > 8000
                UNION ALL
                SELECT c_custkey, 'machinery' AS reason, 1 AS r
                FROM customer WHERE c_mktsegment = 'MACHINERY'
            ),
            ranked AS (
                SELECT c_custkey, reason,
                       row_number() OVER (PARTITION BY c_custkey ORDER BY r)
                           AS rn
                FROM merged
            )
            SELECT c_custkey, reason FROM ranked WHERE rn = 1
        """,
        "f1_bracket_strip": """
            SELECT doc_id,
                   regexp_replace('[' || source || '] ' || substr(text, 1, 60),
                                  '\\[.*?\\]', '', 'g') AS cleaned
            FROM documents
        """,
        "f2_strip_marks": """
            SELECT event_id, translate(props, '.,;:?!', '') AS stripped
            FROM events
        """,
        "f3_simplify_name": f"""
            SELECT doc_id,
                   translate(lower(substr(text, 1, 40)), {_punct_ws_sql()}, '')
                       AS name_simplified
            FROM documents
        """,
        "f4_curie_prefix_upper": """
            WITH c AS (
                SELECT p_partkey, lower(p_brand) || ':' || p_name AS curie
                FROM part
            )
            SELECT p_partkey,
                   CASE WHEN strpos(curie, ':') > 0
                        THEN upper(split_part(curie, ':', 1)) || ':' ||
                             substr(curie, length(split_part(curie, ':', 1)) + 2)
                        ELSE upper(curie) END AS id_simplified
            FROM c
        """,
        "f5_sentence_pipeline": """
            WITH sent AS (
                SELECT doc_id,
                       unnest(string_split(
                           regexp_replace(text, ' the ', '. ', 'g'), '.'
                       )) AS sentence
                FROM documents
            )
            SELECT doc_id,
                   coalesce(array_to_string(
                       list_filter(string_split(sentence, ' '),
                                   t -> length(t) < 6), ' '), '') AS sentence
            FROM sent
            WHERE length(sentence) BETWEEN 15 AND 80
        """,
        "f7_identifier_extract": _f7_oracle(),
        "f10_prefix_extract": f"""
            SELECT DISTINCT split_part(candidate_curie, ':', 1) AS prefix
            FROM ({_f7_oracle()})
        """,
        "e1_exact_dedup": """
            SELECT sha256(text) AS content_sha,
                   min(doc_id) AS canonical_id,
                   count(*) AS n_copies
            FROM documents GROUP BY sha256(text)
        """,
        "e1_minhash_signatures": _e1_minhash_signatures_oracle(),
        "e1_minhash_near_dup": _e1_minhash_near_dup_oracle(),
        "e1_simhash": _e1_simhash_oracle(),
        "e1_ngram_jaccard": _e1_ngram_jaccard_oracle(),
        "e1_embedding_near_dup": f"""
            WITH bucketed AS (
                SELECT vec_id, embedding, {_lsh_bits_sql(4)} AS bucket
                FROM embeddings
            )
            SELECT c.vec_id AS id_a, q.vec_id AS id_b,
                   round({_SQL_COSINE}, 6) AS cos_sim
            FROM bucketed c JOIN bucketed q ON c.bucket = q.bucket
            WHERE c.vec_id < q.vec_id
              AND round({_SQL_COSINE}, 6) >= 0.4
        """,
        "e3_bpe_tokens": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
                   round(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                       / greatest(len(string_split(text, ' ')), 1), 6)
                       AS pieces_per_word
            FROM documents
        """,
        "e1_incremental_dedup": """
            WITH corpus AS (
                SELECT * FROM documents
                WHERE regexp_matches(source, '^src[0-9]$')
            ),
            batch AS (
                SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
                FROM documents WHERE regexp_matches(source, '^src1[0-9]$')
                UNION ALL
                SELECT doc_id + 200000, text, lang, source, n_chars
                FROM documents WHERE regexp_matches(source, '^src1[0-9]$')
                UNION ALL
                SELECT doc_id + 300000, text, lang, source, n_chars
                FROM corpus
            )
            SELECT doc_id, text, lang, source, n_chars
            FROM batch b
            WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
              AND doc_id = (SELECT min(doc_id) FROM batch b2
                            WHERE b2.text = b.text)
        """,
        "e3_repetition": """
            WITH grams AS (
                SELECT doc_id,
                       list_transform(range(1, len(s)),
                           i -> s[i] || ' ' || s[i + 1]) AS bg,
                       CASE WHEN len(s) >= 3
                            THEN list_transform(range(1, len(s) - 1),
                                i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2])
                            ELSE [] END AS tg
                FROM (SELECT doc_id, string_split(text, ' ') AS s
                      FROM documents)
            )
            SELECT doc_id,
                   len(bg) AS n_bigrams,
                   round(1 - len(list_distinct(bg)) / len(bg), 6)
                       AS dup_bigram_frac,
                   CASE WHEN len(tg) > 0
                        THEN round(1 - len(list_distinct(tg)) / len(tg), 6)
                   END AS dup_trigram_frac
            FROM grams
            WHERE len(bg) > 0
        """,
        "e3_redact_pii": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS n_email,
                   len(regexp_extract_all(text,
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                       AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS n_phone,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                       '<IPV4>', 'g'),
                       '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g')
                       AS redacted_text
            FROM documents
        """,
        "e5_skew_profile": """
            WITH c AS (
                SELECT o_custkey, count(*) AS n_rows
                FROM orders GROUP BY o_custkey
            ),
            t AS (SELECT sum(n_rows) AS total FROM c)
            SELECT o_custkey, n_rows,
                   round(n_rows / total, 6) AS share,
                   n_rows / total > 0.0005 AS is_hot
            FROM c CROSS JOIN t
            ORDER BY n_rows DESC, o_custkey ASC
            LIMIT 20
        """,
        "e3_tfidf": """
            WITH tok AS (
                SELECT doc_id, t AS term
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                      FROM documents)
                WHERE t <> ''
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tok GROUP BY doc_id, term
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT doc_id, term, tf, df,
                   round(tf * (ln((1 + n_docs) / (1 + df)) + 1), 6) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        """,
        "e2_cosine_topk": _e2_cosine_topk_oracle(),
        "e2_hard_negatives": _e2_hard_negatives_oracle(),
        "e2_lsh_topk": _e2_lsh_topk_oracle(),
        "e2_ivf_topk": _e2_ivf_topk_oracle(),
        "e2_pq_adc_topk": _pq_adc_oracle(),
        "e2_pandas_topk": _e2_cosine_topk_oracle(),
        "e3_text_quality": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(length(text) / len(string_split(text, ' ')), 6)
                       AS mean_token_len,
                   round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                         / length(text), 6) AS digit_ratio,
                   round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                         / length(text), 6) AS upper_ratio,
                   round(len(list_distinct(string_split(text, ' ')))
                         / len(string_split(text, ' ')), 6) AS distinct_token_ratio
            FROM documents
        """,
        "e3_lang_id": _e3_lang_id_oracle(),
        "e3_fingerprint": _e3_fingerprint_oracle(),
        "e4_media_metadata": """
            SELECT doc_id AS media_id,
                   'application/octet-stream' AS mime_type,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS payload_sha256
            FROM documents
        """,
        "e4_wav_decode": """
            WITH q AS (
                SELECT vec_id,
                       list_transform(
                           embedding,
                           v -> least(floor(greatest(-1.0, least(1.0,
                                    CAST(v AS DOUBLE))) * 32767 + 0.5),
                                32767.0) / 32768.0
                       ) AS norm
                FROM embeddings
            )
            SELECT vec_id,
                   len(norm) AS n_frames,
                   16000 AS sample_rate,
                   round(sqrt(list_sum(list_transform(norm, x -> x * x))
                              / len(norm)), 6) AS rms,
                   CAST(list_max(list_transform(norm, x -> abs(x))) * 32768
                        AS BIGINT) AS peak_q
            FROM q
        """,
        "e4_png_decode": """
            SELECT doc_id AS media_id,
                   32 AS width,
                   CAST(greatest(ceil(octet_length(encode(text)) / 32.0), 1)
                        AS INTEGER) AS height,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS decoded_sha256
            FROM documents
        """,
        # e4_bmp_decode: the format-blind digest oracle again.
        "e4_bmp_decode": """
            SELECT doc_id AS media_id,
                   32 AS width,
                   CAST(greatest(ceil(octet_length(encode(text)) / 32.0), 1)
                        AS INTEGER) AS height,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS decoded_sha256
            FROM documents
        """,
        # s_warc_probe: the oracle never touches WARC bytes — status,
        # lengths, URI and the body digest derive from the text alone.
        "s_warc_probe": """
            SELECT doc_id,
                   CAST(1 AS BIGINT) AS n_records,
                   'response' AS warc_type,
                   'https://corpus.example/doc/' || doc_id AS target_uri,
                   CAST(CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END
                        AS BIGINT) AS http_status,
                   octet_length(encode(text)) AS body_len,
                   sha256(text) AS body_sha256
            FROM documents
        """,
        # s_tar_probe: tar/WebDataset framing proven the same way.
        "s_tar_probe": """
            SELECT doc_id,
                   lpad(CAST(doc_id AS VARCHAR), 8, '0') AS key,
                   CAST(2 AS BIGINT) AS n_parts,
                   octet_length(encode(text)) AS txt_len,
                   sha256(text) AS txt_sha256,
                   'doc=' || doc_id AS meta
            FROM documents
        """,
        # e5_needle_inject: splice replicated with list_slice/concat.
        "e5_needle_inject": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS ts,
                       CAST(floor(len(string_split(text, ' ')) * 0.5)
                            AS INTEGER) AS pos
                FROM documents
            )
            SELECT doc_id,
                   array_to_string(
                       list_concat(list_concat(
                           list_slice(ts, 1, pos),
                           ['NEEDLE-' || (doc_id % 7)]),
                           list_slice(ts, pos + 1, len(ts))), ' ')
                       AS text,
                   CAST(pos AS BIGINT) AS needle_pos,
                   CAST(len(ts) + 1 AS BIGINT) AS n_tokens
            FROM t
        """,
        # e5_chat_render: per-turn template parts re-joined with
        # string_agg in the SAME (ts, event_id) total order.
        "e5_chat_render": """
            WITH turns AS (
                SELECT user_id AS conversation_id, ts, event_id,
                       CASE WHEN event_id % 2 = 0 THEN 'user'
                            ELSE 'assistant' END AS role,
                       event_type || ':'
                       || CAST(floor(value * 100) AS BIGINT) AS content
                FROM events
            )
            SELECT conversation_id,
                   CAST(count(*) AS INTEGER) AS n_turns,
                   string_agg(
                       '<|' || role || '|>' || chr(10) || content
                       || '<|end|>' || chr(10),
                       '' ORDER BY ts, event_id
                   ) AS rendered
            FROM turns
            GROUP BY conversation_id
        """,
        # e5_eval_scores: same synthesized windows; normalization,
        # multiset token overlap and bigram recall in DuckDB list
        # functions. Empty-side conventions replicated exactly.
        "e5_eval_scores": """
            WITH pairs AS (
                SELECT doc_id,
                       array_to_string(list_slice(
                           string_split(text, ' '), 1, 12), ' ')
                           AS prediction,
                       array_to_string(list_slice(
                           string_split(text, ' '), 3, 14), ' ')
                           AS reference
                FROM documents
            ),
            t AS (
                SELECT doc_id, prediction, reference,
                       list_filter(string_split(trim(regexp_replace(
                           lower(prediction), '\\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS p,
                       list_filter(string_split(trim(regexp_replace(
                           lower(reference), '\\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS r
                FROM pairs
            ),
            o AS (
                SELECT *,
                       CAST(coalesce(list_sum(list_transform(
                           list_distinct(p),
                           tkn -> least(
                               len(list_filter(p, x -> x = tkn)),
                               len(list_filter(r, x -> x = tkn))))), 0)
                           AS DOUBLE) AS overlap,
                       CASE WHEN len(p) < 2 THEN []
                            ELSE list_transform(
                                generate_series(1, len(p) - 1),
                                i -> p[i] || ' ' || p[i + 1]) END AS pg,
                       CASE WHEN len(r) < 2 THEN []
                            ELSE list_transform(
                                generate_series(1, len(r) - 1),
                                i -> r[i] || ' ' || r[i + 1]) END AS rg
                FROM t
            )
            SELECT doc_id, prediction, reference,
                   trim(regexp_replace(lower(prediction), '\\s+', ' ',
                                       'g'))
                   = trim(regexp_replace(lower(reference), '\\s+', ' ',
                                         'g')) AS exact_match,
                   round(CASE
                       WHEN len(p) = 0 AND len(r) = 0 THEN 1.0
                       WHEN len(p) = 0 OR len(r) = 0 OR overlap = 0
                           THEN 0.0
                       ELSE 2 * (overlap / len(p)) * (overlap / len(r))
                            / ((overlap / len(p)) + (overlap / len(r)))
                       END, 6) AS token_f1,
                   round(CASE WHEN len(rg) = 0 THEN 0.0
                       ELSE CAST(coalesce(list_sum(list_transform(
                           list_distinct(pg),
                           g -> least(
                               len(list_filter(pg, x -> x = g)),
                               len(list_filter(rg, x -> x = g))))), 0)
                           AS DOUBLE) / len(rg) END, 6) AS rouge_2
            FROM o
        """,
        # e3_dict_tag: brute-force position scan — every i where
        # substr(text, i, len(term)) equals the term, overlaps included.
        "e3_dict_tag": """
            WITH t(term) AS (VALUES ('spark'), ('ark'), ('window'))
            SELECT d.doc_id, t.term, CAST(i - 1 AS BIGINT) AS start
            FROM documents d, t,
                 UNNEST(generate_series(
                     1, length(d.text) - length(t.term) + 1)) AS g(i)
            WHERE substr(d.text, i, length(t.term)) = t.term
        """,
        # e3_wordlm: train on 'en' in SQL too; known bigrams take
        # ln(n12/n1), unseen take ln(0.4·n2/N) with the 0.5 floor for
        # unseen words — both branches replicated exactly.
        "e3_wordlm": """
            WITH en AS (
                SELECT string_split(text, ' ') AS ts
                FROM documents WHERE lang = 'en'
            ),
            uni AS (
                SELECT w, count(*) AS n1
                FROM (SELECT unnest(ts) AS w FROM en)
                WHERE w <> '' GROUP BY w
            ),
            tot AS (SELECT CAST(sum(n1) AS DOUBLE) AS total FROM uni),
            pairs AS (
                SELECT ts[i] AS w1, ts[i + 1] AS w2
                FROM en, UNNEST(generate_series(
                    1, greatest(len(ts) - 1, 0))) AS g(i)
                WHERE ts[i] <> '' AND ts[i + 1] <> ''
            ),
            big AS (
                SELECT w1, w2, count(*) AS n12
                FROM pairs GROUP BY w1, w2
            ),
            lp12 AS (
                SELECT b.w1, b.w2, ln(b.n12 * 1.0 / u.n1) AS lp
                FROM big b JOIN uni u ON u.w = b.w1
            ),
            occ AS (
                SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
                FROM (SELECT doc_id, string_split(text, ' ') AS ts
                      FROM documents),
                     UNNEST(generate_series(
                         1, greatest(len(ts) - 1, 0))) AS g(i)
                WHERE ts[i] <> '' AND ts[i + 1] <> ''
            ),
            scored AS (
                SELECT o.doc_id,
                       coalesce(
                           l.lp,
                           ln(0.4 * coalesce(u2.n1 * 1.0, 0.5)
                              / tot.total)
                       ) AS lp
                FROM occ o
                LEFT JOIN lp12 l ON l.w1 = o.w1 AND l.w2 = o.w2
                LEFT JOIN uni u2 ON u2.w = o.w2
                CROSS JOIN tot
            )
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 6) AS mean_logprob
            FROM scored GROUP BY doc_id
        """,
        # e3_zipf: term counts -> deterministic rank -> ln-ln points
        # -> the e5_group_ols closed-form arithmetic.
        "e3_zipf": """
            WITH counts AS (
                SELECT lang AS grp, term, count(*) AS n
                FROM (SELECT lang,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents)
                WHERE term <> ''
                GROUP BY lang, term
            ),
            pts AS (
                SELECT grp,
                       ln(CAST(row_number() OVER (
                           PARTITION BY grp
                           ORDER BY n DESC, term ASC) AS DOUBLE)) AS x,
                       ln(CAST(n AS DOUBLE)) AS y
                FROM counts
            ),
            s AS (
                SELECT grp,
                       CAST(count(*) AS DOUBLE) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy,
                       sum(x * x) AS sxx,
                       sum(y * y) AS syy
                FROM pts GROUP BY grp
            )
            SELECT grp,
                   CAST(n AS BIGINT) AS n,
                   round((n * sxy - sx * sy)
                         / (n * sxx - sx * sx), 4) AS slope,
                   round((sy - (n * sxy - sx * sy)
                               / (n * sxx - sx * sx) * sx) / n, 4)
                       AS intercept,
                   round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                         / ((n * sxx - sx * sx)
                            * (n * syy - sy * sy)), 4) AS r2
            FROM s
        """,
        # e3_char_entropy: per-position substr explode, identical
        # -(c/tot)·ln(c/tot) term order.
        "e3_char_entropy": """
            WITH chars AS (
                SELECT doc_id, substr(text, i, 1) AS ch
                FROM documents,
                     UNNEST(generate_series(1, length(text))) AS g(i)
            ),
            counts AS (
                SELECT doc_id, ch, count(*) AS c
                FROM chars GROUP BY doc_id, ch
            ),
            probs AS (
                SELECT doc_id, c,
                       sum(c) OVER (PARTITION BY doc_id) AS tot
                FROM counts
            )
            SELECT doc_id,
                   CAST(max(tot) AS BIGINT) AS n_chars,
                   count(*) AS n_distinct_chars,
                   round(-sum((c / tot) * ln(c / tot)), 6) AS entropy
            FROM probs GROUP BY doc_id
        """,
        # e5_class_report: same pair-count -> marginals arithmetic.
        "e5_class_report": """
            WITH preds AS (
                SELECT lang AS p,
                       CASE WHEN doc_id % 4 = 0 THEN 'en'
                            ELSE lang END AS g
                FROM documents
            ),
            pairs AS (
                SELECT p, g, count(*) AS n FROM preds GROUP BY p, g
            ),
            tp AS (
                SELECT g AS label, n AS tp FROM pairs WHERE p = g
            ),
            np AS (
                SELECT p AS label, sum(n) AS n_pred
                FROM pairs GROUP BY p
            ),
            ng AS (
                SELECT g AS label, sum(n) AS support
                FROM pairs GROUP BY g
            ),
            per AS (
                SELECT coalesce(ng.label, np.label) AS label,
                       coalesce(ng.support, 0) AS support,
                       coalesce(tp.tp, 0) AS tp,
                       coalesce(np.n_pred, 0) AS n_pred
                FROM ng
                FULL JOIN np ON np.label = ng.label
                LEFT JOIN tp ON tp.label = coalesce(ng.label, np.label)
            ),
            rows_ AS (
                SELECT label, CAST(support AS BIGINT) AS support,
                       round(CASE WHEN n_pred > 0
                             THEN tp / n_pred ELSE 0.0 END, 6)
                           AS precision,
                       round(CASE WHEN support > 0
                             THEN tp / support ELSE 0.0 END, 6)
                           AS recall,
                       round(CASE WHEN (CASE WHEN n_pred > 0
                                        THEN tp / n_pred
                                        ELSE 0.0 END)
                                  + (CASE WHEN support > 0
                                     THEN tp / support ELSE 0.0 END)
                                  > 0
                             THEN 2 * (CASE WHEN n_pred > 0
                                       THEN tp / n_pred ELSE 0.0 END)
                                  * (CASE WHEN support > 0
                                     THEN tp / support ELSE 0.0 END)
                                  / ((CASE WHEN n_pred > 0
                                      THEN tp / n_pred ELSE 0.0 END)
                                     + (CASE WHEN support > 0
                                        THEN tp / support
                                        ELSE 0.0 END))
                             ELSE 0.0 END, 6) AS f1
                FROM per
            )
            SELECT * FROM rows_
            UNION ALL
            SELECT '__accuracy__', CAST(sum(support) AS BIGINT),
                   round(sum(tp) / sum(support), 6),
                   round(sum(tp) / sum(support), 6),
                   round(sum(tp) / sum(support), 6)
            FROM per
        """,
        # e5_iob_tags: same substr-scan spans, the pairwise-priority
        # anti-join resolution, prefix-sum token offsets, and the
        # first-token window.
        "e5_iob_tags": """
            WITH spans0 AS (
                SELECT DISTINCT d.doc_id,
                       CAST(i - 1 AS BIGINT) AS s_start,
                       length(t.term) AS s_len,
                       CASE WHEN t.term = 'window' THEN 'UI'
                            ELSE 'ENGINE' END AS s_label
                FROM documents d,
                     (VALUES ('spark'), ('ark'), ('window')) t(term),
                     UNNEST(generate_series(
                         1, length(d.text) - length(t.term) + 1)) AS g(i)
                WHERE substr(d.text, i, length(t.term)) = t.term
            ),
            kept AS (
                SELECT s.* FROM spans0 s
                WHERE NOT EXISTS (
                    SELECT 1 FROM spans0 o
                    WHERE o.doc_id = s.doc_id
                      AND s.s_start < o.s_start + o.s_len
                      AND o.s_start < s.s_start + s.s_len
                      AND (o.s_len > s.s_len
                           OR (o.s_len = s.s_len
                               AND o.s_start < s.s_start)
                           OR (o.s_len = s.s_len
                               AND o.s_start = s.s_start
                               AND o.s_label < s.s_label))
                )
            ),
            tok AS (
                SELECT b.doc_id, CAST(g.p AS INT) AS pos,
                       b.tk[g.p] AS token
                FROM (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents) b,
                     UNNEST(generate_series(1, len(b.tk))) AS g(p)
            ),
            offs AS (
                SELECT doc_id, pos, token,
                       coalesce(sum(length(token) + 1) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS tok_start
                FROM tok
            ),
            joined AS (
                SELECT o.doc_id, o.pos, o.token, k.s_start, k.s_len,
                       k.s_label,
                       row_number() OVER (
                           PARTITION BY o.doc_id, k.s_start, k.s_len
                           ORDER BY o.tok_start) AS rn
                FROM offs o LEFT JOIN kept k
                  ON k.doc_id = o.doc_id
                 AND o.tok_start >= k.s_start
                 AND o.tok_start < k.s_start + k.s_len
            )
            SELECT doc_id, pos, token,
                   CASE WHEN s_label IS NULL THEN 'O'
                        WHEN rn = 1 THEN 'B-' || s_label
                        ELSE 'I-' || s_label END AS tag
            FROM joined
        """,
        # e5_augment: same drop hash over raw positions, swap replayed
        # as lead/lag over surviving positions (pairs are disjoint so
        # the window form is exact).
        "e5_augment": f"""
            WITH pre AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents
            ),
            keeppos AS (
                SELECT p.doc_id, g.p,
                       row_number() OVER (
                           PARTITION BY p.doc_id ORDER BY g.p) AS j,
                       p.tk[g.p] AS tok
                FROM pre p,
                     UNNEST(generate_series(1, len(p.tk))) AS g(p)
                WHERE {_sql_hash32(
                    "CAST(p.doc_id AS VARCHAR) || '~' "
                    "|| CAST(g.p AS VARCHAR)")} % 11 <> 0
            ),
            nk AS (
                SELECT doc_id, count(*) AS n
                FROM keeppos GROUP BY doc_id
            ),
            sw AS (
                SELECT k.doc_id, k.j,
                       CASE
                         WHEN k.j % 2 = 1 AND k.j < nk.n
                              AND {_sql_hash32(
                                  "CAST(k.doc_id AS VARCHAR) || '^' "
                                  "|| CAST((k.j + 1) // 2 AS VARCHAR)")}
                                  % 7 = 0
                         THEN lead(k.tok) OVER w
                         WHEN k.j % 2 = 0
                              AND {_sql_hash32(
                                  "CAST(k.doc_id AS VARCHAR) || '^' "
                                  "|| CAST(k.j // 2 AS VARCHAR)")}
                                  % 7 = 0
                         THEN lag(k.tok) OVER w
                         ELSE k.tok
                       END AS tok,
                       CASE WHEN k.j % 2 = 0 AND {_sql_hash32(
                           "CAST(k.doc_id AS VARCHAR) || '^' "
                           "|| CAST(k.j // 2 AS VARCHAR)")} % 7 = 0
                       THEN 1 ELSE 0 END AS swapped
                FROM keeppos k JOIN nk ON nk.doc_id = k.doc_id
                WINDOW w AS (PARTITION BY k.doc_id ORDER BY k.j)
            ),
            agg AS (
                SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY j) AS text,
                       CAST(sum(swapped) AS INT) AS n_swapped_pairs
                FROM sw GROUP BY doc_id
            )
            SELECT p.doc_id,
                   coalesce(a.text, '') AS text,
                   CAST(len(p.tk) - coalesce(nk.n, 0) AS INT)
                       AS n_dropped,
                   coalesce(a.n_swapped_pairs, 0) AS n_swapped_pairs
            FROM pre p
            LEFT JOIN nk ON nk.doc_id = p.doc_id
            LEFT JOIN agg a ON a.doc_id = p.doc_id
        """,
        # e1_repair_text: same artifacts, same rule chain; DuckDB's
        # backreference is \\1 where Spark's is $1.
        "e1_repair_text": """
            WITH synth AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN base || chr(7) ELSE base END AS text
                FROM (
                    SELECT doc_id,
                           replace(replace(text, ' merge ',
                                           '-' || chr(10)),
                                   ' batch ', chr(9) || chr(9)) AS base
                    FROM documents
                )
            ),
            fixed AS (
                SELECT doc_id, length(text) AS n_chars_before,
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(text,
                                   '([A-Za-z])-\\n([A-Za-z])',
                                   '\\1\\2', 'g'),
                               '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'),
                           '[ \\t]+', ' ', 'g') AS text
                FROM synth
            )
            SELECT doc_id, text, n_chars_before,
                   length(text) AS n_chars_after
            FROM fixed
        """,
        # e5_ner_eval: both taggings via the brute-force substr scan
        # (the e3_dict_tag oracle), then the same TP/derived-FP-FN
        # metric arithmetic.
        "e5_ner_eval": """
            WITH p_terms(term) AS (
                VALUES ('spark'), ('ark'), ('window')
            ),
            g_terms(term) AS (
                VALUES ('spark'), ('window'), ('hash')
            ),
            p AS (
                SELECT DISTINCT d.doc_id, CAST(i - 1 AS BIGINT) AS start,
                       length(t.term) AS length,
                       CASE WHEN t.term = 'window' THEN 'UI'
                            ELSE 'ENGINE' END AS label
                FROM documents d, p_terms t,
                     UNNEST(generate_series(
                         1, length(d.text) - length(t.term) + 1)) AS g(i)
                WHERE substr(d.text, i, length(t.term)) = t.term
            ),
            g AS (
                SELECT DISTINCT d.doc_id, CAST(i - 1 AS BIGINT) AS start,
                       length(t.term) AS length,
                       CASE WHEN t.term = 'window' THEN 'UI'
                            ELSE 'ENGINE' END AS label
                FROM documents d, g_terms t,
                     UNNEST(generate_series(
                         1, length(d.text) - length(t.term) + 1)) AS g(i)
                WHERE substr(d.text, i, length(t.term)) = t.term
            ),
            tp AS (
                SELECT p.label, count(*) AS tp
                FROM p JOIN g USING (doc_id, start, length, label)
                GROUP BY p.label
            ),
            np AS (SELECT label, count(*) AS n_pred FROM p GROUP BY label),
            ng AS (SELECT label, count(*) AS n_gold FROM g GROUP BY label),
            per AS (
                SELECT coalesce(np.label, ng.label) AS label,
                       coalesce(tp.tp, 0) AS tp,
                       coalesce(np.n_pred, 0) - coalesce(tp.tp, 0) AS fp,
                       coalesce(ng.n_gold, 0) - coalesce(tp.tp, 0) AS fn
                FROM np
                FULL JOIN ng ON ng.label = np.label
                LEFT JOIN tp ON tp.label = coalesce(np.label, ng.label)
            ),
            allrows AS (
                -- sum() widens to HUGEINT -> pandas float; cast back so
                -- tp/fp/fn hash as the same int64 the Spark side emits
                SELECT label, CAST(tp AS BIGINT) AS tp,
                       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn
                FROM per
                UNION ALL
                SELECT '__micro__', CAST(sum(tp) AS BIGINT),
                       CAST(sum(fp) AS BIGINT), CAST(sum(fn) AS BIGINT)
                FROM per
            )
            SELECT label, tp, fp, fn,
                   round(CASE WHEN tp + fp > 0
                              THEN tp / (tp + fp) ELSE 0.0 END, 6)
                       AS precision,
                   round(CASE WHEN tp + fn > 0
                              THEN tp / (tp + fn) ELSE 0.0 END, 6)
                       AS recall,
                   round(CASE WHEN (CASE WHEN tp + fp > 0
                                    THEN tp / (tp + fp) ELSE 0.0 END)
                              + (CASE WHEN tp + fn > 0
                                 THEN tp / (tp + fn) ELSE 0.0 END) > 0
                         THEN 2 * (CASE WHEN tp + fp > 0
                                   THEN tp / (tp + fp) ELSE 0.0 END)
                              * (CASE WHEN tp + fn > 0
                                 THEN tp / (tp + fn) ELSE 0.0 END)
                              / ((CASE WHEN tp + fp > 0
                                  THEN tp / (tp + fp) ELSE 0.0 END)
                                 + (CASE WHEN tp + fn > 0
                                    THEN tp / (tp + fn) ELSE 0.0 END))
                         ELSE 0.0 END, 6) AS f1
            FROM allrows
        """,
        # e3_kn_ppl: interpolated Kneser-Ney replicated term-for-term —
        # all four dims (bigram counts, context totals + fan-out,
        # continuation counts, type total) derive from the SAME bigram
        # table, and the scoring expression mirrors the Spark operator
        # order exactly so the float math is bitwise-identical.
        "e3_kn_ppl": """
            WITH en AS (
                SELECT string_split(text, ' ') AS ts
                FROM documents WHERE lang = 'en'
            ),
            pairs AS (
                SELECT ts[i] AS w1, ts[i + 1] AS w2
                FROM en, UNNEST(generate_series(
                    1, greatest(len(ts) - 1, 0))) AS g(i)
                WHERE ts[i] <> '' AND ts[i + 1] <> ''
            ),
            big AS (
                SELECT w1, w2, count(*) AS n12
                FROM pairs GROUP BY w1, w2
            ),
            ctx AS (
                SELECT w1, CAST(sum(n12) AS DOUBLE) AS n1,
                       CAST(count(*) AS DOUBLE) AS d_after
                FROM big GROUP BY w1
            ),
            cont AS (
                SELECT w2, CAST(count(*) AS DOUBLE) AS d_before
                FROM big GROUP BY w2
            ),
            types AS (
                SELECT CAST(count(*) AS DOUBLE) AS n_types FROM big
            ),
            occ AS (
                SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
                FROM (SELECT doc_id, string_split(text, ' ') AS ts
                      FROM documents),
                     UNNEST(generate_series(
                         1, greatest(len(ts) - 1, 0))) AS g(i)
                WHERE ts[i] <> '' AND ts[i + 1] <> ''
            ),
            scored AS (
                SELECT o.doc_id,
                       ln(CASE WHEN c.n1 IS NOT NULL THEN
                              greatest(coalesce(b.n12 * 1.0, 0.0)
                                       - 0.75, 0.0) / c.n1
                              + (0.75 * c.d_after / c.n1)
                                * (coalesce(k.d_before, 0.5) / t.n_types)
                          ELSE coalesce(k.d_before, 0.5) / t.n_types
                          END) AS lp
                FROM occ o
                LEFT JOIN big b ON b.w1 = o.w1 AND b.w2 = o.w2
                LEFT JOIN ctx c ON c.w1 = o.w1
                LEFT JOIN cont k ON k.w2 = o.w2
                CROSS JOIN types t
            )
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 6) AS mean_logprob,
                   round(exp(-avg(lp)), 3) AS ppl
            FROM scored GROUP BY doc_id
        """,
        # e4_gif_decode: the SAME format-blind digest oracle — it never
        # touches GIF; a hash match proves the LZW round-trip.
        "e4_gif_decode": """
            SELECT doc_id AS media_id,
                   32 AS width,
                   CAST(greatest(ceil(octet_length(encode(text)) / 32.0), 1)
                        AS INTEGER) AS height,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS decoded_sha256
            FROM documents
        """,
        "e6_windows": """
            SELECT 'tumbling' AS kind,
                   time_bucket(INTERVAL '5 minutes', ts) AS window_start,
                   time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes'
                       AS window_end,
                   event_type AS grp,
                   count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM events GROUP BY window_start, event_type
            UNION ALL
            SELECT 'sliding' AS kind, window_start,
                   window_start + INTERVAL '10 minutes' AS window_end,
                   CAST(NULL AS VARCHAR) AS grp,
                   count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM (
                SELECT value,
                       unnest([tb, tb - INTERVAL '5 minutes']) AS window_start
                FROM (
                    SELECT value, time_bucket(INTERVAL '5 minutes', ts) AS tb
                    FROM events
                )
            ) GROUP BY window_start
        """,
        "e6_tumbling": """
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY window_start, event_type
        """,
        "e6_sliding": """
            WITH b AS (
                SELECT value, time_bucket(INTERVAL '5 minutes', ts) AS tb
                FROM events
            ),
            x AS (
                SELECT value,
                       unnest([tb, tb - INTERVAL '5 minutes']) AS window_start
                FROM b
            )
            SELECT window_start,
                   window_start + INTERVAL '10 minutes' AS window_end,
                   count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM x GROUP BY window_start
        """,
        "e6_sessionize": """
            WITH o AS (
                SELECT user_id, ts, value,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
                FROM events
            ),
            m AS (
                SELECT user_id, ts, value,
                       CASE WHEN prev IS NULL
                                 OR ts - prev > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_s
                FROM o
            ),
            s AS (
                SELECT user_id, ts, value,
                       sum(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS sid
                FROM m
            )
            SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL '30 minutes' AS session_end,
                   count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "e6_props_json": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
            FROM events
        """,
        "syn_canonical": f"""
            SELECT *, 'curie' AS via FROM ({_syn_canonical_curie_oracle()})
            UNION ALL
            SELECT *, 'name' AS via FROM ({_syn_canonical_name_oracle()})
        """,
        "syn_canonical_curie": _syn_canonical_curie_oracle(),
        "syn_canonical_name": _syn_canonical_name_oracle(),
        "syn_equivalent_nodes": _syn_equivalent_nodes_oracle(),
        "syn_category_histogram": _syn_category_histogram_oracle(),
        "syn_normalizer_nodes": _syn_normalizer_nodes_oracle(),
        # -- round 3: the flagship pipelines, hash-checked --------------
        "ep1_mechanistic_nodes": _ep1_mechanistic_oracle(),
        "ep2_aligned_nodes": _ep2_aligned_oracle(),
        # round 7: the in-engine TF-IDF linker (X1 gap closure) — the
        # candidate generator alone, and EP1 end-to-end with linking
        # done by the relational TF-IDF instead of the stub's lexicon
        "x1_tfidf_linker": _x1_tfidf_linker_oracle(),
        "ep1_tfidf_mechanistic_nodes": _ep1_tfidf_oracle(),
        # round 8 (VERDICT r07 next #8): EP1 with zero stub factories
        "ep1_spotted_nodes": _ep1_spotted_oracle(),
        # round 7 (round-8 pool): the suffix-array family — the oracle
        # sorts the ACTUAL suffix strings of the bounded probe corpus
        # (rank() over substr-to-end), so the prefix-doubling ranks and
        # the adjacent-pair duplicated spans are content-checked
        "e1_suffix_array": f"""
            WITH d AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 20
            ),
            corpus AS (
                SELECT string_agg(text || chr(1), '' ORDER BY doc_id)
                    AS s
                FROM d
            ),
            offs AS (
                SELECT doc_id, text,
                       COALESCE(sum(length(text) + 1) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ), 0) AS off
                FROM d
            ),
            pos AS (
                SELECT o.doc_id, o.off + i AS gpos, i AS local_pos
                FROM offs o,
                     UNNEST(generate_series(1, length(o.text) + 1))
                         AS g(i)
            )
            SELECT CAST(p.gpos AS BIGINT) AS gpos, p.doc_id,
                   CAST(p.local_pos AS BIGINT) AS local_pos,
                   CAST(rank() OVER (
                       ORDER BY substr(c.s, CAST(p.gpos AS INT))
                   ) AS BIGINT) AS sa_rank
            FROM pos p, corpus c
        """,
        "e1_sa_dup_spans": _SA_PLANTED_CTES + """
            SELECT a.doc_id,
                   CAST(a.local_pos AS BIGINT) AS local_pos,
                   b.doc_id AS other_doc_id,
                   CAST(b.local_pos AS BIGINT) AS other_pos,
                   a.w AS prefix
            FROM win a JOIN win b ON b.r = a.r + 1
            WHERE length(a.w) >= 40 AND a.w = b.w
        """,
        # round 8 (VERDICT r07 next #2): the Lee-et-al REMOVAL step —
        # keeper = corpus-first occurrence per duplicated 40-char
        # window, every other occurrence's span stripped; the oracle
        # rebuilds each text by per-char coverage + ordered string_agg
        "e1_sa_dedup": _SA_PLANTED_CTES + """
            , pairs AS (
                SELECT a.doc_id AS d1, a.local_pos AS p1,
                       b.doc_id AS d2, b.local_pos AS p2,
                       a.w AS prefix
                FROM win a JOIN win b ON b.r = a.r + 1
                WHERE length(a.w) >= 40 AND a.w = b.w
            ),
            occ AS (
                SELECT prefix, d1 AS d, p1 AS p FROM pairs
                UNION
                SELECT prefix, d2, p2 FROM pairs
            ),
            removals AS (
                SELECT DISTINCT d AS doc_id, p AS start FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY prefix ORDER BY d, p
                    ) AS rn FROM occ
                ) WHERE rn > 1
            ),
            chars AS (
                SELECT dd.doc_id, i,
                       substr(dd.text, CAST(i AS INT), 1) AS ch
                FROM d dd,
                     UNNEST(generate_series(1, length(dd.text)))
                         AS g(i)
            ),
            kept AS (
                SELECT c.doc_id,
                       string_agg(c.ch, '' ORDER BY c.i) AS text,
                       count(*) AS n
                FROM chars c
                WHERE NOT EXISTS (
                    SELECT 1 FROM removals r
                    WHERE r.doc_id = c.doc_id
                      AND c.i >= r.start AND c.i < r.start + 40
                )
                GROUP BY c.doc_id
            )
            SELECT dd.doc_id, COALESCE(k.text, '') AS text,
                   CAST(COALESCE(k.n, 0) AS INT) AS n_chars_kept,
                   CAST(length(dd.text) - COALESCE(k.n, 0) AS INT)
                       AS n_chars_removed
            FROM d dd LEFT JOIN kept k USING (doc_id)
        """,
        # round 8 (VERDICT r07 next #3): the bench-grade SA slice —
        # direct sorted-suffix rank, per-doc checksum (content check)
        "e1_suffix_array_bench": """
            WITH d AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id % 100 = 0
            ),
            corpus AS (
                SELECT string_agg(text || chr(1), '' ORDER BY doc_id)
                    AS s
                FROM d
            ),
            offs AS (
                SELECT doc_id, text,
                       COALESCE(sum(length(text) + 1) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ), 0) AS off
                FROM d
            ),
            pos AS (
                SELECT o.doc_id, o.off + i AS gpos, i AS local_pos
                FROM offs o,
                     UNNEST(generate_series(1, length(o.text) + 1))
                         AS g(i)
            ),
            sa AS (
                SELECT p.doc_id, p.local_pos,
                       rank() OVER (
                           ORDER BY substr(c.s, CAST(p.gpos AS INT))
                       ) AS r
                FROM pos p, corpus c
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_positions,
                   CAST(sum(r * local_pos) % 1000000007 AS BIGINT)
                       AS rank_checksum
            FROM sa GROUP BY doc_id
        """,
        # round 8 (VERDICT r07 next #4): corpus-scale linker probes —
        # the full TF-IDF replication over doc-trigram mentions and a
        # doc-trigram alias dim, max_df off / on
        "x1_linker_corpus": _x1_linker_corpus_oracle(None),
        "x1_linker_corpus_maxdf": _x1_linker_corpus_oracle(0.1),
        # round 8 (round-9 pool): distributed Lloyd's k-means —
        # chained-CTE replay, all-integer grid geometry — and the
        # hash-rank diversity draw over the same replayed fit
        "e2_kmeans": _e2_kmeans_oracle(),
        # the streaming routing face must equal its batch twin — one
        # oracle, two names
        "e2_assign_stream": _e2_kmeans_oracle(),
        "e2_cluster_sample": _e2_kmeans_oracle(tail=f"""
        SELECT id AS vec_id, cid AS cluster_id,
               CAST(rn AS INT) AS draw_rank
        FROM (
            SELECT id, cid, row_number() OVER (
                PARTITION BY cid
                ORDER BY {_sql_hash32("CAST(id AS VARCHAR)")}, id
            ) AS rn
            FROM assign_3
        ) WHERE rn <= 12
    """),
        # round 8 (round-9 pool): semantic decontamination — max
        # benchmark cosine per train vector, benchmark = vec_id < 20
        "e1_semantic_decontaminate": f"""
            WITH q AS (
                SELECT embedding FROM embeddings WHERE vec_id < 20
            ),
            c AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id >= 20
            ),
            scored AS (
                SELECT c.vec_id,
                       round(max({_SQL_COSINE}), 6)
                           AS max_benchmark_sim
                FROM c, q GROUP BY 1
            )
            SELECT t.vec_id, s.max_benchmark_sim,
                   coalesce(s.max_benchmark_sim >= 0.9, false)
                       AS contaminated
            FROM c t LEFT JOIN scored s USING (vec_id)
        """,
        # round 8 (round-9 pool): deterministic FIM (PSM) — hash-drawn
        # token cut points, pure projection in both engines
        "e5_fim_transform": f"""
            WITH cuts AS (
                SELECT doc_id, tk, len(tk) AS n,
                       1 + ({_sql_hash32(
                           "CAST(doc_id AS VARCHAR) || ':r8-fim:a'"
                       )}) % greatest(len(tk), 1) AS ca,
                       1 + ({_sql_hash32(
                           "CAST(doc_id AS VARCHAR) || ':r8-fim:b'"
                       )}) % greatest(len(tk), 1) AS cb
                FROM (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents)
            ),
            spans AS (
                SELECT doc_id, tk, n,
                       least(ca, cb) AS lo, greatest(ca, cb) AS hi
                FROM cuts
            )
            SELECT doc_id,
                   '<PRE>'
                   || coalesce(array_to_string(tk[1:lo-1], ' '), '')
                   || '<SUF>'
                   || coalesce(array_to_string(tk[hi:n], ' '), '')
                   || '<MID>'
                   || coalesce(array_to_string(tk[lo:hi-1], ' '), '')
                       AS text_fim,
                   CAST(lo - 1 AS INT) AS n_prefix,
                   CAST(hi - lo AS INT) AS n_middle,
                   CAST(n - hi + 1 AS INT) AS n_suffix
            FROM spans
        """,
        # round 8 (round-9 pool): paper-shape SemDeDup — the k-means
        # replay, within-cell cosine pairs, recursive-CTE components,
        # min-id survivor
        "e2_semdedup_kmeans": _e2_kmeans_oracle(recursive=True, tail=f"""
        , vecsj AS (
            SELECT a.id, a.cid, e.embedding
            FROM assign_3 a JOIN embeddings e ON e.vec_id = a.id
        ),
        sd_pairs AS (
            SELECT c.id AS id_a, q.id AS id_b
            FROM vecsj c JOIN vecsj q
              ON c.cid = q.cid AND c.id < q.id
            WHERE round({_SQL_COSINE}, 6) >= 0.92
        ),
        sd_edges AS (
            SELECT id_a AS a, id_b AS b FROM sd_pairs
            UNION
            SELECT id_b AS a, id_a AS b FROM sd_pairs
        ),
        sd_reach(id, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM sd_edges)
            UNION
            SELECT e.b, r.lab
            FROM sd_reach r JOIN sd_edges e ON e.a = r.id
        ),
        sd_comp AS (
            SELECT id, min(lab) AS component FROM sd_reach GROUP BY id
        ),
        sd_all AS (
            SELECT a.id, a.cid AS kmeans_cluster,
                   coalesce(c.component, a.id) AS cluster_id
            FROM assign_3 a LEFT JOIN sd_comp c ON c.id = a.id
        ),
        sd_sizes AS (
            SELECT cluster_id, count(*) AS cluster_size
            FROM sd_all GROUP BY 1
        )
        SELECT s.id AS vec_id, s.kmeans_cluster, s.cluster_id,
               CAST(z.cluster_size AS BIGINT) AS cluster_size,
               s.id = s.cluster_id AS is_survivor
        FROM sd_all s JOIN sd_sizes z USING (cluster_id)
    """),
        # round 7 (round-8 pool): rerank funnel + PageRank replay
        "e2_rerank_topk": _e2_rerank_topk_oracle(),
        "g_pagerank": _g_pagerank_oracle(),
        "g_ppr": _g_pagerank_oracle(seeds=[0, 7]),
        # g_kcore: the same 4 synchronized h-index rounds as chained
        # CTEs — per round, rank neighbor values desc and take
        # max(least(rank, value)); all integer arithmetic.
        "g_kcore": (
            """
            WITH raw AS (
                SELECT doc_id % 97 AS s,
                       (doc_id * doc_id + 1) % 97 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
                FROM documents
            ),
            sym AS (
                SELECT s AS a, d AS b FROM raw WHERE s <> d
                UNION
                SELECT d, s FROM raw WHERE s <> d
            ),
            v0 AS (
                SELECT a AS v, COUNT(*) AS core FROM sym GROUP BY a
            )
            """
            + "".join(
                f""",
            v{r} AS (
                SELECT t.v, MAX(LEAST(t.rk, t.uval)) AS core
                FROM (
                    SELECT s.a AS v, p.core AS uval,
                           ROW_NUMBER() OVER (
                               PARTITION BY s.a
                               ORDER BY p.core DESC, s.b
                           ) AS rk
                    FROM sym s JOIN v{r - 1} p ON p.v = s.b
                ) t GROUP BY t.v
            )"""
                for r in range(1, 5)
            )
            + "\n            SELECT v, core FROM v4"
        ),
        # round 7 (round-8 pool): Laplace-mechanism DP histogram —
        # inverse-CDF noise from the md5 hash kernel, same arithmetic
        # order as the Spark expression
        "e5_dp_histogram": f"""
            WITH c AS (
                SELECT event_type, count(*) AS true_count
                FROM events GROUP BY 1
            ),
            n AS (
                SELECT event_type, true_count,
                       ({_sql_hash32("event_type || chr(31) || 'r7'")}
                        + 0.5) / 4294967296.0 AS u
                FROM c
            )
            SELECT event_type, true_count,
                   CAST(greatest(floor(
                       true_count
                       + (-(1.0 / 0.5) * sign(u - 0.5)
                          * ln(1.0 - 2.0 * abs(u - 0.5)))
                       + 0.5), 0) AS BIGINT) AS noisy_count
            FROM n
        """,
        # round 8 (VERDICT r07 next #6): user-level DP — per-user
        # contribution clamp (budget 3, spent in group-key order), then
        # Laplace(3/eps) on the bounded counts
        "e5_dp_histogram_user": f"""
            WITH per AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY 1, 2
            ),
            budget AS (
                SELECT event_type, n,
                       COALESCE(sum(n) OVER (
                           PARTITION BY user_id ORDER BY event_type
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ), 0) AS before
                FROM per
            ),
            c AS (
                SELECT event_type,
                       CAST(sum(greatest(0, least(n, 3 - before)))
                            AS BIGINT) AS true_count
                FROM budget GROUP BY 1
            ),
            nz AS (
                SELECT event_type, true_count,
                       ({_sql_hash32("event_type || chr(31) || 'r8u'")}
                        + 0.5) / 4294967296.0 AS u
                FROM c
            )
            SELECT event_type, true_count,
                   CAST(greatest(floor(
                       true_count
                       + (-(3.0 / 0.5) * sign(u - 0.5)
                          * ln(1.0 - 2.0 * abs(u - 0.5)))
                       + 0.5), 0) AS BIGINT) AS noisy_count
            FROM nz
        """,
        # round 9: DP quantiles — the dp_histogram noise kernel keyed
        # on the PUBLIC bin grid, noisy CDF, integer-compare readout
        "e5_dp_quantile": f"""
            WITH obs AS (
                SELECT LEAST(49, GREATEST(0,
                           CAST(floor((value - 0.0) / 10.0) AS INT)
                       )) AS bin
                FROM events WHERE value IS NOT NULL
            ),
            c AS (SELECT bin, count(*) AS c FROM obs GROUP BY 1),
            spine AS (
                SELECT CAST(ii.b AS INT) AS bin
                FROM UNNEST(generate_series(0, 49)) AS ii(b)
            ),
            keyed AS (
                SELECT bin,
                       ({_sql_hash32(
                           "CAST(bin AS VARCHAR) || chr(31) || 'r9q'"
                       )} + 0.5) / 4294967296.0 AS u
                FROM spine
            ),
            nz AS (
                SELECT k.bin,
                       CAST(greatest(floor(
                           COALESCE(c.c, 0)
                           + (-(1.0 / 0.5) * sign(u - 0.5)
                              * ln(1.0 - 2.0 * abs(u - 0.5)))
                           + 0.5), 0) AS BIGINT) AS noisy_count
                FROM keyed k LEFT JOIN c ON c.bin = k.bin
            ),
            cdf AS (
                SELECT bin,
                       CAST(SUM(noisy_count) OVER (
                           ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS noisy_cum,
                       CAST(SUM(noisy_count) OVER () AS BIGINT)
                           AS noisy_total
                FROM nz
            ),
            hit AS (
                SELECT CAST(q.q_permille AS BIGINT) AS q_permille,
                       MIN(bin) AS bin
                FROM cdf, (VALUES (250), (500), (750), (900))
                     q(q_permille)
                WHERE noisy_cum * 1000 >= q.q_permille * noisy_total
                GROUP BY 1
            )
            SELECT hit.q_permille, hit.bin,
                   0.0 + hit.bin * 10.0 AS lower_edge,
                   cdf.noisy_cum, cdf.noisy_total
            FROM hit JOIN cdf ON cdf.bin = hit.bin
        """,
        # round 7 (round-8 pool): 1-bit quantization (32 sign bits per
        # BIGINT word — all words small positives, no sign convention)
        # + exact Hamming top-k, integer arithmetic end to end
        "e2_hamming_topk": """
            WITH codes AS (
                SELECT vec_id,
                       list_transform(generate_series(0, 1), w ->
                           CAST(list_sum(list_transform(
                               generate_series(0, 31), i ->
                               CASE WHEN embedding[w * 32 + i + 1] > 0
                                    THEN (CAST(1 AS BIGINT) << i)
                                    ELSE CAST(0 AS BIGINT) END
                           )) AS BIGINT)) AS code
                FROM embeddings
            ),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       CAST(list_sum(list_transform(
                           generate_series(1, 2), j ->
                           bit_count(xor(q.code[j], c.code[j]))
                       )) AS BIGINT) AS hamming
                FROM codes c, codes q
                WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
            )
            SELECT query_id, neighbor_id, hamming, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY hamming ASC, neighbor_id ASC
                ) AS rank FROM scored
            ) WHERE rank <= 5
        """,
        # round 8 (VERDICT r07 next #7): the banded pair generator's
        # oracle is the brute-force all-pairs scan — pigeonhole says
        # they must be identical at radius 3 with 4 bands
        "e2_hamming_pairs": """
            WITH base AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 300
            ),
            corpus AS (
                SELECT vec_id, embedding FROM base
                UNION ALL
                SELECT vec_id + 100000,
                       list_transform(generate_series(1, 64), i ->
                           CASE WHEN i = 2 THEN -embedding[i]
                                ELSE embedding[i] END)
                FROM base
            ),
            codes AS (
                SELECT vec_id,
                       list_transform(generate_series(0, 1), w ->
                           CAST(list_sum(list_transform(
                               generate_series(0, 31), i ->
                               CASE WHEN embedding[w * 32 + i + 1] > 0
                                    THEN (CAST(1 AS BIGINT) << i)
                                    ELSE CAST(0 AS BIGINT) END
                           )) AS BIGINT)) AS code
                FROM corpus
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(list_sum(list_transform(
                       generate_series(1, 2), j ->
                       bit_count(xor(a.code[j], b.code[j]))
                   )) AS BIGINT) AS hamming
            FROM codes a, codes b
            WHERE a.vec_id < b.vec_id
              AND list_sum(list_transform(
                      generate_series(1, 2), j ->
                      bit_count(xor(a.code[j], b.code[j])))) <= 3
        """,
        # -- round 2: temporal joins, dedup clustering, E5 widening -----
        "t_asof_join": """
            WITH p AS (
                SELECT event_id, user_id, ts, value
                FROM events WHERE event_type = 'purchase'
            ),
            c AS (
                SELECT user_id, ts, max(value) AS click_value
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id, p.ts, p.value,
                   c.ts AS matched_ts, c.click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "t_range_join": """
            WITH p AS (
                SELECT event_id, user_id, ts, value
                FROM events WHERE event_type = 'purchase'
            ),
            s AS (
                SELECT user_id, ts AS start_ts,
                       ts + INTERVAL 2 HOUR AS end_ts,
                       event_id AS signup_id
                FROM events WHERE event_type = 'signup'
            )
            SELECT p.event_id, p.user_id, p.ts, p.value,
                   s.start_ts, s.end_ts, s.signup_id
            FROM p JOIN s
              ON p.user_id = s.user_id
             AND p.ts >= s.start_ts AND p.ts < s.end_ts
        """,
        "e3_packed_sequences_rows": """
            WITH toks AS (
                SELECT doc_id, i AS idx, tk[i] AS tok
                FROM (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
                     UNNEST(generate_series(1, len(tk))) AS g(i)
            ),
            pos AS (
                SELECT tok,
                       row_number() OVER (ORDER BY doc_id, idx) - 1 AS p
                FROM toks
            )
            SELECT CAST(floor(p / 512) AS BIGINT) AS seq_id,
                   string_agg(tok, ' ' ORDER BY p) AS seq_text,
                   CAST(count(*) AS INT) AS n_tokens
            FROM pos GROUP BY 1
        """,
        "e5_pivot": """
            SELECT o_orderstatus,
                   count(*) FILTER (o_orderpriority = '1-URGENT')
                       AS pri_1,
                   count(*) FILTER (o_orderpriority = '2-HIGH') AS pri_2,
                   count(*) FILTER (o_orderpriority = '3-MEDIUM')
                       AS pri_3,
                   count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
                       AS pri_4,
                   count(*) FILTER (o_orderpriority = '5-LOW') AS pri_5
            FROM orders GROUP BY o_orderstatus
        """,
        "e5_unpivot": """
            WITH wide AS (
                SELECT o_orderstatus,
                       count(*) FILTER (o_orderpriority = '1-URGENT')
                           AS pri_1,
                       count(*) FILTER (o_orderpriority = '2-HIGH')
                           AS pri_2,
                       count(*) FILTER (o_orderpriority = '3-MEDIUM')
                           AS pri_3,
                       count(*) FILTER (
                           o_orderpriority = '4-NOT SPECIFIED') AS pri_4,
                       count(*) FILTER (o_orderpriority = '5-LOW')
                           AS pri_5
                FROM orders GROUP BY o_orderstatus
            )
            SELECT o_orderstatus, 'pri_1' AS priority, pri_1 AS n_orders
            FROM wide
            UNION ALL SELECT o_orderstatus, 'pri_2', pri_2 FROM wide
            UNION ALL SELECT o_orderstatus, 'pri_3', pri_3 FROM wide
            UNION ALL SELECT o_orderstatus, 'pri_4', pri_4 FROM wide
            UNION ALL SELECT o_orderstatus, 'pri_5', pri_5 FROM wide
        """,
        "e5_cluster_safe_split": f"""
            WITH RECURSIVE pairs AS ({_e1_minhash_near_dup_oracle()}),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION
                SELECT id_b AS a, id_a AS b FROM pairs
            ),
            reach(id, lab) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM edges)
                UNION
                SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id
            ),
            comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
            cl AS (
                SELECT d.doc_id,
                       coalesce(c.component, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
            )
            SELECT doc_id,
                   CASE WHEN {_sql_hash32("CAST(cluster_id AS VARCHAR)")}
                             % 10000 < 8000 THEN 'train'
                        WHEN {_sql_hash32("CAST(cluster_id AS VARCHAR)")}
                             % 10000 < 9000 THEN 'valid'
                        ELSE 'test' END AS split
            FROM cl
        """,
        "e1_dup_clusters": f"""
            WITH RECURSIVE pairs AS ({_e1_minhash_near_dup_oracle()}),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION
                SELECT id_b AS a, id_a AS b FROM pairs
            ),
            reach(id, lab) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM edges)
                UNION
                SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id
            ),
            comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
            SELECT d.doc_id,
                   coalesce(c.component, d.doc_id) AS cluster_id,
                   c.component IS NULL AS is_singleton
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q14_promo_revenue": """
            SELECT round(
                100 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0.0 END)
                    / sum(l_extendedprice * (1 - l_discount)), 6
            ) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-09-01'
              AND l_shipdate <  TIMESTAMP '1996-10-01'
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
              )
            GROUP BY o_orderpriority
        """,
        "a9_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
                   round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "q8_market_share": """
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_5'
                                  THEN volume ELSE 0.0 END) / sum(volume),
                         6) AS mkt_share
            FROM (
                SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                       l_extendedprice * (1 - l_discount) AS volume,
                       n2.n_name AS supp_nation
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                WHERE r_name = 'ASIA' AND p_type = 'PROMO'
            )
            GROUP BY o_year
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity * 0.1), 2)
                       AS sum_profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2
        """,
        "q11_important_parts": """
            WITH pv AS (
                SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                WHERE s_nationkey < 5
                GROUP BY l_partkey
            )
            SELECT l_partkey, round(value, 2) AS part_value
            FROM pv
            WHERE value > 0.001 * (SELECT sum(value) FROM pv)
        """,
        "q12_late_priority": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag
        """,
        "q13_order_count_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer
                LEFT JOIN orders ON c_custkey = o_custkey
                                AND o_orderstatus <> 'F'
                GROUP BY c_custkey
            )
            GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q16_supplier_counts": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#5'
              AND p_size IN (1, 4, 9, 14, 23)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
        """,
        "q19_disjunctive_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q17_small_quantity_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
              AND l_quantity < (
                  SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = part.p_partkey
              )
        """,
        "q20_pattern_shippers": """
            WITH shipped AS (
                SELECT l_suppkey, round(sum(l_quantity), 2) AS qty
                FROM lineitem
                WHERE l_partkey IN (
                        SELECT p_partkey FROM part
                        WHERE p_name LIKE '%widget%')
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, n_name, qty
            FROM supplier
            JOIN shipped ON l_suppkey = s_suppkey
            JOIN nation  ON n_nationkey = s_nationkey
            WHERE qty > 300
        """,
        "q21_late_sole_supplier": """
            WITH pair AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate >
                                     o_orderdate + INTERVAL 60 DAY
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY l_orderkey, l_suppkey
            ),
            per_order AS (
                SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
                FROM pair GROUP BY l_orderkey
            )
            SELECT s_name, count(*) AS numwait
            FROM pair
            JOIN per_order USING (l_orderkey)
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE late = 1 AND n_supp >= 2 AND n_late = 1
            GROUP BY s_name
        """,
        # q2: the correlated-min subquery as CTEs — min cost per
        # (part, supplier) from lineitem, region-filtered suppliers,
        # ties kept via the equality re-join on the per-part min.
        "q2_min_cost_supplier": """
            WITH supp_r AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier s
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'EUROPE'
            ),
            cost AS (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice) AS cost
                FROM lineitem GROUP BY l_partkey, l_suppkey
            ),
            j AS (
                SELECT p.p_partkey, p.p_type, sr.s_name, sr.n_name,
                       sr.s_acctbal, c.cost
                FROM cost c
                JOIN part p ON p.p_partkey = c.l_partkey
                 AND p.p_size % 10 = 5
                JOIN supp_r sr ON sr.s_suppkey = c.l_suppkey
            ),
            m AS (
                SELECT p_partkey, min(cost) AS min_cost
                FROM j GROUP BY p_partkey
            )
            SELECT j.p_partkey, j.p_type, j.s_name, j.n_name,
                   j.s_acctbal, round(j.cost, 2) AS supply_cost
            FROM j JOIN m ON m.p_partkey = j.p_partkey
                        AND j.cost = m.min_cost
        """,
        "q22_idle_customers": """
            SELECT c_mktsegment, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
              AND c_acctbal > (
                  SELECT avg(c_acctbal) FROM customer
                  WHERE c_acctbal > 0
                    AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE'))
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY c_mktsegment
        """,
        "e2_label_centroids": """
            SELECT label, pos, round(avg(v), 6) AS centroid
            FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) - 1 AS pos
                  FROM embeddings)
            GROUP BY label, pos
        """,
        "e3_gopher_filter": f"""
            WITH f AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS n_tokens,
                       length(text) AS n_chars,
                       length(regexp_replace(text, '[0-9]', '', 'g'))
                           AS n_nondigit,
                       len(list_distinct(string_split(text, ' ')))
                           AS n_distinct,
                       len(list_intersect(string_split(lower(text), ' '),
                           {_SQL_EN_STOPWORDS})) > 0 AS has_sw
                FROM documents
            ),
            flags AS (
                SELECT doc_id, n_tokens,
                       n_tokens >= 20 AND n_tokens <= 100000 AS len_ok,
                       n_chars / n_tokens >= 3.0
                           AND n_chars / n_tokens <= 10.0
                           AS mean_token_len_ok,
                       (n_chars - n_nondigit) / n_chars <= 0.2
                           AS digit_ratio_ok,
                       n_distinct / n_tokens >= 0.2 AS repetition_ok,
                       has_sw AS stopword_ok
                FROM f
            )
            SELECT *, len_ok AND mean_token_len_ok AND digit_ratio_ok
                      AND repetition_ok AND stopword_ok AS keep
            FROM flags
        """,
        "j_fuzzy_name_match": """
            WITH names AS (SELECT DISTINCT p_name FROM part),
            probes AS (SELECT DISTINCT p_name || 'x' AS probe FROM part),
            pl AS (
                SELECT probe,
                       substr(probe, 1, 1) || '|' ||
                       CAST(CAST(floor(length(probe) / 3) AS BIGINT)
                            AS VARCHAR) AS blk
                FROM probes
            ),
            nr AS (
                SELECT DISTINCT p_name,
                       substr(p_name, 1, 1) || '|' || CAST(b AS VARCHAR)
                           AS blk
                FROM names,
                     unnest([
                        CAST(floor(length(p_name) / 3) AS BIGINT) - 1,
                        CAST(floor(length(p_name) / 3) AS BIGINT),
                        CAST(floor(length(p_name) / 3) AS BIGINT) + 1
                     ]) AS t(b)
            )
            SELECT probe, p_name AS matched_p_name,
                   levenshtein(probe, p_name) AS distance
            FROM pl JOIN nr USING (blk)
            WHERE levenshtein(probe, p_name) <= 2
        """,
        "e5_scd2_user_state": """
            WITH ordered AS (
                SELECT user_id, ts, event_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events
            ),
            changed AS (
                -- IS DISTINCT FROM matches the engine's NULL-SAFE
                -- struct collapse (ADVICE r04): a transition to/from a
                -- NULL attribute value opens a version on both engines.
                SELECT * FROM ordered
                WHERE prev IS DISTINCT FROM event_type
            )
            SELECT user_id, event_type,
                   ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) IS NULL AS is_current
            FROM changed
        """,
        "e5_constraint_report": """
            SELECT 'not_null' AS check, 'o_custkey' AS target,
                   count(*) FILTER (o_custkey IS NULL) AS n_violations,
                   count(*) FILTER (o_custkey IS NULL) = 0 AS passed
            FROM orders
            UNION ALL
            SELECT 'not_null', 'o_orderdate',
                   count(*) FILTER (o_orderdate IS NULL),
                   count(*) FILTER (o_orderdate IS NULL) = 0
            FROM orders
            UNION ALL
            -- NULL keys are excluded from the unique check on BOTH
            -- engines (ADVICE r04): count only non-null keys, and
            -- count(DISTINCT ...) skips NULLs by definition.
            SELECT 'unique', 'o_orderkey',
                   count(o_orderkey) - count(DISTINCT o_orderkey),
                   count(o_orderkey) = count(DISTINCT o_orderkey)
            FROM orders
            UNION ALL
            SELECT 'accepted_values', 'o_orderstatus',
                   count(*) FILTER (o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O', 'F', 'P')),
                   count(*) FILTER (o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O', 'F', 'P')) = 0
            FROM orders
            UNION ALL
            SELECT 'references', 'o_custkey', count(*), count(*) = 0
            FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey IS NOT NULL)
        """,
        "e3_pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS start
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(floor(start / 512.0) AS BIGINT) AS seq_first,
                   CAST(floor((start + n_tokens - 1) / 512.0) AS BIGINT)
                       AS seq_last,
                   -- BIGINT, not DuckDB's HUGEINT-sum→double (the
                   -- driver hashes typed values; Spark side is long)
                   CAST(start % 512 AS BIGINT) AS offset_in_first
            FROM c
        """,
        "e3_hashed_tf": f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ),
            tf AS (
                SELECT doc_id, {_sql_hash32("tok")} % 64 AS bucket,
                       count(*) AS n
                FROM toks WHERE tok <> '' GROUP BY doc_id, bucket
            ),
            l2 AS (
                SELECT doc_id, sqrt(sum(n * n)) AS l2 FROM tf
                GROUP BY doc_id
            )
            SELECT tf.doc_id, bucket AS pos, round(n / l2, 6) AS value
            FROM tf JOIN l2 USING (doc_id)
        """,
        "e5_hash_sample": f"""
            SELECT event_id, user_id, event_type
            FROM events
            WHERE {_sql_hash32("CAST(event_id AS VARCHAR)")} % 10000 < 1000
        """,
        "e1_intradoc_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents
            ),
            grams AS (
                SELECT doc_id, i AS pos,
                       array_to_string(list_slice(tk, i, i + 7), ' ')
                           AS gram
                FROM toks, UNNEST(generate_series(
                    1, greatest(len(tk) - 7, 0))) AS g(i)
            ),
            dups AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           row_number() OVER (
                               PARTITION BY doc_id, gram ORDER BY pos
                           ) AS occ
                    FROM grams
                ) WHERE occ > 1
            ),
            toks_pos AS (
                SELECT t.doc_id, p, tk[p] AS tok
                FROM toks t, UNNEST(generate_series(1, len(tk))) AS u(p)
            ),
            kept AS (
                SELECT tp.doc_id, tp.p, tp.tok
                FROM toks_pos tp
                WHERE NOT EXISTS (
                    SELECT 1 FROM dups d
                    WHERE d.doc_id = tp.doc_id
                      AND tp.p >= d.pos AND tp.p < d.pos + 8
                )
            ),
            dropped AS (
                SELECT doc_id, count(*) AS n_all
                FROM toks_pos GROUP BY doc_id
            )
            SELECT k.doc_id,
                   string_agg(k.tok, ' ' ORDER BY k.p) AS text,
                   CAST(count(*) AS INT) AS n_tokens_kept,
                   CAST(any_value(d.n_all) - count(*) AS INT)
                       AS n_tokens_dropped
            FROM kept k JOIN dropped d ON k.doc_id = d.doc_id
            GROUP BY k.doc_id
        """,
        "e3_charlm": """
            WITH lowered AS (
                SELECT doc_id, lower(text) AS t FROM documents
            ),
            occ3 AS (
                SELECT doc_id, substr(t, i, 3) AS gram
                FROM lowered, UNNEST(generate_series(
                    1, greatest(length(t) - 2, 0))) AS g(i)
                WHERE length(substr(t, i, 3)) = 3
            ),
            occ2 AS (
                SELECT substr(t, i, 2) AS gram
                FROM lowered, UNNEST(generate_series(
                    1, greatest(length(t) - 1, 0))) AS g(i)
                WHERE length(substr(t, i, 2)) = 2
            ),
            grams AS (
                SELECT gram, count(*) AS n_gram FROM occ3 GROUP BY gram
            ),
            ctx AS (
                SELECT gram AS context, count(*) AS n_context
                FROM occ2 GROUP BY gram
            ),
            model AS (
                SELECT g.gram, g.n_gram, c.n_context
                FROM grams g JOIN ctx c ON c.context = substr(g.gram, 1, 2)
            ),
            scored AS (
                SELECT o.doc_id,
                       ln((coalesce(m.n_gram, 0) + 0.1)
                          / (coalesce(m.n_context, 0) + 6.4)) AS lp
                FROM occ3 o LEFT JOIN model m ON o.gram = m.gram
            )
            SELECT doc_id, count(*) AS n_grams,
                   round(avg(lp), 6) AS mean_logprob
            FROM scored GROUP BY doc_id
        """,
        # e3_ppl_buckets: the SAME charlm pipeline as a CTE, then exact
        # tercile cuts (quantile_cont == Spark percentile) + threshold
        # CASE bucketing — replicating the no-sort scale shape.
        "e3_ppl_buckets": """
            WITH lowered AS (
                SELECT doc_id, lower(text) AS t FROM documents
            ),
            occ3 AS (
                SELECT doc_id, substr(t, i, 3) AS gram
                FROM lowered, UNNEST(generate_series(
                    1, greatest(length(t) - 2, 0))) AS g(i)
                WHERE length(substr(t, i, 3)) = 3
            ),
            occ2 AS (
                SELECT substr(t, i, 2) AS gram
                FROM lowered, UNNEST(generate_series(
                    1, greatest(length(t) - 1, 0))) AS g(i)
                WHERE length(substr(t, i, 2)) = 2
            ),
            grams AS (
                SELECT gram, count(*) AS n_gram FROM occ3 GROUP BY gram
            ),
            ctx AS (
                SELECT gram AS context, count(*) AS n_context
                FROM occ2 GROUP BY gram
            ),
            model AS (
                SELECT g.gram, g.n_gram, c.n_context
                FROM grams g JOIN ctx c ON c.context = substr(g.gram, 1, 2)
            ),
            scored AS (
                SELECT o.doc_id,
                       ln((coalesce(m.n_gram, 0) + 0.1)
                          / (coalesce(m.n_context, 0) + 6.4)) AS lp
                FROM occ3 o LEFT JOIN model m ON o.gram = m.gram
            ),
            final AS (
                SELECT doc_id, round(avg(lp), 6) AS mean_logprob
                FROM scored GROUP BY doc_id
            ),
            cuts AS (
                SELECT quantile_cont(mean_logprob, 2.0 / 3.0) AS head_cut,
                       quantile_cont(mean_logprob, 1.0 / 3.0) AS mid_cut
                FROM final
            )
            SELECT doc_id, mean_logprob,
                   CASE WHEN mean_logprob >= head_cut THEN 'head'
                        WHEN mean_logprob >= mid_cut THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM final CROSS JOIN cuts
        """,
        # e3_unicode_normalize: identical decomposed input built with
        # chr(); DuckDB's ICU nfc_normalize must agree byte-for-byte
        # with Python's unicodedata on the Spark side.
        "e3_unicode_normalize": """
            WITH synth AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769)
                             WHEN doc_id % 3 = 1 THEN 'a' || chr(768)
                             ELSE 'o' || chr(770) END)
                       || chr(7) || ' ' || substr(text, 1, 40) AS t
                FROM documents
            )
            SELECT doc_id,
                   nfc_normalize(regexp_replace(t,
                       '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
                       AS text_norm,
                   length(t) AS n_chars_before,
                   length(nfc_normalize(regexp_replace(t,
                       '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')))
                       AS n_chars_after
            FROM synth
        """,
        # e3_url_canonicalize: same synthesized URLs; every step of the
        # canonicalizer (fragment, query split, scheme/host lowering,
        # default ports, path slash, tracking-param filter) in SQL.
        # The tracking filter is RENDERED from web.TRACKING_PARAM_PREFIXES
        # (single source of truth — ADVICE r05).
        "e3_url_canonicalize": f"""
            WITH synth AS (
                SELECT doc_id,
                       'HTTPS://WWW.Site' || (doc_id % 7) || '.COM'
                       || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
                       || '/Dir' || (doc_id % 5)
                       || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
                       || '?utm_source=feed&id=' || (doc_id % 100)
                       || '&fbclid=xyz'
                       || (CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END)
                           AS url
                FROM documents
            ),
            parts AS (
                SELECT doc_id, url,
                       split_part(split_part(url, '#', 1), '?', 1) AS base,
                       CASE WHEN contains(split_part(url, '#', 1), '?')
                            THEN split_part(split_part(url, '#', 1), '?', 2)
                            ELSE '' END AS query
                FROM synth
            ),
            hp AS (
                SELECT doc_id, url, query,
                       lower(split_part(base, '://', 1)) AS scheme,
                       substr(base,
                              length(split_part(base, '://', 1)) + 4)
                           AS after
                FROM parts
            ),
            hostpath AS (
                SELECT doc_id, url, query, scheme,
                       lower(split_part(after, '/', 1)) AS hostport,
                       substr(after,
                              length(split_part(after, '/', 1)) + 1)
                           AS rawpath
                FROM hp
            ),
            norm AS (
                SELECT doc_id, url, query, scheme, hostport,
                       CASE WHEN scheme = 'http'
                                 AND hostport LIKE '%:80'
                            THEN substr(hostport, 1,
                                        length(hostport) - 3)
                            WHEN scheme = 'https'
                                 AND hostport LIKE '%:443'
                            THEN substr(hostport, 1,
                                        length(hostport) - 4)
                            ELSE hostport END AS chost,
                       CASE WHEN rawpath = '' THEN '/'
                            ELSE rawpath END AS p1
                FROM hostpath
            ),
            fin AS (
                SELECT doc_id, url, scheme, chost, hostport,
                       CASE WHEN length(p1) > 1 AND p1 LIKE '%/'
                            THEN substr(p1, 1, length(p1) - 1)
                            ELSE p1 END AS path,
                       array_to_string(list_filter(
                           string_split(query, '&'),
                           x -> x <> ''
                                {_sql_tracking_param_filter()}
                       ), '&') AS kept
                FROM norm
            )
            SELECT doc_id, url,
                   scheme || '://' || chost || path
                   || (CASE WHEN kept = '' THEN ''
                            ELSE '?' || kept END) AS canonical,
                   split_part(hostport, ':', 1) AS host
            FROM fin
        """,
        "e5_mixture_sample": f"""
            WITH t(lang, target) AS (
                VALUES ('en', 40), ('de', 25), ('zh', 100000)
            ),
            h AS (
                SELECT doc_id, d.lang, n_chars, target,
                       {_sql_hash32("CAST(doc_id AS VARCHAR)")} AS hv
                FROM documents d JOIN t ON d.lang = t.lang
            ),
            r AS (
                SELECT doc_id, lang, n_chars, target,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY hv ASC, CAST(doc_id AS VARCHAR) ASC
                       ) AS rn
                FROM h
            )
            SELECT doc_id, lang, n_chars FROM r WHERE rn <= target
        """,
        "e5_stratified_sample": f"""
            WITH h AS (
                SELECT doc_id, lang, n_chars,
                       {_sql_hash32("CAST(doc_id AS VARCHAR)")} AS hv
                FROM documents
            ),
            r AS (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY hv ASC, CAST(doc_id AS VARCHAR) ASC
                       ) AS rn,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM h
            )
            SELECT doc_id, lang, n_chars FROM r WHERE rn <= ceil(n * 0.2)
        """,
        "e5_hash_split": f"""
            WITH b AS (
                SELECT n_chars,
                       {_sql_hash32("CAST(doc_id AS VARCHAR)")} % 10000
                           AS bucket
                FROM documents
            )
            SELECT CASE WHEN bucket < 8000 THEN 'train'
                        WHEN bucket < 9000 THEN 'valid'
                        ELSE 'test' END AS split,
                   count(*) AS n_docs,
                   sum(n_chars) AS total_chars
            FROM b GROUP BY 1
        """,
        "pipeline_clean_corpus": f"""
            WITH RECURSIVE pairs AS ({_e1_minhash_near_dup_oracle()}),
            edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION
                SELECT id_b AS a, id_a AS b FROM pairs
            ),
            reach(id, lab) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM edges)
                UNION
                SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id
            ),
            comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
            clusters AS (
                SELECT d.doc_id,
                       coalesce(c.component, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
            ),
            canon AS (
                SELECT cluster_id, min(doc_id) AS doc_id,
                       count(*) AS cluster_size
                FROM clusters GROUP BY cluster_id
            ),
            canonq AS (
                SELECT cn.doc_id, cn.cluster_id, cn.cluster_size,
                       len(string_split(d.text, ' ')) AS n_tokens,
                       length(d.text) AS n_chars,
                       length(regexp_replace(d.text, '[0-9]', '', 'g'))
                           AS n_nondigit,
                       len(list_distinct(string_split(d.text, ' ')))
                           AS n_distinct,
                       len(list_intersect(
                           string_split(lower(d.text), ' '),
                           {_SQL_EN_STOPWORDS})) > 0 AS has_sw
                FROM canon cn JOIN documents d USING (doc_id)
            )
            SELECT doc_id, cluster_id, cluster_size, n_tokens
            FROM canonq
            WHERE n_tokens >= 20 AND n_tokens <= 100000
              AND n_chars / n_tokens >= 3.0 AND n_chars / n_tokens <= 10.0
              AND (n_chars - n_nondigit) / n_chars <= 0.2
              AND n_distinct / n_tokens >= 0.2
              AND has_sw
        """,
        "e3_chunk_documents": """
            SELECT doc_id,
                   CAST(s / 12 AS INT) AS chunk_index,
                   array_to_string(list_slice(toks, s + 1, s + 16), ' ')
                       AS chunk_text,
                   len(string_split(
                       array_to_string(list_slice(toks, s + 1, s + 16), ' '),
                       ' ')) AS n_chunk_tokens
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
                 UNNEST(generate_series(0, greatest(len(toks) - 1, 0), 12))
                     AS g(s)
        """,
        "e1_decontaminate": f"""
            WITH tsh AS ({_sql_shingles_n(8, "documents")}),
            bsh AS (
                SELECT DISTINCT shingle FROM ({_sql_shingles_n(
                    8, "(SELECT * FROM documents WHERE doc_id % 40 = 0)")})
            ),
            hits AS (
                SELECT doc_id, count(*) AS n_overlapping
                FROM tsh JOIN bsh USING (shingle) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_overlapping, 0) AS n_overlapping,
                   coalesce(h.n_overlapping, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # round 5 late: cross-document substring dedup — grams in >1
        # docs cut from every non-keeper; joins on the raw gram string
        # (Spark joins md5(gram), an injective rename of the same key).
        "e1_crossdoc_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents
            ),
            grams AS (
                SELECT doc_id, i AS pos,
                       array_to_string(list_slice(tk, i, i + 7), ' ')
                           AS gram
                FROM toks, UNNEST(generate_series(
                    1, greatest(len(tk) - 7, 0))) AS g(i)
            ),
            stats AS (
                SELECT gram, min(doc_id) AS keeper
                FROM grams GROUP BY gram
                HAVING count(DISTINCT doc_id) > 1
            ),
            dups AS (
                SELECT g.doc_id, g.pos
                FROM grams g JOIN stats s USING (gram)
                WHERE g.doc_id <> s.keeper
            ),
            toks_pos AS (
                SELECT t.doc_id, p, tk[p] AS tok
                FROM toks t, UNNEST(generate_series(1, len(tk))) AS u(p)
            ),
            kept AS (
                SELECT tp.doc_id, tp.p, tp.tok
                FROM toks_pos tp
                WHERE NOT EXISTS (
                    SELECT 1 FROM dups d
                    WHERE d.doc_id = tp.doc_id
                      AND tp.p >= d.pos AND tp.p < d.pos + 8
                )
            ),
            alln AS (
                SELECT doc_id, count(*) AS n_all
                FROM toks_pos GROUP BY doc_id
            )
            SELECT a.doc_id,
                   coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '')
                       AS text,
                   CAST(count(k.tok) AS INT) AS n_tokens_kept,
                   CAST(any_value(a.n_all) - count(k.tok) AS INT)
                       AS n_tokens_dropped
            FROM alln a LEFT JOIN kept k ON k.doc_id = a.doc_id
            GROUP BY a.doc_id
        """,
        # round 5 late: Bloom-bitmap decontamination — a train shingle
        # is flagged iff ALL 3 md5-derived bit positions are lit by the
        # benchmark set; reproduces Spark's bitmap probe exactly,
        # false positives included.
        "e1_bloom_decontaminate": f"""
            WITH tsh AS ({_sql_shingles_n(8, "documents")}),
            bsh AS (
                SELECT DISTINCT shingle FROM ({_sql_shingles_n(
                    8, "(SELECT * FROM documents WHERE doc_id % 40 = 0)")})
            ),
            bits AS (
                SELECT DISTINCT
                    ({_sql_hash32(
                        "shingle || chr(31) || CAST(j AS VARCHAR)")}
                     % 1048576) AS pos
                FROM bsh, UNNEST(generate_series(0, 2)) AS g(j)
            ),
            flagged AS (
                SELECT doc_id FROM tsh
                WHERE ({_sql_hash32("shingle || chr(31) || '0'")}
                       % 1048576) IN (SELECT pos FROM bits)
                  AND ({_sql_hash32("shingle || chr(31) || '1'")}
                       % 1048576) IN (SELECT pos FROM bits)
                  AND ({_sql_hash32("shingle || chr(31) || '2'")}
                       % 1048576) IN (SELECT pos FROM bits)
            ),
            hits AS (
                SELECT doc_id, count(*) AS n_overlapping
                FROM flagged GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_overlapping, 0) AS n_overlapping,
                   coalesce(h.n_overlapping, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # round 5 late: count-min point queries — the 4x1024 counter
        # cells and the per-item MIN are plain deterministic sums, so
        # the ESTIMATES (collisions and all) hash-match across engines.
        "e5_countmin_topk": f"""
            WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents
            ),
            cells AS (
                SELECT j AS row,
                       ({_sql_hash32(
                           "tok || chr(31) || CAST(j AS VARCHAR)")}
                        % 1024) AS pos,
                       count(*) AS cnt
                FROM toks, UNNEST(generate_series(0, 3)) AS g(j)
                GROUP BY 1, 2
            ),
            items AS (
                SELECT DISTINCT tok FROM toks WHERE tok LIKE 'a%'
            ),
            coords AS (
                SELECT tok, j AS row,
                       ({_sql_hash32(
                           "tok || chr(31) || CAST(j AS VARCHAR)")}
                        % 1024) AS pos
                FROM items, UNNEST(generate_series(0, 3)) AS g(j)
            ),
            est AS (
                SELECT c.tok, min(coalesce(s.cnt, 0)) AS cm_count
                FROM coords c LEFT JOIN cells s USING (row, pos)
                GROUP BY c.tok
            )
            SELECT tok, cm_count FROM est
        """,
        # round 6: unigram-LM APPLY — recursive-SQL Viterbi DP over the
        # frozen piece fixture (builder docstring has the mechanics)
        "e3_unigram_apply": _unigram_apply_oracle(),
        "e3_wordpiece_apply": _wordpiece_apply_oracle(),
        # round 6: end-to-end retrieval — composed chunk/hashed-TF/LSH
        # oracle (builder docstring has the mechanics)
        "e2_retrieval_topk": _e2_retrieval_topk_oracle(),
        # round 6: ordered funnel — per-step earliest-qualifying min
        # join chain, strictly-after semantics
        "e6_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS step1_ts FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS step2_ts
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.step1_ts
                GROUP BY e.user_id
            ),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS step3_ts
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts
                GROUP BY e.user_id
            ),
            seen AS (
                SELECT DISTINCT user_id FROM events
                WHERE event_type IN ('view', 'click', 'purchase')
            )
            SELECT seen.user_id,
                   (CASE WHEN step1_ts IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN step2_ts IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN step3_ts IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_steps_completed,
                   (CASE WHEN step1_ts IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN step2_ts IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN step3_ts IS NOT NULL THEN 1 ELSE 0 END)
                       = 3 AS completed,
                   step1_ts, step2_ts, step3_ts
            FROM seen
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
        """,
        # round 6: weekly cohort retention triangle (Monday-start weeks
        # in both engines; floor() spelled out — DuckDB CAST rounds
        # where Spark's truncates)
        "e5_cohort_retention": """
            WITH firsts AS (
                SELECT user_id, min(date_trunc('week', ts)) AS cohort
                FROM events GROUP BY user_id
            ),
            active AS (
                SELECT DISTINCT user_id, date_trunc('week', ts) AS period
                FROM events
            )
            SELECT cohort AS cohort_period,
                   CAST(floor(date_diff('day', cohort, period) / 7)
                        AS BIGINT) AS periods_since,
                   count(DISTINCT user_id) AS n_active
            FROM active JOIN firsts USING (user_id)
            GROUP BY 1, 2
        """,
        # round 6: nDCG@5 over graded label-distance relevance —
        # composed on the cosine oracle; ln-ratio log2 both engines,
        # 6dp rounding (the accepted float-parity pattern)
        "e5_ndcg": f"""
            WITH topk AS ({_e2_cosine_topk_oracle()}),
            qrels AS (
                SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                       greatest(0, 3 - abs(q.label - c.label)) AS rel
                FROM embeddings q JOIN embeddings c
                  ON c.vec_id <> q.vec_id
                WHERE q.vec_id < 5
            ),
            dcg AS (
                SELECT t.query_id,
                       sum(r.rel / (ln(t.rank + 1) / ln(2))) AS dcg
                FROM topk t JOIN qrels r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.doc_id
                WHERE t.rank <= 5
                GROUP BY t.query_id
            ),
            ideal AS (
                SELECT query_id,
                       sum(rel / (ln(rn + 1) / ln(2))) AS idcg
                FROM (
                    SELECT query_id, rel, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY rel DESC, doc_id ASC
                    ) AS rn
                    FROM qrels WHERE rel > 0
                ) WHERE rn <= 5
                GROUP BY query_id
            )
            SELECT q.query_id,
                   CASE WHEN i.idcg IS NULL THEN 0.0
                        ELSE round(COALESCE(d.dcg, 0.0) / i.idcg, 6)
                   END AS ndcg_at_k
            FROM (SELECT query_id FROM topk
                  UNION SELECT query_id FROM qrels) q
            LEFT JOIN ideal i USING (query_id)
            LEFT JOIN dcg d USING (query_id)
        """,
        # round 6: DSIR importance weights — hashed unigram+bigram
        # log-likelihood ratio, target lang='en' vs the raw pool,
        # Laplace α=1 over 64 buckets, 6dp (accepted float pattern)
        "e5_dsir_weights": f"""
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(string_split(text, ' '),
                                   t -> t <> '') AS tk
                FROM documents
            ),
            feats AS (
                SELECT doc_id, lang, unnest(tk) AS feat FROM toks
                UNION ALL
                SELECT doc_id, lang, tk[i - 1] || ' ' || tk[i]
                FROM toks, UNNEST(generate_series(2, len(tk))) AS g(i)
                WHERE len(tk) >= 2
            ),
            counts AS (
                SELECT doc_id, lang,
                       {_sql_hash32('feat')} % 64 AS bucket,
                       count(*) AS n
                FROM feats GROUP BY 1, 2, 3
            ),
            raw_model AS (
                SELECT bucket, sum(n) AS cnt FROM counts GROUP BY 1
            ),
            raw_tot AS (SELECT sum(n) AS tot FROM counts),
            tgt_model AS (
                SELECT bucket, sum(n) AS cnt FROM counts
                WHERE lang = 'en' GROUP BY 1
            ),
            tgt_tot AS (
                SELECT sum(n) AS tot FROM counts WHERE lang = 'en'
            ),
            ratio AS (
                SELECT g.bucket,
                       (ln(COALESCE(tm.cnt, 0) + 1.0)
                          - ln(tt.tot + 64.0))
                     - (ln(COALESCE(rm.cnt, 0) + 1.0)
                          - ln(rt.tot + 64.0)) AS r
                FROM (SELECT unnest(generate_series(0, 63)) AS bucket) g
                LEFT JOIN tgt_model tm USING (bucket)
                LEFT JOIN raw_model rm USING (bucket),
                tgt_tot tt, raw_tot rt
            )
            SELECT c.doc_id,
                   round(sum(c.n * r.r), 6) AS dsir_log_weight
            FROM counts c JOIN ratio r USING (bucket)
            GROUP BY 1
        """,
        # round 6 time-series family: 6 h resample with gapfill (locf +
        # linear interp), finite-window EWMA, trailing z-score anomaly.
        # avg written as sum/count(value) in BOTH engines (count of
        # NON-NULL values — ADVICE r06: count(*) biased the avg low on
        # NULL-valued observations); 6dp floats.
        "t_resample_gapfill": """
            WITH obs AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket_start,
                       count(*) AS n_obs,
                       sum(value) / count(value) AS value_avg
                FROM events GROUP BY 1, 2
            ),
            span AS (
                SELECT event_type, min(bucket_start) AS lo,
                       max(bucket_start) AS hi
                FROM obs GROUP BY 1
            ),
            grid AS (
                SELECT event_type,
                       unnest(generate_series(lo, hi, 21600))
                           AS bucket_start
                FROM span
            ),
            g AS (
                SELECT grid.event_type, grid.bucket_start,
                       obs.n_obs, obs.value_avg
                FROM grid LEFT JOIN obs USING (event_type, bucket_start)
            ),
            f AS (
                SELECT *,
                    last_value(value_avg IGNORE NULLS) OVER w_f AS pv,
                    last_value(CASE WHEN value_avg IS NOT NULL
                               THEN bucket_start END IGNORE NULLS)
                        OVER w_f AS pb,
                    first_value(value_avg IGNORE NULLS) OVER w_b AS nv,
                    first_value(CASE WHEN value_avg IS NOT NULL
                                THEN bucket_start END IGNORE NULLS)
                        OVER w_b AS nb
                FROM g
                WINDOW w_f AS (PARTITION BY event_type
                               ORDER BY bucket_start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW),
                       w_b AS (PARTITION BY event_type
                               ORDER BY bucket_start
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING)
            )
            SELECT event_type, bucket_start,
                   COALESCE(n_obs, 0) AS n_obs,
                   round(value_avg, 6) AS value_avg,
                   round(pv, 6) AS locf,
                   round(CASE
                       WHEN value_avg IS NOT NULL THEN value_avg
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * (bucket_start - pb)
                                / (nb - pb)
                   END, 6) AS interp
            FROM f
        """,
        # round 7: classical additive seasonal decomposition — interp
        # grid (unrounded), 2xMA half-weight trend (period 4, even),
        # integer phase, per-phase means re-centered per key; 6dp only
        # on output
        "t_seasonal": """
            WITH obs AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket_start,
                       CAST(floor((sum(value) / count(value)) * 1e6
                                  + 0.5) AS BIGINT) AS vm
                FROM events GROUP BY 1, 2
            ),
            span AS (
                SELECT event_type, min(bucket_start) AS lo,
                       max(bucket_start) AS hi
                FROM obs GROUP BY 1
            ),
            grid AS (
                SELECT event_type, lo,
                       unnest(generate_series(lo, hi, 21600))
                           AS bucket_start
                FROM span
            ),
            g AS (
                SELECT grid.event_type, grid.lo, grid.bucket_start,
                       obs.vm
                FROM grid LEFT JOIN obs USING (event_type, bucket_start)
            ),
            f AS (
                SELECT *,
                    last_value(vm IGNORE NULLS) OVER w_f AS pv,
                    last_value(CASE WHEN vm IS NOT NULL
                               THEN bucket_start END IGNORE NULLS)
                        OVER w_f AS pb,
                    first_value(vm IGNORE NULLS) OVER w_b AS nv,
                    first_value(CASE WHEN vm IS NOT NULL
                                THEN bucket_start END IGNORE NULLS)
                        OVER w_b AS nb
                FROM g
                WINDOW w_f AS (PARTITION BY event_type
                               ORDER BY bucket_start
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW),
                       w_b AS (PARTITION BY event_type
                               ORDER BY bucket_start
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING)
            ),
            filled AS (
                SELECT event_type, lo, bucket_start,
                       CASE
                           WHEN vm IS NOT NULL THEN vm
                           WHEN pv IS NULL THEN nv
                           WHEN nv IS NULL THEN pv
                           ELSE pv + CAST(floor(
                               ((nv - pv) * (bucket_start - pb))
                               / (nb - pb) + 0.5) AS BIGINT)
                       END AS v
                FROM f
            ),
            tr AS (
                SELECT event_type, bucket_start, v,
                       CAST(((bucket_start - lo) % (21600 * 4)) / 21600
                            AS INT) AS phase,
                       CASE WHEN lag(v, 2) OVER w IS NOT NULL
                             AND lead(v, 2) OVER w IS NOT NULL
                            THEN lag(v, 2) OVER w
                                 + 2 * lag(v, 1) OVER w + 2 * v
                                 + 2 * lead(v, 1) OVER w
                                 + lead(v, 2) OVER w
                       END AS t8
                FROM filled
                WINDOW w AS (PARTITION BY event_type
                             ORDER BY bucket_start)
            ),
            det AS (
                SELECT *, 8 * v - t8 AS d8 FROM tr
            ),
            pa AS (
                SELECT event_type, phase,
                       sum(d8) AS ds, count(d8) AS dc
                FROM det GROUP BY 1, 2
            ),
            rc AS (
                SELECT event_type,
                       (max(CASE WHEN phase = 0
                                 THEN CAST(ds AS DOUBLE) / dc END)
                        + max(CASE WHEN phase = 1
                                   THEN CAST(ds AS DOUBLE) / dc END)
                        + max(CASE WHEN phase = 2
                                   THEN CAST(ds AS DOUBLE) / dc END)
                        + max(CASE WHEN phase = 3
                                   THEN CAST(ds AS DOUBLE) / dc END))
                       / 4 AS pmean
                FROM pa GROUP BY 1
            ),
            seas AS (
                SELECT pa.event_type, pa.phase,
                       CAST(pa.ds AS DOUBLE) / pa.dc - rc.pmean AS s8
                FROM pa JOIN rc USING (event_type)
            )
            SELECT d.event_type, d.bucket_start, d.phase,
                   CAST(d.v AS DOUBLE) / 1e6 AS value,
                   floor(d.t8 / 8e6 * 1e4 + 0.5) / 1e4 AS trend,
                   floor(s.s8 / 8e6 * 1e4 + 0.5) / 1e4 AS seasonal,
                   floor((d.d8 / 8e6 - s.s8 / 8e6) * 1e4 + 0.5) / 1e4
                       AS resid
            FROM det d JOIN seas s
              ON s.event_type = d.event_type AND s.phase = d.phase
        """,
        "t_ewma": """
            WITH obs AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket_start,
                       sum(value) / count(value) AS value_avg
                FROM events GROUP BY 1, 2
            ),
            contrib AS (
                SELECT event_type,
                       bucket_start + i * 21600 AS bucket_start,
                       power(0.5, i) AS w,
                       power(0.5, i) * value_avg AS wx
                FROM obs, UNNEST(generate_series(0, 7)) AS g(i)
                WHERE value_avg IS NOT NULL
            ),
            tot AS (
                SELECT event_type, bucket_start,
                       sum(wx) AS swx, sum(w) AS sw
                FROM contrib GROUP BY 1, 2
            ),
            hi AS (
                SELECT event_type, max(bucket_start) AS hi
                FROM obs WHERE value_avg IS NOT NULL GROUP BY 1
            )
            SELECT t.event_type, t.bucket_start,
                   round(swx / sw, 6) AS ewma
            FROM tot t JOIN hi USING (event_type)
            WHERE t.bucket_start <= hi.hi
        """,
        "t_anomaly": """
            WITH obs AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket_start,
                       sum(value) / count(value) AS value_avg
                FROM events GROUP BY 1, 2
            ),
            scored AS (
                SELECT event_type, bucket_start, value_avg,
                       avg(value_avg) OVER w AS mu,
                       stddev_samp(value_avg) OVER w AS sd,
                       count(value_avg) OVER w AS cnt
                FROM obs
                WINDOW w AS (PARTITION BY event_type
                             ORDER BY bucket_start
                             ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_type, bucket_start,
                   round(value_avg, 6) AS value_avg,
                   round(z, 6) AS zscore,
                   COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
            FROM (
                SELECT *, CASE WHEN cnt >= 2 AND sd > 0
                               THEN (value_avg - mu) / sd END AS z
                FROM scored
            )
        """,
        # e5_bleu: corpus BLEU-4 replicated relationally — tokens via
        # a positions table, n-grams via lead() windows, clipped
        # matches via per-(doc, n, gram) count join + LEAST, then one
        # corpus rollup. Geometric mean pinned to sqrt(sqrt()) and the
        # multiplication order ((p1*p2)*p3)*p4 — identical to the
        # Spark side; the only exp() stays outside the contract.
        "e5_bleu": """
            WITH toks0 AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                           '\\s+'), t -> t <> '') AS tk
                FROM documents
            ),
            toks AS (
                SELECT doc_id, ii.i AS i, tk[ii.i] AS tok
                FROM toks0, UNNEST(generate_series(1, len(tk))) AS ii(i)
            ),
            ptok AS (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY i) AS j, tok
                FROM toks WHERE i % 7 <> 0
            ),
            pl AS (
                SELECT doc_id, tok,
                       lead(tok, 1) OVER w AS t1,
                       lead(tok, 2) OVER w AS t2,
                       lead(tok, 3) OVER w AS t3
                FROM ptok
                WINDOW w AS (PARTITION BY doc_id ORDER BY j)
            ),
            rl AS (
                SELECT doc_id, tok,
                       lead(tok, 1) OVER w AS t1,
                       lead(tok, 2) OVER w AS t2,
                       lead(tok, 3) OVER w AS t3
                FROM toks
                WINDOW w AS (PARTITION BY doc_id ORDER BY i)
            ),
            pgrams AS (
                SELECT doc_id, 1 AS n, tok AS gram FROM pl
                UNION ALL SELECT doc_id, 2, tok || ' ' || t1
                FROM pl WHERE t1 IS NOT NULL
                UNION ALL SELECT doc_id, 3,
                    tok || ' ' || t1 || ' ' || t2
                FROM pl WHERE t2 IS NOT NULL
                UNION ALL SELECT doc_id, 4,
                    tok || ' ' || t1 || ' ' || t2 || ' ' || t3
                FROM pl WHERE t3 IS NOT NULL
            ),
            rgrams AS (
                SELECT doc_id, 1 AS n, tok AS gram FROM rl
                UNION ALL SELECT doc_id, 2, tok || ' ' || t1
                FROM rl WHERE t1 IS NOT NULL
                UNION ALL SELECT doc_id, 3,
                    tok || ' ' || t1 || ' ' || t2
                FROM rl WHERE t2 IS NOT NULL
                UNION ALL SELECT doc_id, 4,
                    tok || ' ' || t1 || ' ' || t2 || ' ' || t3
                FROM rl WHERE t3 IS NOT NULL
            ),
            pc AS (SELECT doc_id, n, gram, COUNT(*) AS cp
                   FROM pgrams GROUP BY 1, 2, 3),
            rc AS (SELECT doc_id, n, gram, COUNT(*) AS cr
                   FROM rgrams GROUP BY 1, 2, 3),
            m AS (
                SELECT pc.n, SUM(LEAST(cp, cr)) AS matches
                FROM pc JOIN rc USING (doc_id, n, gram) GROUP BY pc.n
            ),
            tot AS (SELECT n, COUNT(*) AS total FROM pgrams GROUP BY n),
            spine AS (
                SELECT v.n,
                       CAST(COALESCE(m.matches, 0) AS BIGINT) AS matches,
                       CAST(COALESCE(tot.total, 0) AS BIGINT) AS total
                FROM (VALUES (1), (2), (3), (4)) v(n)
                LEFT JOIN m ON m.n = v.n
                LEFT JOIN tot ON tot.n = v.n
            ),
            lens AS (
                SELECT CAST(SUM(CASE WHEN i % 7 <> 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS pred_len,
                       CAST(COUNT(*) AS BIGINT) AS ref_len
                FROM toks
            ),
            wide AS (
                SELECT lens.pred_len, lens.ref_len,
                       MAX(CASE WHEN n = 1 THEN matches END) AS match_1,
                       MAX(CASE WHEN n = 2 THEN matches END) AS match_2,
                       MAX(CASE WHEN n = 3 THEN matches END) AS match_3,
                       MAX(CASE WHEN n = 4 THEN matches END) AS match_4,
                       MAX(CASE WHEN n = 1 THEN total END) AS total_1,
                       MAX(CASE WHEN n = 2 THEN total END) AS total_2,
                       MAX(CASE WHEN n = 3 THEN total END) AS total_3,
                       MAX(CASE WHEN n = 4 THEN total END) AS total_4
                FROM spine, lens
                GROUP BY lens.pred_len, lens.ref_len
            ),
            withp AS (
                SELECT *,
                       CASE WHEN total_1 = 0 THEN 0.0
                            ELSE match_1 / total_1 END AS p_1,
                       CASE WHEN total_2 = 0 THEN 0.0
                            ELSE match_2 / total_2 END AS p_2,
                       CASE WHEN total_3 = 0 THEN 0.0
                            ELSE match_3 / total_3 END AS p_3,
                       CASE WHEN total_4 = 0 THEN 0.0
                            ELSE match_4 / total_4 END AS p_4
                FROM wide
            )
            SELECT pred_len, ref_len, match_1, match_2, match_3,
                   match_4, total_1, total_2, total_3, total_4,
                   p_1, p_2, p_3, p_4,
                   sqrt(sqrt(((p_1 * p_2) * p_3) * p_4)) AS bleu_no_bp,
                   CASE WHEN pred_len = 0 THEN NULL
                        ELSE LEAST(0.0, 1.0 - ref_len / pred_len) END
                       AS bp_log_ratio
            FROM withp
        """,
        # e2_srp_sketch: the SAME Python-generated ±1 matrix inlines
        # into both engines' expressions (no cross-engine hash
        # convention at all); grid-integer projections, 32-bit word
        # packing, then the standard integer Hamming top-k.
        "e2_srp_sketch": _e2_srp_oracle(),
        # t_holt: the Holt fold replayed as a recursive CTE — same
        # init convention (l=x1, b=x2-x1, 0 for singletons), same
        # literal coefficients, same multiply/add order; IEEE doubles
        # are bit-identical so no rounding convention is needed.
        "t_holt": """
            WITH RECURSIVE obs AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket_start,
                       SUM(CAST(floor(value * 1000000.0 + 0.5)
                           AS BIGINT)) AS s_micro
                FROM events WHERE value IS NOT NULL
                GROUP BY 1, 2
            ),
            ser AS (
                SELECT event_type,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY bucket_start) AS i,
                       s_micro / 1000000.0 AS x,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM obs
            ),
            holt(event_type, i, n, l, b) AS (
                SELECT s1.event_type, CAST(2 AS BIGINT), s1.n,
                       s1.x, COALESCE(s2.x - s1.x, 0.0)
                FROM ser s1
                LEFT JOIN ser s2 ON s2.event_type = s1.event_type
                                AND s2.i = 2
                WHERE s1.i = 1
                UNION ALL
                SELECT h.event_type, h.i + 1, h.n,
                       0.5 * s.x + 0.5 * (h.l + h.b),
                       0.2 * ((0.5 * s.x + 0.5 * (h.l + h.b)) - h.l)
                           + 0.8 * h.b
                FROM holt h
                JOIN ser s ON s.event_type = h.event_type
                          AND s.i = h.i + 1
            )
            SELECT event_type, CAST(n AS INT) AS n_buckets,
                   l AS level, b AS trend,
                   l + 1.0 * b AS forecast_1,
                   l + 2.0 * b AS forecast_2,
                   l + 3.0 * b AS forecast_3
            FROM holt WHERE i = GREATEST(n, 2)
        """,
        # t_cusum: the closed-form CUSUM (running sum minus clamped
        # running min) replayed verbatim — BIGINT micro-units end to
        # end, deviations scaled by the per-key bucket count so the
        # mean needs no division.
        "t_cusum": """
            WITH obs AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                           AS bucket_start,
                       CAST(SUM(CAST(floor(value * 1000000.0 + 0.5)
                           AS BIGINT)) AS BIGINT) AS s_micro,
                       COUNT(*) AS n_obs
                FROM events WHERE value IS NOT NULL
                GROUP BY 1, 2
            ),
            dev AS (
                SELECT event_type, bucket_start, s_micro, n_obs,
                       COUNT(*) OVER wk AS n,
                       SUM(s_micro) OVER wk AS total,
                       s_micro * COUNT(*) OVER wk
                           - SUM(s_micro) OVER wk AS d_pos,
                       SUM(s_micro) OVER wk
                           - s_micro * COUNT(*) OVER wk AS d_neg
                FROM obs
                WINDOW wk AS (PARTITION BY event_type)
            ),
            cum AS (
                SELECT event_type, bucket_start, s_micro, n_obs, n,
                       total,
                       SUM(d_pos) OVER wo AS cum_p,
                       SUM(d_neg) OVER wo AS cum_n
                FROM dev
                WINDOW wo AS (PARTITION BY event_type
                              ORDER BY bucket_start
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
            ),
            cu AS (
                SELECT event_type, bucket_start, s_micro, n_obs, n,
                       total,
                       CAST(cum_p - LEAST(0, MIN(cum_p) OVER wo)
                            AS BIGINT) AS cusum_pos,
                       CAST(cum_n - LEAST(0, MIN(cum_n) OVER wo)
                            AS BIGINT) AS cusum_neg
                FROM cum
                WINDOW wo AS (PARTITION BY event_type
                              ORDER BY bucket_start
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
            )
            SELECT event_type, bucket_start, s_micro, n_obs,
                   cusum_pos, cusum_neg,
                   (cusum_pos * 1000 > 3000 * abs(total)
                    OR cusum_neg * 1000 > 3000 * abs(total))
                       AS is_change
            FROM cu
        """,
        # round 6: k-anonymity / l-diversity over (event_type, day)
        "e5_k_anonymity": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)
                       AS day_start,
                   count(*) AS class_size,
                   count(DISTINCT user_id) AS l_diversity,
                   count(*) < 5 AS at_risk
            FROM events GROUP BY 1, 2
        """,
        # round 6: planted-footer boilerplate strip — sentence doc-freq
        # on the trimmed period split, removal everywhere, ordered
        # reassembly with '. '
        "e1_boilerplate_strip": """
            WITH injected AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN text || '. All rights reserved'
                            ELSE text END AS text
                FROM documents
            ),
            segs AS (
                SELECT doc_id, string_split(text, '.') AS parts
                FROM injected
            ),
            sents AS (
                SELECT doc_id, i AS pos, trim(parts[i]) AS sent
                FROM segs,
                     UNNEST(generate_series(1, len(parts))) AS g(i)
                WHERE trim(parts[i]) <> ''
            ),
            flagged AS (
                SELECT sent FROM sents
                GROUP BY sent HAVING count(DISTINCT doc_id) > 2
            ),
            marked AS (
                SELECT s.doc_id, s.pos, s.sent,
                       f.sent IS NOT NULL AS bad
                FROM sents s LEFT JOIN flagged f USING (sent)
            )
            SELECT doc_id,
                   COALESCE(string_agg(
                       CASE WHEN NOT bad THEN sent END, '. '
                       ORDER BY pos), '') AS text_clean,
                   count(*) FILTER (WHERE bad) AS n_removed
            FROM marked GROUP BY doc_id
        """,
        # round 6: Markov transitions + top journey prefixes per user
        # e6_attribution: the same running-conversion-count windows,
        # segment equi join, and in-group recency cap.
        "e6_attribution": """
            WITH seq AS (
                SELECT user_id AS ent, ts, event_id AS eid,
                       event_type AS etype,
                       sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS seq
                FROM events
            ),
            convs AS (
                SELECT ent AS c_ent, eid AS conversion_id,
                       seq AS c_idx
                FROM seq WHERE etype = 'purchase'
            ),
            touches AS (
                SELECT ent, ts, eid, etype, seq + 1 AS t_idx
                FROM seq WHERE etype <> 'purchase'
            ),
            joined AS (
                SELECT t.ent, t.ts, t.eid, t.etype, c.conversion_id,
                       row_number() OVER (
                           PARTITION BY t.ent, c.conversion_id
                           ORDER BY t.ts DESC, t.eid DESC) AS r
                FROM touches t
                JOIN convs c ON c.c_ent = t.ent AND c.c_idx = t.t_idx
            ),
            kept AS (SELECT * FROM joined WHERE r <= 5),
            sized AS (
                SELECT *, count(*) OVER (
                    PARTITION BY ent, conversion_id) AS k
                FROM kept
            )
            SELECT ent AS user_id, conversion_id, eid AS touch_id,
                   etype AS touch_type,
                   CAST(k - r + 1 AS BIGINT) AS position,
                   CAST(k AS BIGINT) AS n_touches,
                   CAST(CASE WHEN r = k THEN 1 ELSE 0 END AS INT)
                       AS first_credit,
                   CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS INT)
                       AS last_credit,
                   round(1.0 / k, 6) AS linear_credit
            FROM sized
        """,
        # e6_transition_power: the same rounded matrix squared — join
        # on the intermediate state, sum of products, re-round.
        "e6_transition_power": """
            WITH ordered AS (
                SELECT user_id, event_type AS next_state,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_state
                FROM events
            ),
            pairs AS (
                SELECT prev_state, next_state, count(*) AS n
                FROM ordered WHERE prev_state IS NOT NULL
                GROUP BY 1, 2
            ),
            m AS (
                SELECT prev_state AS a, next_state AS b,
                       round(n / (sum(n) OVER (PARTITION BY prev_state)),
                             6) AS p
                FROM pairs
            )
            SELECT x.a AS prev_state, y.b AS next_state,
                   round(sum(x.p * y.p), 6) AS prob
            FROM m x JOIN m y ON y.a = x.b
            GROUP BY x.a, y.b
        """,
        "e6_transition_matrix": """
            WITH ordered AS (
                SELECT user_id, event_type AS next_state,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_state
                FROM events
            ),
            pairs AS (
                SELECT prev_state, next_state, count(*) AS n
                FROM ordered WHERE prev_state IS NOT NULL
                GROUP BY 1, 2
            )
            SELECT prev_state, next_state, n,
                   round(n / (sum(n) OVER (PARTITION BY prev_state)), 6)
                       AS prob
            FROM pairs
        """,
        "e6_top_paths": """
            WITH ordered AS (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS rn
                FROM events
            ),
            paths AS (
                SELECT user_id,
                       string_agg(event_type, '>' ORDER BY rn) AS path
                FROM ordered WHERE rn <= 5 GROUP BY user_id
            )
            SELECT path, count(*) AS n_entities
            FROM paths GROUP BY 1
            ORDER BY n_entities DESC, path ASC LIMIT 20
        """,
        # round 6 late: robust normalization — exact per-type rank +
        # winsorization to interpolated [p05, p95]
        "e5_winsorize": """
            WITH q AS (
                SELECT event_type,
                       quantile_cont(value, 0.05) AS qlo,
                       quantile_cont(value, 0.95) AS qhi
                FROM events GROUP BY 1
            )
            SELECT e.event_id, e.event_type, e.value,
                   round(percent_rank() OVER (
                       PARTITION BY e.event_type ORDER BY e.value ASC
                   ), 6) AS pct_rank,
                   round(least(greatest(e.value, q.qlo), q.qhi), 6)
                       AS winsorized
            FROM events e JOIN q USING (event_type)
        """,
        # round 6 late: MPEG decode upgraded from rows-only to a frozen
        # fixture oracle — output depends only on doc_id % 120 (tone on
        # % 40 × layer on % 3; round 7 adds the Layer III silence path)
        "e4_mpeg_decode": f"""
            WITH fix(m, layer, sample_rate, n_samples, rms) AS (
                VALUES {_MPEG_DECODE_FIXTURE}
            )
            SELECT d.doc_id, f.layer, f.sample_rate, f.n_samples, f.rms
            FROM documents d JOIN fix f ON d.doc_id % 120 = f.m
        """,
        # round 6: blocked Jaro–Winkler entity match — the Python
        # kernel is pinned char-exact to DuckDB's built-in (tests), so
        # the oracle just calls it; same blocking, 6dp, same threshold
        "j_jw_match": """
            WITH cust AS (
                SELECT c_custkey, c_name FROM customer
                WHERE c_custkey <= 300
            ),
            variants AS (
                SELECT DISTINCT
                       substring(c_name, 1, length(c_name) - 2)
                       || reverse(substring(c_name, length(c_name) - 1, 2))
                           AS matched_v_name
                FROM cust WHERE c_custkey % 3 = 0
            )
            SELECT c.c_custkey, c.c_name, v.matched_v_name,
                   round(jaro_winkler_similarity(
                       c.c_name, v.matched_v_name), 6) AS jw_sim
            FROM cust c JOIN variants v
              ON lower(substring(c.c_name, 1, 1))
                 = lower(substring(v.matched_v_name, 1, 1))
            WHERE round(jaro_winkler_similarity(
                      c.c_name, v.matched_v_name), 6) >= 0.97
        """,
        # round 6: common-neighbor link prediction on the same graph —
        # wedge join through shared neighbors, anti join vs edges
        "g_common_neighbors": """
            WITH raw AS (
                SELECT doc_id % 97 AS s,
                       (doc_id * doc_id + 1) % 97 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
                FROM documents
            ),
            e AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM raw WHERE s <> d
            ),
            adj AS (
                SELECT a AS v, b AS n FROM e
                UNION ALL SELECT b, a FROM e
            ),
            deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
            pairs AS (
                SELECT x.v AS x, y.v AS y, count(*) AS n_common
                FROM adj x JOIN adj y ON x.n = y.n AND x.v < y.v
                GROUP BY x.v, y.v
                HAVING count(*) >= 2
            ),
            non_edges AS (
                SELECT p.* FROM pairs p
                LEFT JOIN e ON e.a = p.x AND e.b = p.y
                WHERE e.a IS NULL
            )
            SELECT ne.x AS a, ne.y AS b, n_common,
                   round(n_common / (dx.d + dy.d - n_common), 6)
                       AS jaccard
            FROM non_edges ne
            JOIN deg dx ON dx.v = ne.x
            JOIN deg dy ON dy.v = ne.y
        """,
        # round 6: exact triangle count — canonical a<b<c closed-triple
        # join (equals the degree-oriented Spark algorithm's count)
        # e3_gopher_rep: the same synthesized lines, then dup-line and
        # top/dup n-gram char masses for n=2..10 from one gram table
        # (n driven by a VALUES dim, not 9 copies of the query).
        "e3_gopher_rep": """
            WITH synth AS (
                SELECT doc_id, replace(text, ' table ', chr(10)) AS text
                FROM documents
            ),
            base AS (
                SELECT doc_id, length(text) AS nc,
                       string_split(text, ' ') AS tk,
                       string_split(text, chr(10)) AS ls
                FROM synth
            ),
            ns(n, is_top) AS (
                VALUES (2, true), (3, true), (4, true), (5, false),
                       (6, false), (7, false), (8, false), (9, false),
                       (10, false)
            ),
            grams AS (
                SELECT b.doc_id, ns.n, ns.is_top, b.nc,
                       array_to_string(
                           list_slice(b.tk, i, i + ns.n - 1), ' '
                       ) AS gram
                FROM base b, ns,
                     UNNEST(generate_series(
                         1, greatest(len(b.tk) - ns.n + 1, 0))) AS g(i)
            ),
            gcnt AS (
                SELECT doc_id, n, is_top, gram,
                       max(nc) AS nc, count(*) AS c
                FROM grams GROUP BY doc_id, n, is_top, gram
            ),
            per_n AS (
                SELECT doc_id, n, is_top,
                       max(c * length(gram)) AS top_mass,
                       sum(CASE WHEN c >= 2
                           THEN c * length(gram) END) AS dup_mass,
                       max(nc) AS nc
                FROM gcnt GROUP BY doc_id, n, is_top
            ),
            gd AS (
                SELECT doc_id,
                       round(coalesce(max(CASE WHEN n = 2
                           THEN top_mass / nc END), 0), 6)
                           AS top2gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 3
                           THEN top_mass / nc END), 0), 6)
                           AS top3gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 4
                           THEN top_mass / nc END), 0), 6)
                           AS top4gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 5
                           THEN dup_mass / nc END), 0), 6)
                           AS dup5gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 6
                           THEN dup_mass / nc END), 0), 6)
                           AS dup6gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 7
                           THEN dup_mass / nc END), 0), 6)
                           AS dup7gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 8
                           THEN dup_mass / nc END), 0), 6)
                           AS dup8gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 9
                           THEN dup_mass / nc END), 0), 6)
                           AS dup9gram_char_frac,
                       round(coalesce(max(CASE WHEN n = 10
                           THEN dup_mass / nc END), 0), 6)
                           AS dup10gram_char_frac
                FROM per_n GROUP BY doc_id
            ),
            lcnt AS (
                SELECT doc_id, line, count(*) AS c
                FROM (SELECT doc_id, unnest(ls) AS line FROM base)
                GROUP BY doc_id, line
            ),
            ld AS (
                SELECT doc_id,
                       CAST(sum(c) AS BIGINT) AS n_lines,
                       round((sum(c) - count(*)) / sum(c), 6)
                           AS dup_line_frac,
                       round(coalesce(
                           sum(CASE WHEN c >= 2
                               THEN c * length(line) END)
                           / sum(c * length(line)), 0), 6)
                           AS dup_line_char_frac
                FROM lcnt GROUP BY doc_id
            )
            SELECT ld.doc_id, ld.n_lines, ld.dup_line_frac,
                   ld.dup_line_char_frac,
                   coalesce(gd.top2gram_char_frac, 0)
                       AS top2gram_char_frac,
                   coalesce(gd.top3gram_char_frac, 0)
                       AS top3gram_char_frac,
                   coalesce(gd.top4gram_char_frac, 0)
                       AS top4gram_char_frac,
                   coalesce(gd.dup5gram_char_frac, 0)
                       AS dup5gram_char_frac,
                   coalesce(gd.dup6gram_char_frac, 0)
                       AS dup6gram_char_frac,
                   coalesce(gd.dup7gram_char_frac, 0)
                       AS dup7gram_char_frac,
                   coalesce(gd.dup8gram_char_frac, 0)
                       AS dup8gram_char_frac,
                   coalesce(gd.dup9gram_char_frac, 0)
                       AS dup9gram_char_frac,
                   coalesce(gd.dup10gram_char_frac, 0)
                       AS dup10gram_char_frac
            FROM ld LEFT JOIN gd ON gd.doc_id = ld.doc_id
        """,
        # e1_c4_filter: same synthesized pages; line keeps via the same
        # three rules, ordered reassembly via string_agg ORDER BY line
        # index (string_agg skips the NULLed dropped lines).
        "e1_c4_filter": """
            WITH synth AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN base_text || ' {'
                            ELSE base_text END AS text
                FROM (
                    SELECT doc_id,
                           replace(replace(text, ' table ',
                                           '.' || chr(10)),
                                   ' slow ', ' javascript ')
                           || ' end.' AS base_text
                    FROM documents
                )
            ),
            ln AS (
                SELECT s.doc_id, i, ls[i] AS line
                FROM (SELECT doc_id,
                             string_split(text, chr(10)) AS ls
                      FROM synth) s,
                     UNNEST(generate_series(1, len(ls))) AS g(i)
            ),
            flags AS (
                SELECT doc_id, i, line,
                       (right(line, 1) IN ('.', '!', '?', '"')
                        AND len(list_filter(string_split(line, ' '),
                                            w -> w <> '')) >= 3
                        AND NOT contains(lower(line), 'javascript'))
                           AS ok
                FROM ln
            ),
            agg AS (
                SELECT doc_id,
                       coalesce(string_agg(
                           CASE WHEN ok THEN line END, chr(10)
                           ORDER BY i), '') AS text,
                       CAST(count(*) FILTER (ok) AS INT)
                           AS n_lines_kept,
                       CAST(count(*) - count(*) FILTER (ok) AS INT)
                           AS n_lines_dropped
                FROM flags GROUP BY doc_id
            )
            SELECT a.doc_id, a.text, a.n_lines_kept, a.n_lines_dropped,
                   contains(s.text, '{') AS has_brace,
                   contains(lower(s.text), 'lorem ipsum') AS has_lorem,
                   (NOT contains(s.text, '{')
                    AND NOT contains(lower(s.text), 'lorem ipsum')
                    AND a.n_lines_kept >= 1) AS keep
            FROM agg a JOIN synth s ON s.doc_id = a.doc_id
        """,
        # e3_skipgram: double-lateral generate_series window pairs.
        "e3_skipgram": """
            WITH toks AS (
                SELECT string_split(text, ' ') AS tk FROM documents
            ),
            pairs AS (
                SELECT tk[i] AS center, tk[j] AS context
                FROM toks,
                     UNNEST(generate_series(1, len(tk))) AS gi(i),
                     UNNEST(generate_series(
                         greatest(i - 2, 1),
                         least(i + 2, len(tk)))) AS gj(j)
                WHERE j <> i AND tk[i] <> '' AND tk[j] <> ''
            )
            SELECT center, context, count(*) AS n
            FROM pairs GROUP BY center, context
        """,
        # e6_cooccurrence: same basket -> canonical pair -> dims chain.
        "e6_cooccurrence": """
            WITH base AS (
                SELECT DISTINCT user_id AS ent, event_type AS item
                FROM events
            ),
            tot AS (
                SELECT CAST(count(DISTINCT ent) AS DOUBLE) AS n_baskets
                FROM base
            ),
            item_n AS (
                SELECT item, count(*) AS n_item FROM base GROUP BY item
            ),
            pairs AS (
                SELECT a.item AS item_a, b.item AS item_b,
                       count(*) AS n_ab
                FROM base a JOIN base b
                  ON a.ent = b.ent AND a.item < b.item
                GROUP BY a.item, b.item
                HAVING count(*) >= 2
            )
            SELECT p.item_a, p.item_b, p.n_ab,
                   na.n_item AS n_a, nb.n_item AS n_b,
                   round(p.n_ab / na.n_item, 6) AS confidence_a_to_b,
                   round(p.n_ab * tot.n_baskets
                         / (na.n_item * nb.n_item), 6) AS lift
            FROM pairs p
            JOIN item_n na ON na.item = p.item_a
            JOIN item_n nb ON nb.item = p.item_b
            CROSS JOIN tot
        """,
        # e5_group_ols: identical closed-form arithmetic — exact
        # integer-valued sums, then the same expression tree.
        "e5_group_ols": """
            WITH pts AS (
                SELECT l_returnflag,
                       CAST(datediff('day', DATE '1996-01-01',
                                     l_shipdate) AS DOUBLE) AS x,
                       CAST(l_quantity AS DOUBLE) AS y
                FROM lineitem
            ),
            s AS (
                SELECT l_returnflag,
                       CAST(count(*) AS DOUBLE) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy,
                       sum(x * x) AS sxx,
                       sum(y * y) AS syy
                FROM pts GROUP BY l_returnflag
            )
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n,
                   round((n * sxy - sx * sy)
                         / (n * sxx - sx * sx), 4) AS slope,
                   round((sy - (n * sxy - sx * sy)
                               / (n * sxx - sx * sx) * sx) / n, 4)
                       AS intercept,
                   round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                         / ((n * sxx - sx * sx)
                            * (n * syy - sy * sy)), 4) AS r2
            FROM s
        """,
        # e5_profile: the same melt -> counts -> stats/top split; the
        # output column named "column" needs quoting (reserved word).
        "e5_profile": """
            WITH m AS (
                SELECT 'doc_id' AS "column",
                       CAST(doc_id AS VARCHAR) AS value FROM documents
                UNION ALL SELECT 'lang', lang FROM documents
                UNION ALL SELECT 'source', source FROM documents
                UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
                FROM documents
            ),
            counts AS (
                SELECT "column", value, count(*) AS c
                FROM m GROUP BY "column", value
            ),
            stats AS (
                SELECT "column",
                       CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN value IS NULL THEN c
                                ELSE 0 END) AS BIGINT) AS n_null,
                       CAST(count(CASE WHEN value IS NOT NULL
                                  THEN 1 END) AS BIGINT) AS n_distinct,
                       min(value) AS min_value,
                       max(value) AS max_value
                FROM counts GROUP BY "column"
            ),
            top AS (
                SELECT "column", value AS top_value, c AS top_count,
                       row_number() OVER (
                           PARTITION BY "column"
                           ORDER BY c DESC, value ASC) AS rk
                FROM counts WHERE value IS NOT NULL
            )
            SELECT s."column", s.n, s.n_null, s.n_distinct,
                   s.min_value, s.max_value, t.top_value, t.top_count
            FROM stats s
            JOIN top t ON t."column" = s."column" AND t.rk = 1
        """,
        # e2_mean_pool: per-dim avg + ordered list reassembly.
        "e2_mean_pool": """
            WITH per AS (
                SELECT vec_id // 8 AS grp, g.i,
                       round(avg(CAST(embedding[g.i] AS DOUBLE)), 6)
                           AS m
                FROM embeddings,
                     UNNEST(generate_series(1, len(embedding))) AS g(i)
                GROUP BY grp, g.i
            ),
            vecs AS (
                SELECT grp,
                       string_agg(printf('%.6f', m), ',' ORDER BY i)
                           AS embedding
                FROM per GROUP BY grp
            ),
            nv AS (
                SELECT vec_id // 8 AS grp, count(*) AS n_vecs
                FROM embeddings GROUP BY grp
            )
            SELECT v.grp AS doc, v.embedding, nv.n_vecs
            FROM vecs v JOIN nv ON nv.grp = v.grp
        """,
        # e5_tokenize: the same salted sha256 prefix (both engines emit
        # lowercase hex).
        "e5_tokenize": """
            SELECT c_custkey,
                   CASE WHEN c_name IS NOT NULL THEN
                       substr(sha256('release-2026:' || c_name), 1, 12)
                   END AS c_name,
                   c_nationkey
            FROM customer
        """,
        # e5_calibration: same synthetic predictions; per-bin agg then
        # the weighted |gap| rollup joined back (abs over the ROUNDED
        # per-bin columns — the operator's documented convention).
        "e5_calibration": """
            WITH preds AS (
                SELECT (doc_id * 7919) % 1001 / 1000.0 AS c,
                       CASE WHEN (doc_id * 104729) % 1000
                                 < ((doc_id * 7919) % 1001) * 0.8
                            THEN 1.0 ELSE 0.0 END AS y
                FROM documents
            ),
            per_bin AS (
                SELECT CAST(least(floor(c * 10), 9) AS INT) AS bin,
                       count(*) AS n,
                       round(avg(c), 6) AS avg_confidence,
                       round(avg(y), 6) AS accuracy,
                       round(abs(avg(c) - avg(y)), 6) AS abs_gap
                FROM preds GROUP BY bin
            ),
            tot AS (
                SELECT round(
                    sum(n * abs(avg_confidence - accuracy)) / sum(n), 6
                ) AS ece
                FROM per_bin
            )
            SELECT per_bin.*, tot.ece FROM per_bin CROSS JOIN tot
        """,
        # e5_kfold: the md5 bucket chain (hash32 % 10000 % 5) replayed.
        "e5_kfold": f"""
            SELECT doc_id,
                   CAST({_sql_hash32(
                       "CAST(doc_id AS VARCHAR) || 'kfold'")}
                        % 10000 % 5 AS INT) AS fold
            FROM documents
        """,
        # e5_span_corrupt: hash-seeded starts/lengths (md5 kernel),
        # gaps-and-islands merge via the same two windows, sentinel
        # reassembly via ordered string_agg.
        "e5_span_corrupt": f"""
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents
            ),
            tp AS (
                SELECT doc_id, len(tk) AS n, p, tk[p] AS tok
                FROM toks,
                     UNNEST(generate_series(1, len(tk))) AS g(p)
            ),
            starts AS (
                SELECT doc_id, p AS s,
                       least(p + {_sql_hash32(
                           "CAST(doc_id AS VARCHAR) || '#' "
                           "|| CAST(p AS VARCHAR)")} % 3, n) AS e
                FROM tp
                WHERE {_sql_hash32(
                    "CAST(doc_id AS VARCHAR) || ':' "
                    "|| CAST(p AS VARCHAR)")} % 7 = 0
            ),
            flagged AS (
                SELECT doc_id, s, e,
                       CASE WHEN s > coalesce(max(e) OVER (
                           PARTITION BY doc_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0)
                       THEN 1 ELSE 0 END AS new_f
                FROM starts
            ),
            isl0 AS (
                SELECT doc_id, s, e,
                       sum(new_f) OVER (
                           PARTITION BY doc_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS island
                FROM flagged
            ),
            islands AS (
                SELECT doc_id, island, min(s) AS s, max(e) AS e
                FROM isl0 GROUP BY doc_id, island
            ),
            cov AS (
                SELECT tp.doc_id, tp.p, tp.tok, i.s, i.e, i.island
                FROM tp LEFT JOIN islands i
                  ON i.doc_id = tp.doc_id
                 AND tp.p >= i.s AND tp.p <= i.e
            ),
            inp AS (
                SELECT doc_id, string_agg(
                    CASE WHEN s IS NULL THEN tok
                         WHEN p = s THEN '<extra_id_'
                             || CAST(island - 1 AS VARCHAR) || '>'
                    END, ' ' ORDER BY p) AS inputs
                FROM cov GROUP BY doc_id
            ),
            spans AS (
                SELECT doc_id, island,
                       '<extra_id_' || CAST(island - 1 AS VARCHAR)
                       || '> ' || string_agg(tok, ' ' ORDER BY p) AS t,
                       count(*) AS sl
                FROM cov WHERE s IS NOT NULL
                GROUP BY doc_id, island
            ),
            tg AS (
                SELECT doc_id,
                       string_agg(t, ' ' ORDER BY island) AS targets,
                       CAST(count(*) AS INT) AS n_spans,
                       CAST(sum(sl) AS INT) AS n_noise_tokens
                FROM spans GROUP BY doc_id
            )
            SELECT i.doc_id, i.inputs,
                   coalesce(tg.targets, '') AS targets,
                   coalesce(tg.n_spans, 0) AS n_spans,
                   coalesce(tg.n_noise_tokens, 0) AS n_noise_tokens
            FROM inp i LEFT JOIN tg ON tg.doc_id = i.doc_id
        """,
        # pipeline_curate_corpus: the full curation chain replayed —
        # synth pages, C4 line keeps, sequential PII scrub, Gopher
        # rules, exact dedup by scrubbed text, one verdict row per doc.
        "pipeline_curate_corpus": f"""
            WITH synth AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN base_text || ' {{' ELSE base_text
                       END AS text
                FROM (
                    SELECT doc_id,
                           replace(replace(
                               text
                               || CASE WHEN doc_id % 3 = 0
                                  THEN ' u' || CAST(doc_id AS VARCHAR)
                                       || '@ex.io' ELSE '' END
                               || CASE WHEN doc_id % 4 = 1
                                  THEN ' at 10.'
                                       || CAST(doc_id % 256 AS VARCHAR)
                                       || '.3.7' ELSE '' END
                               || CASE WHEN doc_id % 5 = 2
                                  THEN ' ssn 123-45-'
                                       || lpad(CAST(doc_id % 10000
                                               AS VARCHAR), 4, '0')
                                  ELSE '' END
                               || CASE WHEN doc_id % 7 = 3
                                  THEN ' call +1 555 123 4567'
                                  ELSE '' END,
                               ' table ', '.' || chr(10)),
                               ' slow ', ' javascript ')
                           || ' end.' AS base_text
                    FROM documents
                )
            ),
            ln AS (
                SELECT s.doc_id, i, ls[i] AS line
                FROM (SELECT doc_id,
                             string_split(text, chr(10)) AS ls
                      FROM synth) s,
                     UNNEST(generate_series(1, len(ls))) AS g(i)
            ),
            lflags AS (
                SELECT doc_id, i, line,
                       (right(line, 1) IN ('.', '!', '?', '"')
                        AND len(list_filter(string_split(line, ' '),
                                            w -> w <> '')) >= 3
                        AND NOT contains(lower(line), 'javascript'))
                           AS ok
                FROM ln
            ),
            c4 AS (
                SELECT f.doc_id,
                       coalesce(string_agg(
                           CASE WHEN f.ok THEN f.line END, chr(10)
                           ORDER BY f.i), '') AS text,
                       (NOT contains(any_value(s.text), '{{')
                        AND NOT contains(lower(any_value(s.text)),
                                         'lorem ipsum')
                        AND count(*) FILTER (f.ok) >= 1) AS keep_c4
                FROM lflags f JOIN synth s ON s.doc_id = f.doc_id
                GROUP BY f.doc_id
            ),
            p1 AS (
                SELECT doc_id, keep_c4,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'
                       )) AS ne,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                           '[EMAIL]', 'g') AS text
                FROM c4
            ),
            p2 AS (
                SELECT doc_id, keep_c4, ne,
                       len(regexp_extract_all(text,
                           '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'
                       )) AS ni,
                       regexp_replace(text,
                           '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                           '[IP]', 'g') AS text
                FROM p1
            ),
            p3 AS (
                SELECT doc_id, keep_c4, ne, ni,
                       len(regexp_extract_all(text,
                           '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS ns,
                       regexp_replace(text,
                           '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b',
                           '[SSN]', 'g') AS text
                FROM p2
            ),
            scr AS (
                SELECT doc_id, keep_c4,
                       (ne + ni + ns + len(regexp_extract_all(text,
                           '\\+?\\d[\\d() -]{{7,}}\\d'))) > 0 AS has_pii,
                       regexp_replace(text,
                           '\\+?\\d[\\d() -]{{7,}}\\d',
                           '[PHONE]', 'g') AS text
                FROM p3
            ),
            qual AS (
                SELECT doc_id,
                       (len(string_split(text, ' ')) >= 20
                        AND len(string_split(text, ' ')) <= 100000
                        AND length(text)
                            / len(string_split(text, ' ')) >= 3.0
                        AND length(text)
                            / len(string_split(text, ' ')) <= 10.0
                        AND (length(text) - length(regexp_replace(
                             text, '[0-9]', '', 'g'))) / length(text)
                            <= 0.2
                        AND len(list_distinct(string_split(text, ' ')))
                            / len(string_split(text, ' ')) >= 0.2
                        AND len(list_intersect(
                            string_split(lower(text), ' '),
                            {_SQL_EN_STOPWORDS})) > 0)
                       IS TRUE AS keep_quality
                FROM scr
            ),
            keeper AS (
                SELECT text, min(doc_id) AS kid
                FROM scr WHERE keep_c4 GROUP BY text
            )
            SELECT s.doc_id, s.keep_c4, s.has_pii, q.keep_quality,
                   coalesce(s.keep_c4 AND s.doc_id <> k.kid, false)
                       AS is_exact_dup,
                   (s.keep_c4 AND q.keep_quality
                    AND NOT coalesce(s.keep_c4 AND s.doc_id <> k.kid,
                                     false)) AS keep,
                   length(s.text) AS n_chars_final
            FROM scr s
            JOIN qual q ON q.doc_id = s.doc_id
            LEFT JOIN keeper k ON k.text = s.text
        """,
        # e1_pii_scrub: the same four patterns in RE2, applied in the
        # same order, counts on each intermediate text, global-flag
        # regexp_replace.
        "e1_pii_scrub": """
            WITH synth AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 3 = 0
                          THEN ' u' || CAST(doc_id AS VARCHAR) || '@ex.io'
                          ELSE '' END
                       || CASE WHEN doc_id % 4 = 1
                          THEN ' at 10.' || CAST(doc_id % 256 AS VARCHAR)
                               || '.3.7'
                          ELSE '' END
                       || CASE WHEN doc_id % 5 = 2
                          THEN ' ssn 123-45-'
                               || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                       4, '0')
                          ELSE '' END
                       || CASE WHEN doc_id % 7 = 3
                          THEN ' call +1 555 123 4567'
                          ELSE '' END AS text
                FROM documents
            ),
            s1 AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
                       )) AS INT) AS n_email,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS text
                FROM synth
            ),
            s2 AS (
                SELECT doc_id, n_email,
                       CAST(len(regexp_extract_all(text,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'
                       )) AS INT) AS n_ipv4,
                       regexp_replace(text,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                           '[IP]', 'g') AS text
                FROM s1
            ),
            s3 AS (
                SELECT doc_id, n_email, n_ipv4,
                       CAST(len(regexp_extract_all(text,
                           '\\b\\d{3}-\\d{2}-\\d{4}\\b'
                       )) AS INT) AS n_ssn,
                       regexp_replace(text,
                           '\\b\\d{3}-\\d{2}-\\d{4}\\b',
                           '[SSN]', 'g') AS text
                FROM s2
            ),
            s4 AS (
                SELECT doc_id, n_email, n_ipv4, n_ssn,
                       CAST(len(regexp_extract_all(text,
                           '\\+?\\d[\\d() -]{7,}\\d'
                       )) AS INT) AS n_phone,
                       regexp_replace(text,
                           '\\+?\\d[\\d() -]{7,}\\d',
                           '[PHONE]', 'g') AS text
                FROM s3
            )
            SELECT doc_id, text, n_email, n_ipv4, n_ssn, n_phone,
                   (n_email + n_ipv4 + n_ssn + n_phone) > 0 AS has_pii
            FROM s4
        """,
        # er_resolve: the whole ER pipeline replayed — DuckDB's builtin
        # JW for blocked pairs, recursive-CTE reachability for the CC
        # labels, canonical name via self-join on the min member id.
        "er_resolve": """
            WITH RECURSIVE recs AS (
                SELECT p_partkey AS id, p_name AS name
                FROM part WHERE p_partkey <= 400
                UNION ALL
                SELECT p_partkey + 100000,
                       substr(p_name, 1, length(p_name) - 2)
                       || reverse(substr(p_name, length(p_name) - 1, 2))
                FROM part
                WHERE p_partkey <= 400 AND p_partkey % 3 = 0
            ),
            pairs AS (
                SELECT r1.id AS a, r2.id AS b
                FROM recs r1 JOIN recs r2
                  ON lower(substr(r1.name, 1, 1))
                     = lower(substr(r2.name, 1, 1))
                 AND r1.id < r2.id
                WHERE round(jaro_winkler_similarity(r1.name, r2.name),
                            6) >= 0.97
            ),
            sym AS (
                SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ),
            reach(id, r) AS (
                SELECT id, id FROM recs
                UNION
                SELECT w.id, s.b FROM reach w JOIN sym s ON s.a = w.r
            ),
            cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
            SELECT rec.id, rec.name, cl.cluster,
                   canon.name AS canonical_name
            FROM recs rec
            JOIN cl ON cl.id = rec.id
            JOIN recs canon ON canon.id = cl.cluster
        """,
        # g_random_walks: the same two hash-seeded steps as chained
        # CTEs over sorted list-adjacency.
        "g_random_walks": f"""
            WITH raw AS (
                SELECT doc_id % 97 AS s,
                       (doc_id * doc_id + 1) % 97 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
                FROM documents
            ),
            sym AS (
                SELECT s AS a, d AS b FROM raw WHERE s <> d
                UNION
                SELECT d, s FROM raw WHERE s <> d
            ),
            adj AS (
                SELECT a AS node, list(b ORDER BY b) AS nbrs
                FROM sym GROUP BY a
            ),
            w0 AS (
                SELECT adj.node AS start, w.walk_id,
                       adj.node AS cur,
                       CAST(adj.node AS VARCHAR) AS path
                FROM adj, (VALUES (0), (1)) w(walk_id)
            ),
            w1 AS (
                SELECT w0.start, w0.walk_id,
                       a.nbrs[CAST({_sql_hash32(
                           "CAST(w0.start AS VARCHAR) || '|' || "
                           "CAST(w0.walk_id AS VARCHAR) || '|1|' || "
                           "CAST(w0.cur AS VARCHAR)")}
                           % len(a.nbrs) + 1 AS INT)] AS cur,
                       w0.path
                FROM w0 JOIN adj a ON a.node = w0.cur
            ),
            w1p AS (
                SELECT start, walk_id, cur,
                       path || ' ' || CAST(cur AS VARCHAR) AS path
                FROM w1
            ),
            w2 AS (
                SELECT w1p.start, w1p.walk_id,
                       a.nbrs[CAST({_sql_hash32(
                           "CAST(w1p.start AS VARCHAR) || '|' || "
                           "CAST(w1p.walk_id AS VARCHAR) || '|2|' || "
                           "CAST(w1p.cur AS VARCHAR)")}
                           % len(a.nbrs) + 1 AS INT)] AS cur,
                       w1p.path
                FROM w1p JOIN adj a ON a.node = w1p.cur
            )
            SELECT start, walk_id,
                   path || ' ' || CAST(cur AS VARCHAR) AS path
            FROM w2
        """,
        # g_bfs_distances: textbook recursive-CTE BFS — enumerate
        # (node, dist) pairs from the seeds, bounded at 3 hops, MIN per
        # node at the end.
        "g_bfs_distances": """
            WITH RECURSIVE raw AS (
                SELECT doc_id % 97 AS s,
                       (doc_id * doc_id + 1) % 97 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
                FROM documents
            ),
            sym AS (
                SELECT s AS a, d AS b FROM raw WHERE s <> d
                UNION
                SELECT d, s FROM raw WHERE s <> d
            ),
            walk(node, dist) AS (
                SELECT CAST(v.node AS BIGINT), v.dist
                FROM (VALUES (0, 0), (1, 0), (2, 0)) v(node, dist)
                UNION
                SELECT s.b, w.dist + 1
                FROM walk w JOIN sym s ON s.a = w.node
                WHERE w.dist < 3
            )
            SELECT node, CAST(min(dist) AS INTEGER) AS dist
            FROM walk GROUP BY node
        """,
        # g_label_prop: the same three synchronous LPA rounds as
        # chained CTEs — per round a neighbor-label count, a max-count
        # window, and a min-label tiebreak.
        "g_label_prop": """
            WITH raw AS (
                SELECT doc_id % 97 AS s,
                       (doc_id * doc_id + 1) % 97 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
                FROM documents
            ),
            sym AS (
                SELECT s AS a, d AS b FROM raw WHERE s <> d
                UNION
                SELECT d, s FROM raw WHERE s <> d
            ),
            l0 AS (
                SELECT DISTINCT a AS node, a AS label FROM sym
            ),
            v1 AS (
                SELECT s.a AS node, l.label, count(*) AS c
                FROM sym s JOIN l0 l ON l.node = s.b
                GROUP BY s.a, l.label
            ),
            t1 AS (
                SELECT node, min(label) AS label FROM (
                    SELECT node, label, c,
                           max(c) OVER (PARTITION BY node) AS mx
                    FROM v1
                ) WHERE c = mx GROUP BY node
            ),
            l1 AS (
                SELECT l0.node, coalesce(t1.label, l0.label) AS label
                FROM l0 LEFT JOIN t1 ON t1.node = l0.node
            ),
            v2 AS (
                SELECT s.a AS node, l.label, count(*) AS c
                FROM sym s JOIN l1 l ON l.node = s.b
                GROUP BY s.a, l.label
            ),
            t2 AS (
                SELECT node, min(label) AS label FROM (
                    SELECT node, label, c,
                           max(c) OVER (PARTITION BY node) AS mx
                    FROM v2
                ) WHERE c = mx GROUP BY node
            ),
            l2 AS (
                SELECT l1.node, coalesce(t2.label, l1.label) AS label
                FROM l1 LEFT JOIN t2 ON t2.node = l1.node
            ),
            v3 AS (
                SELECT s.a AS node, l.label, count(*) AS c
                FROM sym s JOIN l2 l ON l.node = s.b
                GROUP BY s.a, l.label
            ),
            t3 AS (
                SELECT node, min(label) AS label FROM (
                    SELECT node, label, c,
                           max(c) OVER (PARTITION BY node) AS mx
                    FROM v3
                ) WHERE c = mx GROUP BY node
            )
            SELECT l2.node, coalesce(t3.label, l2.label) AS label
            FROM l2 LEFT JOIN t3 ON t3.node = l2.node
        """,
        "g_triangle_count": """
            WITH raw AS (
                SELECT doc_id % 97 AS s,
                       (doc_id * doc_id + 1) % 97 AS d
                FROM documents
                UNION ALL
                SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
                FROM documents
            ),
            e AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM raw WHERE s <> d
            ),
            tri AS (
                SELECT count(*) AS n_triangles
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            )
            SELECT n_triangles,
                   (SELECT count(*) FROM e) AS n_edges,
                   (SELECT count(*) FROM (
                        SELECT DISTINCT v FROM (
                            SELECT a AS v FROM e
                            UNION ALL SELECT b FROM e
                        )
                    )) AS n_vertices
            FROM tri
        """,
        # round 6: temperature-weighted mixing — targets recomputed in
        # SQL via exact integer arithmetic (isqrt weights, int division)
        # then the e5_mixture_sample draw pattern
        "e5_temperature_mix": f"""
            WITH c AS (
                SELECT source, count(*) AS n FROM documents
                GROUP BY source
            ),
            w AS (
                SELECT source, n,
                       CAST(floor(sqrt(n)) AS BIGINT) AS wt
                FROM c
            ),
            t AS (
                SELECT source, n,
                       least(n, wt * 200 // (SELECT sum(wt) FROM w))
                           AS target
                FROM w
            ),
            h AS (
                SELECT doc_id, d.source, target,
                       {_sql_hash32("CAST(doc_id AS VARCHAR)")} AS hv
                FROM documents d JOIN t ON d.source = t.source
            ),
            r AS (
                SELECT doc_id, source, target,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY hv ASC, CAST(doc_id AS VARCHAR) ASC
                       ) AS rn
                FROM h
            )
            SELECT doc_id, source FROM r WHERE rn <= target
        """,
        # round 6: simhash banded pairs + exact Hamming verify —
        # composed on the simhash oracle; DuckDB xor/bit_count
        "e1_simhash_pairs": f"""
            WITH sigs AS ({_e1_simhash_oracle()}),
            banded AS (
                SELECT doc_id, b.band,
                       (simhash >> (b.band * 8)) & 255 AS chunk
                FROM sigs, UNNEST(generate_series(0, 3)) AS b(band)
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM banded x JOIN banded y
                  ON x.band = y.band AND x.chunk = y.chunk
                WHERE x.doc_id < y.doc_id
            )
            SELECT id_a, id_b,
                   CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT)
                       AS hamming
            FROM cand
            JOIN sigs sa ON sa.doc_id = id_a
            JOIN sigs sb ON sb.doc_id = id_b
            WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        """,
        # round 6: banded-MinHash candidate recall vs exact Jaccard
        # truth — composed from the two already-proven oracles
        "e1_near_dup_recall": f"""
            WITH truth AS (
                SELECT id_a, id_b FROM ({_e1_ngram_jaccard_oracle()})
            ),
            cand AS ({_e1_minhash_near_dup_oracle()}),
            hit AS (
                SELECT count(*) AS n_hit
                FROM truth JOIN cand USING (id_a, id_b)
            )
            SELECT (SELECT count(*) FROM truth) AS n_true,
                   (SELECT count(*) FROM cand) AS n_candidates,
                   n_hit,
                   round(CASE WHEN (SELECT count(*) FROM truth) > 0
                         THEN n_hit / (SELECT count(*) FROM truth)
                         ELSE 1.0 END, 6) AS recall,
                   round(CASE WHEN (SELECT count(*) FROM cand) > 0
                         THEN n_hit / (SELECT count(*) FROM cand)
                         ELSE 1.0 END, 6) AS precision
            FROM hit
        """,
        # round 6: CDC changelog compaction — latest-wins per user
        # across snapshot (even event_ids, pre-compacted) + changelog
        # (odd event_ids; 'error' deletes), ties broken
        # changes-over-snapshot then event_id
        "e5_cdc_apply": """
            WITH ev AS (
                SELECT user_id, ts, event_id, event_type, value
                FROM events
            ),
            snapshot AS (
                SELECT user_id, ts, event_id, event_type, value
                FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC
                    ) AS rn
                    FROM ev WHERE event_id % 2 = 0
                ) WHERE rn = 1
            ),
            unioned AS (
                SELECT user_id, ts, event_id, event_type, value,
                       'U' AS op, 0 AS src
                FROM snapshot
                UNION ALL
                SELECT user_id, ts, event_id, event_type, value,
                       CASE WHEN event_type = 'error' THEN 'D'
                            ELSE 'U' END AS op,
                       1 AS src
                FROM ev WHERE event_id % 2 = 1
            )
            SELECT user_id, ts, event_id, event_type, value
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY ts DESC, src DESC, event_id DESC
                ) AS rn
                FROM unioned
            ) WHERE rn = 1 AND op <> 'D'
        """,
        # round 6: recall@5 + reciprocal rank of exact cosine top-5
        # against label-match qrels — composed on the cosine oracle
        "e5_retrieval_metrics": f"""
            WITH topk AS ({_e2_cosine_topk_oracle()}),
            qrels AS (
                SELECT q.vec_id AS query_id, c.vec_id AS doc_id
                FROM embeddings q JOIN embeddings c ON q.label = c.label
                WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
            ),
            hits AS (
                SELECT t.query_id,
                       count(*) AS n_retrieved_relevant,
                       min(t.rank) AS first_rank
                FROM topk t JOIN qrels r
                  ON t.query_id = r.query_id AND t.neighbor_id = r.doc_id
                WHERE t.rank <= 5
                GROUP BY t.query_id
            ),
            totals AS (
                SELECT query_id, count(*) AS n_relevant
                FROM qrels GROUP BY query_id
            )
            SELECT t.query_id, t.n_relevant,
                   COALESCE(h.n_retrieved_relevant, 0)
                       AS n_retrieved_relevant,
                   round(COALESCE(h.n_retrieved_relevant, 0)
                         / t.n_relevant, 6) AS recall_at_k,
                   round(COALESCE(h.n_retrieved_relevant, 0)
                         / least(t.n_relevant, 5), 6)
                       AS capped_recall_at_k,
                   COALESCE(round(1.0 / h.first_rank, 6), 0.0)
                       AS reciprocal_rank
            FROM totals t LEFT JOIN hits h USING (query_id)
        """,
        # round 5 late: global training-order shuffle — hash-range
        # shard + per-shard row_number replicate Spark's sort-free
        # permutation exactly (md5 kernel, ties broken by key)
        "e3_shuffle_shards": f"""
            WITH h AS (
                SELECT doc_id,
                       ({_sql_hash32(
                           "CAST(doc_id AS VARCHAR) || 'epoch0'")}) AS h
                FROM documents
            )
            SELECT doc_id,
                   CAST(floor(h * 8 / 4294967296) AS INT) AS shard,
                   CAST(row_number() OVER (
                       PARTITION BY CAST(floor(h * 8 / 4294967296) AS INT)
                       ORDER BY h, doc_id
                   ) - 1 AS INT) AS pos_in_shard
            FROM h
        """,
        # fractional-epoch upsample: same integer thresholds
        # (floor(w) full copies; frac(w)*10000 bucket threshold on the
        # md5 key hash) and generate_series replication
        "e5_weighted_upsample": f"""
            WITH b AS (
                SELECT doc_id, lang,
                       ({_sql_hash32("CAST(doc_id AS VARCHAR)")}) % 10000
                           AS bucket
                FROM documents
            ),
            c AS (
                SELECT doc_id, lang,
                       CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 0
                                 WHEN 'zh' THEN 0 ELSE 1 END
                       + CASE WHEN bucket < CASE lang
                               WHEN 'en' THEN 3000 WHEN 'de' THEN 5000
                               WHEN 'zh' THEN 0 ELSE 0 END
                         THEN 1 ELSE 0 END AS nc
                FROM b
            )
            SELECT doc_id, lang, CAST(g.i AS INT) AS "copy"
            FROM c, UNNEST(generate_series(0, nc - 1)) AS g(i)
            WHERE nc > 0
        """,
        # pow-2 length bucketing: integer log2 as base-2 digit count
        # (bin() has no leading zeros, mirroring Spark's conv)
        "e3_length_buckets": """
            SELECT doc_id,
                   CAST(n_tokens AS INT) AS n_tokens,
                   CAST(bucket AS INT) AS bucket,
                   CAST(CASE WHEN bucket < 0 THEN 0
                        ELSE (CAST(1 AS BIGINT) << bucket) END
                        AS BIGINT) AS bucket_lo,
                   CAST(CASE WHEN bucket < 0 THEN 0
                        ELSE (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END
                        AS BIGINT) AS bucket_hi
            FROM (
                SELECT doc_id, n_tokens,
                       CASE WHEN n_tokens <= 0 THEN -1
                            ELSE length(bin(n_tokens)) - 1 END AS bucket
                FROM (
                    SELECT doc_id,
                           len(string_split(text, ' ')) AS n_tokens
                    FROM documents
                )
            )
        """,
        # int8 quantization: exact float32->double casts, floor-half-up
        # codes, scale pinned as floor(1e9*scale) so no float is hashed
        "e2_int8_quantize": """
            WITH x AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      v -> CAST(v AS DOUBLE)) AS emb
                FROM embeddings
            ),
            s AS (
                SELECT vec_id, emb,
                       CASE WHEN mx > 0 THEN mx ELSE 1.0 END AS scale
                FROM (
                    SELECT vec_id, emb,
                           list_max(list_transform(emb, v -> abs(v)))
                               / 127.0 AS mx
                    FROM x
                )
            )
            SELECT vec_id,
                   CAST(floor(scale * 1e9) AS BIGINT) AS scale_e9,
                   CAST(g.i - 1 AS BIGINT) AS pos,
                   CAST(floor(emb[g.i] / scale + 0.5) AS INT)
                       AS code
            FROM s, UNNEST(generate_series(1, len(emb))) AS g(i)
        """,
        # per-language trigram heavy hitters: non-distinct sliding
        # trigrams (docs shorter than 3 tokens contribute none), exact
        # counts, ties pinned by gram text
        "e3_ngram_topk": """
            WITH grams AS (
                SELECT lang,
                       array_to_string(list_slice(toks, i, i + 2), ' ')
                           AS gram
                FROM (SELECT lang, string_split(text, ' ') AS toks
                      FROM documents),
                     UNNEST(generate_series(1, len(toks) - 2)) AS g(i)
                WHERE len(toks) >= 3
            ),
            counts AS (
                SELECT lang, gram, count(*) AS n_occurrences
                FROM grams GROUP BY lang, gram
            )
            SELECT lang, gram, CAST(n_occurrences AS BIGINT)
                       AS n_occurrences,
                   CAST(rank AS BIGINT) AS rank
            FROM (
                SELECT lang, gram, n_occurrences,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY n_occurrences DESC, gram ASC
                       ) AS rank
                FROM counts
            )
            WHERE rank <= 10
        """,
        # e4_container_probe: the Spark side synthesizes MP3/MP4
        # payloads per doc and re-parses them with the in-repo framing /
        # box walkers; the oracle replicates the derivation arithmetic
        # only — a hash match therefore proves both containers
        # round-trip bit-exactly. mp3 duration = round(n·1152/44100·1e3)
        # = round(n·11520/441) ms, never a .5 case (108n ≡ 441 mod 882
        # has no solution), so DuckDB half-away == Python half-even.
        "e4_container_probe": """
            SELECT doc_id,
                   CAST(1 + doc_id % 20 AS BIGINT) AS mp3_frames,
                   CAST(round((1 + doc_id % 20) * 11520.0 / 441, 0)
                        AS BIGINT) AS mp3_duration_ms,
                   (doc_id % 3 = 0 AND doc_id % 20 <> 0) AS mp3_vbr,
                   CAST(10 + doc_id % 64 AS BIGINT) AS mp3_tag_bytes,
                   CAST(100 * (1 + doc_id % 50) AS BIGINT)
                       AS mp4_duration_ms,
                   CAST(16 * (1 + doc_id % 8) AS BIGINT) AS mp4_width,
                   CAST(16 * (1 + doc_id % 5) AS BIGINT) AS mp4_height,
                   CAST(1 + doc_id % 30 AS BIGINT) AS mp4_samples,
                   'avc1' AS mp4_codec
            FROM documents
        """,
        # e5_datacard: ROLLUP grouping sets + exact interpolated
        # percentiles (quantile_cont == Spark percentile) + sha256
        # distincts — the whole report is one grouped aggregation.
        "e5_datacard": """
            SELECT source, lang,
                   count(*) AS n_docs,
                   count(DISTINCT sha256(text)) AS n_distinct_texts,
                   count(*) - count(DISTINCT sha256(text)) AS n_exact_dups,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS total_tokens,
                   min(len(string_split(text, ' '))) AS min_tokens,
                   round(quantile_cont(len(string_split(text, ' ')), 0.5),
                         4) AS p50_tokens,
                   round(quantile_cont(len(string_split(text, ' ')), 0.95),
                         4) AS p95_tokens,
                   max(len(string_split(text, ' '))) AS max_tokens
            FROM documents
            GROUP BY ROLLUP (source, lang)
        """,
        # e3_bm25_topk: the full Okapi formula replicated term-by-term;
        # deterministic top-k on (rounded score desc, doc_id)
        "e3_bm25_topk": """
            WITH tok AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS dl,
                       unnest(string_split(text, ' ')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, dl, term, count(*) AS tf
                FROM tok
                WHERE term IN ('spark', 'window', 'hash')
                GROUP BY doc_id, dl, term
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            stats AS (
                SELECT count(*) AS n_docs,
                       avg(len(string_split(text, ' '))) AS avgdl
                FROM documents
            ),
            per AS (
                SELECT tf.doc_id,
                       ln(1 + (stats.n_docs - dfreq.df + 0.5)
                              / (dfreq.df + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))
                           AS s
                FROM tf
                JOIN dfreq USING (term)
                CROSS JOIN stats
            )
            SELECT doc_id,
                   round(sum(s), 6) AS bm25,
                   count(*) AS n_query_terms_hit
            FROM per
            GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id
            LIMIT 25
        """,
    }
    # SemDeDup composition: recursive-SQL connected components over the
    # SAME cosine-pair oracle, plus sizes and the min-id survivor flag
    out["e1_semantic_dedup"] = f"""
        WITH RECURSIVE pairs AS ({out["e1_embedding_near_dup"]}),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b AS a, id_a AS b FROM pairs
        ),
        reach(id, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id
        ),
        comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        clusters AS (
            SELECT e.vec_id,
                   coalesce(c.component, e.vec_id) AS cluster_id
            FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
        ),
        sizes AS (
            SELECT cluster_id, count(*) AS cluster_size
            FROM clusters GROUP BY cluster_id
        )
        SELECT c.vec_id, c.cluster_id,
               CAST(s.cluster_size AS BIGINT) AS cluster_size,
               c.vec_id = c.cluster_id AS is_survivor
        FROM clusters c JOIN sizes s USING (cluster_id)
    """
    # the streaming suite must equal its batch twin — one oracle, two names
    out["e6_windows_batch"] = out["e6_windows"]
    # star CC labels are the same component minima as propagation's
    out["e1_dup_clusters_star"] = out["e1_dup_clusters"]
    # a probe of the incrementally-maintained index must equal a probe of
    # a fresh full build — one oracle, two names
    out["e2_lsh_append_topk"] = out["e2_lsh_topk"]
    # the persisted-alias-index probe must equal the inline linker fit
    # with the SAME max_df posture — one oracle, two names (round 10:
    # the serving index is fit with max_df_ratio=0.1, the production
    # stop-gram cut, so its oracle is the maxdf twin)
    out["x1_linker_indexed"] = out["x1_linker_corpus_maxdf"]
    # round 12: the small-batch champion serving probe — same TF-IDF
    # body, mention slice restricted to the five pinned serving docs,
    # same max_df=0.1 fit as the persisted index it probes
    out["x1_linker_served"] = _x1_linker_corpus_oracle(
        0.1, mention_pred="doc_id % 50 = 0 AND doc_id < 250"
    )
    # -- round-10 consolidation suites: tagged unions of the r09-green
    # singles they replace in the window; every constituent oracle
    # stays registered above, so the singles remain individually
    # hash-checked in tests/test_oracle_parity.py --------------------
    out["e1_sa_suite"] = f"""
        SELECT 'sa' AS op, CAST(gpos AS VARCHAR) AS k,
               concat_ws('§', CAST(doc_id AS VARCHAR),
                         CAST(local_pos AS VARCHAR),
                         CAST(sa_rank AS VARCHAR)) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e1_suffix_array"]})
        UNION ALL
        SELECT 'spans',
               concat_ws('§', CAST(doc_id AS VARCHAR),
                         CAST(local_pos AS VARCHAR)),
               concat_ws('§', CAST(other_doc_id AS VARCHAR),
                         CAST(other_pos AS VARCHAR), prefix),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_sa_dup_spans"]})
        UNION ALL
        SELECT 'dedup', CAST(doc_id AS VARCHAR),
               concat_ws('§', CAST(n_chars_kept AS VARCHAR),
                         CAST(n_chars_removed AS VARCHAR), text),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_sa_dedup"]})
        UNION ALL
        SELECT 'bench', CAST(doc_id AS VARCHAR),
               concat_ws('§', CAST(n_positions AS VARCHAR),
                         CAST(rank_checksum AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_suffix_array_bench"]})
    """
    out["g_rank_suite"] = f"""
        SELECT 'pr' AS op, CAST(node AS VARCHAR) AS k,
               CAST(NULL AS VARCHAR) AS v, rank AS v_num
        FROM ({out["g_pagerank"]})
        UNION ALL
        SELECT 'ppr', CAST(node AS VARCHAR),
               CAST(NULL AS VARCHAR), rank
        FROM ({out["g_ppr"]})
    """
    out["e2_bit_suite"] = f"""
        SELECT 'htop' AS op,
               concat_ws('§', CAST(query_id AS VARCHAR),
                         CAST(rank AS VARCHAR)) AS k,
               CAST(neighbor_id AS VARCHAR) AS v,
               CAST(hamming AS DOUBLE) AS v_num
        FROM ({out["e2_hamming_topk"]})
        UNION ALL
        SELECT 'rrk',
               concat_ws('§', CAST(query_id AS VARCHAR),
                         CAST(rank AS VARCHAR)),
               CAST(neighbor_id AS VARCHAR), cos_sim
        FROM ({out["e2_rerank_topk"]})
        UNION ALL
        SELECT 'hpairs',
               concat_ws('§', CAST(id_a AS VARCHAR),
                         CAST(id_b AS VARCHAR)),
               CAST(NULL AS VARCHAR), CAST(hamming AS DOUBLE)
        FROM ({out["e2_hamming_pairs"]})
        UNION ALL
        SELECT op, k, v, v_num FROM ({out["e2_srp_sketch"]})
    """
    out["e5_dp_suite"] = f"""
        SELECT 'row' AS op, event_type AS k,
               CAST(true_count AS VARCHAR) AS v,
               CAST(noisy_count AS DOUBLE) AS v_num
        FROM ({out["e5_dp_histogram"]})
        UNION ALL
        SELECT 'user', event_type, CAST(true_count AS VARCHAR),
               CAST(noisy_count AS DOUBLE)
        FROM ({out["e5_dp_histogram_user"]})
    """
    out["e2_kmeans_suite"] = f"""
        SELECT 'km' AS op, CAST(vec_id AS VARCHAR) AS k,
               concat_ws('§', CAST(cluster_id AS VARCHAR),
                         CAST(sq_dist AS VARCHAR)) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e2_kmeans"]})
        UNION ALL
        SELECT 'cs', CAST(vec_id AS VARCHAR),
               concat_ws('§', CAST(cluster_id AS VARCHAR),
                         CAST(draw_rank AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e2_cluster_sample"]})
        UNION ALL
        SELECT 'sd', CAST(vec_id AS VARCHAR),
               concat_ws('§', CAST(kmeans_cluster AS VARCHAR),
                         CAST(cluster_id AS VARCHAR),
                         CAST(cluster_size AS VARCHAR),
                         CAST(CAST(is_survivor AS INT) AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e2_semdedup_kmeans"]})
    """
    out["x1_linker_suite"] = f"""
        SELECT 'inline' AS op,
               concat_ws('§', mention, CAST(rank AS VARCHAR)) AS k,
               CAST(alias_id AS VARCHAR) AS v, score AS v_num
        FROM ({out["x1_linker_corpus"]})
        UNION ALL
        SELECT 'maxdf',
               concat_ws('§', mention, CAST(rank AS VARCHAR)),
               CAST(alias_id AS VARCHAR), score
        FROM ({out["x1_linker_corpus_maxdf"]})
    """
    # t_acf: the exact-integer ACF replayed — centi-unit floor-div
    # bucket means, lead windows per lag, the n²-cleared numerator and
    # denominator as BIGINTs, ONE division per row (round 10).
    _acf_leads = ",\n                ".join(
        f"lead(x, {k}) OVER w AS x{k}" for k in range(1, 7)
    )
    _acf_sums = ",\n                ".join(
        f"CAST(SUM(x * x{k}) AS BIGINT) AS p{k}, "
        f"CAST(SUM(CASE WHEN x{k} IS NOT NULL THEN x END) AS BIGINT)"
        f" AS a{k}, "
        f"CAST(SUM(x{k}) AS BIGINT) AS b{k}"
        for k in range(1, 7)
    )
    _acf_rows = "\n            UNION ALL\n".join(
        f"""
            SELECT event_type, {k} AS lag, n AS n_buckets,
                   n * n * p{k} - n * s * (a{k} + b{k})
                       + (n - {k}) * s * s AS acf_num,
                   n * n * q - n * s * s AS acf_den,
                   CASE WHEN n * n * q - n * s * s = 0 THEN 0.0
                        ELSE CAST(n * n * p{k} - n * s * (a{k} + b{k})
                                  + (n - {k}) * s * s AS DOUBLE)
                             / CAST(n * n * q - n * s * s AS DOUBLE)
                   END AS acf
            FROM agg WHERE n > {k}"""
        for k in range(1, 7)
    )
    out["t_acf"] = f"""
        WITH b AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                       AS bucket_start,
                   CAST(floor(SUM(CAST(floor(value * 100 + 0.5)
                       AS BIGINT)) / COUNT(*)) AS BIGINT) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        led AS (
            SELECT event_type, x,
                {_acf_leads}
            FROM b
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start)
        ),
        agg AS (
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q,
                {_acf_sums}
            FROM led GROUP BY 1
        )
        {_acf_rows}
    """
    # e6_hll_distinct: the exact-oracle HLL replayed register by
    # register — md5 halves, leading-zero rank via bin(), the
    # 2^33-scaled harmonic sum as a BIGINT, the single
    # literal/integer division (round 10).
    from drugbankner_spark.operators.sketches import (
        _hll_alpha_m2_scaled,
    )

    _hll_a = repr(_hll_alpha_m2_scaled(8))
    out["e6_hll_distinct"] = f"""
        WITH h AS (
            SELECT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) AS h1,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        9, 8)) AS BIGINT) AS h2
            FROM events WHERE user_id IS NOT NULL
        ),
        regs AS (
            SELECT event_type, CAST(h1 % 256 AS INT) AS reg_idx,
                   MAX(CASE WHEN h2 = 0 THEN 33
                            ELSE 33 - length(bin(h2)) END) AS reg_max
            FROM h GROUP BY 1, 2
        ),
        spine AS (
            SELECT s.event_type, CAST(t.range AS INT) AS reg_idx
            FROM (SELECT DISTINCT event_type FROM regs) s,
                 range(0, 256) t
        ),
        full_regs AS (
            SELECT sp.event_type, sp.reg_idx,
                   COALESCE(r.reg_max, 0) AS reg_max
            FROM spine sp LEFT JOIN regs r
              ON r.event_type = sp.event_type
             AND r.reg_idx = sp.reg_idx
        ),
        est AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN reg_max = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero_regs,
                   CAST(SUM(CAST(1 AS BIGINT) << (33 - reg_max))
                        AS BIGINT) AS s_scaled
            FROM full_regs GROUP BY 1
        )
        SELECT 'reg' AS op,
               concat_ws('§', event_type, CAST(reg_idx AS VARCHAR))
                   AS k,
               CAST(NULL AS VARCHAR) AS v,
               CAST(reg_max AS DOUBLE) AS v_num
        FROM regs
        UNION ALL
        SELECT 'est', event_type,
               concat_ws('§', CAST(n_zero_regs AS VARCHAR),
                         CAST(s_scaled AS VARCHAR)),
               round({_hll_a} / CAST(s_scaled AS DOUBLE), 6)
        FROM est
    """
    # e5_chi2: presence-based chi-square feature selection replayed —
    # exact BIGINT counts, the statistic in DOUBLE with the SAME
    # parenthesization as the Spark expression (every IEEE step
    # correctly rounded => bit-identical), token-text tiebreak
    # (round 10).
    out["e5_chi2"] = """
        WITH pres AS (
            SELECT DISTINCT doc_id, lang AS label, token
            FROM (
                SELECT doc_id, lang,
                       UNNEST(string_split(text, ' ')) AS token
                FROM documents
            )
            WHERE token <> ''
        ),
        tc AS (
            SELECT token, label, COUNT(*) AS a FROM pres GROUP BY 1, 2
        ),
        td AS (
            SELECT token, CAST(SUM(a) AS BIGINT) AS df_token
            FROM tc GROUP BY 1
            HAVING SUM(a) >= 5
        ),
        cn AS (
            SELECT lang AS label, COUNT(*) AS n_class
            FROM documents GROUP BY 1
        ),
        nt AS (SELECT COUNT(*) AS n_total FROM documents),
        j AS (
            SELECT tc.label, tc.token, tc.a, td.df_token,
                   cn.n_class, nt.n_total
            FROM tc JOIN td USING (token) JOIN cn USING (label)
            CROSS JOIN nt
        ),
        sc AS (
            SELECT label, token, a AS df_in_class, df_token,
                   CASE WHEN (n_total - df_token) = 0
                          OR (n_total - n_class) = 0 THEN 0.0
                        ELSE (CAST(n_total AS DOUBLE) *
                              ((CAST(a AS DOUBLE)
                                * CAST(n_total - df_token - n_class + a
                                       AS DOUBLE)
                                - CAST(df_token - a AS DOUBLE)
                                  * CAST(n_class - a AS DOUBLE))
                               * (CAST(a AS DOUBLE)
                                  * CAST(n_total - df_token - n_class
                                         + a AS DOUBLE)
                                  - CAST(df_token - a AS DOUBLE)
                                    * CAST(n_class - a AS DOUBLE))))
                             / ((CAST(df_token AS DOUBLE))
                                * (CAST(n_total - df_token AS DOUBLE))
                                * ((CAST(n_class AS DOUBLE))
                                   * (CAST(n_total - n_class
                                           AS DOUBLE))))
                   END AS chi2
            FROM j
        ),
        rk AS (
            SELECT label, token, df_in_class, df_token, chi2,
                   row_number() OVER (
                       PARTITION BY label
                       ORDER BY chi2 DESC, token ASC
                   ) AS rank
            FROM sc
        )
        SELECT label, token, df_in_class, df_token,
               round(chi2, 6) AS chi2, rank
        FROM rk WHERE rank <= 10
    """
    # e5_agreement: the Gorodkin R_K / kappa arithmetic replayed over
    # the same confusion counts — integer sums, pinned sqrt product
    out["e5_agreement"] = """
        WITH pr AS (
            SELECT lang AS p,
                   CASE WHEN doc_id % 4 = 0 THEN 'en' ELSE lang END AS g
            FROM documents
        ),
        pairs AS (SELECT p, g, COUNT(*) AS n FROM pr GROUP BY 1, 2),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS s,
                   CAST(COALESCE(SUM(CASE WHEN p = g THEN n END), 0)
                        AS BIGINT) AS c
            FROM pairs
        ),
        pm AS (SELECT p, CAST(SUM(n) AS BIGINT) AS pk
               FROM pairs GROUP BY p),
        tm AS (SELECT g, CAST(SUM(n) AS BIGINT) AS tk
               FROM pairs GROUP BY g),
        marg AS (
            SELECT CAST(SUM(pk * tk) AS BIGINT) AS spt,
                   CAST(SUM(pk * pk) AS BIGINT) AS sp2,
                   CAST(SUM(tk * tk) AS BIGINT) AS st2
            FROM (
                SELECT COALESCE(pm.pk, 0) AS pk, COALESCE(tm.tk, 0) AS tk
                FROM pm FULL JOIN tm ON tm.g = pm.p
            )
        )
        SELECT s AS n, c AS n_correct,
               CAST(c * s - spt AS BIGINT) AS agree_num,
               CAST(s * s - spt AS BIGINT) AS kappa_den,
               CASE WHEN s * s - spt <> 0
                    THEN (c * s - spt) / (s * s - spt) END AS kappa,
               CASE WHEN sqrt(CAST(s * s - sp2 AS DOUBLE))
                         * sqrt(CAST(s * s - st2 AS DOUBLE)) <> 0.0
                    THEN CAST(c * s - spt AS DOUBLE)
                         / (sqrt(CAST(s * s - sp2 AS DOUBLE))
                            * sqrt(CAST(s * s - st2 AS DOUBLE)))
               END AS mcc
        FROM tot, marg
    """
    # e3_fertility: word/char counts joined onto the wordpiece-apply
    # replication; exact divisions, NULL on zero denominators
    out["e3_fertility"] = f"""
        WITH wp AS (
            SELECT doc_id, n_tokens FROM ({out["e3_wordpiece_apply"]})
        ),
        st AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text,
                       '\\s+'), t -> t <> '')) AS BIGINT) AS n_words,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        )
        SELECT st.doc_id, st.n_words, st.n_chars, wp.n_tokens,
               CASE WHEN st.n_words > 0
                    THEN wp.n_tokens / st.n_words END AS fertility,
               CASE WHEN wp.n_tokens > 0
                    THEN st.n_chars / wp.n_tokens END AS chars_per_token
        FROM st JOIN wp ON wp.doc_id = st.doc_id
    """
    # e6_interval_join: the stream-stream range join equals the batch
    # range join over the finite driver input (long watermark) —
    # timestamps as unix microseconds on both engines
    out["e6_interval_join"] = """
        SELECT l.event_id, l.user_id,
               epoch_us(l.ts) AS ts_us, l.value,
               epoch_us(r.ts) AS r_ts_us, r.value AS r_value
        FROM events l JOIN events r
          ON r.user_id = l.user_id
         AND l.event_type = 'purchase' AND r.event_type = 'click'
         AND r.ts >= l.ts - INTERVAL 4 HOUR AND r.ts <= l.ts
    """
    # g_modularity: LPA labels via the g_label_prop replay, then the
    # exact-integer Newman sum over the canonical edge set
    out["g_modularity"] = f"""
        WITH raw AS (
            SELECT doc_id % 97 AS s,
                   (doc_id * doc_id + 1) % 97 AS d
            FROM documents
            UNION ALL
            SELECT (doc_id * 3 + 5) % 97, (doc_id * 5 + 11) % 97
            FROM documents
        ),
        sym AS (
            SELECT s AS a, d AS b FROM raw WHERE s <> d
            UNION
            SELECT d, s FROM raw WHERE s <> d
        ),
        und AS (
            SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
            FROM sym
        ),
        m AS (SELECT COUNT(*) AS m FROM und),
        lab AS (
            SELECT node, label AS community
            FROM ({out["g_label_prop"]})
        ),
        deg AS (
            SELECT n, COUNT(*) AS d FROM (
                SELECT a AS n FROM und
                UNION ALL SELECT b FROM und
            ) GROUP BY n
        ),
        per_c AS (
            SELECT lab.community, COUNT(*) AS n_nodes,
                   CAST(SUM(deg.d) AS BIGINT) AS deg_sum
            FROM deg JOIN lab ON lab.node = deg.n
            GROUP BY 1
        ),
        inn AS (
            SELECT la.community, COUNT(*) AS m_in
            FROM und
            JOIN lab la ON la.node = und.a
            JOIN lab lb ON lb.node = und.b
            WHERE la.community = lb.community
            GROUP BY 1
        )
        SELECT per_c.community, per_c.n_nodes,
               CAST(COALESCE(inn.m_in, 0) AS BIGINT) AS m_in,
               per_c.deg_sum,
               CAST(4 * m.m * COALESCE(inn.m_in, 0)
                    - per_c.deg_sum * per_c.deg_sum AS BIGINT) AS q_num,
               CAST(4 * m.m * COALESCE(inn.m_in, 0)
                    - per_c.deg_sum * per_c.deg_sum AS DOUBLE)
                   / (4.0 * m.m * m.m) AS q
        FROM per_c LEFT JOIN inn ON inn.community = per_c.community, m
    """
    # the streaming sessionize face must equal its batch twin
    out["e6_sessionize_batch"] = out["e6_sessionize"]
    # driver-window suites: tagged unions of the consolidated originals'
    # oracles, stringified into the common (op, k, v) schema
    # round-6-late consolidation suites: tagged unions of the new
    # singles' oracles (numerics per-metric on v_num — a double never
    # casts to string, where engine reprs diverge)
    out["e5_prep_suite"] = f"""
        SELECT 'kfold' AS op, CAST(doc_id AS VARCHAR) AS k,
               CAST(NULL AS VARCHAR) AS v, CAST(fold AS DOUBLE) AS v_num
        FROM ({out["e5_kfold"]})
        UNION ALL
        SELECT 'ece', CAST(bin AS VARCHAR) || '§' || m.name,
               CAST(NULL AS VARCHAR),
               CASE m.name WHEN 'n' THEN CAST(n AS DOUBLE)
                    WHEN 'avg_confidence' THEN avg_confidence
                    WHEN 'accuracy' THEN accuracy
                    WHEN 'abs_gap' THEN abs_gap
                    ELSE ece END
        FROM ({out["e5_calibration"]}),
             (VALUES ('n'), ('avg_confidence'), ('accuracy'),
                     ('abs_gap'), ('ece')) m(name)
        UNION ALL
        SELECT 'tok', CAST(c_custkey AS VARCHAR), c_name,
               CAST(c_nationkey AS DOUBLE)
        FROM ({out["e5_tokenize"]})
        UNION ALL
        SELECT 'profile', "column",
               concat_ws('§', CAST(n AS VARCHAR),
                         CAST(n_null AS VARCHAR),
                         CAST(n_distinct AS VARCHAR), min_value,
                         max_value, top_value,
                         CAST(top_count AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e5_profile"]})
        UNION ALL
        SELECT 'ols', l_returnflag || '§' || m.name,
               CAST(NULL AS VARCHAR),
               CASE m.name WHEN 'n' THEN CAST(n AS DOUBLE)
                    WHEN 'slope' THEN slope
                    WHEN 'intercept' THEN intercept
                    ELSE r2 END
        FROM ({out["e5_group_ols"]}),
             (VALUES ('n'), ('slope'), ('intercept'), ('r2')) m(name)
    """
    out["g_graph_suite"] = f"""
        SELECT 'bfs' AS op, CAST(node AS VARCHAR) AS k,
               CAST(NULL AS VARCHAR) AS v, CAST(dist AS DOUBLE) AS v_num
        FROM ({out["g_bfs_distances"]})
        UNION ALL
        SELECT 'lpa', CAST(node AS VARCHAR), CAST(NULL AS VARCHAR),
               CAST(label AS DOUBLE)
        FROM ({out["g_label_prop"]})
        UNION ALL
        SELECT 'walk', CAST(start AS VARCHAR) || '§'
               || CAST(walk_id AS VARCHAR), path, CAST(NULL AS DOUBLE)
        FROM ({out["g_random_walks"]})
    """
    def _num_rows_sql(base_key: str, op: str, key_exprs: list[str],
                      metrics: list[str]) -> str:
        # SQL twin of the Spark-side _num_metric_rows helper: one row
        # per (input row, metric), k = keys § metric, v_num = metric
        keys = " || '§' || ".join(
            f"CAST({k} AS VARCHAR)" for k in key_exprs
        )
        cases = " ".join(
            f"WHEN '{m}' THEN CAST(\"{m}\" AS DOUBLE)" for m in metrics
        )
        vals = ", ".join(f"('{m}')" for m in metrics)
        return f"""
        SELECT '{op}' AS op, {keys} || '§' || m.name AS k,
               CAST(NULL AS VARCHAR) AS v,
               CASE m.name {cases} END AS v_num
        FROM ({out[base_key]}), (VALUES {vals}) m(name)
        """

    # round-8 consolidation suites (VERDICT r07 next #1): tagged
    # unions of the consolidated originals' oracles
    out["t_ts_suite"] = (
        _num_rows_sql("t_resample_gapfill", "resample",
                      ["event_type", "bucket_start"],
                      ["n_obs", "value_avg", "locf", "interp"])
        + " UNION ALL "
        + _num_rows_sql("t_ewma", "ewma",
                        ["event_type", "bucket_start"], ["ewma"])
        + " UNION ALL "
        + _num_rows_sql("t_anomaly", "anomaly",
                        ["event_type", "bucket_start"],
                        ["value_avg", "zscore"])
        + f""" UNION ALL
        SELECT 'anomaly_flag', concat_ws('§', event_type,
                   CAST(bucket_start AS VARCHAR)),
               CAST(is_anomaly AS VARCHAR), CAST(NULL AS DOUBLE)
        FROM ({out["t_anomaly"]})
        """
    )
    out["e6_journey_suite"] = (
        _num_rows_sql("e6_transition_matrix", "tm",
                      ["prev_state", "next_state"], ["n", "prob"])
        + " UNION ALL "
        + _num_rows_sql("e6_top_paths", "paths", ["path"],
                        ["n_entities"])
        + " UNION ALL "
        + _num_rows_sql("e6_transition_power", "power",
                        ["prev_state", "next_state"], ["prob"])
        + " UNION ALL "
        + _num_rows_sql("e6_attribution", "att",
                        ["user_id", "conversion_id", "touch_id"],
                        ["position", "n_touches", "first_credit",
                         "last_credit", "linear_credit"])
        + f""" UNION ALL
        SELECT 'att_touch', concat_ws('§', CAST(user_id AS VARCHAR),
                   CAST(conversion_id AS VARCHAR),
                   CAST(touch_id AS VARCHAR)),
               touch_type, CAST(NULL AS DOUBLE)
        FROM ({out["e6_attribution"]})
        """
        + " UNION ALL "
        + _num_rows_sql("e6_cooccurrence", "cooc",
                        ["item_a", "item_b"],
                        ["n_ab", "n_a", "n_b", "confidence_a_to_b",
                         "lift"])
    )
    out["e5_eval_suite"] = (
        _num_rows_sql("e5_ndcg", "ndcg", ["query_id"], ["ndcg_at_k"])
        + " UNION ALL "
        + _num_rows_sql("e5_retrieval_metrics", "retr", ["query_id"],
                        ["n_relevant", "n_retrieved_relevant",
                         "recall_at_k", "capped_recall_at_k",
                         "reciprocal_rank"])
        + " UNION ALL "
        + _num_rows_sql("e5_class_report", "cls", ["label"],
                        ["support", "precision", "recall", "f1"])
        + " UNION ALL "
        + _num_rows_sql("e5_ner_eval", "ner", ["label"],
                        ["tp", "fp", "fn", "precision", "recall",
                         "f1"])
        + f""" UNION ALL
        SELECT 'iob', concat_ws('§', CAST(doc_id AS VARCHAR),
                   CAST(pos AS VARCHAR)),
               concat_ws('§', token, tag), CAST(NULL AS DOUBLE)
        FROM ({out["e5_iob_tags"]})
        """
    )
    out["e1_clean_suite"] = f"""
        SELECT 'c4' AS op, CAST(doc_id AS VARCHAR) AS k,
               concat_ws('§', text, CAST(n_lines_kept AS VARCHAR),
                   CAST(n_lines_dropped AS VARCHAR),
                   CAST(has_brace AS VARCHAR),
                   CAST(has_lorem AS VARCHAR),
                   CAST(keep AS VARCHAR)) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e1_c4_filter"]})
        UNION ALL
        SELECT 'pii', CAST(doc_id AS VARCHAR),
               concat_ws('§', text, CAST(n_email AS VARCHAR),
                   CAST(n_ipv4 AS VARCHAR), CAST(n_ssn AS VARCHAR),
                   CAST(n_phone AS VARCHAR),
                   CAST(has_pii AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_pii_scrub"]})
        UNION ALL
        SELECT 'repair', CAST(doc_id AS VARCHAR),
               concat_ws('§', text, CAST(n_chars_before AS VARCHAR),
                   CAST(n_chars_after AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_repair_text"]})
        UNION ALL
        SELECT 'boiler', CAST(doc_id AS VARCHAR),
               concat_ws('§', text_clean, CAST(n_removed AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_boilerplate_strip"]})
    """
    # round-9 consolidation suites: tagged unions of the consolidated
    # r07-green originals' oracles
    out["j_er_suite"] = f"""
        SELECT 'jw' AS op,
               concat_ws('§', CAST(c_custkey AS VARCHAR), c_name) AS k,
               matched_v_name AS v, jw_sim AS v_num
        FROM ({out["j_jw_match"]})
        UNION ALL
        SELECT 'er', concat_ws('§', CAST(id AS VARCHAR), name),
               concat_ws('§', CAST(cluster AS VARCHAR), canonical_name),
               CAST(NULL AS DOUBLE)
        FROM ({out["er_resolve"]})
    """
    out["e1_pair_suite"] = (
        f"""
        SELECT 'recall' AS op, m.name AS k,
               CAST(NULL AS VARCHAR) AS v,
               CASE m.name
                    WHEN 'n_true' THEN CAST(n_true AS DOUBLE)
                    WHEN 'n_candidates' THEN CAST(n_candidates AS DOUBLE)
                    WHEN 'n_hit' THEN CAST(n_hit AS DOUBLE)
                    WHEN 'recall' THEN recall
                    ELSE precision END AS v_num
        FROM ({out["e1_near_dup_recall"]}),
             (VALUES ('n_true'), ('n_candidates'), ('n_hit'),
                     ('recall'), ('precision')) m(name)
        UNION ALL
        """
        + _num_rows_sql("e1_simhash_pairs", "simhash",
                        ["id_a", "id_b"], ["hamming"])
    )
    out["e3_lm_suite"] = (
        _num_rows_sql("e3_kn_ppl", "kn", ["doc_id"],
                      ["n_bigrams", "mean_logprob", "ppl"])
        + " UNION ALL "
        + _num_rows_sql("e3_skipgram", "skip", ["center", "context"],
                        ["n"])
        + " UNION ALL "
        + _num_rows_sql("e3_char_entropy", "ent", ["doc_id"],
                        ["n_chars", "n_distinct_chars", "entropy"])
        + " UNION ALL "
        + _num_rows_sql("e3_zipf", "zipf", ["grp"],
                        ["n", "slope", "intercept", "r2"])
        + f""" UNION ALL
        SELECT 'wp', CAST(doc_id AS VARCHAR),
               concat_ws('§', CAST(n_tokens AS VARCHAR), tokens_str),
               CAST(NULL AS DOUBLE)
        FROM ({out["e3_wordpiece_apply"]})
        """
    )
    out["e5_sft_suite"] = (
        f"""
        SELECT 'corrupt' AS op, CAST(doc_id AS VARCHAR) AS k,
               concat_ws('§', inputs, targets,
                   CAST(n_spans AS VARCHAR),
                   CAST(n_noise_tokens AS VARCHAR)) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e5_span_corrupt"]})
        UNION ALL
        SELECT 'aug', CAST(doc_id AS VARCHAR),
               concat_ws('§', text, CAST(n_dropped AS VARCHAR),
                   CAST(n_swapped_pairs AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e5_augment"]})
        UNION ALL
        SELECT 'mix', CAST(doc_id AS VARCHAR), source,
               CAST(NULL AS DOUBLE)
        FROM ({out["e5_temperature_mix"]})
        UNION ALL
        """
        + _num_rows_sql("e5_dsir_weights", "dsir", ["doc_id"],
                        ["dsir_log_weight"])
    )
    out["g_count_suite"] = (
        f"""
        SELECT 'tri' AS op, m.name AS k, CAST(NULL AS VARCHAR) AS v,
               CASE m.name
                    WHEN 'n_triangles' THEN CAST(n_triangles AS DOUBLE)
                    WHEN 'n_edges' THEN CAST(n_edges AS DOUBLE)
                    ELSE CAST(n_vertices AS DOUBLE) END AS v_num
        FROM ({out["g_triangle_count"]}),
             (VALUES ('n_triangles'), ('n_edges'),
                     ('n_vertices')) m(name)
        UNION ALL
        """
        + _num_rows_sql("g_common_neighbors", "cn", ["a", "b"],
                        ["n_common", "jaccard"])
    )
    # timestamps ride as epoch microseconds on BOTH engines (Spark
    # unix_micros == DuckDB epoch_us over the same parquet values)
    out["e5_gov_suite"] = (
        f"""
        SELECT 'kanon' AS op,
               concat_ws('§', event_type,
                   CAST(day_start AS VARCHAR)) AS k,
               concat_ws('§', CAST(class_size AS VARCHAR),
                   CAST(l_diversity AS VARCHAR),
                   CAST(at_risk AS VARCHAR)) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e5_k_anonymity"]})
        UNION ALL
        """
        + _num_rows_sql("e5_winsorize", "winsor",
                        ["event_type", "event_id"],
                        ["value", "pct_rank", "winsorized"])
        + f""" UNION ALL
        SELECT 'cdc',
               CAST(user_id AS VARCHAR) || '§'
                   || CAST(epoch_us(ts) AS VARCHAR) || '§'
                   || CAST(event_id AS VARCHAR) || '§' || 'value',
               CAST(NULL AS VARCHAR), CAST(value AS DOUBLE)
        FROM ({out["e5_cdc_apply"]})
        UNION ALL
        SELECT 'cdc_t',
               concat_ws('§', CAST(user_id AS VARCHAR),
                   CAST(epoch_us(ts) AS VARCHAR),
                   CAST(event_id AS VARCHAR)),
               event_type, CAST(NULL AS DOUBLE)
        FROM ({out["e5_cdc_apply"]})
        UNION ALL
        SELECT 'cohort',
               CAST(epoch_us(cohort_period) AS VARCHAR) || '§'
                   || CAST(periods_since AS VARCHAR) || '§'
                   || 'n_active',
               CAST(NULL AS VARCHAR), CAST(n_active AS DOUBLE)
        FROM ({out["e5_cohort_retention"]})
        """
    )
    out["u_set_suite"] = f"""
        SELECT 'a5' AS op, o_orderstatus AS k, o_orderpriority AS v
        FROM ({out["a5_distinct"]})
        UNION ALL
        SELECT 'u2', CAST(c_custkey AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM ({out["u2_intersect"]})
        UNION ALL
        SELECT 'u3', CAST(c_custkey AS VARCHAR), c_name
        FROM ({out["u3_anti_join"]})
        UNION ALL
        SELECT 'a8', member_id, CAST(NULL AS VARCHAR)
        FROM ({out["a8_explode_distinct"]})
        UNION ALL
        SELECT 'o1', CAST(s_suppkey AS VARCHAR), s_name
        FROM ({out["o1_topk"]})
        UNION ALL
        SELECT 'j9', CAST(c_custkey AS VARCHAR), c_name
        FROM ({out["j9_semi_join"]})
    """
    out["f_curie_suite"] = f"""
        SELECT 'f4' AS op, CAST(p_partkey AS VARCHAR) AS k,
               id_simplified AS v
        FROM ({out["f4_curie_prefix_upper"]})
        UNION ALL
        SELECT 'f10', prefix, CAST(NULL AS VARCHAR)
        FROM ({out["f10_prefix_extract"]})
    """
    # round 5: u_set_suite absorbs U1 + U4
    out["u_set_suite"] += f"""
        UNION ALL
        SELECT 'u1', CAST(c_custkey AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM ({out["u1_union_merge"]})
        UNION ALL
        SELECT 'u4', CAST(c_custkey AS VARCHAR), reason
        FROM ({out["u4_union_prefer_first"]})
    """
    # round-5 suites: (op, k, v, v_num DOUBLE) tagged unions of the
    # consolidated originals' oracles — numeric branches ride v_num so
    # counts/similarities stay checked as numbers, not strings
    out["syn_suite"] = f"""
        SELECT 'canonical' AS op, concat_ws('§', via, entity) AS k,
               concat_ws('§', preferred_curie, preferred_name,
                         preferred_category) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["syn_canonical"]})
        UNION ALL
        SELECT 'equiv', entity, equivalent_id, CAST(NULL AS DOUBLE)
        FROM ({out["syn_equivalent_nodes"]})
        UNION ALL
        SELECT 'cathist', concat_ws('§', cluster_id, category),
               CAST(NULL AS VARCHAR), CAST(cnt AS DOUBLE)
        FROM ({out["syn_category_histogram"]})
        UNION ALL
        SELECT 'norm', concat_ws('§', cluster_id, equivalent_id),
               concat_ws('§', entity, label, category, major_branch,
                         name_sri, CAST(in_sri AS VARCHAR), category_sri,
                         name_kg2pre, CAST(in_kg2pre AS VARCHAR),
                         category_kg2pre, cluster_preferred_name),
               CAST(NULL AS DOUBLE)
        FROM ({out["syn_normalizer_nodes"]})
    """
    out["j_join_suite"] = f"""
        SELECT 'j2' AS op, CAST(o_custkey AS VARCHAR) AS k,
               modal_value AS v, CAST(modal_count AS DOUBLE) AS v_num
        FROM ({out["j2_mode_vote"]})
        UNION ALL
        SELECT 'j4', concat_ws('§', CAST(o_orderkey AS VARCHAR),
                               CAST(o_custkey AS VARCHAR)),
               resolved_name, CAST(NULL AS DOUBLE)
        FROM ({out["j4_coalesce_fallback"]})
        UNION ALL
        SELECT 'j5', concat_ws('§', suffix, candidate),
               CAST(NULL AS VARCHAR), CAST(n_nationkey AS DOUBLE)
        FROM ({out["j5_prefix_expansion"]})
    """
    out["a_agg_suite"] = f"""
        SELECT 'a2' AS op, lang AS k, longest_value AS v,
               CAST(longest_len AS DOUBLE) AS v_num
        FROM ({out["a2_longest_value"]})
        UNION ALL
        SELECT 'a4', concat_ws('§', CAST(c_nationkey AS VARCHAR),
                               c_mktsegment),
               CAST(NULL AS VARCHAR), CAST(cnt AS DOUBLE)
        FROM ({out["a4_category_histogram"]})
        UNION ALL
        SELECT 'a6', CAST(user_id AS VARCHAR),
               concat_ws('§', CAST(event_id AS VARCHAR), event_type),
               CAST(NULL AS DOUBLE)
        FROM ({out["a6_first_writer_wins"]})
    """
    out["e1_near_dup_suite"] = f"""
        SELECT 'simhash' AS op, CAST(doc_id AS VARCHAR) AS k,
               CAST(simhash AS VARCHAR) AS v, CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e1_simhash"]})
        UNION ALL
        SELECT 'ngram', concat_ws('§', CAST(id_a AS VARCHAR),
                                  CAST(id_b AS VARCHAR)),
               CAST(n_common AS VARCHAR), CAST(jaccard AS DOUBLE)
        FROM ({out["e1_ngram_jaccard"]})
        UNION ALL
        SELECT 'embed', concat_ws('§', CAST(id_a AS VARCHAR),
                                  CAST(id_b AS VARCHAR)),
               CAST(NULL AS VARCHAR), CAST(cos_sim AS DOUBLE)
        FROM ({out["e1_embedding_near_dup"]})
    """
    out["e3_docmeta_suite"] = f"""
        SELECT 'lang' AS op, CAST(doc_id AS VARCHAR) AS k,
               predicted_lang AS v, CAST(n_stopword_hits AS DOUBLE) AS v_num
        FROM ({out["e3_lang_id"]})
        UNION ALL
        SELECT 'fp', CAST(doc_id AS VARCHAR),
               CAST(min_fingerprint AS VARCHAR), CAST(n_chunks AS DOUBLE)
        FROM ({out["e3_fingerprint"]})
    """
    out["e4_media_suite"] = f"""
        SELECT 'png' AS op, CAST(media_id AS VARCHAR) AS k,
               concat_ws('§', CAST(width AS VARCHAR),
                         CAST(height AS VARCHAR),
                         CAST(n_bytes AS VARCHAR), decoded_sha256) AS v,
               CAST(NULL AS DOUBLE) AS v_num
        FROM ({out["e4_png_decode"]})
        UNION ALL
        SELECT 'meta', CAST(media_id AS VARCHAR),
               concat_ws('§', mime_type, CAST(n_bytes AS VARCHAR),
                         payload_sha256),
               CAST(NULL AS DOUBLE)
        FROM ({out["e4_media_metadata"]})
    """
    # round-5 LATE rotation suites: tagged unions of the consolidated
    # originals' oracles (same (op, k, v, v_num DOUBLE) shape)
    out["e2_ann_suite"] = f"""
        SELECT 'cosine' AS op,
               concat_ws('§', CAST(query_id AS VARCHAR),
                         CAST(neighbor_id AS VARCHAR)) AS k,
               CAST(rank AS VARCHAR) AS v, CAST(cos_sim AS DOUBLE) AS v_num
        FROM ({out["e2_cosine_topk"]})
        UNION ALL
        SELECT 'lsh', concat_ws('§', CAST(query_id AS VARCHAR),
                                CAST(neighbor_id AS VARCHAR)),
               CAST(rank AS VARCHAR), CAST(cos_sim AS DOUBLE)
        FROM ({out["e2_lsh_topk"]})
        UNION ALL
        SELECT 'ivf', concat_ws('§', CAST(query_id AS VARCHAR),
                                CAST(neighbor_id AS VARCHAR)),
               CAST(rank AS VARCHAR), CAST(cos_sim AS DOUBLE)
        FROM ({out["e2_ivf_topk"]})
    """
    out["e1_dedup_suite"] = f"""
        SELECT 'exact' AS op, content_sha AS k,
               CAST(canonical_id AS VARCHAR) AS v,
               CAST(n_copies AS DOUBLE) AS v_num
        FROM ({out["e1_exact_dedup"]})
        UNION ALL
        SELECT 'survivor', CAST(doc_id AS VARCHAR),
               concat_ws('§', lang, source), CAST(n_chars AS DOUBLE)
        FROM ({out["e1_dedup_survivor"]})
        UNION ALL
        SELECT 'minhash', concat_ws('§', CAST(id_a AS VARCHAR),
                                    CAST(id_b AS VARCHAR)),
               CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
        FROM ({out["e1_minhash_near_dup"]})
        UNION ALL
        SELECT 'decon', CAST(doc_id AS VARCHAR),
               CAST(contaminated AS VARCHAR),
               CAST(n_overlapping AS DOUBLE)
        FROM ({out["e1_decontaminate"]})
        UNION ALL
        SELECT 'cluster', CAST(doc_id AS VARCHAR),
               concat_ws('§', CAST(cluster_id AS VARCHAR),
                         CAST(is_singleton AS VARCHAR)),
               CAST(NULL AS DOUBLE)
        FROM ({out["e1_dup_clusters_star"]})
    """
    out["e3_qual_suite"] = f"""
        WITH q AS ({out["e3_text_quality"]}),
             b AS ({out["e3_bpe_tokens"]})
        SELECT 'quality' AS op,
               concat_ws('§', CAST(doc_id AS VARCHAR), m.name) AS k,
               CAST(NULL AS VARCHAR) AS v, m.x AS v_num
        FROM q, LATERAL (VALUES
            ('n_chars', CAST(n_chars AS DOUBLE)),
            ('n_tokens', CAST(n_tokens AS DOUBLE)),
            ('mean_token_len', CAST(mean_token_len AS DOUBLE)),
            ('digit_ratio', CAST(digit_ratio AS DOUBLE)),
            ('upper_ratio', CAST(upper_ratio AS DOUBLE)),
            ('distinct_token_ratio', CAST(distinct_token_ratio AS DOUBLE))
        ) AS m(name, x)
        UNION ALL
        SELECT 'bpe', concat_ws('§', CAST(doc_id AS VARCHAR), m.name),
               CAST(NULL AS VARCHAR), m.x
        FROM b, LATERAL (VALUES
            ('ws_tokens', CAST(ws_tokens AS DOUBLE)),
            ('bpe_tokens', CAST(bpe_tokens AS DOUBLE)),
            ('pieces_per_word', CAST(pieces_per_word AS DOUBLE))
        ) AS m(name, x)
        UNION ALL
        SELECT 'chunk', concat_ws('§', CAST(doc_id AS VARCHAR),
                                  CAST(chunk_index AS VARCHAR)),
               chunk_text, CAST(n_chunk_tokens AS DOUBLE)
        FROM ({out["e3_chunk_documents"]})
    """
    out["f_text_suite"] = f"""
        SELECT 'name' AS op, CAST(doc_id AS VARCHAR) AS k,
               concat_ws('§', cleaned, stripped, name_simplified) AS v,
               CAST(pos AS DOUBLE) AS v_num
        FROM ({out["f_name_normalize"]})
        UNION ALL
        SELECT 'sent', CAST(doc_id AS VARCHAR), sentence,
               CAST(NULL AS DOUBLE)
        FROM ({out["f5_sentence_pipeline"]})
    """
    # the closed-sessions production face: the batch session table
    # restricted to sessions closed below the final watermark
    # W = max(ts) - 10 minutes (the append-mode emission contract)
    out["e6_sessionize_closed"] = f"""
        SELECT * FROM ({out["e6_sessionize"]})
        WHERE session_end <= (SELECT max(ts) FROM events)
                             - INTERVAL '10 minutes'
    """
    # full-cell IVF-PQ probe of the appended index == flat ADC over the
    # whole corpus — one oracle, two names (see _e2_ivfpq_append_topk)
    out["e2_ivfpq_append_topk"] = out["e2_pq_adc_topk"]
    # round-6 rotation prep: tagged union of the 14 pytest-only TPC-H
    # oracles in the (op, k, v, v_num) suite schema
    _NS = "CAST(NULL AS VARCHAR)"
    _ND = "CAST(NULL AS DOUBLE)"
    out["q_tpch_suite"] = f"""
        SELECT 'q4' AS op, o_orderpriority AS k, {_NS} AS v,
               CAST(order_count AS DOUBLE) AS v_num
        FROM ({out["q4_order_priority"]})
        UNION ALL
        SELECT 'q6', 'revenue', {_NS}, CAST(revenue AS DOUBLE)
        FROM ({out["q6_forecast_revenue"]})
        UNION ALL
        SELECT 'q7', concat_ws('§', supp_nation, cust_nation,
                               CAST(l_year AS VARCHAR)),
               {_NS}, CAST(revenue AS DOUBLE)
        FROM ({out["q7_volume_shipping"]})
        UNION ALL
        SELECT 'q8', CAST(o_year AS VARCHAR), {_NS},
               CAST(mkt_share AS DOUBLE)
        FROM ({out["q8_market_share"]})
        UNION ALL
        SELECT 'q9', concat_ws('§', nation, CAST(o_year AS VARCHAR)),
               {_NS}, CAST(sum_profit AS DOUBLE)
        FROM ({out["q9_product_profit"]})
        UNION ALL
        SELECT 'q11', CAST(l_partkey AS VARCHAR), {_NS},
               CAST(part_value AS DOUBLE)
        FROM ({out["q11_important_parts"]})
        UNION ALL
        SELECT 'q12', l_returnflag, CAST(high_line_count AS VARCHAR),
               CAST(low_line_count AS DOUBLE)
        FROM ({out["q12_late_priority"]})
        UNION ALL
        SELECT 'q13', CAST(c_count AS VARCHAR), {_NS},
               CAST(custdist AS DOUBLE)
        FROM ({out["q13_order_count_distribution"]})
        UNION ALL
        SELECT 'q14', 'promo', {_NS}, CAST(promo_revenue AS DOUBLE)
        FROM ({out["q14_promo_revenue"]})
        UNION ALL
        SELECT 'q15', CAST(s_suppkey AS VARCHAR), s_name,
               CAST(total_revenue AS DOUBLE)
        FROM ({out["q15_top_supplier"]})
        UNION ALL
        SELECT 'q16', concat_ws('§', p_brand, p_type,
                                CAST(p_size AS VARCHAR)),
               {_NS}, CAST(supplier_cnt AS DOUBLE)
        FROM ({out["q16_supplier_counts"]})
        UNION ALL
        SELECT 'q19', 'revenue', {_NS}, CAST(revenue AS DOUBLE)
        FROM ({out["q19_disjunctive_revenue"]})
        UNION ALL
        SELECT 'q21', s_name, {_NS}, CAST(numwait AS DOUBLE)
        FROM ({out["q21_late_sole_supplier"]})
        UNION ALL
        SELECT 'q22', c_mktsegment, CAST(numcust AS VARCHAR),
               CAST(totacctbal AS DOUBLE)
        FROM ({out["q22_idle_customers"]})
    """
    # round 7: composed pretrain-prep oracle — the curation chain's
    # CTE prefix (everything up to its final verdict SELECT) plus a
    # kept-survivors CTE and the single-window packing reference the
    # e3_pack_sequences oracle uses, seq_len 512.
    _cur = out["pipeline_curate_corpus"]
    _head, _sep, _ = _cur.rpartition("SELECT s.doc_id, s.keep_c4")
    assert _sep, "curate oracle shape changed; update pretrain_prep"
    out["pipeline_pretrain_prep"] = _head + """
            , kept AS (
                SELECT s.doc_id, s.text
                FROM scr s
                JOIN qual q ON q.doc_id = s.doc_id
                LEFT JOIN keeper k ON k.text = s.text
                WHERE s.keep_c4 AND q.keep_quality
                  AND NOT coalesce(s.keep_c4 AND s.doc_id <> k.kid,
                                   false)
            ),
            tok AS (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS n_tokens
                FROM kept
            ),
            placed AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS start
                FROM tok
            )
            SELECT doc_id, n_tokens,
                   CAST(floor(start / 512.0) AS BIGINT) AS seq_first,
                   CAST(floor((start + n_tokens - 1) / 512.0)
                        AS BIGINT) AS seq_last,
                   CAST(start % 512 AS BIGINT) AS offset_in_first
            FROM placed
        """
    return out
