"""Relational addendum operators (SURVEY §2.3/2.4/2.6/2.7).

The reference's only join family is time-index alignment (``alignment.py``);
the harness additionally requires general relational coverage over the
TPC-H-ish fixtures.  Everything here is a Spark built-in — the work is in
oracle parity (decimal-exact sums, deterministic LIMIT tiebreaks).

Scale notes: dimension joins broadcast explicitly; fact-fact joins are
left to AQE (sort-merge w/ skew split); aggregates rely on partial
(map-side) aggregation, which Catalyst applies automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.registry import register
from gordo_components_spark.sources.tables import load_table


# predicates shared by the per-variant joins AND join_variants' union
# face (one definition so the face can't silently diverge from the
# variants it claims to mirror)
_BIG_ORDER = 100000  # o_totalprice threshold (semi join)
_URGENT = "1-URGENT"  # o_orderpriority (anti join)
_THETA_DAYS = 30  # range-theta join interval


def _dsum(expr: str, alias: str, scale: int = 8) -> "F.Column":
    """Exact cross-engine SUM: per-row double arithmetic is bit-identical
    across engines; route the accumulation through DECIMAL so summation
    order can't change the result, then back to DOUBLE.  Safe while the
    decimal's numerator fits ~2^53; beyond that use :func:`_dsum_cents`
    (engines' DECIMAL→DOUBLE conversions diverge by 1 ulp)."""
    return F.expr(f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)").alias(alias)


def _osum(expr: str, alias: str, scale: int = 8) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE) AS {alias}"


def _sum_cents_expr(expr: str) -> str:
    """Alias-less integer-cents SUM fragment (the one definition of the
    cents convention — round-6 dedup of 7+ hand-inlined copies, two of
    which did ``rsplit(' AS x')`` alias surgery on :func:`_osum_cents`
    output to get this fragment back)."""
    return f"CAST(round(SUM(CAST({expr} AS DECIMAL(30,8))), 2) * 100 AS BIGINT)"


def _dsum_cents(expr: str, alias: str) -> "F.Column":
    """Money aggregate as exact integer cents: immune to DECIMAL→DOUBLE
    conversion ulp at any magnitude (found at sf0.1: 7.5e9 sums differed
    in the last ulp between engines)."""
    return F.expr(_sum_cents_expr(expr)).alias(alias)


def _osum_cents(expr: str, alias: str) -> str:
    return f"{_sum_cents_expr(expr)} AS {alias}"


def _fshift_expr(expr: str) -> str:
    """floor-shift HALF-UP rounding to 6 dp, alias-less SQL fragment:
    ``floor(x·10⁶ + 0.5)/10⁶`` is bit-identical across engines given
    exact inputs, whereas round() half-tie algorithms differ (Spark
    rounds the shortest decimal repr, DuckDB multiplies) — registry
    docstring convention, promoted here from tpch.py in round 6."""
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000"


def _fshift(expr: str, alias: str) -> str:
    return f"{_fshift_expr(expr)} AS {alias}"


def _fshift_col(col: "F.Column") -> "F.Column":
    """Column-API variant of :func:`_fshift_expr`."""
    return F.floor(col * 1000000 + 0.5) / 1000000


# --- 2.4 aggregations ------------------------------------------------------

@register(
    "agg_groupby_sum",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity', 'sum_qty', scale=0)},
           {_osum_cents('l_extendedprice', 'sum_base_price_cents')},
           {_osum_cents('l_extendedprice * (1 - l_discount)', 'sum_disc_price_cents')},
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("bench",),
)
def agg_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style hash aggregate (map-side partial agg, one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        # scale 0: l_quantity is integral; scale 8's numerator would
        # cross the ~2^53 DECIMAL→DOUBLE ulp cliff near sf1
        _dsum("l_quantity", "sum_qty", scale=0),
        _dsum_cents("l_extendedprice", "sum_base_price_cents"),
        _dsum_cents("l_extendedprice * (1 - l_discount)", "sum_disc_price_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT 'orders:' || o_orderstatus AS grp,
           COUNT(DISTINCT o_custkey) AS n_d1,
           CAST(0 AS BIGINT) AS n_d2,
           COUNT(*) AS n_rows
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'lineitem:' || l_returnflag AS grp,
           COUNT(DISTINCT l_partkey) AS n_d1,
           COUNT(DISTINCT l_suppkey) AS n_d2,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under AQE),
    consolidated SURVEY §2.4 face: the orders leg is the plain exact
    COUNT(DISTINCT); the lineitem leg is the cardinality-estimation
    surface declared exact on both engines (the 100 TB path swaps in
    approx_count_distinct(rsd) — same plan shape; the per-variant
    ``agg_approx_cd`` form stays registered past the witness window)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders_leg = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_d1"),
        F.lit(0).cast("long").alias("n_d2"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.concat(F.lit("orders:"), F.col("o_orderstatus")).alias("grp"),
        "n_d1", "n_d2", "n_rows",
    )
    lineitem_leg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_d1"),
        F.countDistinct("l_suppkey").alias("n_d2"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.concat(F.lit("lineitem:"), F.col("l_returnflag")).alias("grp"),
        "n_d1", "n_d2", "n_rows",
    )
    return orders_leg.unionByName(lineitem_leg)


@register(
    "agg_approx_cd",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality estimation surface; declared with *exact* distinct on
    both sides per SURVEY §2.4 (approx_count_distinct isn't oracle-stable).
    The 100 TB path swaps in approx_count_distinct(rsd) — same plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           {_osum('l_quantity', 'sum_qty', scale=0)},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (Expand operator; single shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        # scale 0: l_quantity is integral; scale 8's numerator would
        # cross the ~2^53 DECIMAL→DOUBLE ulp cliff near sf1
        _dsum("l_quantity", "sum_qty", scale=0),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: salt the hot key into 8 sub-keys, partial
    aggregate per (key, salt), then merge — the manual form of what AQE's
    skew handling does for joins, needed for aggregations when one key
    holds a large share of a 100 TB table.  Decimal partials make the
    two-stage result bit-identical to the direct aggregation (the
    oracle is the UNsalted query — same answer is the point)."""
    ev = load_table(spark, sf_dir, "events")
    partial = ev.groupBy("event_type", (F.col("event_id") % 8).alias("salt")).agg(
        F.expr("SUM(CAST(value AS DECIMAL(30,8)))").alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.expr("CAST(SUM(s) AS DOUBLE)").alias("total_value"),
    )


# --- 2.3 joins -------------------------------------------------------------

@register(
    "join_equi_inner",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {_osum_cents('o_totalprice', 'revenue_cents')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("bench",),
)
def join_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim equi join; the dim side broadcasts via AQE's size
    threshold (no fact shuffle at bench SF) — customer GROWS with the
    scale factor, so the hint is deliberately NOT forced: at 100 TB the
    same plan degrades to a shuffle join instead of a multi-GB
    broadcast (tpch.py broadcast policy)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), _dsum_cents("o_totalprice", "revenue_cents"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > {_BIG_ORDER})
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with any big order."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > _BIG_ORDER)
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '{_URGENT}')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no urgent orders."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == _URGENT)
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_range_theta",
    oracle=f"""
    SELECT o_orderkey, COUNT(*) AS n_late
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL {_THETA_DAYS} DAY
    GROUP BY o_orderkey
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + non-equi range residual (ship >30 days after order).
    The equi conjunct keeps it a hash/sort-merge join — never a cartesian."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr(f"INTERVAL {_THETA_DAYS} DAYS")
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_late"))


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("bench",),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17 tag→asset dimension lookup restated: snowflake dims broadcast
    (reference ``dataset/sensor_tag.py::normalize_sensor_tags``)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "join_variants",
    oracle=f"""
    SELECT 'equi_inner' AS variant, c_mktsegment AS grp,
           COUNT(*) AS n, {_osum_cents('o_totalprice', 'cents')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'left_outer' AS variant,
           CASE WHEN n_orders = 0 THEN 'zero_orders' ELSE 'has_orders' END AS grp,
           COUNT(*) AS n, CAST(0 AS BIGINT) AS cents
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON o_custkey = c_custkey
          GROUP BY c_custkey)
    GROUP BY 2
    UNION ALL
    SELECT 'semi' AS variant, c_mktsegment AS grp,
           COUNT(*) AS n, CAST(0 AS BIGINT) AS cents
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > {_BIG_ORDER})
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti' AS variant, c_mktsegment AS grp,
           COUNT(*) AS n, CAST(0 AS BIGINT) AS cents
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '{_URGENT}')
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'range_theta' AS variant, o_orderpriority AS grp,
           COUNT(*) AS n, CAST(0 AS BIGINT) AS cents
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL {_THETA_DAYS} DAY
    GROUP BY o_orderpriority
    """,
)
def join_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated SURVEY §2.3 addendum face: one witnessed query per
    join strategy — broadcast-hash equi inner, null-preserving left
    outer, left-semi (EXISTS), left-anti (NOT EXISTS), and equi+range
    theta residual.  Each leg aggregates to a compact (variant, grp, n,
    cents) row set so every join's row-routing is value-witnessed.  The
    per-variant queries (``join_equi_inner`` …) stay registered for the
    replica; plan shapes (broadcast, no-cartesian) are guarded in
    tests/test_plan_properties.py."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("long").alias("cents")

    equi = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"), _dsum_cents("o_totalprice", "cents"))
        .select(F.lit("equi_inner").alias("variant"), "grp", "n", "cents")
    )
    left = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy(
            F.when(F.col("n_orders") == 0, F.lit("zero_orders"))
            .otherwise(F.lit("has_orders"))
            .alias("grp")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("left_outer").alias("variant"), "grp", "n", zero)
    )
    big = o.where(F.col("o_totalprice") > _BIG_ORDER)
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("semi").alias("variant"), "grp", "n", zero)
    )
    urgent = o.where(F.col("o_orderpriority") == _URGENT)
    anti = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("anti").alias("variant"), "grp", "n", zero)
    )
    theta_cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr(f"INTERVAL {_THETA_DAYS} DAYS")
    )
    theta = (
        o.join(li, theta_cond)
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("range_theta").alias("variant"), "grp", "n", zero)
    )
    return equi.unionByName(left).unionByName(semi).unionByName(anti).unionByName(theta)


# --- 2.6 sorts / limits ----------------------------------------------------

@register(
    "sort_by_ts",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    """,
)
def sort_by_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O26 timestamp-ordered sequencing. Partitioned by machine (user_id)
    so the sort is shuffle-parallel — a single global ORDER BY would
    serialize on one partition at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            "CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)"
        ).alias("seq"),
    )


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27 top-k: TakeOrderedAndProject (per-partition heap + driver merge,
    no full sort). Unique o_orderkey tiebreak makes the k-set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


# --- 2.7 set operations ----------------------------------------------------

@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (no shuffle — pure concatenation)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")).unionByName(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    )


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics on both engines)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with open but no finished orders."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    fin = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_.subtract(fin)


@register(
    "set_ops",
    oracle="""
    SELECT 'union:customer' AS variant, c_nationkey AS key FROM customer
    UNION ALL
    SELECT 'union:supplier' AS variant, s_nationkey AS key FROM supplier
    UNION ALL
    SELECT 'intersect' AS variant, nationkey AS key FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS variant, custkey AS key FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated SURVEY §2.7 face: UNION ALL (pure concatenation, no
    shuffle), INTERSECT and EXCEPT (distinct semantics, hash-partitioned
    on the full row) witnessed in one query; per-variant forms
    (``set_union``/``set_intersect``/``set_except``) stay registered for
    the replica."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    cn = c.select(F.col("c_nationkey").alias("key"))
    sn = s.select(F.col("s_nationkey").alias("key"))
    union_leg = cn.select(F.lit("union:customer").alias("variant"), "key").unionByName(
        sn.select(F.lit("union:supplier").alias("variant"), "key")
    )
    intersect_leg = cn.intersect(sn).select(F.lit("intersect").alias("variant"), "key")
    open_ = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    fin = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    except_leg = open_.subtract(fin).select(F.lit("except").alias("variant"), "key")
    return union_leg.unionByName(intersect_leg).unionByName(except_leg)
