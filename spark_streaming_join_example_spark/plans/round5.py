"""Round-5 surface: recursive hierarchy traversal (WITH RECURSIVE over
a data-derived edge table — the date-spine variant lives in
advanced.q_recursive_cte), gaps-and-islands runs, CUSUM changepoint
scan, frequency-sketch top-k with an exact small-domain twin, and BFS
shortest-path hops (iterative DataFrame loop cross-checked against the
oracle's recursive CTE).

Determinism doctrine (unchanged from the rest of the registry): both
formulations compute arithmetic-identical results — integer math across
shuffle boundaries, explicit tie-breaks on every top-k/limit, and
column aliases identical on both sides.  Every query states its 100 TB
plan rationale in the docstring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.numeric import VALUE, exact_sum, oracle_exact_sum
from ..operators.graph import basket_pairs
from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: µs-truncated events CTE — identical to events_queries.EV_CTE (kept
#: local so this module reads standalone).
_EV = """
WITH ev AS (
  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
         user_id, event_type, value, props
  FROM events
)
"""


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE) — hierarchy traversal.
# ---------------------------------------------------------------------------


@register(
    "q_recursive_tree",
    tags=("P5", "J5"),
    oracle="""
WITH RECURSIVE nodes AS (
  SELECT DISTINCT p_partkey % 128 AS node FROM part
),
edges AS (
  SELECT node AS child, (node - 1) // 2 AS parent FROM nodes WHERE node > 0
),
t(node, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.child, t.depth + 1 FROM edges e JOIN t ON e.parent = t.node
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node
FROM t GROUP BY depth
""",
)
def q_recursive_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk: project part keys onto a 128-node
    binary-heap tree (child i → parent (i-1)//2) and compute each
    node's depth by iterating from the root, then aggregate per level.

    Scale rationale: Spark 4's recursive CTE executes as an iterative
    union of joins — exactly the same physical shape as the hand-rolled
    label-propagation loops in operators/graph.py, but declared in SQL.
    The per-step join is child-edges ⋈ frontier; with the frontier
    always ≪ edges, Catalyst broadcasts it, so each of the O(depth)
    steps is a scan + broadcast join, no shuffle of the big side.  The
    heap parent function is pure integer arithmetic ((node-1) div 2 ≡
    DuckDB // for node ≥ 1), so both engines walk the identical tree.
    """
    _t(spark, sf_dir, "part").createOrReplaceTempView("r5_part")
    return spark.sql(
        """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT p_partkey % 128 AS node FROM r5_part
),
edges AS (
  SELECT node AS child, (node - 1) div 2 AS parent FROM nodes WHERE node > 0
),
t(node, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.child, t.depth + 1 FROM edges e JOIN t ON e.parent = t.node
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node
FROM t GROUP BY depth
"""
    )


# ---------------------------------------------------------------------------
# Gaps and islands — consecutive-day runs.
# ---------------------------------------------------------------------------


@register(
    "q_islands",
    tags=("W2", "A1"),
    oracle=f"""
{_EV}
, d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM ev
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
)
SELECT user_id, CAST(MIN(day) AS BIGINT) AS start_day,
       CAST(MAX(day) AS BIGINT) AS end_day,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM r GROUP BY user_id, grp
""",
)
def q_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: for each user, collapse their distinct active
    days into maximal runs of consecutive days (day − row_number is
    constant within a run — the classic islands key), reporting each
    island's start/end/length — the streak/churn primitive.

    Scale rationale: one distinct (partial-aggregable) + one window
    sort per user partition + one groupBy — two shuffles total, all
    on the same (user) key, so AQE reuses the partitioning and no data
    moves twice.  Days are pure integers (µs-epoch div 86400000000 —
    both engines truncate toward zero for these positive epochs), so
    the island key is engine-exact with no interval arithmetic.
    """
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn("grp", F.col("day") - F.row_number().over(w))
    return (
        r.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint scan over each user's event stream.
# ---------------------------------------------------------------------------


@register(
    "q_cusum_changepoint",
    tags=("W3", "A1", "X5"),
    oracle=f"""
{_EV}
, m AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
  FROM ev
),
s AS (
  SELECT user_id, event_id, v,
         SUM(v) OVER w AS s_k,
         row_number() OVER w AS k,
         SUM(v) OVER (PARTITION BY user_id) AS s_n,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM m
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (
  SELECT user_id, k, n, ABS(n * s_k - k * s_n) AS dev,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ABS(n * s_k - k * s_n) DESC, k) AS rn
  FROM s
)
SELECT user_id, CAST(k AS BIGINT) AS change_at, CAST(n AS BIGINT) AS n_events,
       CAST(dev AS BIGINT) AS max_dev
FROM d WHERE rn = 1 AND n >= 20
""",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan: for each user with ≥20 events, find the
    prefix k maximizing |n·S_k − k·S_n| (the scaled cumulative
    deviation from the user's own mean — the classic CUSUM statistic
    with the mean division cleared to stay in integers).

    Scale rationale: one window sort per user partition computes the
    running sum, count, and per-user totals in a single exchange; the
    argmax is a group-limit rank over the same partitioning, so the
    whole scan is ONE shuffle of events by user_id.  All arithmetic is
    BIGINT on micro-unit values (|n·S_k| ≤ cnt²·3.3e8 — safe under
    2^63 up to ~5M events/user), so the changepoint position is
    identical in any engine at any partitioning.
    """
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wu = Window.partitionBy("user_id")
    s = m.select(
        "user_id",
        F.sum("v").over(w).alias("s_k"),
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("k"),
        F.sum("v").over(wu).alias("s_n"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    d = s.select(
        "user_id",
        "k",
        "n",
        F.abs(F.col("n") * F.col("s_k") - F.col("k") * F.col("s_n")).alias("dev"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("dev").desc(), F.col("k"))
    return (
        d.withColumn("rn", F.row_number().over(wr))
        .filter((F.col("rn") == 1) & (F.col("n") >= 20))
        .select(
            "user_id",
            F.col("k").alias("change_at"),
            F.col("n").alias("n_events"),
            F.col("dev").alias("max_dev"),
        )
    )


# ---------------------------------------------------------------------------
# Sketch top-k with an exact small-domain twin.
# ---------------------------------------------------------------------------


@register(
    "q_approx_topk_events",
    tags=("A3", "O2"),
    oracle=f"""
{_EV}
, c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1
)
SELECT event_type, cnt FROM c
ORDER BY cnt DESC, event_type LIMIT 3
""",
)
def q_approx_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters via the ``approx_top_k`` frequency sketch, with
    the returned (item, count) pairs re-ranked under a total order.
    The event-type domain is far below the sketch's tracked-item
    capacity (10⁴), so the sketch counts are provably exact and the
    plain GROUP BY top-3 oracle must match bit-for-bit.

    Scale rationale: approx_top_k is the single-pass, fixed-memory
    answer to "top sellers over 100 TB" — a partial-aggregable sketch
    per partition merged at the driver, no full groupBy shuffle of
    high-cardinality keys.  Registering it with an exact twin on a
    bounded domain keeps it inside the hash-compare gate instead of
    the weaker rows-only lane.
    """
    e = _t(spark, sf_dir, "events")
    # Ask the sketch for more items than the domain holds (5 types) so a
    # count tie AT the k-boundary is resolved by our explicit re-rank,
    # not by the sketch's unspecified tie order.
    sk = e.agg(F.expr("approx_top_k(event_type, 10)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("event_type"),
            F.col("x.count").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "event_type")
        .limit(3)
    )



# ---------------------------------------------------------------------------
# BFS shortest-path hops — iterative DataFrame loop vs recursive-CTE oracle.
# ---------------------------------------------------------------------------


@register(
    "q_bfs_hops",
    tags=("J5", "A1", "X2"),
    oracle="""
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
walk(node, d) AS (
  SELECT (SELECT MIN(u) FROM e), 0
  UNION
  SELECT e.v, walk.d + 1 FROM e JOIN walk ON e.u = walk.node WHERE walk.d < 3
)
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(d) AS INT) AS dist
FROM walk GROUP BY node
""",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path hops (≤3) from the smallest part key over the
    co-purchase graph (parts sharing an order).  The Spark side runs
    the textbook distributed BFS — per-level frontier expansion with an
    anti-join against the visited set — while the oracle declares the
    same traversal as a recursive CTE with set semantics; min-hop
    distances are traversal-order-independent, so both agree exactly.

    Scale rationale: the edge list is built once and persisted across
    the 3 expansion rounds (loop-invariant, same discipline as
    q_pagerank — the sweep driver clears the cache between queries).
    Each round shuffles only edges ⋈ frontier on the join key; the
    frontier and visited sets are ≤ |V| rows — broadcast-sized here and
    partitioned-join-sized at 100 TB, where this exact loop is how
    GraphFrames' BFS runs on 1000 executors.  The anti-join keeps the
    frontier minimal, so work per round tracks the UNVISITED boundary,
    not paths (the naive path-recursion blows up as deg^k).
    """
    from ..operators.graph import bfs_hops
    from .copurchase import copurchase_edges

    edges = copurchase_edges(spark, sf_dir)
    return bfs_hops(edges, max_depth=3).select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("int").alias("dist"),
    )

# ---------------------------------------------------------------------------
# MERGE / upsert — full-outer reconciliation of a change set into a target.
# ---------------------------------------------------------------------------


@register(
    "q_merge_upsert",
    tags=("J10", "P5", "U1"),
    oracle="""
WITH cents AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
src AS (
  SELECT o_orderkey AS k,
         CAST((c * 11 + 5) // 10 AS DOUBLE) / 100.0 AS new_price
  FROM cents WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000 AS k,
         CAST((c + 1) // 2 AS DOUBLE) / 100.0 AS new_price
  FROM cents WHERE o_orderkey % 100 = 7
)
SELECT COALESCE(t.o_orderkey, s.k) AS o_orderkey,
       COALESCE(s.new_price, t.o_totalprice) AS final_price,
       CASE WHEN t.o_orderkey IS NULL THEN 'insert'
            WHEN s.k IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM orders t FULL JOIN src s ON t.o_orderkey = s.k
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert as a full-outer reconciliation: a change set
    (10% of orders re-priced, plus brand-new keys) merges into the
    target — matched rows take the source price (`update`), unmatched
    source rows append (`insert`), everything else carries through
    (`keep`).

    Scale rationale: this is the engine-agnostic core of MERGE INTO —
    one full-outer equi-join on the key.  On a cluster, target and
    change set shuffle on the same key (or skip the shuffle entirely
    when the target is bucketed by it — see the bucketing plan test);
    per-row resolution is pure COALESCE/CASE, codegen'd, no UDF.  The
    re-pricing is integer cent math — (cents·11+5) div 10 is half-up
    ×1.1 — because ROUND(double, 2) is NOT cross-engine exact on ties
    (Spark rounds the full decimal expansion, DuckDB the scaled
    double); integer half-up is.
    """
    o = _t(spark, sf_dir, "orders")
    _cents = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
    upd = o.filter(F.expr("o_orderkey % 10 = 3")).select(
        F.col("o_orderkey").alias("k"),
        F.expr(f"CAST(({_cents} * 11 + 5) div 10 AS DOUBLE) / 100.0").alias(
            "new_price"
        ),
    )
    ins = o.filter(F.expr("o_orderkey % 100 = 7")).select(
        (F.col("o_orderkey") + 10_000_000).alias("k"),
        F.expr(f"CAST(({_cents} + 1) div 2 AS DOUBLE) / 100.0").alias("new_price"),
    )
    src = upd.unionByName(ins)
    t = o.select("o_orderkey", "o_totalprice")
    return t.join(src, t["o_orderkey"] == src["k"], "full_outer").select(
        F.coalesce(t["o_orderkey"], src["k"]).alias("o_orderkey"),
        F.coalesce(src["new_price"], t["o_totalprice"]).alias("final_price"),
        F.when(t["o_orderkey"].isNull(), F.lit("insert"))
        .when(src["k"].isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# SCD2 interval versioning from a change log.
# ---------------------------------------------------------------------------


@register(
    "q_scd2_intervals",
    tags=("W2", "P5", "FN-datetime"),
    oracle=f"""
{_EV}
, chg AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 1000000.0) AS BIGINT) // 50000000 AS tier
  FROM ev WHERE event_type = 'purchase'
)
SELECT user_id, CAST(tier AS BIGINT) AS tier, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL AS BOOLEAN) AS is_current
FROM chg
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn each user's purchase
    change log into versioned rows — every change opens a version at
    its timestamp and the next change closes it (``lead`` over the
    per-user timeline); the open-ended row is the current version.

    Scale rationale: SCD2 from a change log is ONE window pass
    partitioned by the dimension key — no self-join, no driver state.
    The tier derivation is integer division on micro-units (both
    engines truncate toward zero on non-negative values), so version
    boundaries are engine-exact.  At 100 TB the change log shuffles
    once on user_id; AQE handles hot keys, and the output is
    partition-local — the standard warehouse pattern for dimension
    history rebuilds.
    """
    e = _t(spark, sf_dir, "events")
    chg = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CAST(ROUND(value * 1000000.0) AS BIGINT) div 50000000"
        ).alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return chg.select(
        "user_id",
        "tier",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )

# ---------------------------------------------------------------------------
# Share-of-total contribution analysis (window over aggregate).
# ---------------------------------------------------------------------------


@register(
    "q_share_of_total",
    tags=("A1", "W3", "A4"),
    oracle="""
WITH agg AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rev_c * 1000000 // SUM(rev_c) OVER (PARTITION BY r_name)
            AS BIGINT) AS ppm_of_region,
       CAST(rev_c * 1000000 // SUM(rev_c) OVER () AS BIGINT) AS ppm_of_total
FROM agg
""",
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: each nation's revenue as parts-per-million
    of its region and of the grand total — the share-of-parent /
    share-of-total pattern behind every OLAP drill-down report.

    Scale rationale: the heavy work is one partial-aggregated groupBy
    over the fact join (dims broadcast); the shares are windows over
    the tiny AGGREGATE (25 rows), not over facts — the pattern that
    stays cheap at 100 TB because the window input is group-cardinality.
    Shares are integer ppm via BIGINT floor-division on exact cent
    sums: both engines truncate identically, no float ratio crosses
    the compare gate.
    """
    _t(spark, sf_dir, "orders").createOrReplaceTempView("r5_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("r5_customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("r5_nation")
    _t(spark, sf_dir, "region").createOrReplaceTempView("r5_region")
    # BIGINT envelope: rev_c·1e6 ≤ ~2e18 at sf0.1 — fits int64 with
    # ~4× headroom; past ~sf0.3 drop to basis points (1e4) like the
    # other documented ppm envelopes.
    return spark.sql(
        """
WITH agg AS (
  SELECT r_name, n_name,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM r5_orders
  JOIN r5_customer ON o_custkey = c_custkey
  JOIN r5_nation ON c_nationkey = n_nationkey
  JOIN r5_region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rev_c * 1000000 div SUM(rev_c) OVER (PARTITION BY r_name)
            AS BIGINT) AS ppm_of_region,
       CAST(rev_c * 1000000 div SUM(rev_c) OVER () AS BIGINT) AS ppm_of_total
FROM agg
"""
    )

# ---------------------------------------------------------------------------
# Point-in-time (temporal) join: facts → dimension version valid at fact time.
# ---------------------------------------------------------------------------


@register(
    "q_point_in_time_join",
    tags=("J7", "J8", "W2"),
    oracle=f"""
{_EV}
, raw AS (
  SELECT user_id, ts AS valid_from, event_id,
         CAST(ROUND(value * 1000000.0) AS BIGINT) // 50000000 AS tier,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS dup
  FROM ev WHERE event_type = 'purchase'
),
ver AS (SELECT user_id, valid_from, tier FROM raw WHERE dup = 1),
clicks AS (
  SELECT event_id AS click_id, user_id, ts FROM ev
  WHERE event_type = 'click'
),
m AS (
  SELECT c.click_id, c.user_id, c.ts, v.tier, v.valid_from,
         row_number() OVER (PARTITION BY c.click_id
                            ORDER BY v.valid_from DESC) AS rn
  FROM clicks c JOIN ver v
    ON c.user_id = v.user_id AND v.valid_from <= c.ts
)
SELECT click_id, user_id, ts, CAST(tier AS BIGINT) AS tier_at_click
FROM m WHERE rn = 1
""",
)
def q_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each click picks up the dimension version
    (the user's purchase-derived spend tier, cf. q_scd2_intervals)
    valid AT the click's event time — the temporal-correctness join
    every feature store and SCD2 lookup needs (joining the CURRENT
    version instead leaks future information into training data).

    Implemented with the repo's as-of join operator (backward
    direction: latest version with valid_from ≤ click ts, ties broken
    by version id).  Scale rationale: the as-of kernel is a
    union-tagged single sort per user partition — one shuffle of both
    inputs on the entity key, no interval explosion; the oracle's
    row_number-over-candidates formulation is the O(clicks×versions)
    shape this operator avoids.
    """
    from ..operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    raw = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.expr(
            "CAST(ROUND(value * 1000000.0) AS BIGINT) div 50000000"
        ).alias("tier"),
    )
    # one version per (user, instant): the as-of kernel's tie order on
    # equal right timestamps is unspecified, so collapse ties upstream
    w_dup = Window.partitionBy("user_id", "valid_from").orderBy(
        F.col("event_id").desc()
    )
    ver = (
        raw.withColumn("dup", F.row_number().over(w_dup))
        .filter(F.col("dup") == 1)
        .select(F.col("user_id").alias("v_user"), "valid_from", "tier")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    j = asof_join(
        clicks,
        ver,
        left_on="user_id",
        right_on="v_user",
        left_ts="ts",
        right_ts="valid_from",
        how="inner",
        direction="backward",
    )
    return j.select("click_id", "user_id", "ts", F.col("tier").alias("tier_at_click"))

# ---------------------------------------------------------------------------
# Graph degree profile + degree assortativity (integer-moment Pearson).
# ---------------------------------------------------------------------------

_CO_EDGES_SQL = """
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""


@register(
    "q_graph_degrees",
    tags=("A1", "J5", "X2"),
    oracle=f"""
WITH e AS ({_CO_EDGES_SQL}),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY u)
SELECT CAST(deg // 32 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(deg) AS BIGINT) AS min_deg,
       CAST(MAX(deg) AS BIGINT) AS max_deg,
       CAST(SUM(deg) AS BIGINT) AS sum_deg
FROM deg GROUP BY 1
""",
)
def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree profile of the co-purchase graph: per 32-degree bucket,
    how many nodes and their degree mass — the first diagnostic run on
    any production graph (it is what tells you whether triangle/join
    kernels need skew handling).

    Scale rationale: degrees are one partial-aggregated groupBy over
    the distinct edge list; the histogram is a second groupBy over
    node-cardinality data.  Everything is BIGINT (deg div 32 ≡ DuckDB
    // on non-negatives), so the histogram is partition-count exact.
    """
    from .copurchase import copurchase_edges

    e = copurchase_edges(spark, sf_dir)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.groupBy(F.expr("CAST(deg div 32 AS BIGINT)").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
            F.sum("deg").alias("sum_deg"),
        )
    )


@register(
    "q_assortativity",
    tags=("A1", "J5", "FN-math"),
    oracle=f"""
WITH e AS ({_CO_EDGES_SQL}),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY u),
pairs AS (
  SELECT du.deg AS x, dv.deg AS y
  FROM e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
  FROM pairs
)
SELECT n AS n_edges,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
             / sqrt(CAST(n*syy - sy*sy AS DOUBLE)), 8) AS assortativity
FROM mom
""",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity: the Pearson correlation of endpoint
    degrees over every directed edge — do hubs link to hubs?  Computed
    from exact BIGINT moments with the final expression written
    term-for-term identically in both engines (the doubles are built
    FROM exact integers right before the one divide/sqrt chain, the
    round-4 anomaly-zscore recipe).

    Scale rationale: endpoint degrees are annotated IN PLACE with two
    unordered COUNT windows (partitionBy u, then v) — two keyed
    exchanges of the edge list, zero joins, then a single 6-sum
    partial aggregate with constant state.  The window chain consumes
    the edge list exactly ONCE, so no lineage pin is needed either —
    unlike the degree-table + two-join formulation this replaced,
    which fed the self-join edge build to three consumers (Catalyst
    does not reuse the subtree) and so rebuilt the most expensive
    relation 3x.  Measured at sf0.1 warm, fresh plan per run:
    join-form 5.0 s → window-form 3.9 s (the residual floor is the
    edge build itself).  BIGINT envelope: n·Σxy ≤ ~4e18 at sf0.1
    (documented; past that, scale degrees by div 4 first like the
    other fixed-point envelopes).
    """
    from pyspark.sql import Window

    from .copurchase import copurchase_edges

    # same distinct directed co-purchase relation as the other graph
    # kernels (bench-scoped shared build; identical plan when off)
    e = copurchase_edges(spark, sf_dir)
    pairs = (
        e.withColumn("x", F.count(F.lit(1)).over(Window.partitionBy("u")))
        .withColumn("y", F.count(F.lit(1)).over(Window.partitionBy("v")))
        .select("x", "y")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return mom.select(
        F.col("n").alias("n_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
            8,
        ).alias("assortativity"),
    )
