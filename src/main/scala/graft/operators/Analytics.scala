package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SafeRound.round

import graft.Tables

/** Core relational analytics: the engine must still be a real SQL
  * engine under the vector layer. TPC-H-shaped aggregates/joins plus
  * event-log operators (tumbling windows, sessionization, JSON props).
  *
  * Scale notes (100 TB):
  *  - dims (region/nation/supplier) are broadcast — no shuffle of the
  *    fact side for those joins; fact⋈fact shuffles on the join key
  *    and AQE handles skew/coalescing.
  *  - every aggregate here is partial-aggregation friendly (sum/count/
  *    min/max), so map-side combine bounds shuffle volume.
  *  - top-k uses `orderBy().limit(k)` which Spark plans as
  *    TakeOrderedAndProject (per-partition heaps, no global sort).
  *  - all float outputs are rounded and every query ends in a total
  *    order with unique tie-break → deterministic across engines.
  */
object Analytics {

  private val CUT = "1998-01-01"

  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit(CUT).cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit(CUT).cast("timestamp"))
    // customer is small at every SF relative to the facts → broadcast;
    // orders⋈lineitem shuffles on the order key.
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val l = Tables.lineitem(s, dir)
    val rev = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("p_brand"), col("rnk"))
  }

  def qWindowSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    l.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .filter(col("rn") <= 5)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Hierarchical totals via ROLLUP grouping sets (subtotal + grand
    * total rows), the standard reporting shape. */
  def q1Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact interpolated percentiles per event type (Spark `percentile`
    * == DuckDB `quantile_cont`, both linear interpolation). */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  def qEventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 4).as("avg_value"))
      .orderBy("hour", "event_type")

  def qEventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").cast("long").as("sec"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    e.withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("duration_sec"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "sess_id")
  }

  /** RANGE-frame window (value-based frames, vs the ROWS frames used
    * elsewhere): per event, activity of the same user in the
    * PRECEDING 10 MINUTES of event time — frame membership is defined
    * by the sec value, so ties are all-in and no tie-break is needed. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").cast("long").as("sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-600, 0)
    e.withColumn("n_10min", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_10min", round(sum("value").over(w), 2))
      .select(col("event_id"), col("user_id"), col("sec"), col("n_10min"), col("sum_10min"))
      .orderBy("event_id")
  }

  /** Sessionization through Spark's NATIVE session_window (gap-merge
    * windows, the same construct the streaming engine uses for
    * stateful session aggregation). Semantics differ from the
    * lag-based qEventsSessionize at the exact-gap boundary: a new
    * session starts at gap ≥ 30 min (session_window merges only
    * strictly-within-gap events); the oracle mirrors that. */
  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").cast("long").as("sess_start_sec"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start_sec")

  /** Per-user value totals via a two-phase *salted* aggregation — the
    * standard defense when a grouping key is pathologically skewed
    * (one user = 30% of events): phase 1 groups on (key, salt) so the
    * hot key spreads over 8 reducers; phase 2 combines the 8 partials.
    * Results are identical to the direct groupBy (the oracle runs the
    * plain form). */
  def qUserSalted(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("pn"), sum("value").as("pv"))
      .groupBy("user_id")
      .agg(sum("pn").as("n_events"), round(sum("pv"), 2).as("sum_value"))
      .orderBy("user_id")

  /** AS-OF join — an operator Spark lacks natively, composed from
    * existing ops (preference (a) of the build rules): each `error`
    * event is matched to the same user's most recent `purchase` at or
    * before it. Union the two streams tagged, sort per user by time,
    * carry the last purchase forward with last(ignoreNulls) — one
    * shuffle on user_id, no range join blowup. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts").cast("long").as("sec"))
      .filter(col("event_type").isin("error", "purchase"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("purch_sec",
        last(when(col("event_type") === "purchase", col("sec")), ignoreNulls = true).over(byUser))
      .withColumn("purch_value",
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "error" && col("purch_sec").isNotNull)
      .select(col("event_id"), col("user_id"),
        (col("sec") - col("purch_sec")).as("gap_sec"),
        round(col("purch_value"), 2).as("purch_value"))
      .orderBy("event_id")
  }

  def qEventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type", "k_bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_window_supplier" -> (qWindowSupplier _),
    "q_events_hourly" -> (qEventsHourly _),
    "q_events_sessionize" -> (qEventsSessionize _),
    "q_session_window" -> (qSessionWindow _),
    "q_window_range" -> (qWindowRange _),
    "q_events_json" -> (qEventsJson _),
    "q_user_salted" -> (qUserSalted _),
    "q_asof_join" -> (qAsofJoin _),
    "q1_rollup" -> (q1Rollup _),
    "q_percentiles" -> (qPercentiles _))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(1e-9 + sum(l_quantity), 2) AS sum_qty,
        |  round(1e-9 + sum(l_extendedprice), 2) AS sum_base_price,
        |  round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(1e-9 + sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(1e-9 + avg(l_quantity), 4) AS avg_qty,
        |  round(1e-9 + avg(l_extendedprice), 4) AS avg_price,
        |  round(1e-9 + avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_topk_per_group" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey,
        |    round(1e-9 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
        |FROM rev QUALIFY rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q_window_supplier" ->
      """SELECT l_suppkey, rn, l_orderkey, running_qty FROM (
        |  SELECT l_suppkey, l_orderkey,
        |    row_number() OVER w AS rn,
        |    round(1e-9 + sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  round(1e-9 + sum(value), 2) AS sum_value,
        |  round(1e-9 + avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM e)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS sess_id
        |  FROM marked)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  max(sec) - min(sec) AS duration_sec,
        |  round(1e-9 + sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    "q_user_salted" ->
      """SELECT user_id, count(*) AS n_events, round(1e-9 + sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id, sec,
        |  count(*) OVER w AS n_10min,
        |  round(1e-9 + sum(value) OVER w, 2) AS sum_10min
        |FROM (SELECT event_id, user_id, value,
        |        epoch_ns(ts) // 1000000000 AS sec
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // session_window semantics: merge iff gap < 30 min (µs precision);
    // session start = min event time, truncated to seconds on output
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e)),
        |s AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, min(us) // 1000000 AS sess_start_sec,
        |  count(*) AS n_events, round(1e-9 + sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_sec""".stripMargin,
    "q1_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  round(1e-9 + sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(1e-9 + quantile_cont(value, 0.5), 4) AS p50,
        |  round(1e-9 + quantile_cont(value, 0.9), 4) AS p90,
        |  round(1e-9 + quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_ns(ts) // 1000000000 AS sec
        |  FROM events WHERE event_type IN ('error', 'purchase')),
        |c AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type = 'purchase' THEN sec END IGNORE NULLS)
        |      OVER w AS purch_sec,
        |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |      OVER w AS purch_value
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, sec - purch_sec AS gap_sec,
        |  round(1e-9 + purch_value, 2) AS purch_value
        |FROM c WHERE event_type = 'error' AND purch_sec IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        |  count(*) AS n, round(1e-9 + sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
