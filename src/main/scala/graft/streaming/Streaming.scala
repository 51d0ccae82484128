package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SafeRound.round
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming pipelines over the events stream.
  *
  * The batch analytics in Analytics.scala answer "what happened"; these
  * answer the same questions continuously. `Trigger.AvailableNow`
  * drains the parquet backlog as a bounded stream, which is also how
  * the correctness gate runs them deterministically: `stream_hourly`
  * must produce byte-identical results to the batch q_events_hourly
  * oracle.
  *
  * Scale notes: the tumbling-window agg is keyed on (window,
  * event_type) — state is bounded by #windows × #types, partial
  * aggregation applies upstream of the shuffle, and a watermark (used
  * in the append-mode variant) bounds state retention for true
  * unbounded streams. Sessionization keeps one state object per
  * user_id with an event-time timeout — the standard
  * flatMapGroupsWithState topology.
  */
object Streaming {

  /** Raw event row as read from the stream (ns epoch already
    * normalized to a microsecond timestamp). */
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionAgg(user_id: Long, n_events: Long, sum_value: Double)

  /** Collect a memory-sink table into a local frame and drop the view,
    * so repeated runs don't accumulate result copies in the catalog.
    * For DICTIONARY-SIZED results only (bounded by the group space —
    * windows × types, routes, segments): the collect transits the
    * driver. Corpus-proportional results (one row per session, per
    * joined pair, per window×user) drain through [[drainToParquet]]
    * instead. */
  private def drainMemorySink(s: SparkSession, name: String): DataFrame = {
    val src = s.table(name)
    val rows = src.collect()
    val schema = src.schema
    s.catalog.dropTempView(name)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Drain a bounded stream through a foreachBatch PARQUET sink (the
    * stream_quality_route pattern) and read the result back as a
    * distributed frame — for corpus-proportional outputs, where a
    * memory sink would collect the whole result to the driver. Append
    * mode appends each micro-batch; Complete mode overwrites with the
    * full state each trigger, so the final batch's rewrite is the
    * answer. Checkpoint and sink live under a wiped fixed scratch
    * path (stale appends would double-count; temp dirs would leak) —
    * the returned LAZY frame is therefore valid until the next run of
    * the same (query, dir), the same at-rest contract as the other
    * fixed-path sinks (DedupStream.candidates, qualityRoute); a
    * caller holding results across runs materializes them. A drain
    * that fired zero batches (empty source glob) returns an empty
    * frame of the stream's schema, like the memory sink did. */
  private def drainToParquet(df: DataFrame, mode: OutputMode, tag: String,
      dir: String): DataFrame = {
    val s = df.sparkSession
    val root = graft.functions.Scratch.fresh(tag, dir)
    val out = s"$root/out"
    val writeMode = if (mode == OutputMode.Complete()) "overwrite" else "append"
    val q = df.writeStream
      .outputMode(mode)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode(writeMode).parquet(out)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // zero-batch detection through the path's OWN FileSystem, not
    // java.io.File (ADVICE r10): Scratch is local here, but a
    // non-local default FS would make the File check report "missing"
    // despite data (empty frame returned over a real drain) or fail
    // the read — resolve existence wherever the path actually lives.
    if (!graft.functions.Scratch.exists(s, out))
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), df.schema)
    // explicit schema (ADVICE r17): a drain whose batches all had zero
    // rows leaves a dir with no data files, and schema INFERENCE would
    // throw where the stream's own schema reads it as a typed empty
    // frame (and skips the footer read on the normal path too).
    else s.read.schema(df.schema).parquet(out)
  }

  /** Run a stateful streaming query with its state-partition count
    * sized from the STREAM's input bytes (same bytes/128MiB rule the
    * batch session uses, floored at 8) instead of the batch
    * shuffle-partition count. Stateful operators inherit the
    * shuffle-partition conf at query start and every state partition
    * pays a fixed per-micro-batch checkpoint cost (delta + commit file
    * per store per batch), so over-partitioning a small stream buys
    * pure overhead — while a 100 TB stream still gets bytes-driven
    * fan-out. The conf is restored before returning (batch queries on
    * the session keep their own sizing).
    *
    * No-data micro-batches are disabled for the wrapped drain (r18):
    * Spark fires an extra ZERO-ROW batch after the last data batch
    * solely to advance the watermark and evict state, and that batch
    * reloads every state-store partition to do it — measured 1.6 s of
    * the 4.9 s stream_dedup wall and 1.7 s of the 7.8 s
    * stream_interval_join wall (StreamProbe, sf0.1: batch 1 rows=0,
    * addBatch 1.3–1.4 s). None of the operators here need it for their
    * OUTPUT: complete-mode sinks re-emit full state on every data
    * batch, dropDuplicates emits first-seen rows immediately, inner
    * stream-stream joins emit matches in the batch that completes
    * them, and flatMapGroupsWithState runs with NoTimeout — the
    * watermark only governs state EVICTION, which a bounded
    * AvailableNow drain ends by terminating. (A watermark-SEALED
    * append sink — hourlyWatermarked's shape — DOES need the final
    * advance; that one re-enables the flag inside its own body.)
    * Oracle-checked: all wrapped drains hash-match their batch
    * oracles at every SF with the flag off. */
  private[streaming] def withStatePartitions[T](s: SparkSession, inputPath: String)(body: => T): T = {
    val k = "spark.sql.shuffle.partitions"
    val kNoData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val old = s.conf.get(k)
    val oldNoData = s.conf.get(kNoData)
    val bytes = graft.GraftSession.dirBytes(inputPath)
    val sized = math.max(8L, bytes / graft.GraftSession.TargetPartitionBytes)
      .min(graft.GraftSession.MaxShufflePartitions.toLong).toString
    s.conf.set(k, sized)
    s.conf.set(kNoData, "false")
    try body finally {
      s.conf.set(k, old)
      s.conf.set(kNoData, oldNoData)
    }
  }

  /** events.parquet as a bounded file stream with normalized ts. */
  def eventStream(s: SparkSession, dir: String): DataFrame = {
    val batchSchema = graft.Tables.table(s, dir, "events").schema
    // file-stream sources take a directory; the sf dir holds every
    // table, so glob-filter down to the events file(s).
    val raw = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // watermarks require an instant TimestampType; naive micros are
        // UTC wall time (sessions pin spark.sql.session.timeZone=UTC).
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour windows by event type — streaming twin of
    * Analytics.qEventsHourly. Complete mode so the bounded drain
    * emits every window (the unbounded deployment would use the
    * watermarked append variant below). */
  def hourly(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    val agg = eventStream(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 4).as("avg_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"), col("avg_value"))
    val name = s"stream_hourly_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drainMemorySink(s, name).orderBy("hour", "event_type")
  }

  /** Watermarked append-mode variant (the unbounded-stream shape):
    * late data beyond 30 min is dropped, state is evicted per
    * watermark advance. Only windows sealed by the final watermark
    * are emitted, so this is spec-tested rather than oracle-diffed. */
  def hourlyWatermarked(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    // the ONE drain here whose OUTPUT depends on the final watermark
    // advance: append mode emits a window only once the watermark
    // seals it, and on a bounded drain that seal happens in the
    // trailing no-data batch — re-enable it for this query only
    // (withStatePartitions turns it off for the eviction-only drains).
    val kNoData = "spark.sql.streaming.noDataMicroBatches.enabled"
    s.conf.set(kNoData, "true")
    val agg = eventStream(s, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    val name = s"stream_hourly_wm_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drainMemorySink(s, name).orderBy("hour", "event_type")
  }

  /** Streaming trending top-k: per tumbling hour, the 5 most active
    * users. The STREAMING stage is the windowed count — state bounded
    * by #windows × #users, partial-agg upstream of the shuffle; the
    * top-k rank runs on the drained (already tiny, one row per
    * window×user) aggregate, exactly where a production job would put
    * it (per-trigger foreachBatch rank over updated windows — window
    * functions are not available inside a streaming plan by design).
    * Ties break on user_id in both engines. */
  def trending(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    import org.apache.spark.sql.expressions.Window
    val agg = eventStream(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("user_id"), col("n"))
    // windows × users rows — corpus-proportional, so the drain goes
    // through the parquet sink and the rank runs distributed on the
    // read-back (never through the driver)
    val w = Window.partitionBy(col("hour")).orderBy(col("n").desc, col("user_id"))
    drainToParquet(agg, OutputMode.Complete, "trending", dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .orderBy("hour", "rnk")
  }

  /** Stream-static enrichment join: the event stream joined to a
    * broadcast dimension (customer segment), then aggregated — the
    * standard streaming-enrichment topology (dim broadcast per
    * micro-batch, no stream-side shuffle before the agg). */
  def enrich(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventStream(s, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val name = s"stream_enrich_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drainMemorySink(s, name).orderBy("c_mktsegment", "event_type")
  }

  /** Stateful sessionization with flatMapGroupsWithState: one state
    * object per user, closed on a 30-minute event-time gap. Emits
    * (user_id, n_events, sum_value) per closed session plus the final
    * open one at drain end. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    import s.implicits._
    val evs: Dataset[Ev] = eventStream(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]

    // repo rounding convention (SafeRound): +1e-9 then HALF_UP
    def r2(v: Double): Double =
      BigDecimal(v + 1e-9).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fn(userId: Long, rows: Iterator[Ev],
        state: GroupState[List[(Long, Double)]]): Iterator[SessionAgg] = {
      // batch-drain semantics: all of a user's events arrive in one
      // group; split into sessions by the 30-min gap in event time.
      val evsSorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = scala.collection.mutable.ListBuffer.empty[SessionAgg]
      var n = 0L; var sv = 0.0; var lastTs = Long.MinValue
      evsSorted.foreach { e =>
        if (lastTs != Long.MinValue && e.ts.getTime - lastTs > 30 * 60 * 1000L) {
          sessions += SessionAgg(userId, n, r2(sv))
          n = 0L; sv = 0.0
        }
        n += 1; sv += e.value; lastTs = e.ts.getTime
      }
      if (n > 0) sessions += SessionAgg(userId, n, r2(sv))
      sessions.iterator
    }

    val out = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
    // one row per closed session — linear in the corpus, so the drain
    // goes through the parquet sink, never the driver
    drainToParquet(out.toDF(), OutputMode.Append, "sessionize", dir)
      .orderBy("user_id", "n_events", "sum_value")
  }

  /** Stream-stream interval join: each purchase joined to the same
    * user's errors in the following 30 minutes. Both sides are
    * watermarked and the join carries an event-time range condition —
    * the shape that lets Spark bound join state on a true unbounded
    * stream (state for a purchase is evicted once the error-side
    * watermark passes its +30 min horizon). Inner joins emit complete
    * results under a bounded drain, so this is held to the batch
    * range-join oracle. */
  def intervalJoin(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    val p = eventStream(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      .withWatermark("pts", "30 minutes")
    val e = eventStream(s, dir).filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("euid"), col("ts").as("ets"))
      .withWatermark("ets", "30 minutes")
    val joined = p.join(e,
      col("user_id") === col("euid") &&
        col("ets") > col("pts") &&
        col("ets") <= col("pts") + expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        (col("ets").cast("long") - col("pts").cast("long")).as("gap_sec"))
    // join output grows with the event stream — parquet drain, not a
    // driver-resident memory table
    drainToParquet(joined, OutputMode.Append, "intervaljoin", dir)
      .orderBy("purchase_id", "error_id")
  }

  /** Exactly-once ingestion semantics over an at-least-once source:
    * the stream unioned with itself (every event delivered twice)
    * deduplicates on event_id under a watermark, and the downstream
    * counts must equal the single-copy batch truth. This is the
    * standard `dropDuplicates`-with-watermark topology — state holds
    * only ids younger than the watermark horizon. */
  def dedupStream(s: SparkSession, dir: String): DataFrame =
      withStatePartitions(s, s"$dir/events.parquet") {
    val once = eventStream(s, dir)
    val twice = once.union(eventStream(s, dir))
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id")
    val agg = twice.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val name = s"stream_dedup_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drainMemorySink(s, name).orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly" -> (hourly _),
    "stream_trending" -> (trending _),
    "stream_enrich" -> (enrich _),
    "stream_sessionize" -> (sessionize _),
    "stream_interval_join" -> (intervalJoin _),
    "stream_quality_route" -> (qualityRoute _),
    "stream_dedup" -> (dedupStream _))

  /** Quality threshold for the streaming router (the corpus median, so
    * both routes stay populated). Routing compares the ROUNDED score —
    * the same boundary in both engines. */
  val QualityThreshold = 0.55

  /** Streaming quality router: score each micro-batch of documents
    * with the BATCH quality operator (the same code — `TextAnalysis
    * .qualityOf` runs unchanged inside foreachBatch) and route rows to
    * accept/reject sinks — the filter-and-fork topology of a live
    * ingestion pipeline. Per batch: one narrow scoring map + two
    * filtered appends; no state, no shuffle. The drained per-route
    * report equals the batch quality aggregation, which is the oracle. */
  def qualityRoute(s: SparkSession, dir: String): DataFrame = {
    // wiped fixed path: the route sinks are append-mode, so stale
    // content would double-count; per-call temp dirs would leak disk
    val root = graft.functions.Scratch.fresh("qroute", dir)
    val batchSchema = graft.Tables.documents(s, dir).schema
    val stream = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "documents.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // quality scoring is per-row regex/ratio work and a file-source
        // micro-batch is one partition per file: spread first (no-op
        // when the batch already fills the cluster). The fork is ONE
        // write partitioned by the route column (r17): the previous
        // persist + two filtered appends built an in-memory columnar
        // cache of the scored batch and ran two jobs over it — the
        // partitioned write scores each row once, routes it in the
        // same pass, and still lands accept/reject in separate sink
        // directories (route=accept / route=reject). repartition on
        // the route column keeps file count at one per route per
        // batch, the state-table rule.
        graft.operators.TextAnalysis.qualityOf(graft.Tables.spreadFrame(batch))
          .select(col("doc_id"), col("quality"))
          .withColumn("route",
            when(col("quality") >= QualityThreshold, "accept").otherwise("reject"))
          .repartition(col("route"))
          .write.mode("append").partitionBy("route").parquet(s"$root/routes")
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the route partition column comes back on the read, so the
    // report is one pruned-scannable groupBy; a drain that fired zero
    // batches (empty source glob) — or whose batches all had zero
    // rows, leaving the dir with no parquet DATA files (ADVICE r17) —
    // reports a typed empty frame instead of failing schema inference.
    val routesPath = s"$root/routes"
    def hasData: Boolean = {
      val p = new org.apache.hadoop.fs.Path(routesPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.exists(p) && {
        val it = fs.listFiles(p, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next().getPath.getName
          found = !f.startsWith("_") && !f.startsWith(".")
        }
        found
      }
    }
    val routed =
      if (!hasData)
        s.emptyDataFrame.select(lit("").as("route"), lit(0L).as("doc_id"),
          lit(0.0).as("quality")).limit(0)
      else s.read.parquet(routesPath)
    routed
      .groupBy(col("route"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy("route")
  }

  // stream_hourly/stream_enrich are held to the batch oracles.
  val oracleSql: Map[String, String] = Map(
    "stream_trending" ->
      """WITH h AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |    user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT hour, user_id, n,
        |  row_number() OVER (PARTITION BY hour ORDER BY n DESC, user_id) AS rnk
        |FROM h QUALIFY rnk <= 5 ORDER BY hour, rnk""".stripMargin,
    "stream_quality_route" ->
      s"""SELECT CASE WHEN quality >= $QualityThreshold THEN 'accept' ELSE 'reject' END AS route,
         |  count(*) AS n_docs, round(1e-9 + avg(quality), 4) AS avg_quality
         |FROM (${graft.operators.TextAnalysis.qualityPerDocSql})
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  round(1e-9 + sum(value), 2) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  round(1e-9 + sum(value), 2) AS sum_value,
        |  round(1e-9 + avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n,
        |  round(1e-9 + sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // The stream computes gaps in MILLISECONDS (java.sql.Timestamp
    // .getTime on the µs-normalized ts = epoch_ns // 1e6 for positive
    // epochs), so the oracle reproduces the ms grain exactly — NOT the
    // second grain of q_events_sessionize. Output is (user_id,
    // n_events, sum_value) per session; remaining ties after the
    // 3-column order are identical rows, so the order is total.
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_ns(ts) // 1000000 AS ms
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS sess_id
        |  FROM marked)
        |SELECT user_id, count(*) AS n_events, round(1e-9 + sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, n_events, sum_value""".stripMargin,
    // comparisons run on µs-truncated timestamps (epoch_ns // 1000) to
    // match Spark's ns→µs normalization exactly; gaps on second grain.
    "stream_interval_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events WHERE event_type IN ('purchase', 'error'))
        |SELECT p.event_id AS purchase_id, x.event_id AS error_id, p.user_id,
        |  x.us // 1000000 - p.us // 1000000 AS gap_sec
        |FROM e p JOIN e x ON p.user_id = x.user_id
        |  AND p.event_type = 'purchase' AND x.event_type = 'error'
        |  AND x.us > p.us AND x.us <= p.us + 1800000000
        |ORDER BY 1, 2""".stripMargin)
}
