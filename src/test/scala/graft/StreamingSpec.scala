package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, IvfIndex, Multimodal}
import graft.streaming.{IvfStream, Streaming}

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stream_hourly equals batch q_events_hourly") {
    val stream = Streaming.hourly(spark, sf).collect().map(_.toSeq).toSet
    val batch = Analytics.qEventsHourly(spark, sf).collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("watermarked append-mode stream emits a subset of sealed windows") {
    val wm = Streaming.hourlyWatermarked(spark, sf)
      .select("hour", "event_type", "n").collect().map(_.toSeq).toSet
    val batch = Analytics.qEventsHourly(spark, sf)
      .select("hour", "event_type", "n").collect().map(_.toSeq).toSet
    assert(wm.nonEmpty, "watermarked stream emitted nothing")
    assert(wm.subsetOf(batch), "append-mode emitted a window batch disagrees with")
  }

  test("stream_sessionize matches batch sessionization on session sizes") {
    val stream = Streaming.sessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Analytics.qEventsSessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch)
  }

  test("streaming IVF upsert probes identically to a batch build with the same model") {
    // stream path: base half built in batch, odd half appended per micro-batch
    val streamed = IvfStream.indexUpsert(spark, sf).collect().map(_.toSeq).toSeq
    // batch path: same centroid model (seeded fit on the even half),
    // whole table assigned in one pass
    val emb = Tables.embeddings(spark, sf)
    // same adaptive geometry as IvfStream's base fit (at the spec SF
    // the √N default coincides with the 16-cell floor)
    val base = emb.filter(col("vec_id") % 2 === 0)
    val model = IvfIndex.fitModel(base, IvfIndex.defaultNlist(base.count()))
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val batchIndex = IvfIndex.assign(model, emb).filter(col("vec_id") =!= 0)
    val batch = IvfIndex.search(spark, batchIndex, model.clusterCenters.map(_.toArray),
      query, k = 10).collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.size == 10)

    // tamper negative-control for the STREAMED layout — the same
    // property AnnSpec pins for the batch PQ/IVF builds: serving and
    // oracle both trust the dumped artifacts, so corrupting ONE row in
    // a copy of the dump and re-deriving the answer through the same
    // probe path must change it. Reassigning the clean top-1 to the
    // centroid FARTHEST from the query (never in the nprobe-nearest
    // probe set) guarantees the probe misses it.
    val centroids = model.clusterCenters.map(_.toArray)
    val qd = query.map(_.toDouble)
    val far = centroids.zipWithIndex
      .maxBy { case (c, _) => IvfIndex.cosineDist(c, qd) }._2
    val topHit = streamed.head.head.asInstanceOf[Long]
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_tamper").toString
    spark.read.parquet(IvfStream.scratchRoot(sf) + "/dump/assign.parquet")
      .withColumn("centroid_id",
        when(col("vec_id") === topHit, lit(far)).otherwise(col("centroid_id")))
      .write.mode("overwrite").parquet(s"$tmp/assign.parquet")
    val corrupt = spark.read.parquet(s"$tmp/assign.parquet")
      .join(emb, "vec_id")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val tampered = IvfIndex.search(spark,
      corrupt.filter(col("vec_id") =!= 0), centroids, query, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(tampered != streamed,
      "a corrupted streamed-layout assignment row must change the probed answer")
  }

  test("streaming minhash candidates equal the batch band-candidate set") {
    val streamed = graft.streaming.DedupStream.candidates(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Dedup.bandCandidatesOf(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dedup stream state join: pruned partitioned scan + broadcast batch, equals batch set") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val half0 = docs.filter(col("doc_id") % 2 === 0)
    val half1 = docs.filter(col("doc_id") % 2 === 1)
    def bandsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.bandsOf(Dedup.minhashSigOf(Dedup.shingleSetOf(d)))
    val statePath = java.nio.file.Files.createTempDirectory("graft_state").toString + "/state"
    bandsOf(half0).write.partitionBy("band").parquet(statePath)
    val vs = graft.streaming.DedupStream.stateCandidates(bandsOf(half1), statePath)
    val p = vs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the state scan prunes to the batch's band partitions and the
    // batch side is broadcast — no state-side exchange
    assert(p.contains("PartitionFilters: [") && p.contains("band"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    // cross-half ∪ within-half candidates == the batch operator's set
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(vs.distinct()) ++
      pairs(Dedup.bandCandidatesOf(half0)) ++ pairs(Dedup.bandCandidatesOf(half1))
    assert(all == pairs(Dedup.bandCandidatesOf(docs)))
  }

  test("dedup stream survives a zero-band micro-batch (ADVICE r17)") {
    // every doc under 3 tokens -> shingleSetOf is empty -> the
    // per-batch band scratch is written with NO data files; the
    // explicit-schema read must yield an empty typed frame, not an
    // 'Unable to infer schema' failure, and the drained candidate set
    // is empty.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tinydocs").toString
    Seq((1L, "one two", "en", "syn", 7L), (2L, "ok", "en", "syn", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = graft.streaming.DedupStream.candidates(spark, dir)
    assert(out.columns.toSeq == Seq("doc_a", "doc_b"))
    assert(out.count() == 0)
  }

  test("quality route reports a typed empty frame on an all-empty drain (ADVICE r17)") {
    // a documents.parquet with ZERO rows still fires one micro-batch;
    // the partitioned route write then creates the sink dir with no
    // parquet data files, which used to fail schema inference.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_emptydocs").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = Streaming.qualityRoute(spark, dir)
    assert(out.columns.toSeq == Seq("route", "n_docs", "avg_quality"))
    assert(out.count() == 0)
  }

  test("mm_frame_sample is deterministic and bounded by n_frames") {
    val a = Multimodal.frameSample(spark, sf).collect().map(_.toSeq)
    val b = Multimodal.frameSample(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    // only vids have frames beyond 1; sampled frames are 1, 7, 13, 19
    val frames = a.map(_(2).asInstanceOf[Long]).toSet
    assert(frames.subsetOf(Set(1L, 7L, 13L, 19L)))
  }

  test("mm decode keeps payload size consistent with metadata") {
    val bad = Multimodal.decoded(spark, sf)
      .filter(m => m.width != m.n_bytes % 640 + 16 || m.n_bytes <= 0)
      .count()
    assert(bad == 0)
  }
}
