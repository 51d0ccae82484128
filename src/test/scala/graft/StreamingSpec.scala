package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Multimodal}
import graft.streaming.Streaming

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
