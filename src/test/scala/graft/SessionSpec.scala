package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-knob arithmetic of GraftSession. */
class SessionSpec extends AnyFunSuite {
  import GraftSession._

  test("shuffle partitions: floored at parallelism for small inputs") {
    assert(shufflePartitionsFor(0L, 32) == 32)
    assert(shufflePartitionsFor(1L << 30, 32) == 32) // 1 GiB / 128 MiB = 8 < 32
  }

  test("shuffle partitions: tracks bytes/128MiB in the large regime") {
    val tenTb = 10L << 40
    assert(shufflePartitionsFor(tenTb, 32) == (tenTb / TargetPartitionBytes).toInt)
    // 100 TB hits the scheduler-sanity cap
    assert(shufflePartitionsFor(100L << 40, 32) == MaxShufflePartitions)
  }

  test("shuffle partitions: monotone in input size") {
    val sizes = Seq(1L << 20, 1L << 30, 1L << 35, 1L << 40, 10L << 40, 100L << 40)
    val parts = sizes.map(shufflePartitionsFor(_, 16))
    assert(parts == parts.sorted)
  }

  test("dirBytes sees the testdata parquet files") {
    val b = dirBytes("/root/testdata/sf0.001")
    assert(b > 0L)
    // and the derived partitions for local test SFs equal parallelism
    assert(shufflePartitionsFor(b, 32) == 32)
  }

  test("DfCache bounds live sessions: LRU eviction past MaxPerSession, recent keys survive") {
    import graft.functions.DfCache
    val spark = SparkTestSession.spark
    import spark.implicits._
    DfCache.clear()
    try {
      // overfill by 5: a service iterating many corpus dirs must not
      // accumulate persisted frames without limit (r7 kept only the
      // stopped-session hygiene; live sessions grew unboundedly)
      val n = DfCache.MaxPerSession + 5
      (0 until n).foreach { i =>
        DfCache.getOrElseUpdate(spark, s"lru-spec-$i")(Seq(i).toDF("v"))
      }
      assert(DfCache.sizeFor(spark) == DfCache.MaxPerSession)
      // least-recently-used dropped, most recent retained
      assert(!DfCache.contains(spark, "lru-spec-0"))
      assert(DfCache.contains(spark, s"lru-spec-${n - 1}"))
      // re-inserting an evicted key works (rebuild path, no stale state)
      val df = DfCache.getOrElseUpdate(spark, "lru-spec-0")(Seq(42).toDF("v"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(42))
    } finally DfCache.clear()
  }
}
