package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocumentSource

class SourceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("binaryFile document ingestion reads a raw directory") {
    val dir = Files.createTempDirectory("graft_docs")
    Files.writeString(dir.resolve("a.txt"), "hello spark vector world")
    Files.writeString(dir.resolve("b.txt"), "second document body")
    Files.writeString(dir.resolve("skip.bin"), "not a txt")

    val docs = DocumentSource.toText(
      DocumentSource.readDocumentsDir(spark, dir.toString, "*.txt"))
      .select("file_name", "text", "n_bytes")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(docs.length == 2, "glob filter must exclude skip.bin")
    assert(docs(0) == ("a.txt", "hello spark vector world", 24L))
    assert(docs(1)._2 == "second document body")

    val stats = DocumentSource.ingestStats(spark, dir.toString, "*.txt").collect()(0)
    assert(stats.getLong(0) == 2 && stats.getLong(1) == 44L)
  }
}
