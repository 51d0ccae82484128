package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{WarcGen, WarcText}

/** Deterministic mutation fuzz over the WARC container surface
  * (VERDICT r15 item 3 — PdfFuzzSpec's pattern for the crawl front
  * door): the robustness contract is "garbage in, skipped records
  * out, never throw", plus NO MISATTRIBUTION — damage to one record
  * never corrupts the payload of a later record whose own framing is
  * intact, and content hidden inside a correctly framed body never
  * surfaces as its own record. Mutants are seeded xorshift
  * corruptions of both container shapes (plain and per-record gzip
  * members), plus the structured framing attacks the verdict names:
  * Content-Length lies, nested `WARC/1.0` bodies, CRLF-less headers,
  * truncated gzip members. */
class WarcFuzzSpec extends AnyFunSuite {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  // xorshift64*: deterministic, no java.util.Random state surprises
  private def prng(seed0: Long): () => Long = {
    var s = if (seed0 == 0) 0x9E3779B97F4A7C15L else seed0
    () => {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
  }

  private def mutate(base: Array[Byte], seed: Long): Array[Byte] = {
    val next = prng(seed)
    def nat(bound: Int): Int = ((next() >>> 1) % math.max(1, bound)).toInt
    (nat(4): @unchecked) match {
      case 0 => // flip 1-8 bytes anywhere (framing digits, CRLFs, gzip headers)
        val out = base.clone()
        (0 to nat(8)).foreach(_ => out(nat(out.length)) =
          (out(nat(out.length)) ^ (1 + nat(255))).toByte)
        out
      case 1 => // truncate (half a record, half a gzip member)
        base.take(nat(base.length))
      case 2 => // drop a middle slice (kills header/body blank lines)
        val a = nat(base.length); val b = math.min(base.length, a + 1 + nat(64))
        base.take(a) ++ base.drop(b)
      case 3 => // splice-duplicate a slice (phantom version lines)
        val a = nat(base.length); val b = math.min(base.length, a + 1 + nat(128))
        base.take(b) ++ base.slice(a, b) ++ base.drop(b)
    }
  }

  test("records + responseText never throw over 800 mutants of both container shapes") {
    // one doc per gate class: plain ASCII, declared UTF-8, EUC-KR,
    // undeclared UTF-8, UTF-16LE+BOM, chunked+gzip — so the mutants
    // hit the BOM branch, the chunk parser, and the entity gunzip too
    val docs = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma"),
      (4L, "delta"), (5L, "epsilon"), (6L, "zeta"))
    for (gz <- Seq(false, true)) {
      val base = WarcGen.warcFile(docs, gz)
      (0 until 400).foreach { k =>
        val rs = WarcText.records(mutate(base, (if (gz) 900000L else 0L) + k))
        rs.foreach { r => // must not throw, and fields stay non-null
          assert(r.uri != null && r.body != null)
          assert(WarcText.responseText(r) != null)
        }
      }
    }
  }

  test("framing attacks never misattribute an intact trailing record") {
    def rec(headers: Seq[(String, String)], body: String): String = {
      val h = headers :+ ("Content-Length" -> body.length.toString)
      "WARC/1.0\r\n" +
        h.map { case (k, v) => s"$k: $v" }.mkString("", "\r\n", "\r\n") +
        "\r\n" + body + "\r\n\r\n"
    }
    val sentinelBody = "HTTP/1.1 200 OK\r\n\r\nsentinel payload intact"
    val sentinel = rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://e/sentinel"), sentinelBody)
    def sentinelOk(prefix: String): Unit = {
      val rs = WarcText.records((prefix + sentinel).getBytes(Latin1))
      val got = rs.find(_.uri == "http://e/sentinel")
      assert(got.isDefined, s"sentinel lost after: ${prefix.take(60)}…")
      assert(new String(got.get.body, Latin1) == "sentinel payload intact",
        "sentinel payload corrupted")
    }
    // (a) Content-Length lies LONGER than the file: unframeable, the
    // scan resynchronizes on the sentinel's version line
    sentinelOk("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e/liar\r\nContent-Length: 99999\r\n\r\nshort")
    // (b) garbled (non-numeric) length: same self-contained loss
    sentinelOk("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e/liar\r\nContent-Length: NaN\r\n\r\nx\r\n\r\n")
    // (c) CRLF-less (bare-LF) headers: the record cannot frame; its
    // header block merges forward but every named lookup resolves to
    // the sentinel's own CRLF headers — sentinel attribution intact
    sentinelOk("WARC/1.0\nWARC-Type: response\n" +
      "WARC-Target-URI: http://e/bare\nContent-Length: 5\n\nhello")
    // (d) a COMPLETE well-formed record nested inside a correctly
    // framed body must never surface as its own record: framing, not
    // scanning, delimits
    val fake = rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://e/fake"), "HTTP/1.1 200 OK\r\n\r\nevil")
    val outerBody = "HTTP/1.1 200 OK\r\n\r\nbefore " + fake + " after"
    val nested = rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://e/outer"), outerBody)
    val rs = WarcText.records((nested + sentinel).getBytes(Latin1))
    assert(rs.map(_.uri) == Seq("http://e/outer", "http://e/sentinel"), rs.map(_.uri))
    assert(!rs.exists(_.uri == "http://e/fake"))
    assert(new String(rs.head.body, Latin1).contains("evil"),
      "nested content belongs to the OUTER record's payload")
    sentinelOk(nested)
    // (e) a Content-Length that lies SHORTER truncates only its own
    // payload; the sentinel still frames
    sentinelOk("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e/short\r\nContent-Length: 4\r\n\r\n" +
      "HTTP/1.1 200 OK\r\n\r\nlong tail with no version lines\r\n\r\n")
  }

  test("gzip member truncation ladder stays total and loses only the tail") {
    val base = WarcGen.warcFile(Seq((1L, "aa"), (2L, "bb"), (3L, "cc")), gzipped = true)
    val full = WarcText.records(base).map(_.uri)
    assert(full == (1 to 3).map(i => s"http://crawl.example/doc/$i"))
    var n = base.length
    while (n > 0) {
      val rs = WarcText.records(base.take(n)) // never throws
      // whatever survives is a prefix of the true record sequence:
      // truncation may lose records, never invent or reorder them
      assert(full.startsWith(rs.map(_.uri)), s"n=$n: ${rs.map(_.uri)}")
      n = n * 3 / 4 - 1
    }
  }
}
