package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfGen, PdfText}

/** Deterministic mutation fuzz over the extraction surface: the
  * robustness contract is "garbage in, empty out, never throw" and
  * since r14 "always a valid status". Mutants are seeded xorshift
  * corruptions of every PdfGen class (byte flips, truncations, and
  * splice-duplications hit the object scanner, the filter chain, the
  * cipher layer, and the font/cmap parsers), so a parser regression
  * that throws or mis-states shows up as a unit failure, not a task
  * death in an executor at 3 AM. */
class PdfFuzzSpec extends AnyFunSuite {

  private val Statuses = Set("clear", "decrypted_rc4", "decrypted_aes",
    "locked", "unsupported", "malformed")

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
      case 0 => // flip 1-8 bytes anywhere
        val out = base.clone()
        (0 to nat(8)).foreach(_ => out(nat(out.length)) =
          (out(nat(out.length)) ^ (1 + nat(255))).toByte)
        out
      case 1 => // truncate
        base.take(nat(base.length))
      case 2 => // drop a middle slice (kills endobj/endstream pairings)
        val a = nat(base.length); val b = math.min(base.length, a + 1 + nat(64))
        base.take(a) ++ base.drop(b)
      case 3 => // splice-duplicate a slice (phantom headers, double dicts)
        val a = nat(base.length); val b = math.min(base.length, a + 1 + nat(128))
        base.take(b) ++ base.slice(a, b) ++ base.drop(b)
    }
  }

  test("extract never throws and always lands on a valid status, over 600 mutants") {
    val text = "fuzz corpus text, with (parens) and \\ escapes\nand lines"
    (0 until 12).foreach { id =>
      val base = PdfGen.payloadFor(id.toLong, PdfGen.sanitize(text))
      (0 until 50).foreach { k =>
        val mutant = mutate(base, id * 1000L + k)
        val e = PdfText.extract(mutant) // must not throw
        assert(Statuses.contains(e.status),
          s"doc $id mutant $k: invalid status ${e.status}")
        assert(e.chars == e.text.length)
      }
    }
  }

  test("extract on truncation ladders of every class stays total") {
    val text = "ladder"
    (0 until 6).foreach { id =>
      val base = PdfGen.payloadFor(id.toLong, text)
      var n = base.length
      while (n > 0) {
        val e = PdfText.extract(base.take(n))
        assert(Statuses.contains(e.status))
        n = n / 2
      }
    }
  }

  test("Identity-H gate PDFs survive 400 mutants per flavor (cmap/CFF parsers in the blast zone)") {
    // the r15 CID surface: corrupted sfnt directories, cmap subtables
    // and glyphIdArrays (even doc_ids), format-12 groups (odd), all
    // behind the same never-throw/valid-status contract. Mutating the
    // FontFile2 stream also exercises invertEmbeddedFont's bare-CFF
    // dispatch on random leading bytes.
    val text = "cid fuzz corpus with spaces and CAPS and 0123"
    (0 until 8).foreach { id =>
      val base = PdfGen.cidPdf(id.toLong, PdfGen.sanitize(text))
      (0 until 50).foreach { k =>
        val mutant = mutate(base, 7000L + id * 1000L + k)
        val e = PdfText.extract(mutant) // must not throw
        assert(Statuses.contains(e.status),
          s"cid doc $id mutant $k: invalid status ${e.status}")
        assert(e.chars == e.text.length)
      }
      var n = base.length
      while (n > 0) { // truncation ladder too
        assert(Statuses.contains(PdfText.extract(base.take(n)).status))
        n = n / 2
      }
    }
  }

  test("htmlToText never throws over 400 mutants of the gate page") {
    // same contract for the markup front door: mutated tags, broken
    // entities, unterminated script/style, spliced comments
    val page = graft.sources.HtmlGen.page(3L,
      "html fuzz body & <escaped> text with lines\nand more")
    val bytes = page.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    (0 until 400).foreach { k =>
      val mutant = new String(mutate(bytes, 90000L + k),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val out = graft.sources.HtmlText.htmlToText(mutant) // must not throw
      assert(out != null)
    }
  }
}
