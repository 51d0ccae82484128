package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.UrlCanon.urlCanonicalize

/** URL-level dedup (`dedup_url`, VERDICT r15 item 7) — the cheapest,
  * FIRST-line dedup every crawl pipeline runs before any content
  * dedup: the same page arrives under `HTTP://Host.COM:443/...#frag`,
  * with tracking params, and with gratuitous percent-escapes; one
  * canonicalization pass plus a per-URL keep-best collapses the
  * re-fetches for free, before a single shingle is computed. Reference
  * context: the reference's corpus is keyed by filename
  * (scripts/01_pdf_to_vector.sql:194 — Oracle never sees URLs); a
  * crawl-scale corpus is keyed by URL, and `WarcText.warcToText`
  * produces exactly the (url, text) frame this operator consumes.
  *
  * Semantics: canonicalize ([[graft.functions.UrlCanon]] — lowercase
  * scheme/host, strip default port / fragment / tracking params,
  * percent-decode unreserved escapes), group by the canonical URL,
  * keep the HIGHEST-QUALITY copy (the `dedup_keep_best` scorer,
  * compared on the ROUNDED value; tie → smallest doc_id). One row per
  * canonical URL: survivors count, keeper, its quality.
  *
  * Scale shape: canonicalization is a codegen'd narrow projection
  * fused into the scan (no UDF, no extra pass); the quality score
  * rides the SAME projection (qualityOf with a carried url column —
  * no self-join of documents); then ONE hash-partition on the
  * canonical url serves the count/max aggregate, the keeper
  * resolution join, and the final assembly (same key throughout —
  * the exchange is planned once and reused, keepBest's shape). At
  * 100 TB this is a single shuffle of (url, doc_id, quality) tuples —
  * the minimum any URL-keyed dedup can do.
  *
  * The gate corpus synthesizes three messy variants per canonical URL
  * from consecutive doc_ids (uppercase host + fragment; default port +
  * interleaved tracking params; percent-encoded unreserved escapes),
  * so every chain step is load-bearing: skip one and triples stop
  * collapsing (or collapse to the wrong key) and the hash diverges.
  * The DuckDB oracle REPRODUCES the canonicalization chain over the
  * same generated variants (fragment/scheme/host/port/tracking steps
  * in full generality; the percent-decode step over the escape
  * instances the generator emits — the general rule is spec-pinned on
  * the Scala side, UrlCanonSpec).
  */
object UrlDedup {

  /** Messy URL variants over documents — cls = doc_id%3, canonical
    * key shared by each run of three consecutive doc_ids. Pure
    * projection (no shuffle); mirrored verbatim in the oracle CTE. */
  private[graft] def urlTable(s: SparkSession, dir: String): DataFrame = {
    val g = expr("doc_id DIV 3").cast("string")
    val h = expr("(doc_id DIV 3) % 20").cast("string")
    val cls = expr("doc_id % 3")
    val url = when(cls === 0, concat(
      lit("https://EXAMPLE-"), h, lit(".COM/~user/path-"), g,
      lit("?id="), g, lit("&x=1#top")))
      .when(cls === 1, concat(
        lit("https://example-"), h, lit(".com:443/~user/path-"), g,
        lit("?utm_source=rss&id="), g, lit("&x=1&gclid=g"), g,
        lit("&utm_medium=m")))
      .otherwise(concat(
        lit("https://example-"), h, lit(".com/%7Euser/pa%74h-"), g,
        lit("?id="), g, lit("&x=1")))
    Tables.documents(s, dir).select(col("doc_id"), col("text"), url.as("url"))
  }

  /** canonicalize → group by canonical url → keep best copy. */
  def urlDedup(s: SparkSession, dir: String): DataFrame = {
    // one pass: quality scored on the same projection that carries the
    // url (no join-back of documents onto itself), canonical key fused
    // into the scan-side projection
    val scored = TextAnalysis.qualityOf(urlTable(s, dir), carry = Seq("url"))
      .select(col("doc_id"), urlCanonicalize(col("url")).as("url"),
        col("quality"), coalesce(col("quality"), lit(-1e9)).as("qk"))
    // count/max, keeper election, and assembly all shuffle on the SAME
    // key — one exchange, reused (keepBest's topology on the url key)
    val mx = scored.groupBy(col("url").as("umx"))
      .agg(count(lit(1)).as("n_docs"), max(col("qk")).as("mq"))
    val keep = scored
      .join(mx, col("url") === col("umx") && col("qk") === col("mq"))
      .groupBy(col("url"))
      .agg(min(col("doc_id")).as("keeper"), max(col("mq")).as("best_quality"))
    keep.select(col("url"), col("keeper"), col("best_quality"))
      .join(mx.select(col("umx").as("url"), col("n_docs")), "url")
      .select(col("url"), col("n_docs"), col("keeper"), col("best_quality"))
      .orderBy("url")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_url" -> (urlDedup _))

  /** The variant generator, verbatim in SQL (`//` is DuckDB integer
    * division, matching Spark's DIV on the non-negative doc_id).
    * NOTE: this CTE interpolates into a caller's stripMargin string,
    * so no line may BEGIN with `||` — the outer stripMargin would eat
    * the first pipe. Concatenation operators sit at line ends. */
  private[graft] val urlRawCte: String =
    """uraw AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3
      |      WHEN 0 THEN 'https://EXAMPLE-' || ((doc_id // 3) % 20) ||
      |        '.COM/~user/path-' || (doc_id // 3) ||
      |        '?id=' || (doc_id // 3) || '&x=1#top'
      |      WHEN 1 THEN 'https://example-' || ((doc_id // 3) % 20) ||
      |        '.com:443/~user/path-' || (doc_id // 3) ||
      |        '?utm_source=rss&id=' || (doc_id // 3) ||
      |        '&x=1&gclid=g' || (doc_id // 3) || '&utm_medium=m'
      |      ELSE 'https://example-' || ((doc_id // 3) % 20) ||
      |        '.com/%7Euser/pa%74h-' || (doc_id // 3) ||
      |        '?id=' || (doc_id // 3) || '&x=1'
      |    END AS url
      |  FROM documents)""".stripMargin

  /** The canonicalization chain in DuckDB: fragment strip, scheme +
    * host lowercase, default-port strip, tracking-param filter with
    * order-preserving reassembly — each step in full generality; the
    * unreserved-percent-decode step decodes the instances the
    * generator emits (%7E→~, %74→t). */
  private[graft] val urlCanonCte: String =
    """usplit AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([^:/?#]+)://', 1)) AS scheme,
      |    lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)) AS auth,
      |    regexp_replace(regexp_replace(url, '#.*$', ''),
      |      '^[^:/?#]+://[^/?#]*', '') AS rest
      |  FROM uraw),
      |uparts AS (
      |  SELECT doc_id, scheme,
      |    CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
      |         WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
      |         ELSE auth END AS auth,
      |    replace(replace(regexp_extract(rest, '^([^?]*)', 1),
      |      '%7E', '~'), '%74', 't') AS path,
      |    CASE WHEN contains(rest, '?')
      |      THEN array_to_string(list_filter(
      |        string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
      |        p -> NOT (starts_with(p, 'utm_')
      |          OR regexp_extract(p, '^([^=]*)', 1)
      |            IN ('gclid', 'fbclid', 'msclkid', 'mc_eid'))), '&')
      |      ELSE NULL END AS query
      |  FROM usplit),
      |ucanon AS (
      |  SELECT doc_id, scheme || '://' || auth || path ||
      |    CASE WHEN query IS NOT NULL AND query != '' THEN '?' || query
      |      ELSE '' END AS url
      |  FROM uparts)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_url" ->
      s"""WITH ${TextAnalysis.qualityCtes},
         |$urlRawCte,
         |$urlCanonCte,
         |scored AS (
         |  SELECT c.doc_id, c.url, q.quality,
         |    coalesce(q.quality, -1e9) AS qk
         |  FROM ucanon c JOIN qdoc q USING (doc_id)),
         |mx AS (
         |  SELECT url, count(*) AS n_docs, max(qk) AS mq
         |  FROM scored GROUP BY 1),
         |keep AS (
         |  SELECT s.url, min(s.doc_id) AS keeper, max(m.mq) AS best_quality
         |  FROM scored s JOIN mx m ON s.url = m.url AND s.qk = m.mq
         |  GROUP BY 1)
         |SELECT k.url, m.n_docs, k.keeper, k.best_quality
         |FROM keep k JOIN mx m USING (url)
         |ORDER BY k.url""".stripMargin)
}
