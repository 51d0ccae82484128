package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash

/** Interchange-format coverage: JSONL, the lingua franca of LLM
  * training-data exchange (one JSON object per line — what every
  * open-data corpus and filtering toolchain emits).
  *
  * Spark's native `json` source/sink IS line-delimited JSON, reads
  * with partition-parallel line splitting, and takes an explicit
  * schema (never infer on a 100 TB corpus — inference is a full extra
  * pass). The round-trip query proves the sink+source pair lossless
  * with a per-language CONTENT CHECKSUM (order-insensitive sum of
  * 64-bit text hashes), not just row counts — the oracle computes the
  * same checksum over the original parquet, so any corruption,
  * reordering-with-loss, or encoding drift fails the hash gate.
  */
object Interchange {

  /** Fixed scratch path keyed by (query, input dir): repeated
    * verify/bench runs overwrite the same directory instead of leaking
    * a fresh temp dir per invocation (mode("overwrite") clears it). */
  private[graft] def scratch(name: String, dir: String): String =
    graft.functions.Scratch.stable(name, dir) + "/docs"

  /** documents → JSONL → back, summarized per lang with a content
    * checksum. The write is the sink under test, the schema-given
    * read is the source under test. */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val out = scratch("jsonl", dir)
    docs.write.mode("overwrite").json(out)
    s.read.schema(docs.schema).json(out)
      .withColumn("h", PortableHash.phash64(col("text"), 17))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(h)").as("text_checksum"))
      .orderBy("lang")
  }

  /** documents → CSV → back, same per-lang content-checksum gate as
    * the JSONL round-trip (seed 19 so the two checksums can never be
    * confused). CSV stays line-splittable — and therefore
    * partition-parallel readable — only while records are single-line;
    * this corpus has no control chars in `text`, and Spark's writer
    * quotes embedded separators/quotes, so the default (multiLine off,
    * the scalable path) reads it back exactly. A corpus WITH embedded
    * newlines must escape them before the sink (multiLine=true reads
    * are not splittable — each file becomes one task).
    *
    * The text-fidelity contract is pinned EXPLICITLY rather than
    * inherited from writer defaults: whitespace trimming off on both
    * sides (the write default silently trims padded text), and a
    * dedicated null marker distinct from the empty string so "" and
    * NULL round-trip as themselves instead of collapsing. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val out = scratch("csv", dir)
    val csvOpts = Map(
      "header" -> "true",
      "ignoreLeadingWhiteSpace" -> "false",
      "ignoreTrailingWhiteSpace" -> "false",
      "nullValue" -> "\\N",
      "emptyValue" -> "")
    docs.write.mode("overwrite").options(csvOpts).csv(out)
    s.read.schema(docs.schema).options(csvOpts).csv(out)
      .withColumn("h", PortableHash.phash64(col("text"), 19))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(h)").as("text_checksum"))
      .orderBy("lang")
  }

  /** Schema evolution across producer versions — the lake-drift case
    * every long-lived corpus hits: a v1 producer wrote five columns,
    * a v2 producer adds `n_tokens`, both batches land in ONE parquet
    * directory. The consumer reads with `mergeSchema` (an explicit
    * opt-in — schema merging is a footer-union pass you pay once, not
    * something to leave on by default at 100 TB); v1 rows surface the
    * new column as null, and the aggregate proves both cohorts
    * survived with a corpus-wide content checksum plus null-aware
    * token accounting (count(col) skips the backfilled nulls). */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val out = scratch("evo", dir)
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(out)
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .write.mode("append").parquet(out)
    s.read.option("mergeSchema", "true").parquet(out)
      .withColumn("h", PortableHash.phash(col("text"), 29))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("n_tokens")).as("n_v2_docs"),
        sum(coalesce(col("n_tokens"), lit(0L))).as("sum_tokens"),
        expr("bit_xor(h)").as("text_checksum"))
      .orderBy("lang")
  }

  /** Malformed-record handling — at 100 TB corrupt lines are a
    * certainty, and the ingest contract must QUARANTINE them, not die
    * or silently drop. Good JSONL plus deterministically-injected
    * truncated lines (one per doc_id%10==3, built from the corpus in
    * both engines) are read back in PERMISSIVE mode with an explicit
    * `_corrupt_record` column in the schema: malformed lines land
    * whole in the quarantine column with every data field null, and
    * the per-lang report proves none were lost or double-counted.
    * Per-row map work only; the quarantine column prunes away for
    * consumers that don't select it. */
  def jsonlCorrupt(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val out = scratch("corrupt", dir)
    val good = docs
      .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("value"))
    val bad = docs.filter(col("doc_id") % 10 === 3)
      .select(concat(lit("{\"doc_id\": "), col("doc_id").cast("string"),
        lit(", \"lang\": \"")).as("value"))
    good.union(bad).write.mode("overwrite").text(out)
    s.read
      .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .groupBy(coalesce(col("lang"), lit("_corrupt")).as("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))
      .orderBy("lang")
  }

  /** HTML → text ingestion gate (r15, VERDICT r14 item 3): each
    * documents row is wrapped in deterministic dirty HTML —
    * title/h1, style + script blocks with sentinel payloads, a
    * comment, the body text entity-ESCAPED, and an entity decoration
    * sentence ([[HtmlGen.page]]) — then extracted back through
    * [[HtmlText.htmlToText]]. The gate demands the clean text
    * byte-exact per document; the DuckDB oracle predicts it from the
    * text column alone (title + h1 + the unescaped body + the
    * decoded decoration, whitespace-collapsed), so it never runs an
    * extractor: tag/script/style leakage, entity mis-decode, or
    * collapse drift all diverge the hash. Two narrow maps
    * (synthesize, extract), no shuffle before the output sort. */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    // text equality IS the gate; no char-count column on purpose --
    // DuckDB length() counts codepoints, Spark's counts UTF-16 units,
    // and the byte-exact text column subsumes any count.
    HtmlText.utlHtmlToText(s, HtmlGen.htmlTable(s, dir))
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  /** WARC container gate (r15): the same documents, packed into
    * multi-record WARC files (warcinfo + request + response records
    * per [[WarcGen.warcFile]]) and read back through record framing →
    * HTTP body → the HTML chain. Per-document byte-exact against the
    * SAME oracle prediction as [[htmlExtract]] — the container layer
    * must be invisible: any framing slip, skipped-type leak, or HTTP
    * header residue diverges the hash. */
  def warcExtract(s: SparkSession, dir: String): DataFrame = {
    WarcText.utlWarcToText(s, WarcGen.gateTable(s, dir))
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  /** WARC parse-accounting gate (r17, VERDICT r16 item 5): per-file
    * (responses, framed-and-skipped, unframeable, truncated) from the
    * streaming iterator's counters — the `doc_extract_report` status
    * channel for the container path, so lost volume at 100 TB is a
    * plain sum over this frame. The oracle predicts every row from
    * the generator's file-grouping arithmetic: each file carries one
    * warcinfo + a request/response pair per document, nothing is
    * malformed, nothing truncated — so any accounting slip (a
    * skipped type counted as a response, a phantom malformed, a
    * false truncation flag) diverges the hash. */
  def warcReport(s: SparkSession, dir: String): DataFrame =
    WarcText.warcReport(s, WarcGen.gateTable(s, dir)).orderBy("path")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_jsonl_corrupt" -> (jsonlCorrupt _),
    "src_jsonl_roundtrip" -> (jsonlRoundtrip _),
    "src_csv_roundtrip" -> (csvRoundtrip _),
    "src_html_extract" -> (htmlExtract _),
    "src_warc_extract" -> (warcExtract _),
    "src_warc_report" -> (warcReport _),
    "src_schema_evolution" -> (schemaEvolution _))

  private def checksumSql(seed: Int): String =
    s"""WITH x AS (
       |  SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
       |    bit_xor(${PortableHash.duckSql64("text", seed)}) AS ux
       |  FROM documents GROUP BY lang)
       |SELECT lang, n_docs, sum_chars,
       |  -- DuckDB xors the UNSIGNED hash representation; Spark's is
       |  -- signed. Same 64 bits — shift the unsigned value back into
       |  -- the signed range (mod-2^64 bijection).
       |  (CASE WHEN ux >= 9223372036854775808
       |    THEN ux::HUGEINT - 18446744073709551616 ELSE ux::HUGEINT END)::BIGINT
       |    AS text_checksum
       |FROM x ORDER BY lang""".stripMargin

  /** The WARC gate's predicted extraction as a reusable CTE ending in
    * `wt(doc_id, text)` — what [[WarcText]] must yield per document
    * from the [[WarcGen]] container corpus; `pipeline_crawl` splices
    * it as the head of the crawl-funnel oracle. NOTE: interpolates
    * into callers' stripMargin strings, so concatenation operators
    * sit at line ENDS (a line starting with `||` would lose its first
    * pipe to the outer stripMargin). */
  private[graft] val warcTextCte: String =
    """wt AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(
      |      'Doc ' || doc_id || ' Doc ' || doc_id || ' ' ||
      |        coalesce(text, '') || ' café & résumé "ok"' ||
      |        CASE doc_id % 6
      |          WHEN 1 THEN ' naïve café ' || chr(8212) || ' ' || chr(937)
      |          WHEN 2 THEN ' ' || chr(54620) || chr(44397) || chr(50612) ||
      |            ' ' || chr(53580) || chr(49828) || chr(53944)
      |          WHEN 3 THEN ' data ' || chr(128578) || ' ' || chr(937)
      |          WHEN 4 THEN ' utf16 ' || chr(10003) || ' ' || chr(937)
      |          WHEN 5 THEN ' chunked gz ' || chr(8594) || ' ' || chr(937)
      |          ELSE '' END,
      |      '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text
      |  FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "src_jsonl_corrupt" ->
      """SELECT lang, count(*) AS n_rows, 0::BIGINT AS n_corrupt,
        |  sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT '_corrupt' AS lang, count(*) AS n_rows,
        |  count(*) AS n_corrupt, 0::BIGINT AS sum_chars
        |FROM documents WHERE doc_id % 10 = 3
        |ORDER BY lang""".stripMargin,
    "src_schema_evolution" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |        tok -> length(tok) > 0))::BIGINT AS ntok
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_v2_docs,
         |  sum(CASE WHEN doc_id % 2 = 1 THEN ntok ELSE 0 END)::BIGINT AS sum_tokens,
         |  bit_xor(${PortableHash.duckSql("text", 29)})::BIGINT AS text_checksum
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_csv_roundtrip" -> checksumSql(19),
    "src_jsonl_roundtrip" -> checksumSql(17),
    // predicts the extraction from the text column alone: title + h1
    // ("Doc N" twice), the body text (escape/decode round-trips to
    // itself), the decoded decoration sentence — all under one final
    // whitespace collapse + trim, exactly htmlToText's last step.
    "src_html_extract" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      'Doc ' || doc_id || ' Doc ' || doc_id || ' ' ||
        |        coalesce(text, '') || ' café & résumé "ok"',
        |      '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text
        |  FROM documents)
        |SELECT doc_id, text
        |FROM t ORDER BY doc_id""".stripMargin,
    // the container layer must be invisible: the bare-page prediction
    // plus the per-class decoration (doc_id%6 — WarcGen.Decor:
    // HTTP-declared UTF-8, meta-declared EUC-KR Hangul, undeclared
    // UTF-8 with an astral-plane emoji, UTF-16LE behind a BOM, and a
    // chunked-transfer gzip entity). chr() codepoints keep this
    // source ASCII where the characters leave Latin-1; a wrong-charset
    // decode, skipped BOM, or misordered unchunk/gunzip mojibakes the
    // decoration and diverges the hash.
    // the generator's grouping arithmetic, replayed: file key k =
    // doc_id // DocsPerFile, odd keys gzip; per file one warcinfo +
    // one request per doc (framed, skipped → n_other = n + 1), one
    // response per doc, zero malformed, zero truncated
    "src_warc_report" ->
      s"""WITH f AS (
         |  SELECT doc_id // ${WarcGen.DocsPerFile} AS k, count(*) AS n
         |  FROM documents GROUP BY 1)
         |SELECT 'graft-' || k ||
         |    CASE WHEN k % 2 = 1 THEN '.warc.gz' ELSE '.warc' END AS path,
         |  n AS n_responses, (n + 1)::BIGINT AS n_other,
         |  0::BIGINT AS n_malformed, 0::BIGINT AS truncated
         |FROM f ORDER BY path""".stripMargin,
    "src_warc_extract" ->
      s"""WITH $warcTextCte
         |SELECT doc_id, text
         |FROM wt ORDER BY doc_id""".stripMargin)
}
