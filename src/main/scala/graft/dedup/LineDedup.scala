package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Cross-document LINE-level dedup — the CCNet / RefinedWeb
  * boilerplate-line removal step: a line that appears in many
  * documents (navigation bars, cookie banners, footers) is removed
  * from EVERY document, while each document keeps its unique lines.
  * Complements the other two repetition surfaces: [[SpanDedup]] cuts
  * duplicated token PASSAGES across documents,
  * [[graft.text.Repetition.addLineFlags]] profiles line repetition
  * WITHIN one document; neither removes a globally-common line from
  * documents that are otherwise unique.
  *
  * Matching is on the normalized line (lowercased, space-trimmed); the
  * ORIGINAL line bytes are preserved for survivors. Whitespace-only
  * lines never match (they carry no boilerplate evidence, and removing
  * them would reflow unrelated text).
  *
  * Scale shape: the frequency pass moves only the 128-bit line
  * fingerprint (two independently-seeded xxhash64 values, the same key
  * [[Dedup.normalizedExact]] shuffles — line text never rides the df
  * exchange) with map-side partial counts. The removal pass explodes
  * to (id, pos, line), anti-joins on the fingerprint, and regroups by
  * id — the rebuild has to move the text it KEEPS, same as
  * [[SpanDedup.removeSpans]]; per-task width is bounded by document
  * length. The common-line table is df-filtered (every surviving entry
  * appears in >= minDf documents, so its size is <= corpus-lines /
  * minDf) and AQE broadcasts it when small.
  *
  * Contract: `idCol` must be a UNIQUE, NON-NULL row id (the same
  * contract as [[Dedup.normalizedExact]] — the rebuild groups by it
  * and joins the result back on it), and must not be one of the
  * reserved working names (`lh1`, `lh2`, `df`, `line`, `_pos`,
  * `_line`) — enforced with a fail-fast.
  */
object LineDedup {

  private val Seed2 = 0x9e3779b97f4a7c15L

  private def normLine(l: Column): Column = lower(trim(l))

  /** Column names the passes use internally / emit — an idCol named
    * like one of these would be silently overwritten mid-pass.
    */
  private val Reserved = Set("lh1", "lh2", "df", "line", "_pos", "_line")

  private def lineRows(docs: DataFrame, idCol: String, textCol: String) = {
    require(!Reserved(idCol), s"idCol '$idCol' collides with a reserved working column")
    docs.select(
      col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("_pos", "_line")))
  }

  /** Per-line document frequency over the corpus: one row per distinct
    * normalized non-empty line, keyed by the 128-bit fingerprint
    * (`lh1`, `lh2`) the removal pass joins on, with `df` = the number
    * of DISTINCT documents containing the line. Narrow plan: explode →
    * distinct (id, lh1, lh2) → count per fingerprint.
    */
  def lineDf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    lineRows(docs, idCol, textCol)
      .where(length(trim(col("_line"))) > 0)
      .select(
        col(idCol),
        xxhash64(normLine(col("_line"))).as("lh1"),
        xxhash64(normLine(col("_line")), lit(Seed2)).as("lh2"))
      .distinct()
      .groupBy(col("lh1"), col("lh2"))
      .agg(count(lit(1)).as("df"))

  /** The lines the removal pass deletes: fingerprints whose document
    * frequency is >= `minDf` (the audit view — join back to the
    * exploded lines to sample the actual boilerplate text).
    */
  def commonLines(docs: DataFrame, idCol: String, textCol: String, minDf: Int): DataFrame =
    lineDf(docs, idCol, textCol).where(col("df") >= minDf)

  /** A human-readable enrichment of [[commonLines]]: adds a
    * representative normalized `line` per fingerprint (the audit a
    * reviewer actually reads). The text enrichment is a SEPARATE
    * df-bounded pass — the exploded lines are left-semi filtered to
    * the common fingerprints BEFORE any text rides an exchange, and
    * the representative is a `min` with map-side partials (one string
    * per fingerprint per mapper).
    */
  def commonLineAudit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      common: DataFrame // the (lh1, lh2, df) table the removal consumed
  ): DataFrame = {
    val rep = lineRows(docs, idCol, textCol)
      .select(
        xxhash64(normLine(col("_line"))).as("lh1"),
        xxhash64(normLine(col("_line")), lit(Seed2)).as("lh2"),
        normLine(col("_line")).as("line"))
      .join(common.select(col("lh1"), col("lh2")), Seq("lh1", "lh2"), "left_semi")
      .groupBy(col("lh1"), col("lh2"))
      .agg(min(col("line")).as("line"))
    common.join(rep, Seq("lh1", "lh2"), "left")
  }

  /** Rebuilds `textCol` with every line whose fingerprint is in
    * `common` removed — the table-driven core, so a caller (the
    * curation pipeline) can audit the EXACT table the removal
    * consumed. Survivor lines keep their original bytes and order; a
    * document reduced to nothing becomes the empty string, and null
    * text is treated as empty. All other columns pass through.
    */
  def removeLines(
      docs: DataFrame,
      common: DataFrame, // carries (lh1, lh2)
      idCol: String,
      textCol: String
  ): DataFrame = {
    import graft.util.Cols.fresh
    val cT = fresh(docs.columns.toSet, "_ld_text")
    val kept = lineRows(docs, idCol, textCol)
      .withColumn("lh1", xxhash64(normLine(col("_line"))))
      .withColumn("lh2", xxhash64(normLine(col("_line")), lit(Seed2)))
      .join(common.select(col("lh1"), col("lh2")), Seq("lh1", "lh2"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(
          "\n",
          transform(
            array_sort(collect_list(struct(col("_pos"), col("_line")))),
            s => s.getField("_line"))).as(cT))
    docs
      .drop(textCol)
      .join(kept, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(cT), lit("")))
      .drop(cT)
  }

  /** [[removeLines]] against the corpus' own >= minDf common lines. */
  def removeCommonLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int
  ): DataFrame =
    removeLines(docs, commonLines(docs, idCol, textCol, minDf), idCol, textCol)

  /** Driver-collected common-line hash table for the ingestion-time
    * variant, guarded against unbounded collects the same way
    * [[SpanDedup.dupGramSet]] guards its broadcast build: one job,
    * `limit(maxLines + 1)`, fail fast over the cap. Hashed with
    * [[Hashing.hashString]] (the driver-side fingerprint the streaming
    * probe can recompute), sorted for binary search.
    */
  def commonLineSet(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int,
      maxLines: Int = 2000000
  ): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    // keyed on the normalized line TEXT: the set builder needs the
    // bytes so probe-side hashing uses one function end to end
    val lines = lineRows(docs, idCol, textCol)
      .select(col(idCol), normLine(col("_line")).as("_n"))
      .where(length(col("_n")) > 0)
      .distinct()
      .groupBy(col("_n"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select(col("_n"))
      .limit(maxLines + 1)
      .collect()
    require(
      lines.length <= maxLines,
      s"common-line table exceeds maxLines=$maxLines — not broadcastable; " +
        "raise minDf or the cap, or use the distributed removeCommonLines")
    val hashes = lines.map(r => Hashing.hashString(r.getString(0)))
    java.util.Arrays.sort(hashes)
    spark.sparkContext.broadcast(hashes)
  }

  /** Ingestion-time line scrub: removes lines whose normalized form is
    * in the PRE-COMPUTED broadcast table — a stateless per-row
    * projection (batch OR streaming), so a stream scrubs known
    * boilerplate with no shuffle and no state, exactly like
    * [[SpanDedup.streamingRemoveSpans]]. The probe is the one UDF
    * class this library allows: a broadcast-table membership test
    * Catalyst cannot express. Parity with [[removeCommonLines]] over
    * the same corpus/minDf is pinned by spec (the trim below mirrors
    * SQL `trim`: spaces only, unlike String.trim).
    */
  def streamingRemoveCommonLines(
      df: DataFrame,
      textCol: String,
      common: org.apache.spark.broadcast.Broadcast[Array[Long]]
  ): DataFrame = {
    val cut = udf { (t: String) =>
      if (t == null) ""
      else {
        def sqlTrim(s: String): String = {
          var b = 0
          var e = s.length
          while (b < e && s.charAt(b) == ' ') b += 1
          while (e > b && s.charAt(e - 1) == ' ') e -= 1
          s.substring(b, e)
        }
        t.split("\n", -1)
          .filter { l =>
            // Locale.ROOT: the broadcast table was normalized by Spark's
            // locale-independent lower(); a tr/az default locale would
            // map 'I' -> dotless i and silently miss the table
            val n = sqlTrim(l).toLowerCase(java.util.Locale.ROOT)
            n.isEmpty ||
            java.util.Arrays.binarySearch(common.value, Hashing.hashString(n)) < 0
          }
          .mkString("\n")
      }
    }
    df.withColumn(textCol, cut(col(textCol)))
  }
}
