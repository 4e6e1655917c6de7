package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Substring / passage-level deduplication: find the duplicated SPANS
  * inside documents — token ranges whose n-gram windows also occur in
  * other documents — rather than whole near-duplicate documents.
  * Document-granularity near-dup (the [[Dedup]] MinHash/Jaccard
  * family) keeps a document that embeds a verbatim 500-token
  * boilerplate block present in a million others; this operator is the
  * one that sees the block. The design follows the suffix-free
  * approximation used by large-corpus dedup pipelines (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL'22
  * — their ExactSubstr uses suffix arrays; at cluster scale the
  * standard re-expression is position-indexed n-gram windows, which is
  * what composes with Spark's shuffle machinery).
  *
  * Plan shape, built for the 100-TB corpus:
  *   1. position-indexed word n-grams — narrow (id, pos, gramHash)
  *      rows; the text itself never rides a shuffle, and positions are
  *      bounded by document length (documents are KB–MB, never TB);
  *   2. gram document-frequency — one hash aggregation over the 8-byte
  *      gram key with map-side partial aggregation; grams kept when
  *      df >= minDf (a gram in only one document cannot witness
  *      cross-document duplication);
  *   3. positions of duplicated grams rejoin by gram (left-semi,
  *      narrow keys both sides), then merge into maximal spans per
  *      document with a per-document window — gaps-and-islands: a new
  *      island starts where the next window start is more than n past
  *      the previous one (window [s, s+n-1] and a start <= s+n overlap
  *      or touch). Per-document windows are bounded tasks for the same
  *      reason as step 1.
  *
  * Shingle semantics match [[Dedup.wordShingles]] tokenization
  * (lowercase, whitespace-split) but KEEP positions and repeats —
  * a repeated gram occupies every position it appears at. Documents
  * shorter than n tokens emit nothing (a doc that cannot contain an
  * n-token window has no span; whole-document duplication is exact
  * dedup's job). The DuckDB oracle replays the whole thing on gram
  * STRINGS (collisions of the 64-bit gram hash are the only divergence
  * risk, ~n²/2^65).
  */
object SpanDedup {

  /** Position-indexed n-gram hashes: (idCol, pos, gram); pos is the
    * 0-based index of the window's first token.
    */
  def positionalGrams(
      spark: SparkSession,
      df: DataFrame, // (idCol, textCol)
      idCol: String,
      textCol: String,
      shingleN: Int
  ): DataFrame = {
    // the word_gram_hashes codegen expression + posexplode replaces the
    // typed flatMap (encoder round-trip per row, codegen barrier); a
    // null text yields a null array, which posexplode drops — the same
    // zero rows the old Iterator.empty produced
    df.select(
        col(idCol).cast("long").as(idCol),
        posexplode(graft.functions.TextExpressions
          .word_gram_hashes(col(textCol).cast("string"), shingleN)))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("gram"))
  }

  /** Duplicated-span report: one row per maximal duplicated span,
    * (idCol, span_start, span_end, n_dup_grams) — token positions
    * inclusive, n_dup_grams the number of duplicated n-gram windows
    * merged into the span. A span's every covered token sits under at
    * least one n-gram window shared (at any position) with >= minDf-1
    * other documents.
    */
  def duplicateSpans(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 6,
      minDf: Int = 2,
      maxDf: Option[Long] = None
  ): DataFrame = {
    val grams = positionalGrams(spark, df, idCol, textCol, shingleN)
    val dupGrams = dupGramTable(grams, idCol, minDf, maxDf)
    val dupPos = grams.join(dupGrams, Seq("gram"), "left_semi").select(col(idCol), col("pos"))

    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = dupPos
      .withColumn(
        "_brk",
        when(lag(col("pos"), 1).over(byDoc).isNull, 1)
          .when(col("pos") - lag(col("pos"), 1).over(byDoc) > shingleN, 1)
          .otherwise(0))
      .withColumn(
        "_isl",
        sum(col("_brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands
      .groupBy(col(idCol), col("_isl"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + (shingleN - 1)).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_dup_grams"))
  }

  /** Per-document duplication profile derived from the span report:
    * (idCol, n_spans, dup_tokens, total_tokens, dup_fraction) — the
    * number a curation policy thresholds on ("drop documents that are
    * mostly boilerplate"). Spans within a document never overlap (the
    * report merges them), so their lengths sum exactly.
    */
  def spanStats(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 6,
      minDf: Int = 2
  ): DataFrame =
    spanStatsFromReport(df, duplicateSpans(spark, df, idCol, textCol, shingleN, minDf), idCol, textCol)

  /** [[spanStats]] from an already-computed span report — callers that
    * consume the report twice (profile + surgery) compute the gram
    * aggregation once.
    */
  def spanStatsFromReport(
      df: DataFrame,
      spanReport: DataFrame, // duplicateSpans output for the SAME (shingleN, minDf)
      idCol: String,
      textCol: String
  ): DataFrame = {
    val spans = spanReport
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    val totals = df.select(
      col(idCol).cast("long").as(idCol),
      graft.text.TextOps.tokenCount(col(textCol)).cast("long").as("total_tokens"))
    totals
      .join(spans, Seq(idCol), "inner")
      .select(
        col(idCol),
        col("n_spans"),
        col("dup_tokens"),
        col("total_tokens"),
        round(col("dup_tokens") / col("total_tokens"), 6).as("dup_fraction"))
  }

  /** Span SURGERY — cut, don't drop (the action of Lee et al.'s
    * ExactSubstr dedup, ACL'22 §4.1: *remove the duplicated substring,
    * keep the document*): rebuild each flagged document's text with its
    * duplicated spans excised. Documents with no duplicated span pass
    * through byte-identical; a rebuilt document's surviving tokens are
    * re-joined with single spaces (the span positions are token
    * indices, so the original inter-token whitespace inside a rebuilt
    * document is not recoverable — documented normalization, the same
    * convention as [[graft.text.TextOps.normalized]]); a document
    * whose every token is covered becomes the empty string.
    *
    * Plan: the narrow span report aggregates to one row per flagged
    * document (id, array of [start,end]); the corpus left-joins it on
    * the id key (one exchange of the text — inherent to a rewrite) and
    * the excision is a pure higher-order-function expression
    * (positional `filter` + `exists` over the span array — no UDF).
    * Token positions are the whitespace-split indices of
    * [[positionalGrams]]; lowercasing never moves whitespace, so the
    * original-case tokens align with the report's positions.
    */
  def removeSpans(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 6,
      minDf: Int = 2,
      maxDf: Option[Long] = None
  ): DataFrame =
    removeSpansFromReport(
      df, duplicateSpans(spark, df, idCol, textCol, shingleN, minDf, maxDf), idCol, textCol)

  /** [[removeSpans]] from an already-computed span report. */
  def removeSpansFromReport(
      df: DataFrame,
      spanReport: DataFrame, // duplicateSpans output for the SAME (shingleN, minDf)
      idCol: String,
      textCol: String
  ): DataFrame = {
    import graft.util.Cols.fresh
    val names = df.columns.toSet
    val cId = fresh(names, "_sdc_id")
    val cSpans = fresh(names + cId, "_sdc_spans")
    val spans = spanReport
      .groupBy(col(idCol).as(cId))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as(cSpans))
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val kept = filter(
      toks,
      (t, i) =>
        !exists(
          col(cSpans),
          s => i.cast("long") >= s.getField("span_start") && i.cast("long") <= s.getField("span_end")))
    df.join(spans, col(idCol).cast("long") === col(cId), "left")
      .withColumn(
        textCol,
        when(col(cSpans).isNull, col(textCol)).otherwise(array_join(kept, " ")))
      .drop(cId, cSpans)
  }

  /** THE dup-gram selection (one definition for the batch report and
    * the streaming broadcast table — SpanDedupSpec pins their
    * equality): document frequency over distinct docs, kept when
    * df >= minDf; maxDf is the extreme-scale stoplist cap (a gram in
    * more than maxDf documents — ubiquitous boilerplate vocabulary —
    * is its own signal and would otherwise fan its positions into
    * every doc's span merge; default off, min-df alone is the
    * correctness definition).
    */
  private def dupGramTable(
      posGrams: DataFrame,
      idCol: String,
      minDf: Int,
      maxDf: Option[Long]
  ): DataFrame =
    maxDf.foldLeft(
      posGrams
        .groupBy(col("gram"))
        .agg(countDistinct(col(idCol)).as("_df"))
        .where(col("_df") >= minDf)
    ) { (d, cap) => d.where(col("_df") <= cap) }
      .select(col("gram"))

  /** Reference-corpus duplicated-gram table for the STREAMING flagger:
    * the sorted gram hashes whose document frequency in `df` is >=
    * minDf (optionally <= maxDf), as a broadcast unboxed Array[Long]
    * probed by binary search — the same shape as
    * [[Decontam.evalGramSet]]. The gram df is the one corpus-global
    * quantity span detection needs; once broadcast, per-document span
    * merging is a pure local computation, which is what makes the
    * streaming variant stateless. The limit is the guard: at most
    * maxGrams + 1 hashes ever reach the driver.
    */
  def dupGramSet(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 6,
      minDf: Int = 2,
      maxDf: Option[Long] = None,
      maxGrams: Int = 5000000
  ): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    import spark.implicits._
    val dup = dupGramTable(positionalGrams(spark, df, idCol, textCol, shingleN), idCol, minDf, maxDf)
    val grams = dup.as[Long].limit(maxGrams + 1).collect()
    require(grams.length <= maxGrams,
      s"duplicated-gram set (> $maxGrams grams) exceeds maxGrams=$maxGrams — not broadcastable; " +
        "raise minDf or set a maxDf stoplist cap")
    java.util.Arrays.sort(grams)
    spark.sparkContext.broadcast(grams)
  }

  /** Streaming span profile: stateless per-row span detection of a
    * streamed (or batch) corpus against the broadcast duplicated-gram
    * table — appends (n_spans, dup_tokens, total_tokens, dup_fraction)
    * columns with EXACTLY [[spanStats]]'s merge semantics (docs with no
    * duplicated window get zeros; batch spanStats omits them — its
    * report is inner-joined). No watermark, no state store: the
    * corpus-global part (gram df) lives in the broadcast, so
    * ingestion-time boilerplate flagging is a pure map at any scale.
    */
  def streamingSpanStats(
      df: DataFrame, // batch OR streaming, carries textCol
      textCol: String,
      dupGrams: org.apache.spark.broadcast.Broadcast[Array[Long]],
      shingleN: Int = 6
  ): DataFrame = {
    // total_tokens replicates TextOps.tokenCount EXACTLY (Spark trim
    // strips only 0x20 spaces and Spark split keeps empty tokens), so
    // the streaming profile equals batch spanStats byte-for-byte even
    // on text with leading/trailing tabs or newlines
    def sparkTokenCount(t: String): Long = {
      var b = 0; var e = t.length
      while (b < e && t.charAt(b) == ' ') b += 1
      while (e > b && t.charAt(e - 1) == ' ') e -= 1
      if (e == b) 0L else t.substring(b, e).split("\\s+", -1).length.toLong
    }
    val stats = udf { (t: String) =>
      if (t == null) (0, 0L, 0L, 0.0)
      else {
        // Locale.ROOT: under a tr/az default locale String.toLowerCase
        // would tokenize 'I' differently from SQL lower() and the
        // DuckDB oracle (the LineDedup streaming-scrub fix, applied
        // here too)
        val toks = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        val total = sparkTokenCount(t)
        if (toks.length < shingleN) (0, 0L, total, 0.0)
        else {
          val positions = (0 to toks.length - shingleN).iterator.filter { i =>
            val h = Hashing.hashString(toks.slice(i, i + shingleN).mkString(" "))
            java.util.Arrays.binarySearch(dupGrams.value, h) >= 0
          }.toArray
          if (positions.isEmpty) (0, 0L, total, 0.0)
          else {
            // gaps-and-islands over the sorted positions, same merge
            // rule as duplicateSpans: next start <= previous + n stays
            var nSpans = 0
            var dupTokens = 0L
            var start = positions(0)
            var last = positions(0)
            var k = 1
            while (k <= positions.length) {
              if (k == positions.length || positions(k) - last > shingleN) {
                nSpans += 1
                dupTokens += (last + shingleN - 1) - start + 1
                if (k < positions.length) { start = positions(k) }
              }
              if (k < positions.length) last = positions(k)
              k += 1
            }
            val frac = BigDecimal(dupTokens.toDouble / total)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (nSpans, dupTokens, total, frac)
          }
        }
      }
    }
    df.withColumn("_span", stats(col(textCol)))
      .withColumn("n_spans", col("_span._1"))
      .withColumn("dup_tokens", col("_span._2"))
      .withColumn("total_tokens", col("_span._3"))
      .withColumn("dup_fraction", col("_span._4"))
      .drop("_span")
  }

  /** Streaming span SURGERY: stateless per-row [[removeSpans]] against
    * the broadcast duplicated-gram table — the ingestion-time cut
    * (boilerplate excised as documents arrive, no state store), the
    * same shape as [[streamingSpanStats]]. Semantics are pinned to the
    * batch operator digit-for-digit (SpanDedupSpec): a token is cut
    * iff it sits under a duplicated n-gram window, which equals the
    * batch form's merged-island cover (islands merge windows whose
    * starts are <= n apart — adjacent-or-overlapping covers — so the
    * island range IS the union of its window covers, no holes).
    * Span-free and sub-n-token documents pass through byte-identical;
    * rebuilt documents re-join surviving original-case tokens with
    * single spaces.
    */
  def streamingRemoveSpans(
      df: DataFrame, // batch OR streaming, carries textCol
      textCol: String,
      dupGrams: org.apache.spark.broadcast.Broadcast[Array[Long]],
      shingleN: Int = 6
  ): DataFrame = {
    val cut = udf { (t: String) =>
      if (t == null) null
      else {
        val low = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        if (low.length < shingleN) t
        else {
          val covered = new Array[Boolean](low.length)
          var any = false
          var i = 0
          while (i <= low.length - shingleN) {
            val h = Hashing.hashString(low.slice(i, i + shingleN).mkString(" "))
            if (java.util.Arrays.binarySearch(dupGrams.value, h) >= 0) {
              any = true
              var k = i
              while (k < i + shingleN) { covered(k) = true; k += 1 }
            }
            i += 1
          }
          if (!any) t
          else {
            // original-case tokens align with the lowercased positions
            // (lowercasing never moves whitespace)
            val orig = t.split("\\s+").filter(_.nonEmpty)
            val sb = new StringBuilder
            var j = 0
            while (j < orig.length) {
              if (!covered(j)) {
                if (sb.nonEmpty) sb.append(' ')
                sb.append(orig(j))
              }
              j += 1
            }
            sb.toString
          }
        }
      }
    }
    df.withColumn(textCol, cut(col(textCol)))
  }
}
