package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Decontam, Dedup, LineDedup, SpanDedup}
import graft.sampling.Sampling
import graft.text.TextOps

/** End-to-end training-corpus curation: the library's data-quality
  * operators composed in the canonical order a 100-TB pipeline runs
  * them —
  *
  *   1. exact-normalized dedup (cheapest win first: a narrow
  *      hash-keyed shuffle removes trivially-mutated copies before any
  *      heavier stage sees them),
  *   2. optional NEAR-duplicate removal (the 100-TB recipe runs exact
  *      dedup THEN near-dup before decontamination: a similarity pair
  *      join — exact prefix-filtered Jaccard or MinHash-LSH — feeding
  *      the pairwise smaller-id-wins survivor policy),
  *   2b. optional cross-document LINE dedup ([[LineDedup]]): cut lines
  *      appearing in >= lineDedupMinDf documents (nav bars, banners)
  *      BEFORE the span stage, so passage detection and every
  *      downstream signal judge the de-boilerplated text,
  *   3. optional BOILERPLATE handling: drop documents whose
  *      [[SpanDedup.spanStats]] duplicated-token fraction exceeds a
  *      cap, and/or CUT the duplicated spans out of the survivors
  *      ([[SpanAction.CutSpans]] — keep the doc, excise the
  *      boilerplate) — the passage-level signal whole-document
  *      near-dup cannot see (a doc that is 80% shared boilerplate
  *      survives stages 1-2 whenever its unique 20% keeps pairwise
  *      Jaccard low),
  *   4. benchmark decontamination (broadcast eval grams; corpus text
  *      never shuffles),
  *   5. quality floor (pure column predicates — a token-count minimum,
  *      the composite [[TextOps.qualityScore]], and/or the Gopher
  *      repetition rules via [[graft.text.Repetition.gopherPasses]] and
  *      the line-family rules via
  *      [[graft.text.Repetition.gopherLinePasses]]),
  *   6. deterministic stratified sampling (a pure scan-side predicate
  *      on the two-residue id-hash — the mix step).
  *
  * Stages 5-6 are predicates and fuse into one codegen'd filter over
  * stage 4's output. Corpus-wide shuffles: the dedup fingerprint
  * group-by and its semi-join back, plus the near-dup pair join and
  * the span-stats gram aggregation when those stages are enabled;
  * decontamination adds only collision-sized exchanges (the per-doc
  * aggregation of the broadcast-join match stream and the left-anti on
  * the narrow id key). Every stage is individually value-oracled
  * (q_dedup_norm, q_jaccard_pairs / q_neardup_survivors, q_span_stats,
  * q_decontam_clean, q_text_stats, q_sample_stratified) and the
  * compose is oracled end-to-end (q_curate, q_curate_neardup).
  */
object Curation {

  /** Near-duplicate stage selector for [[curate]]. */
  sealed trait NearDupStage
  object NearDupStage {

    /** Skip near-dup removal (exact-normalized dedup only). */
    case object Off extends NearDupStage

    /** Recall-complete prefix-filtered exact Jaccard pair join
      * ([[Dedup.jaccardPairsExact]]) — deterministic and
      * oracle-replayable; the default when correctness is audited.
      */
    final case class ExactJaccard(threshold: Double, shingleN: Int = 3) extends NearDupStage

    /** MinHash-LSH banding with exact re-scoring
      * ([[Dedup.minhashNearDupPairs]]) — the cheaper scale path;
      * recall is the banding recall at the configured (bands, rows).
      */
    final case class MinHashLsh(
        threshold: Double,
        shingleN: Int = 3,
        numBands: Int = 16,
        rowsPerBand: Int = 4
    ) extends NearDupStage
  }

  /** Boilerplate-stage action on the [[SpanDedup]] signal. */
  sealed trait SpanAction
  object SpanAction {

    /** Drop whole documents whose duplicated-token fraction exceeds
      * `maxDupFraction` (the conservative policy: a mostly-boilerplate
      * document is not worth keeping).
      */
    case object DropDocs extends SpanAction

    /** Span SURGERY ([[SpanDedup.removeSpans]] — Lee et al.'s
      * ExactSubstr action): excise the duplicated spans and KEEP the
      * documents. When `maxDupFraction` is also set, documents over
      * the cap still drop (they are boilerplate wholesale) and the
      * survivors get their spans cut; both decisions read the same
      * span report, measured once on the post-near-dup (and, when that
      * stage is on, post-line-dedup) corpus.
      * Downstream stages (decontam, quality, sampling) see the CUT
      * text — the pipeline order a real curation run wants (remove
      * boilerplate, then decontaminate what remains).
      */
    case object CutSpans extends SpanAction
  }

  /** Thresholds for the optional Gopher repetition-rule stage
    * ([[graft.text.Repetition.gopherPasses]]) — intra-document quality
    * rules (word count/shape, duplicated-unit and top-n-gram caps)
    * applied alongside the token/quality floor as one fused scan-side
    * predicate. Defaults mirror `Repetition.addGopherFlags`.
    */
  final case class GopherRules(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordFraction: Double = 0.8,
      maxDupUnitFraction: Double = 0.5,
      maxTopNgramCharFraction: Double = 0.2)

  /** Thresholds for the optional Gopher LINE-rule stage
    * ([[graft.text.Repetition.gopherLinePasses]]) — the MassiveText
    * line family (duplicate-line and duplicate-line-character caps,
    * bullet-start and ellipsis-end caps) for multi-line corpora, which
    * the word-level [[GopherRules]] cannot see. Fuses into the same
    * scan-side filter; single-line documents pass vacuously (no line
    * evidence against them). Defaults mirror
    * `Repetition.addLineFlags`.
    */
  final case class GopherLineRules(
      maxDupLineFraction: Double = 0.3,
      maxDupLineCharFraction: Double = 0.2,
      maxBulletLineFraction: Double = 0.9,
      maxEllipsisLineFraction: Double = 0.3)

  /** Caps for the optional full n-gram rule stage
    * ([[graft.text.Repetition.gopherNgramPasses]]) — the Table A1
    * top-n-gram (n = 2..4) and duplicated-n-gram (n = 5..10) character
    * caps. Defaults are the published thresholds; override the maps to
    * tune or drop individual n. Fuses into the same scan-side filter.
    */
  final case class GopherNgramRules(
      topCaps: Map[Int, Double] = graft.text.Repetition.TopNgramCaps,
      dupCaps: Map[Int, Double] = graft.text.Repetition.DupNgramCaps)

  /** The chain with its stage plans exposed (all lazy DataFrames —
    * nothing is computed until a consumer acts): lets a driver write
    * the SAME contamination report / span profile / near-dup pair
    * table the pipeline thresholded, instead of recomputing an audit
    * over a different corpus that may contradict the stage decisions.
    */
  final case class Staged(
      deduped: DataFrame,
      nearDupPairs: Option[DataFrame], // what the survivor policy consumed
      afterNearDup: DataFrame,
      // the fingerprint table the line cut consumed (Some iff the line
      // dedup stage is on) and the corpus after the cut
      commonLineTable: Option[DataFrame],
      afterLineDedup: DataFrame,
      spanReport: Option[DataFrame], // the spans both span decisions read
      spanProfile: Option[DataFrame], // what the boilerplate cap thresholded
      afterSpans: DataFrame,
      contaminationReport: DataFrame, // what the anti-join removed
      cleaned: DataFrame,
      qualified: DataFrame,
      sampled: DataFrame,
      // the corpus the gopher stage(s) thresholded (post-floors,
      // pre-rules; Some iff the word OR line stage is on) — the audit
      // input, so a flag-count report reads the exact plan the stage
      // filtered. With both families on, each family's report counts
      // its own bite over this shared evaluated corpus independently.
      gopherEvaluated: Option[DataFrame] = None
  )

  def curateStaged(
      spark: SparkSession,
      docs: DataFrame, // (idCol, textCol, strataCol, ...)
      evalDocs: DataFrame, // (evalTextCol)
      idCol: String,
      textCol: String,
      strataCol: String,
      evalTextCol: String,
      minTokens: Int,
      rates: Map[String, Double],
      defaultRate: Double,
      shingleN: Int = 3,
      nearDup: NearDupStage = NearDupStage.Off,
      qualityFloor: Option[Double] = None,
      maxDupFraction: Option[Double] = None,
      spanShingleN: Int = 6,
      spanMinDf: Int = 2,
      spanAction: SpanAction = SpanAction.DropDocs,
      gopher: Option[GopherRules] = None,
      gopherLines: Option[GopherLineRules] = None,
      gopherNgrams: Option[GopherNgramRules] = None,
      lineDedupMinDf: Option[Int] = None,
      // any extra scan-side predicate fused into the same quality
      // filter (e.g. Repetition.gopherParagraphPasses(col(textCol)),
      // a domain blocklist, a language gate): it judges the text the
      // pipeline would actually ship (post line-dedup / span surgery),
      // which a pre-curate filter on the raw input cannot
      extraRule: Option[Column] = None
  ): Staged = {
    // Plan-boundary rule (this file): a NARROW decision table whose
    // producing subtree would otherwise be re-planned into MULTIPLE
    // consuming branches — the near-dup pair table, the common-line
    // fingerprint table, the span report — is cut with a LAZY
    // localCheckpoint. Without the cut, the DataFrame API re-inlines
    // the subtree per branch (the measured q_curate_neardup plan was
    // 1378 nodes / 304 Exchanges; runtime exchange-reuse dedups the
    // execution, but the driver still plans, optimizes and codegens
    // the whole tree). With it, each decision table is planned once
    // and its consumers see a leaf. Single-consumer tables (the
    // contamination report) are NOT cut: measured, the barrier alone
    // costs ~0.3-1 s per chain with nothing deduplicated in return.
    // The WIDE corpus stages stay lazy/recomputed per the documented
    // caching policy — at 100-TB scale these same narrow tables are
    // the ones a real run stages (RunCuration's persisted prefixes),
    // while pinning the corpus itself would not fit.
    def cut(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
    val deduped = Dedup.normalizedExact(docs, idCol, textCol)
    val nearDupPairs = (nearDup match {
      case NearDupStage.Off => None
      case NearDupStage.ExactJaccard(t, n) =>
        Some(Dedup.jaccardPairsExact(spark, deduped, idCol, textCol, n, t))
      case NearDupStage.MinHashLsh(t, n, bands, rows) =>
        Some(Dedup.minhashNearDupPairs(spark, deduped, idCol, textCol, n, t, bands, rows))
    }).map(cut)
    val afterNearDup = nearDupPairs.fold(deduped)(
      Dedup.nearDupSurvivorsFromPairs(deduped, _, idCol))
    // cross-document line dedup cuts >= minDf-common lines BEFORE the
    // span stage, so passage detection and every downstream signal
    // judge the de-boilerplated text; the consumed fingerprint table is
    // exposed for the audit
    val commonLineTable = lineDedupMinDf.map(minDf =>
      cut(LineDedup.commonLines(afterNearDup, idCol, textCol, minDf)))
    val afterLineDedup = commonLineTable.fold(afterNearDup)(
      LineDedup.removeLines(afterNearDup, _, idCol, textCol))
    // the boilerplate stage is on when a drop cap is set OR the action
    // is surgery; both decisions read ONE span report measured on the
    // post-line-dedup corpus
    val spanStageOn = maxDupFraction.isDefined || spanAction == SpanAction.CutSpans
    val spanReport =
      if (spanStageOn)
        Some(cut(SpanDedup
          .duplicateSpans(spark, afterLineDedup, idCol, textCol, spanShingleN, spanMinDf)))
      else None
    val spanProfile = spanReport.map(
      SpanDedup.spanStatsFromReport(afterLineDedup, _, idCol, textCol))
    val afterDrop = maxDupFraction.zip(spanProfile).foldLeft(afterLineDedup) {
      case (df, (cap, profile)) =>
        df.join(
          profile.where(col("dup_fraction") > cap).select(col(idCol)),
          Seq(idCol), "left_anti")
    }
    val afterSpans = spanAction match {
      case SpanAction.DropDocs => afterDrop
      case SpanAction.CutSpans =>
        spanReport.fold(afterDrop)(
          SpanDedup.removeSpansFromReport(afterDrop, _, idCol, textCol))
    }
    // decontaminate = report + anti-join (same as Decontam.decontaminate,
    // opened up so the report the pipeline used IS the audit artifact)
    val report = Decontam
      .contaminationReport(spark, afterSpans, evalDocs, idCol, textCol, evalTextCol, shingleN)
    val cleaned = afterSpans.join(report.select(col(idCol)), Seq(idCol), "left_anti")
    val qualified0 = qualityFloor.foldLeft(
      cleaned.where(TextOps.tokenCount(col(textCol)) >= minTokens)
    ) { (df, floor) => df.where(TextOps.qualityScore(col(textCol)) >= floor) }
    // the Gopher repetition rules fuse into the same codegen'd filter
    // as the floors above — intra-doc signals, zero added shuffle;
    // applied AFTER span surgery so the rules judge the text that
    // would actually ship
    val qualifiedW = gopher.foldLeft(qualified0) { (df, r) =>
      df.where(graft.text.Repetition.gopherPasses(
        col(textCol),
        minWords = r.minWords, maxWords = r.maxWords,
        minMeanWordLen = r.minMeanWordLen, maxMeanWordLen = r.maxMeanWordLen,
        minAlphaWordFraction = r.minAlphaWordFraction,
        maxDupUnitFraction = r.maxDupUnitFraction,
        maxTopNgramCharFraction = r.maxTopNgramCharFraction))
    }
    val qualifiedL = gopherLines.foldLeft(qualifiedW) { (df, r) =>
      df.where(graft.text.Repetition.gopherLinePasses(
        col(textCol),
        maxDupLineFraction = r.maxDupLineFraction,
        maxDupLineCharFraction = r.maxDupLineCharFraction,
        maxBulletLineFraction = r.maxBulletLineFraction,
        maxEllipsisLineFraction = r.maxEllipsisLineFraction))
    }
    val qualifiedN = gopherNgrams.foldLeft(qualifiedL) { (df, r) =>
      df.where(graft.text.Repetition.gopherNgramPasses(col(textCol), r.topCaps, r.dupCaps))
    }
    val qualified = extraRule.foldLeft(qualifiedN)(_.where(_))
    val sampled = Sampling.stratified(qualified, strataCol, idCol, rates, defaultRate)
    Staged(deduped, nearDupPairs, afterNearDup, commonLineTable, afterLineDedup,
      spanReport, spanProfile, afterSpans, report,
      cleaned, qualified, sampled,
      gopherEvaluated =
        if (gopher.isDefined || gopherLines.isDefined || gopherNgrams.isDefined)
          Some(qualified0)
        else None)
  }

  def curate(
      spark: SparkSession,
      docs: DataFrame, // (idCol, textCol, strataCol, ...)
      evalDocs: DataFrame, // (evalTextCol)
      idCol: String,
      textCol: String,
      strataCol: String,
      evalTextCol: String,
      minTokens: Int,
      rates: Map[String, Double],
      defaultRate: Double,
      shingleN: Int = 3,
      nearDup: NearDupStage = NearDupStage.Off,
      qualityFloor: Option[Double] = None,
      maxDupFraction: Option[Double] = None,
      spanShingleN: Int = 6,
      spanMinDf: Int = 2,
      spanAction: SpanAction = SpanAction.DropDocs,
      gopher: Option[GopherRules] = None,
      gopherLines: Option[GopherLineRules] = None,
      gopherNgrams: Option[GopherNgramRules] = None,
      lineDedupMinDf: Option[Int] = None,
      extraRule: Option[Column] = None
  ): DataFrame =
    curateStaged(spark, docs, evalDocs, idCol, textCol, strataCol, evalTextCol,
      minTokens, rates, defaultRate, shingleN, nearDup, qualityFloor,
      maxDupFraction, spanShingleN, spanMinDf, spanAction, gopher, gopherLines,
      gopherNgrams, lineDedupMinDf, extraRule).sampled
}
