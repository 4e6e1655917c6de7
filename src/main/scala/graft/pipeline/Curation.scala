package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Decontam, Dedup}
import graft.sampling.Sampling
import graft.text.TextOps

/** End-to-end training-corpus curation: the library's data-quality
  * operators composed in the canonical order a 100-TB pipeline runs
  * them —
  *
  *   1. exact-normalized dedup (cheapest win first: a narrow
  *      hash-keyed shuffle removes trivially-mutated copies before any
  *      heavier stage sees them),
  *   2. benchmark decontamination (broadcast eval grams; corpus text
  *      never shuffles),
  *   3. quality floor (a pure column predicate — here the token
  *      count; swap in [[TextOps.qualityScore]] for the composite),
  *   4. deterministic stratified sampling (a pure scan-side predicate
  *      on the golden-ratio id-hash — the mix step).
  *
  * Stages 3-4 are predicates and fuse into one codegen'd filter over
  * stage 2's output; the whole chain shuffles exactly twice (the dedup
  * fingerprint group-by and its semi-join back). Every stage is
  * individually value-oracled (q_dedup_norm, q_decontam_clean,
  * q_text_stats, q_sample_stratified) and the compose is oracled
  * end-to-end (q_curate).
  */
object Curation {

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
      shingleN: Int = 3
  ): DataFrame = {
    val deduped = Dedup.normalizedExact(docs, idCol, textCol)
    val cleaned =
      Decontam.decontaminate(spark, deduped, evalDocs, idCol, textCol, evalTextCol, shingleN)
    val qualified = cleaned.where(TextOps.tokenCount(col(textCol)) >= minTokens)
    Sampling.stratified(qualified, strataCol, idCol, rates, defaultRate)
  }
}
