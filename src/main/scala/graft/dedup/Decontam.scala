package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and remove) corpus documents that
  * share at least one word n-gram window with a held-out evaluation
  * table — the standard n-gram-overlap contamination test applied to
  * training corpora before model training (the GPT-3 appendix-C /
  * open-data-curation recipe, re-expressed as a Spark plan).
  *
  * Plan shape — built for the asymmetry of the problem: the eval set is
  * tiny (benchmarks are thousands of documents) while the corpus is the
  * 100-TB side. Eval-side distinct n-gram hashes form a broadcast
  * dimension; the corpus side streams its shingles (narrow (id, hash)
  * rows — document text never rides a shuffle) through a broadcast hash
  * join. No corpus-side wide exchange at any scale; the only
  * aggregation is the per-doc shared-gram count on the (already
  * id-keyed) match stream.
  *
  * Shingle semantics are EXACTLY [[Dedup.wordShingles]] (lowercase,
  * whitespace-split, n-token windows hashed; documents shorter than n
  * tokens contribute their whole token sequence as one window) so
  * contamination composes with the dedup family's notion of overlap,
  * and the DuckDB oracle replays it string-for-string.
  */
object Decontam {

  /** Per-contaminated-doc report: (idCol, n_shared_grams) for every
    * corpus document sharing >= 1 word n-gram with `eval`, with the
    * count of DISTINCT shared grams as evidence weight.
    */
  def contaminationReport(
      spark: SparkSession,
      corpus: DataFrame, // (idCol, textCol)
      eval: DataFrame, // (evalTextCol)
      idCol: String,
      textCol: String,
      evalTextCol: String,
      shingleN: Int = 3
  ): DataFrame = {
    import spark.implicits._
    val evalGrams = eval
      .select(col(evalTextCol).cast("string"))
      .as[String]
      .flatMap(t => Dedup.wordShingles(t, shingleN))
      .distinct()
      .toDF("gram")
    val corpusGrams = corpus
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) => Dedup.wordShingles(t, shingleN).map(g => (id, g)) }
      .toDF("id", "gram")
    // wordShingles already dedups within a document, so count(*) after
    // the semi-restricting inner join IS the distinct shared-gram count
    corpusGrams
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The cleaned corpus: rows of `corpus` that share NO word n-gram
    * with `eval` (left-anti against the flagged ids on the narrow id
    * key).
    */
  def decontaminate(
      spark: SparkSession,
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      evalTextCol: String,
      shingleN: Int = 3
  ): DataFrame = {
    val flagged = contaminationReport(spark, corpus, eval, idCol, textCol, evalTextCol, shingleN)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
