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
    // shingling runs as the word_shingles codegen expression + explode
    // (the typed-flatMap form paid an encoder round-trip per row and
    // broke the scan's whole-stage-codegen span); same grams, same plan
    // shape downstream
    val evalGrams = eval
      .select(explode(graft.functions.TextExpressions
        .word_shingles(col(evalTextCol).cast("string"), shingleN)).as("gram"))
      .distinct()
    val corpusGrams = corpus
      .select(
        col(idCol).cast("long").as("id"),
        explode(graft.functions.TextExpressions
          .word_shingles(col(textCol).cast("string"), shingleN)).as("gram"))
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

  /** Per-(corpus doc, eval doc) contamination attribution: which eval
    * document each corpus document collides with, and on how many
    * distinct shared grams — the view an eval owner needs to decide
    * whether a hit is a real leak or a ubiquitous phrase. Same
    * broadcast plan as [[contaminationReport]]; the output fans out
    * only on actual collisions.
    */
  def contaminationMatrix(
      spark: SparkSession,
      corpus: DataFrame, // (idCol, textCol)
      eval: DataFrame, // (evalIdCol, evalTextCol)
      idCol: String,
      textCol: String,
      evalIdCol: String,
      evalTextCol: String,
      shingleN: Int = 3
  ): DataFrame = {
    import spark.implicits._
    val evalGrams = eval
      .select(
        col(evalIdCol).cast("long").as("eval_id"),
        explode(graft.functions.TextExpressions
          .word_shingles(col(evalTextCol).cast("string"), shingleN)).as("gram"))
    val corpusGrams = corpus
      .select(
        col(idCol).cast("long").as("corpus_id"),
        explode(graft.functions.TextExpressions
          .word_shingles(col(textCol).cast("string"), shingleN)).as("gram"))
    // wordShingles dedups within each document, so count(*) per
    // (corpus_id, eval_id) IS the distinct shared-gram count
    corpusGrams
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("corpus_id").as(idCol), col("eval_id").as(evalIdCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Eval-side broadcast gram table for the STREAMING flagger: the
    * eval slice is tiny by construction (benchmarks are thousands of
    * docs), so its distinct gram hashes collect to the driver and
    * broadcast once — as a SORTED unboxed Array[Long] (8 bytes/gram;
    * the default cap of 5M grams is a ~40 MB broadcast) probed by
    * binary search, not a boxed Set (which would multiply memory ~8x
    * and defeat the cap). Refuses surprisingly-large eval sets instead
    * of silently building an oversized broadcast.
    */
  def evalGramSet(
      spark: SparkSession,
      eval: DataFrame,
      evalTextCol: String,
      shingleN: Int = 3,
      maxGrams: Int = 5000000
  ): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    import spark.implicits._
    val distinctGrams = eval
      .select(explode(graft.functions.TextExpressions
        .word_shingles(col(evalTextCol).cast("string"), shingleN)).as("g"))
      .distinct()
      .as[Long]
    // the limit IS the guard: the driver materializes at most
    // maxGrams + 1 longs, and one extra element proves the eval set is
    // oversized before anything bigger ever reaches the driver (one
    // job, unlike a separate count() probe which would recompute the
    // distinct shuffle)
    val grams = distinctGrams.limit(maxGrams + 1).collect()
    require(grams.length <= maxGrams,
      s"eval gram set (> $maxGrams grams) exceeds maxGrams=$maxGrams — not a broadcastable eval slice")
    java.util.Arrays.sort(grams)
    spark.sparkContext.broadcast(grams)
  }

  /** Streaming decontamination flagger: stateless per-row check of a
    * streamed corpus against the broadcast sorted eval gram table —
    * appends `contaminated` (any shared gram) and `n_shared_grams`
    * columns. No watermark, no state store: ingestion-time filtering
    * is a pure map, which is exactly why it scales to an unbounded
    * stream (the batch [[contaminationReport]] remains the
    * corpus-level audit). Works identically on batch and streaming
    * DataFrames.
    */
  def streamingDecontamFlag(
      df: DataFrame, // batch OR streaming, carries textCol
      textCol: String,
      evalGrams: org.apache.spark.broadcast.Broadcast[Array[Long]],
      shingleN: Int = 3
  ): DataFrame = {
    val nShared = udf { (t: String) =>
      if (t == null) 0
      else Dedup.wordShingles(t, shingleN)
        .count(g => java.util.Arrays.binarySearch(evalGrams.value, g) >= 0)
    }
    df.withColumn("n_shared_grams", nShared(col(textCol)))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }
}
