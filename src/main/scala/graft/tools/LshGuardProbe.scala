package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measurement probe for the q_curate_lsh_guard floor: on the
  * q_curate_neardup corpus (clips, %20 holdout removed, post exact
  * dedup), compare the MinHash-LSH near-dup stage's survivor set
  * against the recall-complete exact-Jaccard stage's at the shipped
  * config (threshold 0.6, 3-gram shingles, 16 bands x 4 rows).
  * Containment (exact survivors ⊆ LSH survivors) must hold by
  * construction; the removal recall is the measured quantity the guard
  * row asserts a floor on.
  */
object LshGuardProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("lsh-guard-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { dir =>
      val corpus = graft.SparkEntry.docsWithClipsLang(spark, dir).where(col("doc_id") % 20 =!= 0)
      val deduped = Dedup.normalizedExact(corpus, "doc_id", "text")
      val n = deduped.count()
      val exact = Dedup
        .nearDupSurvivorsFromPairs(
          deduped, Dedup.jaccardPairsExact(spark, deduped, "doc_id", "text", 3, 0.6), "doc_id")
        .select("doc_id").as[Long].collect().toSet
      val lsh = Dedup
        .nearDupSurvivorsFromPairs(
          deduped, Dedup.minhashNearDupPairs(spark, deduped, "doc_id", "text", 3, 0.6, 16, 4),
          "doc_id")
        .select("doc_id").as[Long].collect().toSet
      val violations = exact -- lsh // must be empty (LSH pairs ⊆ exact pairs)
      val removedExact = n - exact.size
      val removedLsh = n - lsh.size
      val recall = if (removedExact == 0) 1.0 else removedLsh.toDouble / removedExact
      println(s"[lsh-guard] $dir n=$n exactSurv=${exact.size} lshSurv=${lsh.size} " +
        s"violations=${violations.size} removedExact=$removedExact removedLsh=$removedLsh recall=$recall")
    }
    spark.stop()
  }
}
