package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Curation
import graft.text.Repetition

/** Dev probe: attribute q_curate_gopher_ngrams's bench cost — is it
  * the n-gram gate, the injected corpus, or the chain? Times each
  * variant twice (cold, warm) on the same session.
  */
object CurateNgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    val docs = graft.SparkEntry.injectedRepeats(spark, dir)
    val corpus = docs.where(col("doc_id") % 20 =!= 0)
    val eval = docs.where(col("doc_id") % 20 === 0).select(col("text"))
    def chain(ng: Option[Curation.GopherNgramRules]) = Curation.curate(
      spark, corpus, eval, "doc_id", "text", "lang", "text",
      minTokens = 20, rates = Map("en" -> 0.5, "zh" -> 0.25), defaultRate = 0.1,
      shingleN = 6, gopherNgrams = ng)
    time("chain, no ngram stage")(chain(None).count())
    time("chain + ngram stage")(chain(Some(Curation.GopherNgramRules())).count())
    time("gate alone (filter)")(corpus.where(Repetition.gopherNgramPasses(col("text"))).count())
    time("signals alone (project)")(
      Repetition.addGopherNgramFlags(Repetition.addNgramSignals(corpus, "text"))
        .where(col("ngram_passes")).count())
    spark.stop()
  }
}
