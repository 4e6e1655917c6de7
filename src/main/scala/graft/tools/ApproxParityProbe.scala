package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measurement tool (not part of the library surface): checks whether
  * the approximate-family queries are EXACTLY equal to their exact
  * counterparts on the driver corpora — the precondition for giving
  * them hard DuckDB oracles (VERDICT r2 next-round #3).
  */
object ApproxParityProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def diff(name: String, a: DataFrame, b: DataFrame): Unit = {
      val onlyA = a.exceptAll(b).count()
      val onlyB = b.exceptAll(a).count()
      println(s"$name: a=${a.count()} b=${b.count()} onlyA=$onlyA onlyB=$onlyB " +
        (if (onlyA == 0 && onlyB == 0) "EQUAL" else "DIFF"))
    }

    for (dir <- dirs) {
      println(s"== $dir")
      val q = graft.SparkEntry.queries
      diff("minhash_vs_jaccard", q("q_dedup_minhash")(spark, dir), q("q_jaccard_pairs")(spark, dir))
      diff("hotspot_approx_vs_exact",
        q("q_hotspot_approx")(spark, dir).withColumnRenamed("n_sessions_approx", "n"),
        q("q_hotspot_cells")(spark, dir).withColumnRenamed("n_sessions", "n"))
      diff("ann_lsh_vs_brute", q("q_ann_lsh")(spark, dir), q("q_ann_topk")(spark, dir))
      diff("ann_ivf_vs_brute", q("q_ann_ivf")(spark, dir), q("q_ann_topk")(spark, dir))
    }
    spark.stop()
  }
}
