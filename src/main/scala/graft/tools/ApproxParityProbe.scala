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
      // rank-free neighbor-id containment (recall@k) — the guard metric
      val brute = q("q_ann_topk")(spark, dir).select("query_id", "neighbor_id")
      val nBrute = brute.count()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.where(org.apache.spark.sql.functions.col("label") === 0)
        .orderBy(org.apache.spark.sql.functions.col("vec_id")).limit(20)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
      // HLL per-cell relative error vs exact (unfiltered cells) — the
      // error-bound-guard metric
      locally {
        import org.apache.spark.sql.functions.{col, abs, max, approx_count_distinct, countDistinct}
        val ev = spark.read.parquet(s"$dir/events.parquet")
          .select(col("user_id"), graft.ops.Blocks.gridCell(col("value"), 5.0).as("cell"))
        val a = ev.groupBy("cell").agg(approx_count_distinct(col("user_id")).as("a"))
        val e = ev.groupBy("cell").agg(countDistinct(col("user_id")).as("e"))
        val j = a.join(e, Seq("cell"))
        val maxErr = j.agg(max(abs(col("a") - col("e")) / col("e"))).head().getDouble(0)
        println(s"hll_max_rel_err: $maxErr")
        for (floor <- Seq(10, 20)) {
          val m = j.where(col("e") >= floor)
            .agg(max(abs(col("a") - col("e")) / col("e"))).head().getDouble(0)
          println(s"hll_max_rel_err_exact_ge_$floor: $m")
        }
      }
      for (nProbe <- Seq(4, 6, 8); km <- Seq(0, 5)) {
        val ivf = graft.ann.Ann.ivfTopK(spark, qs, emb, "vec_id", "embedding", 5,
            numLists = 16, nProbe = nProbe, kmeansIters = km)
          .select("query_id", "neighbor_id")
        val hits = ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(s"ann_ivf_recall_at_k nProbe=$nProbe km=$km: $hits / $nBrute = ${hits.toDouble / nBrute}")
      }
    }
    spark.stop()
  }
}
