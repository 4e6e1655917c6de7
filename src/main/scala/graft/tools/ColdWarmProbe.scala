package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement tool: cold (first execution — plan + codegen + JIT) vs
  * warm (second execution, same session) cost per query, for the bench
  * attribution table in PLANS.md. Run at the bench config
  * (local[32], sf0.1) for comparable numbers.
  */
object ColdWarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings").foreach(t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () })
    graft.SparkEntry.prepareKg(spark, sfDir)
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println("| query | cold (s) | warm (s) |")
    println("|---|---|---|")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      val cold = t(fn(spark, sfDir).count())
      val warm = t(fn(spark, sfDir).count())
      println(f"| $n | $cold%.2f | $warm%.2f |")
    }
    spark.stop()
  }
}
