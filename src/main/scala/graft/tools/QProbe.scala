package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-faithful single-query timing probe (dev tool): same session
  * config and warm-up as graft.Bench, NO prepareKg, then times the
  * named queries in the given order (cold = exactly what the bench
  * entry pays when it is the first of its family).
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings").foreach(t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () })
    for (n <- args) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qprobe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$rows)")
    }
    spark.stop()
  }
}
