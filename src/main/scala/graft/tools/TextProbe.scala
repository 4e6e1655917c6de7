package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Dev tool: which part of the text-annotation pass costs time. */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[text] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
    }
    t("count")(d.count())
    t("token_count only")(d.select(TextOps.tokenCount(col("text"))).agg(sum("*")).head())
    t("split only")(d.select(size(split(lower(col("text")), "\\s+"))).agg(sum("*")).head())
    t("langId only")(d.select(TextOps.langId(col("text")).as("l")).groupBy("l").count().count())
    t("quality only")(d.select(TextOps.qualityScore(col("text")).as("q")).agg(avg("q")).head())
    t("fingerprint only")(d.select(TextOps.fingerprintCol(col("text"))).agg(count("*")).head())
    t("annotate full")(TextOps.annotate(d, "text").agg(count("*")).head())
    t("annotate again")(TextOps.annotate(d, "text").agg(count("*")).head())
    spark.stop()
  }
}
