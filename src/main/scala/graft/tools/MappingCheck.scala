package graft.tools

import org.apache.spark.sql.SparkSession

import graft.kg.Dictionary
import graft.link.Linker
import graft.pipeline.KGPipeline

/** Dev tool: canonical-mapping accuracy + timing at dictionary scale
  * (stresses LSH blocking + scoring + CC without the turn stream).
  * Usage: runMain graft.tools.MappingCheck [numEntities]
  */
object MappingCheck {
  def main(args: Array[String]): Unit = {
    val numEntities = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dict = Dictionary.build(42L, numEntities)
    println(s"[map] surfaces=${dict.size}")
    val t0 = System.nanoTime()
    val mapping = KGPipeline.canonicalMapping(spark, dict, Linker.LshConfig())
      .as[(Long, Long)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    val truth = dict.map(s => s.surfaceId -> s.canonicalId).toMap
    val wrong = truth.count { case (k, v) => mapping(k) != v }
    println(f"[map] entities=$numEntities surfaces=${dict.size} wrong=$wrong acc=${1.0 - wrong.toDouble / truth.size}%.6f secs=$secs%.1f")
    spark.stop()
  }
}
