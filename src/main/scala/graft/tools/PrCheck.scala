package graft.tools

import org.apache.spark.sql.SparkSession

import graft.kg.Dictionary
import graft.pipeline.KGPipeline
import graft.synth.{GenConfig, TranscriptGen}

/** Dev tool: end-to-end triple P/R vs the generation oracle at an
  * arbitrary corpus config. Usage: runMain graft.tools.PrCheck
  * [numConvs] [numEntities]
  */
object PrCheck {
  def main(args: Array[String]): Unit = {
    val numConvs = args.headOption.map(_.toInt).getOrElse(500)
    val numEntities = args.lift(1).map(_.toInt).getOrElse(800)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cfg = GenConfig(seed = 42L, numConvs = numConvs, numEntities = numEntities)
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    val got = KGPipeline
      .run(spark, TranscriptGen.transcripts(spark, cfg), dict)
      .edges
      .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
      .collect()
      .toSet
    val want = TranscriptGen
      .expectedTriples(spark, cfg)
      .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
      .collect()
      .toSet
    val tp = (got & want).size.toDouble
    val p = if (got.isEmpty) 0.0 else tp / got.size
    val r = if (want.isEmpty) 0.0 else tp / want.size
    println(f"[pr] convs=$numConvs entities=$numEntities got=${got.size} want=${want.size} P=$p%.4f R=$r%.4f")
    if (p < 1.0 || r < 1.0) {
      (want -- got).take(3).foreach(t => println(s"[pr] MISSING $t"))
      (got -- want).take(3).foreach(t => println(s"[pr] EXTRA   $t"))
    }
    spark.stop()
  }
}
