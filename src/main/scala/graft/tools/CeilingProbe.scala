package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.Mentions
import graft.kg.Dictionary
import graft.pipeline.KGPipeline
import graft.synth.TranscriptGen

/** Dev tool: stage breakdown of the SCALING workload (ScalingBench's
  * exact config) at one core count, fresh JVM — what bounds the
  * 32-core ceiling?
  */
object CeilingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val numConvs = args.drop(1).headOption.map(_.toInt).getOrElse(1000000)
    val cfg = ScalingBench.cfgFor(numConvs)
    // JIT warmup at small scale (same protocol as ScalingBench); runAt
    // owns and stops its own session, so run it before building ours
    ScalingBench.runAt(cores = cores, cfg = cfg.copy(numConvs = 20000))
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ceiling] cores=$cores $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    val turns = TranscriptGen.transcripts(spark, cfg)
    t("gen only (count)")(turns.count())
    val bc = spark.sparkContext.broadcast(dict.toArray)
    t("gen+extract (count)")(Mentions.extract(spark, turns, bc).count())
    t("mapping (count)")(KGPipeline.canonicalMapping(spark, dict, graft.link.Linker.LshConfig()).count())
    t("full pipeline (counts)") {
      val r = KGPipeline.run(spark, turns, dict)
      (r.edges.count(), r.vertices.count())
    }
    spark.stop()
  }
}
