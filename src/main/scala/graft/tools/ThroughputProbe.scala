package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.Mentions
import graft.kg.Dictionary
import graft.synth.{GenConfig, TranscriptGen}

/** Dev tool: turns/sec of the per-turn extraction path (gen -> trie
  * extract -> triples count) at one core count. Run in a fresh JVM per
  * core count; includes an in-session warmup.
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val numConvs = args.lift(1).map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = GenConfig(seed = 42L, numConvs = numConvs, numEntities = 900)
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    val bc = spark.sparkContext.broadcast(dict.toArray)

    def job(c: GenConfig): (Long, Long) = {
      val turns = TranscriptGen.transcripts(spark, c)
      val ex = Mentions.extract(spark, turns, bc)
      val row = ex
        .select(count(lit(1)).as("turns"), sum(size(col("triples"))).as("triples"))
        .head()
      (row.getLong(0), row.getLong(1))
    }

    job(cfg.copy(numConvs = math.min(20000, numConvs))) // warmup / JIT
    val t0 = System.nanoTime()
    val (turns, triples) = job(cfg)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"[tput] cores=$cores turns=$turns triples=$triples secs=$secs%.2f tps=${turns / secs}%.0f"
    )
    spark.stop()
  }
}
