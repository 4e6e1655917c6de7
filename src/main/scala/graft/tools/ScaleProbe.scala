package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.Mentions
import graft.kg.Dictionary
import graft.pipeline.KGPipeline
import graft.synth.{GenConfig, TranscriptGen}

/** Dev tool: isolate which stage stops scaling from N to 4N cores. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val numConvs = args.headOption.map(_.toInt).getOrElse(40000)
    val cfg = GenConfig(
      seed = 42L,
      numConvs = numConvs,
      numEntities = math.min(900, math.max(100, numConvs / 20))
    )

    for (cores <- Seq(32, 8, 32)) {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] cores=$cores $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
      }
      val dict = Dictionary.build(cfg.seed, cfg.numEntities)
      val turns = TranscriptGen.transcripts(spark, cfg)
      t("gen count")(turns.count())
      val bc = spark.sparkContext.broadcast(dict.toArray)
      val ex0 = Mentions.extract(spark, turns, bc)
      val ex = ex0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("extract persist+count")(ex.count())
      t("extract reread")(ex.count())
      val mapping = KGPipeline.canonicalMapping(spark, dict, graft.link.Linker.LshConfig())
      t("mapping count")(mapping.count())
      val trips = ex.select(explode(col("triples")).as("t"))
        .select(col("t.subj"), col("t.pred"), col("t.obj"), col("t.conv_id"), col("t.turn_idx"))
      val m = broadcast(mapping)
      val edges = trips
        .join(m.withColumnRenamed("id", "subj").withColumnRenamed("canonical", "csubj"), Seq("subj"))
        .join(m.withColumnRenamed("id", "obj").withColumnRenamed("canonical", "cobj"), Seq("obj"))
      t("edges join count")(edges.count())
      ex.unpersist()
      spark.stop()
    }
  }
}
