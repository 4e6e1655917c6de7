package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.extract.Mentions
import graft.kg.Dictionary
import graft.link.Linker
import graft.pipeline.KGPipeline
import graft.synth.TranscriptGen

/** Stage-by-stage wall-clock profile of the KG pipeline (dev tool). */
object ProfileKG {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cfg = graft.SparkEntry.genConfigFor(args.headOption.getOrElse("sf0.1"))
    println(s"[profile] cfg=$cfg")
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    println(s"[profile] dict surfaces=${dict.size}")

    val turns = TranscriptGen.transcripts(spark, cfg)
    t("gen+count turns")(println("[profile] turns=" + turns.count()))
    val bc = spark.sparkContext.broadcast(dict.toArray)
    val ex = Mentions.extract(spark, turns, bc).persist()
    t("extraction")(println("[profile] extractions=" + ex.count()))
    val dictDf = spark.createDataset(dict.map(s => (s.surfaceId, s.surface))).toDF("id", "surface")
    val links = t("linkEdges")(Linker.linkEdges(spark, dictDf).toDF("src", "dst", "score").persist())
    t("linkEdges count")(println("[profile] links=" + links.count()))
    val cc = t("cc")(ConnectedComponents.run(spark, links))
    t("cc count")(println("[profile] cc=" + cc.count()))
    val res = t("pipeline total")(KGPipeline.run(spark, turns, dict))
    t("edges count")(println("[profile] edges=" + res.edges.count()))
    t("vertices count")(println("[profile] vertices=" + res.vertices.count()))
    spark.stop()
  }
}
