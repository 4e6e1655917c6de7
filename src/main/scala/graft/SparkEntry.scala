package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kg.Dictionary
import graft.pipeline.KGPipeline
import graft.synth.{GenConfig, TranscriptGen}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Corpus size scaled like the driver's sf dirs: sf0.001 -> small
    * smoke corpus, sf0.1 -> bench-sized.
    */
  def genConfigFor(sfDir: String): GenConfig = {
    val sf = raw"sf([\d.]+)".r
      .findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble)
      .getOrElse(0.001)
    GenConfig(
      seed = 42L,
      numConvs = math.max(50, (sf * 40000).toInt),
      numEntities = math.max(40, (sf * 8000).toInt)
    )
  }

  /** Flagship: full KG construction (synth transcripts -> mentions ->
    * triples -> LSH link -> CC canonicalize -> canonical edge table)
    * on a smoke-scale corpus; driver checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = genConfigFor("sf0.001")
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    val turns = TranscriptGen.transcripts(spark, cfg)
    KGPipeline.run(spark, turns, dict).edges.toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3-flavor grouped aggregation profile over lineitem
    "q_agg_pricing" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n_rows")
        )
    }),
    // KG pipeline edge table (non-SQL-expressible: LSH + CC inside);
    // driver records rows-only check
    "kg_edges" -> ((s, dir) => {
      val cfg = genConfigFor(dir).copy(numConvs = 300, numEntities = 120)
      val dict = Dictionary.build(cfg.seed, cfg.numEntities)
      KGPipeline.run(s, TranscriptGen.transcripts(s, cfg), dict).edges.toDF()
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
