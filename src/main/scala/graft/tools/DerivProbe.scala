package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-attribution probe for kg_derivation_checks (dev tool): times
  * each fingerprint branch separately, then the 6-way union, twice —
  * separates planning/codegen from execution on the cached edge table.
  */
object DerivProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[deriv] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    t("prepareKg")(graft.SparkEntry.prepareKg(spark, sfDir))
    val q = graft.SparkEntry.queries("kg_derivation_checks")
    t("full cold")(q(spark, sfDir).count())
    t("full warm")(q(spark, sfDir).count())

    // piecewise: same branches as the query body
    import spark.implicits._
    val edges = {
      val cfg = graft.SparkEntry.genConfigFor(sfDir)
      // reuse the memoized result via the public query path
      graft.SparkEntry.queries("kg_edges")(spark, sfDir)
    }
    edges.createOrReplaceTempView("kg_edges_v")
    def fingerprint(tag: String, df: DataFrame): DataFrame = {
      val cols = df.columns.sorted.map(col)
      df.agg(
          count(lit(1)).as("cnt"),
          sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("h1"),
          sum(xxhash64((cols :+ lit(0x9e3779b9L)): _*).cast("decimal(38,0)")).as("h2"))
        .select(lit(tag).as("tag"), col("cnt"), col("h1"), col("h2"))
    }
    val coocSql = spark.sql(
      """SELECT least(subj, obj) AS entity_a, greatest(subj, obj) AS entity_b,
        |       count(DISTINCT conv_id) AS n_convs, count(*) AS n_assertions
        |FROM kg_edges_v WHERE subj <> obj
        |GROUP BY 1, 2 HAVING count(DISTINCT conv_id) >= 2""".stripMargin)
    val profileSql = spark.sql(
      """WITH roles AS (
        |  SELECT subj AS entity_id, pred, conv_id, turn_idx, 1 AS as_subj FROM kg_edges_v
        |  UNION ALL
        |  SELECT obj AS entity_id, pred, conv_id, turn_idx, 0 AS as_subj FROM kg_edges_v),
        |base AS (
        |  SELECT entity_id, count(*) AS n_assertions, sum(as_subj) AS n_as_subject,
        |         count(DISTINCT conv_id) AS n_convs,
        |         min(turn_idx) AS first_turn, max(turn_idx) AS last_turn
        |  FROM roles GROUP BY entity_id),
        |pc AS (SELECT entity_id, pred, count(*) AS cnt FROM roles GROUP BY entity_id, pred),
        |tp AS (SELECT entity_id, pred AS top_pred FROM (
        |  SELECT entity_id, pred,
        |         row_number() OVER (PARTITION BY entity_id ORDER BY cnt DESC, pred ASC) AS rn
        |  FROM pc) WHERE rn = 1)
        |SELECT base.entity_id, n_assertions, n_as_subject, n_convs, first_turn, last_turn, top_pred
        |FROM base JOIN tp ON base.entity_id = tp.entity_id""".stripMargin)
    val transSql = spark.sql(
      """SELECT pred, next_pred, count(*) AS n_transitions FROM (
        |  SELECT pred, lead(pred, 1) OVER (
        |    PARTITION BY conv_id ORDER BY turn_idx ASC, subj ASC, obj ASC) AS next_pred
        |  FROM kg_edges_v)
        |WHERE next_pred IS NOT NULL GROUP BY pred, next_pred""".stripMargin)
    val branches = Seq(
      "cooc_api" -> graft.analytics.EntityAggregates.coOccurrence(edges, 2L),
      "cooc_sql" -> coocSql,
      "profile_api" -> graft.analytics.EntityAggregates.entityProfile(edges),
      "profile_sql" -> profileSql,
      "trans_api" -> graft.analytics.EntityAggregates.predicateTransitions(edges),
      "trans_sql" -> transSql
    )
    for ((tag, df) <- branches)
      t(s"branch $tag")(fingerprint(tag, df).collect())
    val u = branches.map { case (tag, df) => fingerprint(tag, df) }.reduce(_.unionByName(_))
    t("union 2nd")(u.collect())
    t("union 3rd")(u.collect())

    println(s"[deriv] edges partitions = ${edges.rdd.getNumPartitions}")
    t("edges.count warm")(edges.count())
    t("edges.count warm2")(edges.count())

    // few-partition variant: same branches over a 2-partition copy
    val small = edges.repartition(2).cache()
    t("small materialize")(small.count())
    small.createOrReplaceTempView("kg_edges_v")
    val coocSql2 = spark.sql(
      """SELECT least(subj, obj) AS entity_a, greatest(subj, obj) AS entity_b,
        |       count(DISTINCT conv_id) AS n_convs, count(*) AS n_assertions
        |FROM kg_edges_v WHERE subj <> obj
        |GROUP BY 1, 2 HAVING count(DISTINCT conv_id) >= 2""".stripMargin)
    val branches2 = Seq(
      "cooc_api" -> graft.analytics.EntityAggregates.coOccurrence(small, 2L),
      "cooc_sql" -> coocSql2,
      "profile_api" -> graft.analytics.EntityAggregates.entityProfile(small),
      "trans_api" -> graft.analytics.EntityAggregates.predicateTransitions(small)
    )
    for ((tag, df) <- branches2)
      t(s"small branch $tag")(fingerprint(tag, df).collect())
    for ((tag, df) <- branches2)
      t(s"small warm $tag")(fingerprint(tag, df).collect())
    spark.stop()
  }
}
