package graft

import scala.util.Random

import org.apache.spark.graphx.{Edge, Graph}

import graft.canon.ConnectedComponents

/** Third-implementation cross-check (SURVEY §2.9 G3): our DataFrame
  * large-star/small-star CC vs GraphX's connectedComponents on random
  * graphs. GraphX is test-only — the engine's primary path stays
  * DataFrame (RDDs only "if forced", per input_hint).
  */
class GraphXCrossCheckSpec extends SparkSpec {

  test("CC agrees with GraphX connectedComponents") {
    import spark.implicits._
    val rnd = new Random(21)
    for (trial <- 1 to 3) {
      val n = 80
      val edges = Seq.fill(110)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val df = spark.createDataset(edges).toDF("src", "dst")

      val ours = ConnectedComponents
        .run(spark, df, driverLocalThreshold = if (trial % 2 == 0) 0L else 1000000L)
        .as[(Long, Long)]
        .collect()
        .toMap

      val gx = Graph
        .fromEdges(spark.sparkContext.parallelize(edges.map { case (a, b) => Edge(a, b, ()) }), ())
        .connectedComponents()
        .vertices
        .collect()
        .toMap

      // GraphX includes only nodes present in edges; component id = min
      // member under both conventions
      assert(ours.keySet == gx.keySet, s"trial $trial node sets differ")
      assert(ours.forall { case (k, v) => gx(k) == v }, s"trial $trial labels differ")
    }
  }

  test("pipeline drops null-text turns (P1 filter)") {
    import spark.implicits._
    val cfg = graft.synth.GenConfig(numConvs = 5, numEntities = 10)
    val dict = graft.kg.Dictionary.build(cfg.seed, cfg.numEntities)
    val good = graft.synth.TranscriptGen.transcripts(spark, cfg)
    val withNulls = good.union(
      spark.createDataset(
        Seq(graft.model.Turn("conv_null", 0, "user", null, None, new java.sql.Timestamp(0L)))
      )
    )
    // must not throw, and the null turn contributes nothing
    val a = graft.pipeline.KGPipeline.run(spark, withNulls, dict).edges.count()
    val b = graft.pipeline.KGPipeline.run(spark, good, dict).edges.count()
    assert(a == b)
  }
}
