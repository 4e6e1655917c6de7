package graft

import scala.util.Random

import graft.canon.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  private def naiveCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  private def runBoth(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = spark.createDataset(edges).toDF("src", "dst")
    val want = naiveCC(edges)
    val local = ConnectedComponents.run(spark, df).as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents
      .run(spark, df, driverLocalThreshold = 0L)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(local == want, s"driver-local differs (n=${edges.size})")
    assert(dist == want, s"distributed large/small-star differs (n=${edges.size})")
  }

  test("CC agrees with naive union-find on random graphs (both paths)") {
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val n = 60
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      runBoth(edges)
    }
  }

  test("CC handles chains, stars, self-loops, empty") {
    import spark.implicits._
    runBoth((0L until 50L).map(i => (i, i + 1))) // one long chain
    runBoth((1L to 40L).map(i => (0L, i))) // star
    runBoth(Seq((5L, 5L), (5L, 6L))) // self-loop folded away
    val empty = ConnectedComponents
      .run(spark, spark.createDataset(Seq.empty[(Long, Long)]).toDF("src", "dst"))
      .count()
    assert(empty == 0)
  }

  test("CC is idempotent: running on its own star output is a fixpoint") {
    import spark.implicits._
    val rnd = new Random(9)
    val edges = Seq.fill(120)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong)).filter(e => e._1 != e._2)
    val df = spark.createDataset(edges).toDF("src", "dst")
    val m1 = ConnectedComponents.run(spark, df).as[(Long, Long)].collect().toMap
    val starEdges = spark.createDataset(m1.toSeq.filter(kv => kv._1 != kv._2)).toDF("src", "dst")
    val m2 = ConnectedComponents.run(spark, starEdges, driverLocalThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(m1 == m2)
  }

  test("distributed CC is invariant to input partitioning") {
    import spark.implicits._
    val rnd = new Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong)).filter(e => e._1 != e._2)
    def at(parts: Int) = ConnectedComponents
      .run(spark, spark.createDataset(edges).toDF("src", "dst").repartition(parts), driverLocalThreshold = 0L)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(at(1) == at(13))
  }
}
