package graft

import scala.util.Random

import graft.canon.{ConnectedComponents, GreedyOverlapDedup}
import graft.canon.GreedyOverlapDedup.Interval

class GreedyOverlapSpec extends SparkSpec {

  test("overlapFrac: disjoint 0, nested 1, half overlap 0.5") {
    assert(GreedyOverlapDedup.overlapFrac(Interval(1, 0, 3, 0), Interval(2, 4, 7, 0)) == 0.0)
    assert(GreedyOverlapDedup.overlapFrac(Interval(1, 0, 9, 0), Interval(2, 2, 5, 0)) == 1.0)
    assert(GreedyOverlapDedup.overlapFrac(Interval(1, 0, 3, 0), Interval(2, 2, 5, 0)) == 0.5)
  }

  test("greedy keeps the max-weight rep per cluster and rejects overlaps") {
    val cands = Seq(
      Interval(1, 0, 9, 5), Interval(2, 1, 10, 9), Interval(3, 2, 11, 7), // cluster A
      Interval(4, 50, 59, 3), Interval(5, 51, 60, 2) // cluster B
    )
    val acc = GreedyOverlapDedup.greedy(cands, 0.5)
    assert(acc.map(_.id) == Seq(2, 4))
  }

  test("property: greedy reps == CC components on non-adversarial cluster fixtures") {
    import spark.implicits._
    val rnd = new Random(17)
    for (trial <- 1 to 10) {
      // clusters of mutually-overlapping intervals, far apart from each
      // other: within a cluster every pair overlaps >= frac; across
      // clusters zero overlap ("non-adversarial" regime)
      val nClusters = 2 + rnd.nextInt(4)
      val cands = (0 until nClusters).flatMap { k =>
        val base = k * 1000
        val len = 20 + rnd.nextInt(10)
        val nMembers = 1 + rnd.nextInt(4)
        (0 until nMembers).map { m =>
          // jitter start by < len/4 so pairwise overlap stays > 0.5
          val s = base + rnd.nextInt(len / 4)
          Interval(k * 10L + m, s, s + len - 1, 1 + rnd.nextInt(100))
        }
      }
      val acc = GreedyOverlapDedup.greedy(cands, 0.5)
      // CC over the >=frac overlap relation
      val edges = (for {
        Seq(a, b) <- cands.combinations(2)
        if GreedyOverlapDedup.overlapFrac(a, b) >= 0.5
      } yield (a.id, b.id)).toSeq
      val cc = ConnectedComponents
        .run(spark, edges.toDF("src", "dst"))
        .as[(Long, Long)]
        .collect()
        .toMap
      val clusters = cands.groupBy(c => cc.getOrElse(c.id, c.id)).values.toSeq
      // one accepted rep per cluster; rep = max weight (tie: start, id)
      val wantReps = clusters
        .map(_.sortBy(c => (-c.weight, c.start, c.id)).head.id)
        .toSet
      assert(acc.map(_.id).toSet == wantReps, s"trial $trial")
    }
  }

  test("perGroup replays greedy independently per group") {
    import spark.implicits._
    val rows = Seq(
      ("g1", 1L, 0, 9, 5L), ("g1", 2L, 1, 10, 9L),
      ("g2", 1L, 0, 9, 5L), ("g2", 9L, 100, 109, 1L)
    ).toDF("group", "id", "start", "end", "weight")
    val got = GreedyOverlapDedup
      .perGroup(spark, rows, 0.5)
      .as[(String, Long, Int, Int, Long)]
      .collect()
      .map(r => (r._1, r._2))
      .toSet
    assert(got == Set(("g1", 2L), ("g2", 1L), ("g2", 9L)))
  }
}
