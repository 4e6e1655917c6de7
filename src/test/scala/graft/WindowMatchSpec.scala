package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.canon.GreedyOverlapDedup
import graft.link.WindowMatch
import graft.link.WindowMatch.WindowPattern

class WindowMatchSpec extends SparkSpec {

  /** Brute-force mirror of the reference two-pointer
    * (/root/reference/src/OverlappingSegmentsUtils.jl:156-165).
    */
  private def bruteWindows(lengths: IndexedSeq[Double], minLen: Double, step: Int): Seq[(Int, Int)] = {
    val cum = lengths.scanLeft(0.0)(_ + _)
    (0 until lengths.length by step).flatMap { s =>
      val e = (s until lengths.length).find(e => cum(e) - cum(s) >= minLen)
      e.map(s -> _)
    }
  }

  test("candidateWindows matches the brute-force two-pointer on random lengths") {
    val rnd = new Random(7)
    for (_ <- 1 to 20) {
      val lens = IndexedSeq.fill(1 + rnd.nextInt(40))(rnd.nextDouble() * 10)
      val minLen = rnd.nextDouble() * 30
      val step = 1 + rnd.nextInt(4)
      assert(WindowMatch.candidateWindows(lens, minLen, step) == bruteWindows(lens, minLen, step))
    }
  }

  test("jaccardSorted agrees with set jaccard") {
    val rnd = new Random(3)
    for (_ <- 1 to 50) {
      val a = Array.fill(rnd.nextInt(10))(rnd.nextInt(12).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(10))(rnd.nextInt(12).toLong).distinct.sorted
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val want = if (union == 0) 1.0 else inter.toDouble / union
      assert(WindowMatch.jaccardSorted(a, b) == want)
    }
  }

  /** deterministic synthetic turn stream: conv c has turns with token
    * sets drawn from a small vocab; conv "c3" embeds the pattern at a
    * known offset.
    */
  private def fixture = {
    val rnd = new Random(11)
    def randTurn() = Array.fill(3)(rnd.nextInt(50).toLong).distinct
    val pattern = Array.tabulate(4)(i => Array(100L + i, 200L + i, 300L + i))
    val convs = (0 until 8).map { c =>
      val n = 6 + rnd.nextInt(10)
      val turns = Array.fill(n)(randTurn())
      if (c == 3) for (i <- pattern.indices) turns(2 + i) = pattern(i) // exact embed at start_idx 3
      if (c == 5 && turns.length >= pattern.length) // noisy embed at start 1
        for (i <- pattern.indices) turns(i) = pattern(i) ++ Array(999L)
      (s"c$c", turns)
    }
    (pattern, convs)
  }

  private def bruteBest(
      pattern: Array[Array[Long]],
      turns: Array[Array[Long]],
      tol: Double
  ): Option[(Int, Double)] = {
    val w = pattern.length
    def r6(x: Double) =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val scored = (0 to turns.length - w).map { s =>
      val sum = (0 until w).map { i =>
        1.0 - WindowMatch.jaccardSorted(pattern(i).distinct.sorted, turns(s + i).distinct.sorted)
      }.sum
      (s, r6(sum / w))
    }
    scored.sortBy { case (s, sc) => (sc, s) }.headOption.filter(_._2 <= tol)
  }

  test("bestWindowPerSession equals the driver-side brute force on every conversation") {
    import spark.implicits._
    val (pattern, convs) = fixture
    val rows = convs.flatMap { case (c, turns) =>
      turns.zipWithIndex.map { case (t, i) => (c, i, t.toSeq) }
    }
    val df = rows.toDF("conv", "idx", "tokens")
    val got = WindowMatch
      .bestWindowPerSession(spark, df, "conv", Seq("idx"), "tokens",
        Seq(WindowPattern(7L, pattern)), tol = 0.9)
      .as[(Long, String, Int, Int, Double)]
      .collect()
      .map { case (pid, c, s, e, sc) => c -> ((pid, s, e, sc)) }
      .toMap
    for ((c, turns) <- convs) {
      bruteBest(pattern, turns, 0.9) match {
        case Some((s, sc)) =>
          assert(got(c) == ((7L, s + 1, s + pattern.length, sc)), s"conv $c")
        case None => assert(!got.contains(c), s"conv $c should not match")
      }
    }
    // the exact embed is found at its planted offset with score 0
    assert(got("c3") == ((7L, 3, 6, 0.0)))
  }

  test("findRecurringSegments: planted recurring segment is mined with correct run count") {
    import spark.implicits._
    // reference conv r: 12 turns; convs c0..c5 embed ref turns [2..5]
    val refTurns = Array.tabulate(12)(i => Array(1000L + i, 2000L + i))
    val rnd = new Random(23)
    val convs = (0 until 6).map { c =>
      val n = 8 + rnd.nextInt(4)
      val turns = Array.fill(n)(Array.fill(2)(rnd.nextInt(40).toLong).distinct)
      for (i <- 0 until 4) turns(1 + i) = refTurns(2 + i)
      (s"c$c", turns)
    }
    val rows = (("r", refTurns) +: convs).flatMap { case (c, turns) =>
      turns.zipWithIndex.map { case (t, i) => (c, i, t.toSeq, 1.0) }
    }
    val df = rows.toDF("conv", "idx", "tokens", "len")
    val (segments, details) = WindowMatch.findRecurringSegments(
      spark, df, "conv", Seq("idx"), "tokens", "len",
      refConv = "r", minLen = 3.0, step = 1, tol = 0.1, minRuns = 4, dedupFrac = 0.5)
    val segs = segments.as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    // candidates are 4-turn windows (cum length 3.0 -> e = s+3); the
    // planted window [2..5] (0-based) must survive with 6 runs; greedy
    // dedup (frac 0.5) kills neighbors overlapping it by >= 2 turns
    assert(segs.nonEmpty)
    assert(segs.exists { case (pid, s, e, runs) => pid == 2L && s == 3 && e == 6 && runs == 6L })
    // accepted segments pairwise overlap < 0.5
    for {
      (Seq((p1, s1, e1, _), (p2, s2, e2, _))) <- segs.toSeq.combinations(2)
    } {
      val f = GreedyOverlapDedup.overlapFrac(
        GreedyOverlapDedup.Interval(p1, s1, e1, 0),
        GreedyOverlapDedup.Interval(p2, s2, e2, 0))
      assert(f < 0.5, s"accepted segments overlap: $p1 vs $p2")
    }
    // details only for accepted patterns, each conv embeds -> present
    val acceptedIds = segs.map(_._1).toSet
    val det = details.as[(Long, String, Int, Int, Double)].collect()
    assert(det.forall(d => acceptedIds.contains(d._1)))
    assert(det.count(_._1 == 2L) == 6)
    assert(det.filter(_._1 == 2L).forall(d => d._3 == 2 && d._5 == 0.0))
  }
}
