package graft

import graft.dedup.SpanDedup

class SpanDedupSpec extends SparkSpec {

  private def spans(rows: Seq[(Long, String)], n: Int = 3, minDf: Int = 2): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SpanDedup
      .duplicateSpans(spark, rows.toDF("doc_id", "text"), "doc_id", "text", n, minDf)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("duplicateSpans: shared block becomes one merged span on both sides") {
    val got = spans(Seq(
      1L -> "x1 x2 p q r s x3 x4",
      2L -> "y1 p q r s y2 y3"
    ))
    // the shared 4-token block "p q r s" carries two shared 3-grams in
    // each doc; adjacent window starts merge into ONE span covering it
    assert(got == Set((1L, 2L, 5L, 2L), (2L, 1L, 4L, 2L)))
  }

  test("duplicateSpans: gap of exactly n merges (contiguous token cover); gap > n splits") {
    val got = spans(Seq(
      5L -> "g1 g2 g3 m g4 g5 g6", // shared windows at pos 0 and 3: contiguous cover -> merged
      6L -> "g1 g2 g3 zz m g4 g5" // shared windows at pos 0 and 4: a one-token hole -> two spans
    ))
    assert(got == Set((5L, 0L, 5L, 2L), (6L, 0L, 2L, 1L), (6L, 4L, 6L, 1L)))
  }

  test("duplicateSpans: a repeated gram is flagged at EVERY position it occupies") {
    val got = spans(Seq(
      7L -> "r1 r2 r3 w r1 r2 r3",
      8L -> "z r1 r2 r3 z2"
    ))
    assert(got == Set((7L, 0L, 2L, 1L), (7L, 4L, 6L, 1L), (8L, 1L, 3L, 1L)))
  }

  test("duplicateSpans: minDf thresholds on DISTINCT docs; short docs emit nothing") {
    val corpus = Seq(
      10L -> "a b c t1", // "a b c" in 3 docs
      11L -> "a b c t2",
      12L -> "t3 a b c",
      13L -> "a b" // shorter than n: no windows, no spans
    )
    assert(spans(corpus, minDf = 3).map(_._1) == Set(10L, 11L, 12L))
    assert(spans(corpus, minDf = 4).isEmpty)
    // within-doc repetition alone is NOT cross-document duplication
    assert(spans(Seq(20L -> "q q q q q q q q"), minDf = 2).isEmpty)
    // maxDf stoplist cap: the 3-doc gram is dropped when capped at 2
    import spark.implicits._
    val capped = graft.dedup.SpanDedup
      .duplicateSpans(spark, corpus.toDF("doc_id", "text"), "doc_id", "text", 3, 2, maxDf = Some(2L))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped.isEmpty) // "a b c" has df=3 > cap; nothing else repeats
    assert(spans(corpus, minDf = 2).nonEmpty) // uncapped it IS reported
  }

  test("spanStats: per-doc dup fraction from merged spans") {
    import spark.implicits._
    val df = Seq(
      1L -> "x1 x2 p q r s x3 x4", // 8 tokens, dup span covers 4
      2L -> "y1 p q r s y2 y3", // 7 tokens, dup span covers 4
      3L -> "nothing shared here at all"
    ).toDF("doc_id", "text")
    val got = SpanDedup.spanStats(spark, df, "doc_id", "text", 3, 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 1L, 4L, 8L, 0.5),
      (2L, 1L, 4L, 7L, 0.571429)))
  }

  test("duplicateSpans: deterministic under repartitioning") {
    import spark.implicits._
    val rows = (0L until 60L).map { i =>
      val filler = s"f${i}a f${i}b f${i}c f${i}d"
      if (i % 4 == 0) (i, s"$filler shared block of text here p$i") else (i, s"$filler p$i")
    }
    val a = SpanDedup.duplicateSpans(spark, rows.toDF("doc_id", "text"), "doc_id", "text", 3, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = SpanDedup
      .duplicateSpans(spark, rows.toDF("doc_id", "text").repartition(13), "doc_id", "text", 3, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
