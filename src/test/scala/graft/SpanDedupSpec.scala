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

  test("duplicateSpans + spanStats: equal a brute-force local oracle on a random corpus") {
    import spark.implicits._
    // deterministic pseudo-random corpus with a small token vocabulary
    // so cross-doc gram collisions are frequent and varied
    def rng(seed: Long): Iterator[Long] =
      Iterator.iterate(graft.util.Hashing.mix64(seed))(graft.util.Hashing.mix64)
    val n = 4
    val corpus = (0L until 80L).map { i =>
      val len = 2 + (rng(i).next() % 23 + 23) % 23 // 2..24 tokens (some < n)
      val toks = rng(i * 7 + 1).take(len.toInt).map(h => s"w${(h % 9 + 9) % 9}").toSeq
      (i, toks.mkString(" "))
    }
    // brute force: gram -> distinct docs; flagged positions; island merge
    val byGram = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    val posByDoc = corpus.map { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty) // already lowercase
      val grams = if (toks.length < n) Array.empty[(Int, String)]
      else (0 to toks.length - n).map(i => (i, toks.slice(i, i + n).mkString(" "))).toArray
      grams.foreach { case (_, g) => byGram.getOrElseUpdate(g, scala.collection.mutable.Set.empty) += id }
      (id, grams, toks.length)
    }
    val expected = posByDoc.flatMap { case (id, grams, _) =>
      val ps = grams.collect { case (p, g) if byGram(g).size >= 2 => p }
      if (ps.isEmpty) Nil
      else {
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && p - acc.head.head <= n => (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(isl => (id, isl.min.toLong, (isl.max + n - 1).toLong, isl.size.toLong))
      }
    }.toSet
    val got = spans(corpus, n = n, minDf = 2)
    assert(got == expected, s"got ${got.size} vs expected ${expected.size}")
    assert(expected.nonEmpty)
    // spanStats totals derive from the same spans
    val stats = graft.dedup.SpanDedup
      .spanStats(spark, corpus.toDF("doc_id", "text"), "doc_id", "text", n, 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val expStats = expected.groupBy(_._1).map { case (id, ss) =>
      val dup = ss.toSeq.map(s => s._3 - s._2 + 1).sum
      val total = posByDoc.find(_._1 == id).get._3.toLong
      (id, ss.size.toLong, dup, total,
        BigDecimal(dup.toDouble / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    assert(stats == expStats)
  }

  test("streamingSpanStats: stateless stream profile matches batch spanStats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, String)].collect().take(150) ++ Seq(
        // trailing/leading non-space whitespace: tokenCount keeps the
        // empty split tokens, and the streaming profile must agree
        (900000L, "shared streaming span block here\n"),
        (900001L, "\tshared streaming span block here"))
    val corpusDf = corpus.toSeq.toDF("doc_id", "text")
    val bc = graft.dedup.SpanDedup.dupGramSet(spark, corpusDf, "doc_id", "text", 4, 2)
    assert(bc.value.nonEmpty)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val flagged = graft.dedup.SpanDedup.streamingSpanStats(
      input.toDS().toDF("doc_id", "text"), "text", bc, 4)
    val q = flagged.writeStream.format("memory").queryName("stream_spans")
      .outputMode("append").start()
    input.addData(corpus.take(70).toSeq)
    q.processAllAvailable()
    input.addData(corpus.drop(70).toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark
      .sql("SELECT doc_id, n_spans, dup_tokens, total_tokens, dup_fraction FROM stream_spans")
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(got.length == corpus.length)
    val batch = graft.dedup.SpanDedup
      .spanStats(spark, corpusDf, "doc_id", "text", 4, 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    got.foreach { case (id, nSpans, dup, total, frac) =>
      batch.get(id) match {
        case Some((_, bN, bDup, bTotal, bFrac)) =>
          assert(nSpans.toLong == bN && dup == bDup && total == bTotal && frac == bFrac, s"doc $id")
        case None => // batch report omits span-free docs; stream gives zeros
          assert(nSpans == 0 && dup == 0L, s"doc $id should be span-free")
      }
    }
    assert(got.exists(_._2 > 0) && got.exists(_._2 == 0)) // non-vacuous both ways
  }

  test("removeSpans: cuts duplicated spans, keeps docs; untouched docs pass byte-identical") {
    import spark.implicits._
    val df = Seq(
      (1L, "X1 x2 P Q r s x3 x4", "keep"), // dup span [2,5] -> cut, case preserved elsewhere
      (2L, "y1 p q R S y2 y3", "keep"),
      (3L, "  odd\twhitespace  untouched\n", "keep"), // no span: byte-identical passthrough
      (4L, "p q r s", "keep"), // fully covered -> empty string
      (5L, "p q r s tail1 tail2", "keep")
    ).toDF("doc_id", "text", "_sdc_spans") // caller column named like the temp must survive
    val got = SpanDedup.removeSpans(spark, df, "doc_id", "text", 3, 2)
      .as[(Long, String, String)].collect().map { case (id, t, k) => id -> ((t, k)) }.toMap
    assert(got(1L) == ("X1 x2 x3 x4", "keep"))
    assert(got(2L) == ("y1 y2 y3", "keep"))
    assert(got(3L) == ("  odd\twhitespace  untouched\n", "keep"))
    assert(got(4L) == ("", "keep"))
    assert(got(5L) == ("tail1 tail2", "keep"))
  }

  test("removeSpans agrees with a local cut of the (verified) span report on a random corpus") {
    import spark.implicits._
    def rng(seed: Long): Iterator[Long] =
      Iterator.iterate(graft.util.Hashing.mix64(seed))(graft.util.Hashing.mix64)
    val n = 4
    val corpus = (0L until 80L).map { i =>
      val len = 2 + (rng(i).next() % 23 + 23) % 23
      val toks = rng(i * 7 + 1).take(len.toInt).map(h => s"w${(h % 9 + 9) % 9}").toSeq
      (i, toks.mkString(" "))
    }
    val report = SpanDedup
      .duplicateSpans(spark, corpus.toDF("doc_id", "text"), "doc_id", "text", n, 2)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSeq).toMap
    val expected = corpus.map { case (id, t) =>
      report.get(id) match {
        case None => id -> t
        case Some(ss) =>
          val toks = t.split("\\s+").filter(_.nonEmpty).zipWithIndex
          id -> toks.collect { case (w, i) if !ss.exists(s => i >= s._1 && i <= s._2) => w }
            .mkString(" ")
      }
    }.toMap
    val got = SpanDedup.removeSpans(spark, corpus.toDF("doc_id", "text"), "doc_id", "text", n, 2)
      .as[(Long, String)].collect().toMap
    assert(got == expected)
    assert(corpus.toMap != expected) // non-vacuous: something was cut
  }

  test("streamingRemoveSpans: stateless stream cut matches batch removeSpans byte-for-byte") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .as[(Long, String)].collect().take(150) ++ Seq(
        (900000L, "shared streaming span block here\n"),
        (900001L, "\tshared streaming span block here"),
        (900002L, "  untouched\twhitespace survives  intact\n"))
    val corpusDf = corpus.toSeq.toDF("doc_id", "text")
    val bc = graft.dedup.SpanDedup.dupGramSet(spark, corpusDf, "doc_id", "text", 4, 2)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val cutStream = graft.dedup.SpanDedup.streamingRemoveSpans(
      input.toDS().toDF("doc_id", "text"), "text", bc, 4)
    val q = cutStream.writeStream.format("memory").queryName("stream_cut")
      .outputMode("append").start()
    input.addData(corpus.take(70).toSeq)
    q.processAllAvailable()
    input.addData(corpus.drop(70).toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT doc_id, text FROM stream_cut")
      .as[(Long, String)].collect().toMap
    val batch = graft.dedup.SpanDedup
      .removeSpans(spark, corpusDf, "doc_id", "text", 4, 2)
      .as[(Long, String)].collect().toMap
    assert(got.size == corpus.length)
    assert(got == batch)
    val original = corpus.toMap
    assert(got.exists { case (id, t) => t != original(id) }) // something was cut
    assert(got(900002L) == original(900002L)) // untouched doc keeps its whitespace
    assert(got(900000L) == "" && got(900001L) == "") // fully-covered docs empty
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
