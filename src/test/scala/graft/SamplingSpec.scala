package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

class SamplingSpec extends SparkSpec {

  // local replay of Sampling.idUniform (two-residue golden/silver hash)
  private def idHash(id: Long): Double = {
    def pmod(x: Long, m: Long): Long = ((x % m) + m) % m
    pmod(pmod(id, 2147483647L) * 1327217885L + pmod(id, 2147483629L) * 1709782614L, 2147483647L) /
      2147483647.0
  }

  test("stratified: exact membership vs local two-residue replay; threshold coin is monotone") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, Seq("en", "zh", "fr")((i % 3).toInt)))
    val df = rows.toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val got = Sampling.stratified(df, "lang", "doc_id", rates, 0.1)
      .select("doc_id").as[Long].collect().toSet
    val want = rows.filter { case (id, lang) => idHash(id) < rates.getOrElse(lang, 0.1) }
      .map(_._1).toSet
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
    assert(got.nonEmpty && got.size < rows.size) // non-vacuous both ways
    // threshold coin: raising a rate only ADDS rows (the property that
    // makes mixture ablations nested rather than resampled)
    val lower = Sampling.stratified(df, "lang", "doc_id", Map("en" -> 0.2), 0.1)
      .select("doc_id").as[Long].collect().toSet
    val higher = Sampling.stratified(df, "lang", "doc_id", Map("en" -> 0.6), 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(lower.subsetOf(higher))
    // deterministic under partitioning
    val again = Sampling.stratified(df.repartition(7), "lang", "doc_id", rates, 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
  }

  test("idUniform: ids congruent mod 2^31-1 get DIFFERENT coins (no 2.1e9 period)") {
    import spark.implicits._
    val m1 = 2147483647L
    val ids = Seq(5L, 5L + m1, 5L + 2 * m1, 5L + 3 * m1)
    val coins = ids.toDF("id").select(Sampling.idUniform(col("id")).as("u"))
      .as[Double].collect().toSet
    assert(coins.size == ids.size, s"periodic coins: $coins")
    // negative ids fold like the DuckDB double-% replay
    val neg = Seq(-7L).toDF("id").select(Sampling.idUniform(col("id")).as("u"))
      .as[Double].collect().head
    assert(neg == idHash(-7L))
  }

  test("tokenBudgetCap: running total respects budget, first excess row is cut, docs stay whole") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 2000L), ("a", 3L, 900L), ("a", 4L, 10L),
      ("b", 1L, 5000L), // single doc over budget: dropped entirely, not truncated
      ("c", 1L, 4000L) // exactly at budget: kept
    ).toDF("source", "doc_id", "n_chars")
    val kept = Sampling.tokenBudgetCap(df, "source", Seq("doc_id"), "n_chars", 4000L)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // a: 1000+2000+900=3900 <= 4000; adding doc 4 (3910) also fits
    assert(kept == Set(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("c", 1L)))
    // tighter budget cuts at the first excess row, keeping earlier docs whole
    val tight = Sampling.tokenBudgetCap(df, "source", Seq("doc_id"), "n_chars", 3000L)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(tight == Set(("a", 1L), ("a", 2L)))
  }

  test("tokenBudgetCap: chunked scan equals the window form at every chunk size") {
    import spark.implicits._
    // deterministic pseudo-random corpus: 3 sources (one NULL — a null
    // group key must behave like the window form's null partition, not
    // vanish in the chunk-offset join), ids with gaps, token counts
    // that force cuts at different points per source
    val rows = (0L until 400L).map { i =>
      (Seq("web", "code", "chat", null)((i % 4).toInt), i * 3 % 251, (i * 37 % 90) + 1)
    }
    val df = rows.toDF("source", "doc_id", "n_toks")
    val want = Sampling
      .tokenBudgetCapWindowed(df, "source", Seq("doc_id"), "n_toks", 1500L)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(want.nonEmpty && want.size < rows.size)
    for (chunk <- Seq(1, 2, 7, 64, 1 << 20)) {
      val got = Sampling
        .tokenBudgetCap(df, "source", Seq("doc_id"), "n_toks", 1500L, chunkSize = chunk)
        .select("source", "doc_id").as[(String, Long)].collect().toSet
      assert(got == want, s"chunkSize=$chunk: ${got.size} vs ${want.size}")
    }
  }

  test("floorDivLong is exact floor division on negatives and above 2^53") {
    import spark.implicits._
    // the double route rounds above 2^53 — these ids would drift chunks
    val ids = Seq(-9L, -8L, -1L, 0L, 7L, (1L << 53) + 1L, (1L << 62) + 3L, Long.MaxValue - 2L,
      Long.MinValue, Long.MinValue + 1L, Long.MinValue + 5L)
    for (n <- Seq(1L, 4L, 256L, 1048576L)) {
      val got = ids.toDF("id")
        .select(col("id"), graft.util.Cols.floorDivLong(col("id"), n).as("q"))
        .as[(Long, Long)].collect().toMap
      ids.foreach(i => assert(got(i) == Math.floorDiv(i, n), s"id=$i n=$n"))
    }
    // chunked cap stays exact when order keys sit above 2^53 (double
    // cast would merge distinct chunks up there)
    val big = (0L until 8L).map(i => ("s", (1L << 53) + i * 3, 10L)).toDF("source", "doc_id", "n_toks")
    val want = Sampling.tokenBudgetCapWindowed(big, "source", Seq("doc_id"), "n_toks", 50L)
      .select("doc_id").as[Long].collect().toSet
    val got = Sampling.tokenBudgetCap(big, "source", Seq("doc_id"), "n_toks", 50L, chunkSize = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want && want.size == 5)
  }

  test("packSequences: hand-computed walk — fill, overflow, oversize-alone, restart after oversize") {
    import spark.implicits._
    val df = Seq((1L, 300L), (2L, 150L), (3L, 100L), (4L, 600L), (5L, 50L))
      .toDF("doc_id", "n_toks")
    val got = Sampling.packSequences(df, "doc_id", "n_toks", maxTokens = 500L, chunkDocs = 1000)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 300L, 0L, 0L), // opens seq 0
      (2L, 150L, 0L, 300L), // fits: 450 <= 500
      (3L, 100L, 1L, 0L), // 550 > 500: opens seq 1
      (4L, 600L, 2L, 0L), // oversize: isolated in its own sequence
      (5L, 50L, 3L, 0L))) // cannot join the oversize sequence
  }

  test("packSequences: the walk restarts at each id-chunk; seq_id is globally unique") {
    import spark.implicits._
    val df = (0L until 8L).map(i => (i, 100L)).toDF("doc_id", "n_toks")
    val got = Sampling.packSequences(df, "doc_id", "n_toks", maxTokens = 1000L, chunkDocs = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 8 × 100 would fit one sequence, but the chunk boundary at id 4
    // restarts the walk: chunk 0 packs into seq 0·4+0, chunk 1 into 1·4+0
    assert(got.map(r => (r._1, r._3, r._4)) == Seq(
      (0L, 0L, 0L), (1L, 0L, 100L), (2L, 0L, 200L), (3L, 0L, 300L),
      (4L, 4L, 0L), (5L, 4L, 100L), (6L, 4L, 200L), (7L, 4L, 300L)))
  }

  test("packSequences: equals a local greedy replay on a gappy corpus; invariants hold") {
    import spark.implicits._
    // unique ids with gaps INCLUDING negatives (floor-division chunking
    // must agree with Math.floorDiv below zero), tokens 20..919 incl.
    // oversize
    val rows = (0L until 600L).map(i => (i * 7 % 1009 - 300, (i * 137 % 900) + 20))
      .distinctBy(_._1)
    val df = rows.toDF("doc_id", "n_toks").repartition(13)
    val maxTokens = 700L
    val chunkDocs = 64
    val got = Sampling.packSequences(df, "doc_id", "n_toks", maxTokens, chunkDocs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

    // local replay of the same chunked next-fit walk
    val want = rows.sortBy(_._1).groupBy { case (id, _) => Math.floorDiv(id, chunkDocs) }
      .toSeq.flatMap { case (chunk, docs) =>
        var seq = -1L; var run = maxTokens + 1
        docs.sortBy(_._1).map { case (id, tok) =>
          val off = if (run + tok > maxTokens) { seq += 1; run = tok; 0L }
          else { val o = run; run += tok; o }
          (id, tok, chunk * chunkDocs + seq, off)
        }
      }.sortBy(_._1)
    assert(got == want && got.nonEmpty)

    // invariants: all docs present exactly once; a sequence either fits
    // the budget or is a single oversize doc; offsets are prefix sums
    assert(got.map(_._1) == rows.map(_._1).sorted)
    got.groupBy(_._3).foreach { case (seqId, ds) =>
      val tot = ds.map(_._2).sum
      assert(tot <= maxTokens || ds.size == 1, s"seq $seqId: $tot over budget with ${ds.size} docs")
      ds.sortBy(_._4).foldLeft(0L) { (acc, d) =>
        assert(d._4 == acc, s"seq $seqId: offset ${d._4} != prefix $acc"); acc + d._2
      }
    }
    assert(got.exists(_._2 > maxTokens)) // oversize path non-vacuous
    assert(got.groupBy(_._3).exists(_._2.size > 1)) // multi-doc sequences exist
  }

  test("upsample: exact copy counts vs local replay; raising a factor only adds copies") {
    import spark.implicits._
    val rows = (0L until 900L).map(i => (i, Seq("en", "zh", "fr")((i % 3).toInt)))
    val df = rows.toDF("doc_id", "lang").repartition(9)
    val factors = Map("en" -> 2.5, "zh" -> 0.5)
    def copiesOf(id: Long, f: Double): Long =
      f.floor.toLong + (if (idHash(id) < f - f.floor) 1L else 0L)
    val got = Sampling.upsample(df, "lang", "doc_id", factors)
      .select("doc_id", "copy_idx").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    rows.foreach { case (id, lang) =>
      val n = copiesOf(id, factors.getOrElse(lang, 1.0))
      val want = if (n == 0) None else Some((0L until n).toSeq)
      assert(got.get(id) == want, s"id=$id lang=$lang")
    }
    // non-vacuous: some en docs got the third copy, some didn't; some
    // zh docs dropped entirely; fr untouched at exactly one copy
    assert(rows.count { case (id, l) => l == "en" && got(id).size == 3 } > 0)
    assert(rows.count { case (id, l) => l == "en" && got(id).size == 2 } > 0)
    assert(rows.exists { case (id, l) => l == "zh" && !got.contains(id) })
    assert(rows.filter(_._2 == "fr").forall { case (id, _) => got(id) == Seq(0L) })
    // nested mixes: every copy at 2.3 exists at 2.7
    val lo = Sampling.upsample(df, "lang", "doc_id", Map("en" -> 2.3))
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().toSet
    val hi = Sampling.upsample(df, "lang", "doc_id", Map("en" -> 2.7))
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size)
  }

  test("sequenceTexts: contexts are member texts joined in packing order; every doc appears once") {
    import spark.implicits._
    val df = Seq(
      (1L, 300L, "alpha"), (2L, 150L, "beta"), (3L, 100L, "gamma"),
      (4L, 600L, "delta"), (5L, 50L, "eps"))
      .toDF("doc_id", "n_toks", "text").repartition(5)
    val got = Sampling.sequenceTexts(df, "doc_id", "text", "n_toks", maxTokens = 500L)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // same walk as the packSequences hand-computed test: {1,2} {3} {4} {5}
    assert(got == Seq(
      (0L, "alpha beta", 2L), (1L, "gamma", 1L), (2L, "delta", 1L), (3L, "eps", 1L)))
    // zero-token docs share offset 0 — the id tie-break keeps assembly
    // deterministic
    val zeros = Seq((10L, 0L, "a"), (11L, 0L, "b"), (12L, 0L, "c")).toDF("doc_id", "n_toks", "text")
    val z = Sampling.sequenceTexts(zeros, "doc_id", "text", "n_toks", maxTokens = 5L)
      .as[(Long, String, Long)].collect().toSeq
    assert(z == Seq((0L, "a b c", 3L)))
  }

  test("shufflePositions: exact 0-based rank under (coin, id); bucket count never changes it") {
    import spark.implicits._
    val ids = (0L until 500L).map(_ * 13 % 2003).distinct
    val df = ids.map(i => (i, s"d$i")).toDF("doc_id", "payload").repartition(11)
    val want = ids.sortBy(i => (idHash(i), i)).zipWithIndex.map { case (i, p) => (i, p.toLong) }
    for (buckets <- Seq(1, 7, 64, 4096)) {
      val got = Sampling.shufflePositions(df, "doc_id", buckets)
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._2).toSeq
      assert(got == want, s"buckets=$buckets")
    }
    // positions are a permutation of 0..n-1 and payload columns survive
    val out = Sampling.shufflePositions(df, "doc_id", 16)
    assert(out.columns.toSeq == Seq("doc_id", "payload", "shuffle_pos"))
    assert(out.select("shuffle_pos").as[Long].collect().sorted.toSeq == (0L until ids.size).toSeq)
  }

  test("tokenBudgetCap: caller columns named like temps survive untouched") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10L, "keep1", "keep2"), ("a", 2L, 10L, "x", "y"))
      .toDF("source", "doc_id", "n_toks", "_tbc_chunk", "_running")
    val out = Sampling.tokenBudgetCap(df, "source", Seq("doc_id"), "n_toks", 100L)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.select("_tbc_chunk").as[String].collect().toSet == Set("keep1", "x"))
    // non-numeric leading order column: falls back to the window form
    val byName = Sampling.tokenBudgetCap(
      df.withColumn("name", concat(lit("d"), col("doc_id"))),
      "source", Seq("name"), "n_toks", 15L)
    assert(byName.select("doc_id").as[Long].collect().toSet == Set(1L))
  }
}
