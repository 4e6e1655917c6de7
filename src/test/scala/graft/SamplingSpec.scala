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
