package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

class SamplingSpec extends SparkSpec {

  private def goldenHash(id: Long): Double =
    (id % 2147483647L) * 1327217885L % 2147483647L / 2147483647.0

  test("stratified: exact membership vs local golden-ratio replay; threshold coin is monotone") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, Seq("en", "zh", "fr")((i % 3).toInt)))
    val df = rows.toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val got = Sampling.stratified(df, "lang", "doc_id", rates, 0.1)
      .select("doc_id").as[Long].collect().toSet
    val want = rows.filter { case (id, lang) => goldenHash(id) < rates.getOrElse(lang, 0.1) }
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
}
