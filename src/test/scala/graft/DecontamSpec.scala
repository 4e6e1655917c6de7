package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Decontam, Dedup}

class DecontamSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("decontam: window-boundary n-grams are never missed (first/last window, exact-n doc)") {
    import spark.implicits._
    // corpus doc of 6 tokens has 4 3-gram windows; eval docs hit the
    // FIRST window, the LAST window, an interior window, and a
    // no-overlap control — false negatives at either boundary fail here
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val evalHit = Seq(
      "alpha beta gamma", // first window
      "delta epsilon zeta", // last window
      "beta gamma delta", // interior window
      "unrelated words entirely"
    ).toDF("text")
    val report = Decontam
      .contaminationReport(spark, corpus, evalHit, "doc_id", "text", "text", 3)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(report == Map(1L -> 3L), s"got $report")

    // eval doc that is EXACTLY one window long flags a corpus doc that
    // contains it at the very end (the classic off-by-one miss)
    val corpus2 = Seq((2L, "p q r s t")).toDF("doc_id", "text")
    val eval2 = Seq("r s t").toDF("text")
    assert(
      Decontam.contaminationReport(spark, corpus2, eval2, "doc_id", "text", "text", 3)
        .count() == 1L)
  }

  test("decontam: short documents (< n tokens) match only whole-sequence-identical short docs") {
    import spark.implicits._
    val corpus = Seq((1L, "x y"), (2L, "x y z w")).toDF("doc_id", "text")
    val eval = Seq("x y").toDF("text")
    // "x y" (whole-sequence shingle of the short eval doc) matches the
    // short corpus doc, NOT the long one (whose windows are all 3-grams)
    val flagged = Decontam
      .contaminationReport(spark, corpus, eval, "doc_id", "text", "text", 3)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(flagged == Set(1L))
  }

  test("decontam: report equals brute-force shingle intersection on the real corpus slice") {
    import spark.implicits._
    val d = spark.read.parquet(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val evalRows = d.filter(_._1 % 20 == 0)
    val corpusRows = d.filter(_._1 % 20 != 0)
    val evalGrams = evalRows.flatMap(r => Dedup.wordShingles(r._2, 3)).toSet
    val want = corpusRows
      .map { case (id, t) => id -> Dedup.wordShingles(t, 3).count(evalGrams.contains).toLong }
      .filter(_._2 > 0)
      .toMap
    val corpus = spark.createDataset(corpusRows.toSeq).toDF("doc_id", "text")
    val ev = spark.createDataset(evalRows.toSeq).toDF("doc_id", "text")
    val got = Decontam
      .contaminationReport(spark, corpus, ev, "doc_id", "text", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"sizes got=${got.size} want=${want.size}")

    // decontaminate == corpus anti flagged, and is contamination-free
    val cleaned = Decontam.decontaminate(spark, corpus, ev, "doc_id", "text", "text", 3)
    assert(cleaned.count() == corpusRows.length - want.size)
    assert(
      Decontam.contaminationReport(spark, cleaned, ev, "doc_id", "text", "text", 3)
        .count() == 0L)
  }
}
