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

  test("decontam matrix: per-(corpus, eval) attribution equals brute force; marginals match report") {
    import spark.implicits._
    val d = spark.read.parquet(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val evalRows = d.filter(_._1 % 20 == 0)
    val corpusRows = d.filter(_._1 % 20 != 0)
    val evalGramsById = evalRows.map { case (id, t) => id -> Dedup.wordShingles(t, 3).toSet }
    val want = (for {
      (cid, t) <- corpusRows
      cg = Dedup.wordShingles(t, 3).toSet
      (eid, eg) <- evalGramsById
      n = (cg & eg).size
      if n > 0
    } yield ((cid, eid), n.toLong)).toMap
    val corpus = spark.createDataset(corpusRows.toSeq).toDF("doc_id", "text")
    val ev = spark.createDataset(evalRows.toSeq).toDF("eval_doc_id", "text")
    val got = Decontam
      .contaminationMatrix(spark, corpus, ev, "doc_id", "text", "eval_doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().map { case (c, e, n) => ((c, e), n) }.toMap
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
    assert(got.nonEmpty)
    // the matrix's per-corpus-doc DISTINCT-gram marginal is NOT simply
    // the row-sum (a gram shared with two eval docs counts once in the
    // report) — check the flagged-id set matches instead
    val reportIds = Decontam
      .contaminationReport(spark, corpus,
        ev.select(col("text")), "doc_id", "text", "text", 3)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got.keySet.map(_._1) == reportIds)
  }

  test("decontam streaming flag: stateless stream flagging matches the batch report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = spark.read.parquet(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().take(120)
    val evalRows = d.filter(_._1 % 20 == 0)
    val corpusRows = d.filter(_._1 % 20 != 0)
    val bc = Decontam.evalGramSet(
      spark, spark.createDataset(evalRows.toSeq).toDF("doc_id", "text"), "text", 3)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val flagged = Decontam.streamingDecontamFlag(
      input.toDS().toDF("doc_id", "text"), "text", bc, 3)
    val q = flagged.writeStream.format("memory").queryName("stream_decontam")
      .outputMode("append").start()
    input.addData(corpusRows.take(30).toSeq)
    q.processAllAvailable()
    input.addData(corpusRows.drop(30).toSeq) // second micro-batch
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT doc_id, n_shared_grams, contaminated FROM stream_decontam")
      .as[(Long, Int, Boolean)].collect()
    assert(got.length == corpusRows.length)
    val evalGrams = evalRows.flatMap(r => Dedup.wordShingles(r._2, 3)).toSet
    got.foreach { case (id, n, c) =>
      val expected = Dedup.wordShingles(corpusRows.find(_._1 == id).get._2, 3).count(evalGrams.contains)
      assert(n == expected && c == (expected > 0), s"doc $id")
    }
    assert(got.exists(_._3) && got.exists(!_._3)) // non-vacuous both ways
  }
}
