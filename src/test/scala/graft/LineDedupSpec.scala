package graft

import org.apache.spark.sql.functions._

import graft.dedup.LineDedup

class LineDedupSpec extends SparkSpec {

  test("removeCommonLines: common footers cut everywhere, unique lines kept in order") {
    import spark.implicits._
    // 6 docs share a footer (case/padding varies — normalization
    // matches them); 2 docs share a rarer line (df=2 < minDf=3)
    val docs = Seq(
      (1L, "alpha one\nSubscribe Now\nbeta two"),
      (2L, "gamma three\n  subscribe now  "),
      (3L, "SUBSCRIBE NOW\ndelta four"),
      (4L, "subscribe now\nepsilon five\nsubscribe now"),
      (5L, "zeta six\nsubscribe now"),
      (6L, "subscribe now"), // reduced to nothing -> ""
      (7L, "eta seven\nrare pair line"),
      (8L, "rare pair line\ntheta eight"),
      (9L, null.asInstanceOf[String]), // null -> ""
      (10L, "iota nine\n\n   \nkappa ten") // blank lines survive
    ).toDF("doc_id", "text")
    val out = LineDedup.removeCommonLines(docs, "doc_id", "text", minDf = 3)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha one\nbeta two")
    assert(out(2L) == "gamma three")
    assert(out(3L) == "delta four")
    assert(out(4L) == "epsilon five") // both occurrences cut
    assert(out(5L) == "zeta six")
    assert(out(6L) == "")
    assert(out(7L) == "eta seven\nrare pair line") // df=2 under minDf
    assert(out(8L) == "rare pair line\ntheta eight")
    assert(out(9L) == "")
    assert(out(10L) == "iota nine\n\n   \nkappa ten") // byte-identical
    // the audit table: exactly one common normalized line at df >= 3
    val common = LineDedup.commonLines(docs, "doc_id", "text", 3)
    assert(common.count() == 1)
    assert(common.select(col("df")).as[Long].head() == 6)
  }

  test("curation line-dedup stage cuts footers before downstream stages; audit table written") {
    import spark.implicits._
    import graft.pipeline.Curation
    // every doc shares a footer line; bodies are unique and long enough
    // for the token floor only WITH the footer removed the floor still
    // holds (12-word bodies, floor 5)
    val corpus = (0L until 30L).map { i =>
      val body = (1 to 12).map(w => s"word${i * 13 + w}z").mkString(" ")
      (i, s"$body\nFollow Us On Social Media", "en")
    }.toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching anything at all").toDF("text")
    def run(m: Option[Int]) = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 5,
        Map.empty, 1.0, shingleN = 6, lineDedupMinDf = m)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val base = run(None)
    val gated = run(Some(3))
    assert(base.keySet == gated.keySet && gated.nonEmpty)
    base.values.foreach(t => assert(t.contains("Follow Us On Social Media")))
    gated.foreach { case (i, t) =>
      assert(!t.contains("Follow Us"), s"doc $i kept the footer")
      assert(t == t.trim && t.split("\n").length == 1) // body only, no dangling newline
    }

    // spark-submit core: --line-dedup flag, fingerprint segment, and
    // the common_lines audit carrying the footer's normalized text
    assert(!RunCuration.configFingerprint(RunCuration.Args()).contains("lineDedupMinDf"))
    val out = java.nio.file.Files.createTempDirectory("graft_curation_ldedup_").toString
    val args = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out,
      "--shingle-n", "6", "--min-tokens", "5", "--line-dedup", "3"))
    assert(args.lineDedupMinDf == Some(3))
    // minDf=1 would mark every line common and blank the corpus
    intercept[IllegalArgumentException](RunCuration.parse(List("--line-dedup", "1")))
    assert(RunCuration.configFingerprint(args).contains("lineDedupMinDf=3"))
    val (in, outN) = RunCuration.run(spark, corpus, eval, args)
    assert(in == 30 && outN == 30)
    val shipped = spark.read.parquet(s"$out/corpus")
    assert(shipped.where(col("text").contains("Follow Us")).count() == 0)
    val audit = spark.read.parquet(s"$out/common_lines")
      .select(col("line"), col("df")).as[(String, Long)].collect()
    assert(audit.toSeq == Seq(("follow us on social media", 30L)))
  }

  test("streaming scrub equals the distributed removal; broadcast guard fails fast") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val boiler = Vector("cookie banner text", "all rights reserved", "menu home about")
    val corpus = (0L until 150L).map { i =>
      val own = (0 to rnd.nextInt(4)).map(j => s"body line ${i}_$j")
      val foot = boiler.filter(_ => rnd.nextInt(2) == 0)
        .map(b => if (rnd.nextInt(2) == 0) b.toUpperCase else s"  $b")
      (i, (own ++ foot).mkString("\n"))
    } :+ (150L, null.asInstanceOf[String]) :+ (151L, "")
    val df = corpus.toDF("doc_id", "text")
    val batch = LineDedup.removeCommonLines(df, "doc_id", "text", minDf = 5)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val set = LineDedup.commonLineSet(spark, df, "doc_id", "text", minDf = 5)
    val stream = LineDedup.streamingRemoveCommonLines(df, "text", set)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(batch == stream)
    // non-vacuous: some doc lost a line, some doc is untouched
    val orig = corpus.toMap
    assert(batch.exists { case (k, v) => orig(k) != null && v != orig(k) })
    assert(batch.exists { case (k, v) => v == orig(k) && v.nonEmpty })
    // guard: a cap smaller than the table fails fast instead of
    // collecting unbounded driver state
    intercept[IllegalArgumentException] {
      LineDedup.commonLineSet(spark, df, "doc_id", "text", minDf = 5, maxLines = 1)
    }
  }
}
