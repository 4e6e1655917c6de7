package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

class RunMixSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    (0L until 120L).map(i =>
      (i, s"document $i with body words ${"x " * (i % 7).toInt}end", Seq("en", "zh")((i % 2).toInt)))
      .toDF("doc_id", "text", "lang").repartition(7)
  }

  test("RunMix: shipped contexts equal the inline library composition digit-for-digit") {
    import spark.implicits._
    val docs = corpus()
    val out = java.nio.file.Files.createTempDirectory("graft_mix_").toString
    val a = RunMix.parse(List(
      "--corpus", "u", "--out", out,
      "--max-tokens", "24", "--chunk-docs", "16", "--shuffle-buckets", "8"))
    val (mixedRows, nSeqs) = RunMix.run(spark, docs, a)
    assert(mixedRows == 120 && nSeqs > 1)
    val got = spark.read.parquet(s"$out/contexts")
      .select(col("seq_id"), col("seq_text"), col("n_docs"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // the same composition straight from the library operators
    val keyed = docs
      .withColumn("_k", col("doc_id").cast("long"))
      .withColumn("_t", graft.text.TextOps.tokenCount(col("text")).cast("long"))
    val want = Sampling.sequenceTexts(
        Sampling.shufflePositions(keyed, "_k", 8),
        "shuffle_pos", "text", "_t", maxTokens = 24L, chunkDocs = 16)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    // lineage covers every doc exactly once, positions are a permutation
    val asg = spark.read.parquet(s"$out/assignments")
    assert(asg.columns.toSet == Set("shuffle_pos", "n_tokens", "seq_id", "seq_offset", "doc_id"))
    assert(asg.select(col("doc_id")).distinct().count() == 120 && asg.count() == 120)
    val pos = asg.select(col("shuffle_pos")).as[Long].collect().sorted.toSeq
    assert(pos == (0L until 120L).toSeq)
    // manifest totals agree with the shipped tables
    val m = spark.read.parquet(s"$out/mix_manifest")
      .select(col("n_rows"), col("n_sequences"), col("total_tokens"),
        col("max_seq_tokens"), col("max_tokens"), col("mean_fill"))
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(m._1 == 120 && m._2 == nSeqs && m._5 == 24L)
    assert(m._3 == asg.agg(sum(col("n_tokens"))).as[Long].head())
    assert(m._4 <= 24L) // every doc here fits the budget
    assert(m._6 > 0.0 && m._6 <= 1.0)

    // resume: a re-run with the same config is a no-op on the contexts
    val (again, nSeqs2) = RunMix.run(spark, docs, a)
    assert(again == 120 && nSeqs2 == nSeqs)
    // ...and a different config against the same dir fails fast
    intercept[IllegalArgumentException](
      RunMix.run(spark, docs, a.copy(maxTokens = 32L)))
  }

  test("RunMix: epoch copies shuffle to their own positions; copy lineage ships") {
    import spark.implicits._
    val docs = corpus()
    val out = java.nio.file.Files.createTempDirectory("graft_mix_ups_").toString
    val a = RunMix.parse(List(
      "--corpus", "u", "--out", out,
      "--upsample", "en=2.0", "--max-tokens", "24", "--chunk-docs", "16",
      "--shuffle-buckets", "8"))
    assert(RunMix.upsampleOn(a) && !RunMix.upsampleOn(RunMix.Args()))
    val (mixedRows, nSeqs) = RunMix.run(spark, docs, a)
    assert(mixedRows == 180 && nSeqs > 1) // 60 en x2 + 60 zh x1
    val asg = spark.read.parquet(s"$out/assignments")
    assert(asg.columns.contains("copy_idx"))
    assert(asg.count() == 180)
    // every copy at a distinct position; positions contiguous 0..179
    val pos = asg.select(col("shuffle_pos")).as[Long].collect().sorted.toSeq
    assert(pos == (0L until 180L).toSeq)
    // both copies of each en doc are assigned, each exactly once
    val copies = asg.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    (0L until 120L).foreach(i => assert(copies(i) == (if (i % 2 == 0) 2L else 1L), s"doc $i"))
    // contexts carry every copy: member counts add up to the mixed rows
    val nd = spark.read.parquet(s"$out/contexts").agg(sum(col("n_docs"))).as[Long].head()
    assert(nd == 180L)
    // per-stratum composition of the mixed stream packing consumed
    val mix = spark.read.parquet(s"$out/mix_report")
      .select(col("stratum"), col("n_rows"), col("n_unique_docs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mix("en") == ((120L, 60L)) && mix("zh") == ((60L, 60L)))
  }

  test("RunMix: --token-budget caps each stratum in id order before the shuffle") {
    import spark.implicits._
    val docs = corpus()
    val out = java.nio.file.Files.createTempDirectory("graft_mix_budget_").toString
    val a = RunMix.parse(List(
      "--corpus", "u", "--out", out, "--token-budget", "60",
      "--max-tokens", "24", "--chunk-docs", "16", "--shuffle-buckets", "8"))
    assert(a.tokenBudget.contains(60L))
    val (mixedRows, _) = RunMix.run(spark, docs, a)
    // local replay: per stratum, keep docs in id order while the
    // running whitespace-token total stays within 60
    val toks = docs.select(col("doc_id"), col("lang"),
        graft.text.TextOps.tokenCount(col("text")).cast("long"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val want = toks.groupBy(_._2).values.flatMap { g =>
      var run = 0L
      g.sortBy(_._1).takeWhile { case (_, _, t) => run += t; run <= 60L }
    }.map(_._1).toSet
    assert(want.nonEmpty && want.size < 120) // the cap bites, non-vacuously
    assert(mixedRows == want.size.toLong)
    val got = spark.read.parquet(s"$out/assignments")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == want)
    // the report reflects the capped stream
    val mix = spark.read.parquet(s"$out/mix_report")
    assert(mix.agg(sum(col("n_tokens"))).as[Long].head() <= 120L) // 60 per stratum x2
  }

  test("RunMix: re-upsampling an already-upsampled corpus fails fast") {
    import spark.implicits._
    val withCopies = Seq((1L, "some text", "en", 0L), (1L, "some text", "en", 1L))
      .toDF("doc_id", "text", "lang", "copy_idx")
    val out = java.nio.file.Files.createTempDirectory("graft_mix_dup_").toString
    val a = RunMix.parse(List("--corpus", "u", "--out", out, "--upsample", "en=2.0"))
    intercept[IllegalArgumentException](RunMix.run(spark, withCopies, a))
  }
}
