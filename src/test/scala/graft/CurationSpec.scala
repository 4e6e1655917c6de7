package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.pipeline.Curation
import graft.text.TextOps

class CurationSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("curate: output satisfies every stage's constraint, each stage removes something") {
    import spark.implicits._
    val all = spark.read.parquet(docs)
    val corpus = all.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val eval = all.where(col("doc_id") % 20 === 0).select(col("text"))
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val out = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 20, rates, 0.1)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    assert(out.nonEmpty && out.length < corpus.count())

    // stage 1: no two survivors share a normalized text
    val normed = corpus.select(col("doc_id"), TextOps.normalized(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    val survivors = out.map(_._1).toSet
    assert(survivors.toSeq.map(normed).distinct.length == survivors.size)

    // stage 2: no survivor shares a gram with the eval slice
    val evalGrams = eval.as[String].collect().flatMap(t => Dedup.wordShingles(t, 3)).toSet
    out.foreach { case (id, t, _) =>
      assert(!Dedup.wordShingles(t, 3).exists(evalGrams.contains), s"doc $id contaminated")
    }

    // stage 3: every survivor meets the token floor
    out.foreach { case (id, t, _) =>
      assert(t.trim.split("\\s+").count(_.nonEmpty) >= 20, s"doc $id under floor")
    }

    // stage 4: every survivor's hash is under its stratum rate, and no
    // qualified doc under the rate was dropped (exact sample replay)
    def goldenHash(id: Long): Double = {
      def pmod(x: Long, m: Long): Long = ((x % m) + m) % m
      pmod(pmod(id, 2147483647L) * 1327217885L + pmod(id, 2147483629L) * 1709782614L,
        2147483647L) / 2147483647.0
    }
    out.foreach { case (id, _, lang) =>
      assert(goldenHash(id) < rates.getOrElse(lang, 0.1), s"doc $id over rate")
    }
    val preSample = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 20,
        Map.empty, 1.0) // rate 1.0 = no sampling
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    assert(preSample.length > out.length) // sampling removed something
    val expected = preSample.filter { case (id, lang) =>
      goldenHash(id) < rates.getOrElse(lang, 0.1)
    }.map(_._1).toSet
    assert(survivors == expected)

    // determinism under partitioning
    val again = Curation
      .curate(spark, corpus.repartition(7), eval, "doc_id", "text", "lang", "text", 20, rates, 0.1)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == survivors)
  }

  test("curate: gopher stage removes repetition-heavy docs the token floor keeps") {
    import spark.implicits._
    import graft.text.Repetition
    val all = spark.read.parquet(docs)
    val corpus = all.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val eval = all.where(col("doc_id") % 20 === 0).select(col("text"))
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val rules = Curation.GopherRules(
      minWords = 20, minMeanWordLen = 4.0, maxDupUnitFraction = 0.6)
    val base = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 20, rates, 0.1,
        shingleN = 6)
      .select(col("doc_id")).as[Long].collect().toSet
    val gated = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 20, rates, 0.1,
        shingleN = 6, gopher = Some(rules))
      .select(col("doc_id")).as[Long].collect().toSet
    // the gopher stage only removes — and removes exactly the docs
    // failing the fused predicate (non-vacuous both ways)
    assert(gated.subsetOf(base) && gated.size < base.size && gated.nonEmpty)
    val passing = corpus
      .where(Repetition.gopherPasses(col("text"),
        minWords = rules.minWords, minMeanWordLen = rules.minMeanWordLen,
        maxDupUnitFraction = rules.maxDupUnitFraction))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(gated == base.intersect(passing))
  }

  test("curate: gopher LINE stage gates on line rules; gopher_line_report audits its bite") {
    import spark.implicits._
    import graft.text.Repetition
    // multi-line corpus: 6 five-word lines per doc (distinct words, so
    // the dup-line rules never fire); every %4 doc gets ellipsis line
    // endings — the one rule that bites at these thresholds
    val corpus = (0L until 60L).map { i =>
      val base = (1 to 30).map(w => s"word${(i * 31 + w) % 997}x")
        .grouped(5).map(_.mkString(" ")).mkString("\n")
      val t = if (i % 4 == 0) base.linesIterator.map(_ + "...").mkString("\n") else base
      (i, t, "en")
    }.toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching anything at all").toDF("text")
    val rules = Curation.GopherLineRules(maxEllipsisLineFraction = 0.2)
    val base = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6)
      .select(col("doc_id")).as[Long].collect().toSet
    val gated = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6, gopherLines = Some(rules))
      .select(col("doc_id")).as[Long].collect().toSet
    // the line stage only removes — and removes exactly the docs
    // failing the fused line predicate (non-vacuous both ways)
    assert(gated.subsetOf(base) && gated.size < base.size && gated.nonEmpty)
    val passing = corpus
      .where(Repetition.gopherLinePasses(col("text"),
        maxEllipsisLineFraction = rules.maxEllipsisLineFraction))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(gated == base.intersect(passing))
    assert(gated == base.filter(_ % 4 != 0)) // exactly the ellipsis docs dropped

    // the spark-submit core: --gopher-lines grammar, the line-report
    // audit table, and the fingerprint segment
    assert(RunCuration.parseGopherLines("default") == Curation.GopherLineRules())
    assert(RunCuration.parseGopherLines("max-dup-line-fraction=0.5,max-bullet-fraction=0.8") ==
      Curation.GopherLineRules(maxDupLineFraction = 0.5, maxBulletLineFraction = 0.8))
    intercept[IllegalArgumentException](RunCuration.parseGopherLines("bogus-key=1"))
    // stage-off runs keep the pre-flag fingerprint (resume compat)
    assert(!RunCuration.configFingerprint(RunCuration.Args()).contains("gopherLines"))
    val out = java.nio.file.Files.createTempDirectory("graft_curation_lines_").toString
    val args = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out,
      "--shingle-n", "6", "--gopher-lines", "max-ellipsis-fraction=0.2"))
    assert(args.gopherLines == Some(rules))
    assert(RunCuration.configFingerprint(args).contains("gopherLines"))
    val (in, outN) = RunCuration.run(spark, corpus, eval, args)
    assert(in == 60 && outN == 45) // the 15 ellipsis docs dropped
    val shipped = spark.read.parquet(s"$out/corpus")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(shipped == gated)
    val report = spark.read.parquet(s"$out/gopher_line_report")
    assert(report.columns.toSet == Set("n_evaluated",
      "n_dup_line_ok", "n_dup_line_chars_ok", "n_bullet_ok", "n_ellipsis_ok",
      "n_line_passes",
      "p50_dup_line_fraction", "p90_dup_line_fraction", "max_dup_line_fraction",
      "p90_dup_line_char_fraction", "max_dup_line_char_fraction",
      "p90_bullet_line_fraction", "p90_ellipsis_line_fraction", "p50_n_lines"))
    val r = report.select(col("n_evaluated"), col("n_ellipsis_ok"),
      col("n_bullet_ok"), col("n_line_passes"), col("p50_n_lines"))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 == 60 && r._2 == 45 && r._3 == 60 && r._4 == 45 && r._5 == 6.0)
  }

  test("curate: gopher NGRAM stage gates on the full family; gopher_ngram_report audits it") {
    import spark.implicits._
    import graft.text.Repetition
    // every %3 doc has its 60-word body doubled -> dup-5..10-gram cover
    // ~1.0, failing every dup cap; the rest have unique bodies long
    // enough that a single unrepeated top-n-gram stays under its cap
    val corpus = (0L until 60L).map { i =>
      val body = (1 to 60).map(w => s"tok${i * 61 + w}q").mkString(" ")
      val t = if (i % 3 == 0) s"$body $body" else body
      (i, t, "en")
    }.toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching anything at all").toDF("text")
    val base = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6)
      .select(col("doc_id")).as[Long].collect().toSet
    val gated = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6,
        gopherNgrams = Some(Curation.GopherNgramRules()))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(gated.subsetOf(base) && gated.nonEmpty)
    assert(gated == base.filter(_ % 3 != 0)) // exactly the doubled docs dropped
    val passing = corpus.where(Repetition.gopherNgramPasses(col("text")))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(gated == base.intersect(passing))

    // CLI grammar + cap overrides; unknown n fails fast
    assert(RunCuration.parseGopherNgrams("default") == Curation.GopherNgramRules())
    val tuned = RunCuration.parseGopherNgrams("top-2=0.5,dup-5=0.9")
    assert(tuned.topCaps(2) == 0.5 && tuned.dupCaps(5) == 0.9)
    assert(tuned.topCaps(3) == Repetition.TopNgramCaps(3)) // untouched
    intercept[IllegalArgumentException](RunCuration.parseGopherNgrams("top-7=0.5"))
    intercept[IllegalArgumentException](RunCuration.parseGopherNgrams("bogus=1"))

    // the spark-submit core writes the n-gram report over the exact
    // evaluated corpus; fingerprint gains a sorted-caps segment
    val out = java.nio.file.Files.createTempDirectory("graft_curation_ng_").toString
    val args = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out,
      "--shingle-n", "6", "--gopher-ngrams", "default"))
    assert(args.gopherNgrams == Some(Curation.GopherNgramRules()))
    assert(RunCuration.configFingerprint(args).contains("gopherNgrams=top2=0.2"))
    val (in, outN) = RunCuration.run(spark, corpus, eval, args)
    assert(in == 60 && outN == 40)
    val report = spark.read.parquet(s"$out/gopher_ngram_report")
    assert(report.columns.toSet == Set("n_evaluated",
      "n_top_2gram_ok", "n_top_3gram_ok", "n_top_4gram_ok",
      "n_dup_5gram_ok", "n_dup_6gram_ok", "n_dup_7gram_ok",
      "n_dup_8gram_ok", "n_dup_9gram_ok", "n_dup_10gram_ok",
      "n_ngram_passes",
      "p90_top_2gram_char_fraction", "max_top_2gram_char_fraction",
      "p90_dup_5gram_char_fraction", "max_dup_5gram_char_fraction"))
    val r = report.select(col("n_evaluated"), col("n_dup_5gram_ok"),
      col("n_ngram_passes"), col("max_dup_5gram_char_fraction"))
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 == 60 && r._2 == 40 && r._3 == 40 && r._4 == 1.0)
  }

  test("curate: near-dup stage removes dominated clips; composite quality floor holds") {
    import spark.implicits._
    val all = spark.read.parquet(docs)
    // clip corpus: every 4th doc gets a copy with the last 3 words
    // dropped (high-but-not-1.0 Jaccard) under a shifted id
    val base = all.select(col("doc_id"), col("text"), col("lang"))
    val clips = base.where(col("doc_id") % 4 === 0).select(
      (col("doc_id") + 200000).as("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), lit(1),
        greatest(size(split(col("text"), " ")) - 3, lit(1)))).as("text"),
      col("lang"))
    val corpus = base.union(clips).where(col("doc_id") % 20 =!= 0)
    val eval = all.where(col("doc_id") % 20 === 0).select(col("text"))
    val floor = 0.75
    def run(nd: Curation.NearDupStage) = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6, nearDup = nd, qualityFloor = Some(floor))
      .select(col("doc_id")).as[Long].collect().toSet
    val without = run(Curation.NearDupStage.Off)
    val withNd = run(Curation.NearDupStage.ExactJaccard(0.6, 3))
    assert(withNd.subsetOf(without))
    val removed = without -- withNd
    assert(removed.nonEmpty, "near-dup stage removed nothing")
    // smaller-id-wins: clips (the larger side of their pair by id
    // shift) are dominated and removed. The raw sf0.001 corpus also
    // carries NATURAL near-dup pairs at J >= 0.6, so removals below
    // the shift are legitimate — require the clips specifically.
    val clipIds = clips.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id")).as[Long].collect().toSet
    val removedClips = removed.filter(_ >= 200000)
    assert(removedClips.nonEmpty && removedClips.subsetOf(clipIds))
    // the MinHashLsh stage (the cheap-scale path) removes the same
    // clips here: banding recall at J ~ 0.9 clip pairs is ~1, and LSH
    // survivors can only be a superset of the exact stage's (banding
    // loses pairs, never invents them — exact re-scoring)
    val withLsh = run(Curation.NearDupStage.MinHashLsh(0.6, 3))
    assert(withNd.subsetOf(withLsh) && withLsh.subsetOf(without))
    assert((without -- withLsh).exists(_ >= 200000), "LSH stage removed no clips")
    // composite floor holds on every survivor (replay the column expr)
    val qualities = corpus
      .withColumn("q", graft.text.TextOps.qualityScore(col("text")))
      .select(col("doc_id"), col("q")).as[(Long, Double)].collect().toMap
    withNd.foreach(id => assert(qualities(id) >= floor, s"doc $id under quality floor"))
    // the floor is not vacuous on this corpus
    assert(corpus.count() > without.size)
  }

  test("RunCuration: spark-submit core writes partitioned corpus + audit tables") {
    import spark.implicits._
    val all = spark.read.parquet(docs)
    val corpus = all.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val eval = all.where(col("doc_id") % 20 === 0).select(col("text"))
    val out = java.nio.file.Files.createTempDirectory("graft_curation_").toString
    val args = RunCuration.parse(List(
      "--docs", "unused", "--eval", "unused", "--out", out,
      "--min-tokens", "20", "--quality-floor", "0.72",
      "--neardup", "exact:0.6", "--max-dup-fraction", "0.9",
      "--gopher", "min-words=5,max-dup-unit-fraction=0.6",
      "--shingle-n", "6", "--rates", "en=0.9,zh=0.8", "--default-rate", "0.7"))
    assert(args.nearDup == Curation.NearDupStage.ExactJaccard(0.6))
    assert(args.rates == Map("en" -> 0.9, "zh" -> 0.8))
    // extended --neardup grammar: shingle-n and LSH banding on the CLI
    assert(RunCuration.parseNearDup("exact:0.7:4") == Curation.NearDupStage.ExactJaccard(0.7, 4))
    assert(RunCuration.parseNearDup("lsh:0.6:5:24:2") ==
      Curation.NearDupStage.MinHashLsh(0.6, 5, 24, 2))
    assert(RunCuration.parseSpanAction("cut") == Curation.SpanAction.CutSpans)
    intercept[IllegalArgumentException](RunCuration.parseNearDup("lsh:0.6:5:24"))
    // --gopher grammar: default thresholds or k=v overrides
    assert(RunCuration.parseGopher("default") == Curation.GopherRules())
    assert(RunCuration.parseGopher("min-words=20,max-dup-unit-fraction=0.6") ==
      Curation.GopherRules(minWords = 20, maxDupUnitFraction = 0.6))
    intercept[IllegalArgumentException](RunCuration.parseGopher("bogus-key=1"))
    val (in, outN) = RunCuration.run(spark, corpus, eval, args)
    assert(in == corpus.count() && outN > 0 && outN < in)
    // partitioned layout + curated ids are a subset of the corpus
    val curated = spark.read.parquet(s"$out/corpus")
    assert(curated.columns.contains("lang"))
    val ids = curated.select(col("doc_id")).as[Long].collect().toSet
    val corpusIds = corpus.select(col("doc_id")).as[Long].collect().toSet
    assert(ids.subsetOf(corpusIds))
    // audit tables exist and are consistent
    val report = spark.read.parquet(s"$out/decontam_report")
    assert(report.columns.toSet == Set("doc_id", "n_shared_grams"))
    val flagged = report.select(col("doc_id")).as[Long].collect().toSet
    assert(ids.intersect(flagged).isEmpty) // no contaminated doc survived
    // the span audit is the EXACT profile the cap thresholded (post
    // near-dup, where sf0.001's 6-gram spans vanish with their pair
    // partners — an empty table is the honest audit here); schema +
    // consistency: no survivor may sit over the cap in the audit
    val spanAudit = spark.read.parquet(s"$out/span_stats")
    assert(spanAudit.columns.toSet ==
      Set("doc_id", "n_spans", "dup_tokens", "total_tokens", "dup_fraction"))
    val overCap = spanAudit.where(col("dup_fraction") > 0.9)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids.intersect(overCap).isEmpty)

    // a NON-empty span audit end-to-end: boilerplate-injected corpus,
    // the written profile is the plan the cap thresholded — over-cap
    // docs are dropped from the mix and appear in the audit
    val out3 = java.nio.file.Files.createTempDirectory("graft_curation_span_").toString
    val boiler = "this exact boilerplate notice appears in many documents verbatim"
    val spanCorpus = ((0L until 8L).map(i => (i, s"$boiler tail$i", "en")) ++
      (100L until 110L).map(i =>
        (i, s"doc$i body$i text$i words$i here$i only$i more$i stuff$i", "en")))
      .toDF("doc_id", "text", "lang")
    val args3 = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out3,
      "--span-shingle-n", "3", "--max-dup-fraction", "0.5", "--shingle-n", "6"))
    val (in3, n3) = RunCuration.run(spark, spanCorpus,
      Seq("nothing matching at all").toDF("text"), args3)
    assert(in3 == 18 && n3 == 10) // every boilerplate doc dropped
    val audit3 = spark.read.parquet(s"$out3/span_stats")
    assert(audit3.count() == 8) // the 8 injected docs, profiled
    val dropped3 = audit3.where(col("dup_fraction") > 0.5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(dropped3 == (0L until 8L).toSet)
    val shipped3 = spark.read.parquet(s"$out3/corpus")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(shipped3 == (100L until 110L).toSet)

    // near-dup audit tables: the pair table the survivor policy
    // consumed + the transitive clusters over the same graph
    val pairAudit = spark.read.parquet(s"$out/neardup_pairs")
    assert(pairAudit.columns.toSet == Set("id_a", "id_b", "jaccard"))
    val dominated = pairAudit.select(col("id_b")).as[Long].collect().toSet
    assert(dominated.nonEmpty || pairAudit.count() == 0)
    assert(ids.intersect(dominated).isEmpty, "a dominated doc survived the near-dup stage")
    val clusterAudit = spark.read.parquet(s"$out/neardup_clusters")
    assert(clusterAudit.columns.toSet == Set("doc_id", "cluster_id"))
    // every paired doc shares its cluster with its pair partner
    val cmap = clusterAudit.as[(Long, Long)].collect().toMap
    pairAudit.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().foreach {
      case (x, y) => assert(cmap(x) == cmap(y), s"pair ($x,$y) split across clusters")
    }

    // gopher audit: per-rule pass counts over the corpus the stage
    // thresholded; at this corpus the dup-unit cap bites non-vacuously
    val gopherAudit = spark.read.parquet(s"$out/gopher_report")
    assert(gopherAudit.columns.toSet == Set("n_evaluated", "n_words_ok", "n_word_len_ok",
      "n_alpha_ok", "n_dup_unit_ok", "n_passes", "n_top_ngram_ok",
      "p50_dup_unit_fraction", "p90_dup_unit_fraction", "max_dup_unit_fraction",
      "p50_top_ngram_char_fraction", "p90_top_ngram_char_fraction",
      "max_top_ngram_char_fraction", "p50_word_count"))
    val ga = gopherAudit.select(col("n_evaluated"), col("n_dup_unit_ok"), col("n_passes"))
      .as[(Long, Long, Long)].head()
    assert(ga._1 > 0 && ga._3 <= ga._1 && ga._2 < ga._1) // the cap removed something
    assert(ga._3 >= ids.size.toLong) // survivors passed (sampling may drop more)
    // signal distribution: ordered percentiles inside the signal range,
    // and the dup-unit tail sits over the 0.6 cap (that's what bit above)
    val gd = gopherAudit.select(col("p50_dup_unit_fraction"), col("p90_dup_unit_fraction"),
      col("max_dup_unit_fraction"), col("p50_word_count"))
      .as[(Double, Double, Double, Double)].head()
    assert(gd._1 <= gd._2 && gd._2 <= gd._3 && gd._3 <= 1.0 && gd._1 >= 0.0)
    assert(gd._3 > 0.6 && gd._4 > 0.0)

    // mix composition: per-stratum totals over exactly the shipped corpus
    val mix = spark.read.parquet(s"$out/mix_report")
    assert(mix.columns.toSet == Set("stratum", "n_docs", "n_unique_docs", "n_chars", "n_tokens"))
    assert(mix.agg(sum(col("n_docs"))).as[Long].head() == ids.size.toLong)
    // no upsampling: every shipped row is a unique doc
    assert(mix.where(col("n_docs") =!= col("n_unique_docs")).count() == 0)
    val wantChars = curated.agg(sum(length(col("text")).cast("long"))).as[Long].head()
    assert(mix.agg(sum(col("n_chars"))).as[Long].head() == wantChars)
    assert(mix.where(col("n_tokens") <= 0L).count() == 0)

    // --redact scrubs the SHIPPED mix only (stages saw original text)
    val out2 = java.nio.file.Files.createTempDirectory("graft_curation_red_").toString
    val withPii = corpus.withColumn("text",
      concat(col("text"), lit(" reach me at leak"), col("doc_id"), lit("@corp.example")))
    val args2 = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out2, "--shingle-n", "6", "--redact"))
    assert(args2.redact)
    val (_, n2) = RunCuration.run(spark, withPii, eval, args2)
    assert(n2 > 0)
    val shipped = spark.read.parquet(s"$out2/corpus")
    assert(shipped.where(col("text").contains("@corp.example")).count() == 0)
    assert(shipped.where(col("text").contains("[EMAIL]")).count() == n2)
    // pre/post PII counts audit: every shipped doc carried one injected
    // email pre-scrub; the post-scan of the redacted text finds none
    val pii = spark.read.parquet(s"$out2/pii_counts")
      .select(col("pii_type"), col("n_pre"), col("n_post"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(pii.keySet == Set("n_emails", "n_ssns", "n_ips", "n_phones"))
    assert(pii("n_emails")._1 == n2 && pii("n_emails")._2 == 0L)
  }

  test("RunCuration: --upsample ships epoch copies after redaction; audits see the shipped multiset") {
    import spark.implicits._
    val corpus = (0L until 40L).map(i =>
      (i, s"doc$i unique body with plenty of words number $i end mail$i@x.example",
        Seq("en", "zh")((i % 2).toInt)))
      .toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching at all").toDF("text")
    val out = java.nio.file.Files.createTempDirectory("graft_curation_ups_").toString
    val args = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out,
      "--shingle-n", "6", "--upsample", "en=2.0", "--redact"))
    assert(args.upsample == Map("en" -> 2.0) && RunCuration.upsampleOn(args))
    assert(!RunCuration.upsampleOn(RunCuration.Args())) // stage-off default
    val (in, outN) = RunCuration.run(spark, corpus, eval, args)
    assert(in == 40 && outN == 60) // 20 en docs x2 + 20 zh docs x1
    val shipped = spark.read.parquet(s"$out/corpus")
    // integral factor 2.0: every en doc exactly copies {0,1}, zh exactly {0}
    val byId = shipped.select(col("doc_id"), col("copy_idx")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    (0L until 40L).foreach { i =>
      val want = if (i % 2 == 0) Seq(0L, 1L) else Seq(0L)
      assert(byId(i) == want, s"doc $i")
    }
    // redaction ran before the expand: every shipped copy is scrubbed
    assert(shipped.where(col("text").contains("@x.example")).count() == 0)
    assert(shipped.where(col("text").contains("[EMAIL]")).count() == 60)
    // mix_report counts shipped copies AND underlying docs
    val mix = spark.read.parquet(s"$out/mix_report")
      .select(col("stratum"), col("n_docs"), col("n_unique_docs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mix("en") == ((40L, 20L)) && mix("zh") == ((20L, 20L)))
    // PII pre/post scan the same shipped multiset: one email per copy
    val pii = spark.read.parquet(s"$out/pii_counts")
      .select(col("pii_type"), col("n_pre"), col("n_post"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(pii("n_emails") == ((60L, 0L)))
    // resume fail-fast: a re-run with different factors must not mix
    // old buckets with a new mix config
    val args2 = args.copy(upsample = Map("en" -> 3.0))
    intercept[IllegalArgumentException](RunCuration.run(spark, corpus, eval, args2))

    // an aggressive config that filters EVERYTHING ships an empty
    // corpus and empty audits, not a schema-inference crash on the
    // file-less dynamic-partitioned output
    val outE = java.nio.file.Files.createTempDirectory("graft_curation_empty_").toString
    val argsE = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", outE,
      "--shingle-n", "6", "--default-rate", "0.0", "--redact"))
    val (inE, outNE) = RunCuration.run(spark, corpus, eval, argsE)
    assert(inE == 40 && outNE == 0)
    assert(spark.read.parquet(s"$outE/mix_report").count() == 0)
  }

  test("resumable corpus sink: completed buckets are skipped; RunCuration re-run is a no-op") {
    import spark.implicits._
    import graft.graph.Materialize
    val dir = java.nio.file.Files.createTempDirectory("graft_resume_").toString + "/corpus"
    val d = (0L until 100L).map(i => (i, s"text $i", Seq("en", "zh")((i % 2).toInt)))
      .toDF("doc_id", "text", "lang")
    val bucketOf = pmod(xxhash64(col("doc_id")), lit(4)).cast("int")
    // "crashed" first run: only the rows of buckets 0-1 made it
    val n1 = Materialize.writeBucketedResumable(
      spark, d.where(bucketOf < 2), dir, "doc_id", 4, Seq("lang"))
    assert(n1 == 2)
    // resume with the full input, text MUTATED on the completed
    // buckets' rows: the ledger must skip them (their data is final)
    val mutated = d.withColumn("text",
      when(bucketOf < 2, lit("MUST NOT APPEAR")).otherwise(col("text")))
    val n2 = Materialize.writeBucketedResumable(spark, mutated, dir, "doc_id", 4, Seq("lang"))
    assert(n2 == 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    assert(back.where(col("text") === "MUST NOT APPEAR").count() == 0)
    assert(back.select("doc_id").as[Long].collect().toSet == (0L until 100L).toSet)
    // fully-resumed table: a third run writes nothing
    assert(Materialize.writeBucketedResumable(spark, d, dir, "doc_id", 4, Seq("lang")) == 0L)
    // the bucket modulus is pinned — a mismatched re-run fails fast
    intercept[IllegalArgumentException] {
      Materialize.writeBucketedResumable(spark, d, dir, "doc_id", 8, Seq("lang"))
    }

    // integration: a second identical RunCuration invocation resumes to
    // a no-op and the shipped corpus is unchanged
    val all = spark.read.parquet(docs)
    val corpus = all.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val eval = all.where(col("doc_id") % 20 === 0).select(col("text"))
    val out = java.nio.file.Files.createTempDirectory("graft_resume_run_").toString
    val args = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out, "--shingle-n", "6", "--buckets", "8"))
    val (_, first) = RunCuration.run(spark, corpus, eval, args)
    val ids1 = spark.read.parquet(s"$out/corpus").select("doc_id").as[Long].collect().sorted
    val (_, second) = RunCuration.run(spark, corpus, eval, args)
    val ids2 = spark.read.parquet(s"$out/corpus").select("doc_id").as[Long].collect().sorted
    assert(first == second && ids1.sameElements(ids2))
    // a changed config against the same out dir fails fast instead of
    // silently mixing stale buckets with new-config audits
    val argsChanged = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out, "--shingle-n", "6", "--buckets", "8",
      "--min-tokens", "5"))
    intercept[IllegalArgumentException](RunCuration.run(spark, corpus, eval, argsChanged))
    // --fresh rebuilds from scratch (stale ledger cleared)
    val argsFresh = RunCuration.parse(List(
      "--docs", "u", "--eval", "u", "--out", out, "--shingle-n", "6", "--buckets", "8", "--fresh"))
    val (_, third) = RunCuration.run(spark, corpus, eval, argsFresh)
    assert(third == first)
  }

  test("curate: CutSpans excises boilerplate and keeps the docs; with a cap, over-cap docs still drop") {
    import spark.implicits._
    import graft.pipeline.Curation.SpanAction
    val boiler = "terms of service apply to all users of this site always"
    // A: almost pure boilerplate (dup_fraction 11/12 ~ 0.92); B:
    // boilerplate + a 5-token unique tail (11/16 ~ 0.69); C: unique
    val a = (0L until 8L).map(i => (i, s"$boiler a$i", "en"))
    val b = (10L until 20L).map(i => (i, s"$boiler u$i v$i w$i x$i y$i", "en"))
    val c = (100L until 110L).map(i => (i, s"doc$i body$i text$i words$i here$i only$i", "en"))
    val corpus = (a ++ b ++ c).toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching anything at all").toDF("text")
    def run(cap: Option[Double], action: SpanAction) = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6,
        nearDup = Curation.NearDupStage.ExactJaccard(0.9, 3),
        maxDupFraction = cap, spanShingleN = 3, spanAction = action)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    // surgery without a cap: every doc kept, boilerplate cut everywhere
    val cut = run(None, SpanAction.CutSpans)
    assert(cut.keySet == (a ++ b ++ c).map(_._1).toSet)
    a.foreach { case (i, _, _) => assert(cut(i) == s"a$i") }
    b.foreach { case (i, _, _) => assert(cut(i) == s"u$i v$i w$i x$i y$i") }
    c.foreach { case (i, t, _) => assert(cut(i) == t) } // untouched, byte-identical
    // surgery WITH a cap: mostly-boilerplate A drops wholesale, B is
    // kept and cut (both decisions from one span report), C untouched
    val cutCap = run(Some(0.8), SpanAction.CutSpans)
    assert(cutCap.keySet == (b ++ c).map(_._1).toSet)
    b.foreach { case (i, _, _) => assert(cutCap(i) == s"u$i v$i w$i x$i y$i") }
    // the default action with the same cap drops A but leaves B uncut
    val dropCap = run(Some(0.8), SpanAction.DropDocs)
    assert(dropCap.keySet == (b ++ c).map(_._1).toSet)
    b.foreach { case (i, t, _) => assert(dropCap(i) == t) }
  }

  test("curate: extraRule judges the SHIPPED text (post span surgery), not the raw input") {
    import spark.implicits._
    import graft.pipeline.Curation.SpanAction
    import graft.text.TextOps
    val boiler = "terms of service apply to all users of this site always"
    // A-docs: 11 boilerplate tokens + 3 unique -> CutSpans leaves 3
    // tokens; C-docs: 6 unique tokens, untouched by surgery
    val a = (0L until 8L).map(i => (i, s"$boiler u$i v$i w$i", "en"))
    val c = (100L until 108L).map(i => (i, s"doc$i body$i text$i words$i here$i only$i", "en"))
    val corpus = (a ++ c).toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching anything at all").toDF("text")
    val rule = TextOps.tokenCount(col("text")) >= 5
    def run(action: SpanAction) = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6, spanShingleN = 3, spanAction = action,
        extraRule = Some(rule))
      .select(col("doc_id")).as[Long].collect().toSet
    // no surgery: every A doc has 14 raw tokens -> the rule keeps all
    assert(run(SpanAction.DropDocs) == (a ++ c).map(_._1).toSet)
    // with surgery the rule sees the CUT text (3 tokens) and drops A —
    // a pre-curate filter on raw input could not make this decision
    assert(run(SpanAction.CutSpans) == c.map(_._1).toSet)
  }

  test("curate: boilerplate stage drops span-heavy docs that near-dup keeps") {
    import spark.implicits._
    val boiler = "terms of service apply to all users of this site always"
    // docs 0-9 embed the 11-token boilerplate block + 3 unique tokens
    // (dup_fraction ~ 0.79); docs 100-109 are fully unique; pairwise
    // Jaccard between boilerplate docs stays moderate (shared block,
    // distinct tails) so an 0.9 near-dup threshold keeps them all
    val rows = (0L until 10L).map(i => (i, s"$boiler unique$i tail$i x$i", "en")) ++
      (100L until 110L).map(i => (i, s"doc$i body$i text$i words$i here$i only$i", "en"))
    val corpus = rows.toDF("doc_id", "text", "lang")
    val eval = Seq("nothing matching anything at all").toDF("text")
    def run(cap: Option[Double]) = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 0,
        Map.empty, 1.0, shingleN = 6,
        nearDup = Curation.NearDupStage.ExactJaccard(0.9, 3),
        maxDupFraction = cap, spanShingleN = 3)
      .select(col("doc_id")).as[Long].collect().toSet
    val keptAll = run(None)
    assert(keptAll == rows.map(_._1).toSet) // near-dup at 0.9 removes nothing
    val capped = run(Some(0.5))
    assert(capped == (100L until 110L).toSet, s"got $capped") // every boilerplate doc dropped
  }
}
