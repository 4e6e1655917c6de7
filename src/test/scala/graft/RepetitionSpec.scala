package graft

import org.apache.spark.sql.functions.{col, regexp_replace}
import graft.text.Repetition

class RepetitionSpec extends SparkSpec {

  private def signalsOf(text: String, topN: Int = 2, coverN: Int = 2, sep: String = "\\s+") = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Repetition
      .addSignals(df, "text", topN, coverN, sep)
      .select(
        "n_units", "n_distinct_units", "dup_unit_fraction", "dup_unit_char_fraction",
        "top_ngram_char_fraction", "dup_ngram_positions", "covered_units",
        "dup_ngram_unit_fraction")
      .as[(Int, Int, Double, Double, Double, Int, Int, Double)]
      .head()
  }

  test("addSignals: hand-computed tiny document") {
    // units [a, a, a, b]; 2-grams [a a, a a, a b]
    val s = signalsOf("a a a b")
    assert(s._1 == 4 && s._2 == 2)
    assert(s._3 == 0.5) // (4-2)/4
    assert(s._4 == 0.75) // 3 chars of 'a' over 4 unit chars
    // top 2-gram: "a a" count 2 x len 3 = 6 chars over text len 7
    assert(s._5 == math.round(6.0 / 7.0 * 1e6) / 1e6)
    assert(s._6 == 2) // two "a a" windows
    assert(s._7 == 3) // tokens 0,1,2 covered; trailing b not
    assert(s._8 == 0.75)
  }

  test("addSignals: no repetition, sub-n and empty docs profile as zeros") {
    val uniq = signalsOf("alpha beta gamma")
    assert(uniq._3 == 0.0 && uniq._4 == 0.0 && uniq._6 == 0 && uniq._8 == 0.0)
    // top gram still counts a single occurrence: "alpha beta" = 10 chars / 16
    assert(uniq._5 == math.round(10.0 / 16.0 * 1e6) / 1e6)
    val one = signalsOf("single")
    assert(one._1 == 1 && one._5 == 0.0 && one._8 == 0.0)
    val empty = signalsOf("   ")
    assert(empty._1 == 0 && empty._3 == 0.0 && empty._5 == 0.0)
  }

  test("addSignals: null text profiles as an empty document") {
    import spark.implicits._
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = Repetition.addSignals(df, "text")
      .select("n_units", "dup_unit_fraction", "covered_units")
      .as[(Int, Double, Int)].head()
    assert(r == ((0, 0.0, 0)))
  }

  test("addSignals: line mode (unitSep = \\n) trims and lowercases lines") {
    val s = signalsOf("Hello World\nhello world \nbye", sep = "\n")
    assert(s._1 == 3 && s._2 == 2)
    assert(s._3 == math.round(1.0 / 3.0 * 1e6) / 1e6)
    // dup chars: "hello world" x2 = 22 over 22 + 3
    assert(s._4 == math.round(22.0 / 25.0 * 1e6) / 1e6)
  }

  test("addSignals: equals a brute-force local oracle on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (0L until 120L).map { i =>
      val n = rnd.nextInt(14) // 0..13 tokens, many collisions at this vocab
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val got = Repetition
      .addSignals(docs.toDF("doc_id", "text"), "text", topN = 2, coverN = 3)
      .select(
        "doc_id", "n_units", "n_distinct_units", "dup_unit_fraction",
        "dup_unit_char_fraction", "top_ngram_char_fraction", "dup_ngram_positions",
        "covered_units", "dup_ngram_unit_fraction")
      .as[(Long, Int, Int, Double, Double, Double, Int, Int, Double)]
      .collect().sortBy(_._1)

    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    val want = docs.map { case (id, text) =>
      val u = text.toLowerCase.split("\\s+").map(_.trim).filter(_.nonEmpty)
      val t = u.length
      val d = u.distinct.length
      val totChars = u.map(_.length).sum
      val wc = u.groupBy(identity).map { case (w, g) => (w, g.length) }
      val dupChars = wc.collect { case (w, c) if c >= 2 => c * w.length }.sum
      val g2 = u.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toVector
      val topChars =
        if (t >= 2) g2.groupBy(identity).map { case (g, o) => o.length * g.length }.max else 0
      val g3 = u.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toVector
      val cnt3 = g3.groupBy(identity).map { case (g, o) => (g, o.length) }
      val dupPos = g3.zipWithIndex.collect { case (g, i) if cnt3(g) >= 2 => i }
      val covered = (0 until t).count(j => dupPos.exists(i => i <= j && j <= i + 2))
      (id, t, d,
        if (t > 0) r6((t - d).toDouble / t) else 0.0,
        if (totChars > 0) r6(dupChars.toDouble / totChars) else 0.0,
        if (t >= 2) r6(topChars.toDouble / math.max(text.length, 1)) else 0.0,
        dupPos.length, covered,
        if (t > 0) r6(covered.toDouble / t) else 0.0)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // non-vacuity: the corpus exercises both zero and non-zero covers
    assert(want.exists(_._7 > 0) && want.exists(w => w._2 > 0 && w._7 == 0))
  }

  test("addGopherFlags: rules flag and conjunction; thresholds split") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "1 2 3 4 5 6 7 8 9 10 11 12 13")
    ).toDF("doc_id", "text")
    val flagged = Repetition.addGopherFlags(
      Repetition.addSignals(df, "text"), "text",
      minWords = 10, maxWords = 100, minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
      minAlphaWordFraction = 0.8, maxDupUnitFraction = 0.5, maxTopNgramCharFraction = 0.5)
    val rows = flagged
      .select("doc_id", "words_ok", "word_len_ok", "alpha_ok", "dup_unit_ok", "top_ngram_ok", "passes")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(rows(0) == ((1L, true, true, true, true, true, true)))
    assert(rows(1)._5 == false && rows(1)._7 == false) // all-spam: dup fraction fails
    assert(rows(2)._4 == false && rows(2)._7 == false) // digits: alpha fraction fails
    // passes is exactly the conjunction
    rows.foreach(r => assert(r._7 == (r._2 && r._3 && r._4 && r._5 && r._6)))
  }

  test("gopherPasses: the fused predicate equals addGopherFlags' passes column") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    // mix clean docs (large vocab of alpha words) with spammy ones
    // (tiny vocab, short/digit words) so every rule decides both ways
    val clean = Vector.tabulate(200)(i => s"wd${i}x") // 4-6 chars, alpha
    val spam = Vector("a", "bb", "12", "spam")
    val corpus = (0L until 150L).map { i =>
      val vocab = if (i % 3 == 0) spam else clean
      val n = rnd.nextInt(30)
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ (150L, null.asInstanceOf[String]) :+ (151L, "   ")
    val df = corpus.toDF("doc_id", "text")
    // two threshold sets so every rule decides for some doc
    for ((mw, mlen, mdup, mtop) <- Seq((5, 2.0, 0.4, 0.3), (10, 3.0, 0.6, 0.15))) {
      val viaFlags = Repetition
        .addGopherFlags(
          Repetition.addSignals(df, "text"), "text",
          minWords = mw, minMeanWordLen = mlen,
          maxDupUnitFraction = mdup, maxTopNgramCharFraction = mtop)
        .select(col("doc_id"), col("passes"))
        .as[(Long, Boolean)].collect().toMap
      val viaPred = df
        .select(col("doc_id"),
          Repetition.gopherPasses(col("text"),
            minWords = mw, minMeanWordLen = mlen,
            maxDupUnitFraction = mdup, maxTopNgramCharFraction = mtop).as("p"))
        .as[(Long, Boolean)].collect().toMap
      assert(viaFlags == viaPred)
      // the comparison is non-vacuous both ways
      assert(viaFlags.values.exists(identity) && viaFlags.values.exists(!_))
    }
  }

  test("addNgramSignals: hand-computed top and cover fractions") {
    import spark.implicits._
    // A: "a b c a b c d" — top-2 "a b"x2 = 6 chars / 13; top-3
    // "a b c"x2 = 10/13; top-4 all distinct, best = one gram's 7 chars;
    // no duplicated 5..10-gram. B: "xx yy zz" three times — dup
    // 5-grams at pos {0,3}, dup 6-grams at {0,3}: every unit covered
    // (18/18 chars); 7-grams all distinct; top-2 "xx yy"x3 = 15/26.
    val df = Seq((1L, "a b c a b c d"), (2L, "xx yy zz xx yy zz xx yy zz"))
      .toDF("doc_id", "text")
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val rows = Repetition.addNgramSignals(df, "text")
      .select("doc_id", "top_2gram_char_fraction", "top_3gram_char_fraction",
        "top_4gram_char_fraction", "dup_5gram_char_fraction", "dup_6gram_char_fraction",
        "dup_7gram_char_fraction", "dup_10gram_char_fraction")
      .as[(Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows(0) == ((1L, r6(6.0 / 13), r6(10.0 / 13), r6(7.0 / 13), 0.0, 0.0, 0.0, 0.0)))
    assert(rows(1)._2 == r6(15.0 / 26))
    assert(rows(1)._5 == 1.0 && rows(1)._6 == 1.0 && rows(1)._7 == 0.0 && rows(1)._8 == 0.0)
    // flags at the published caps: A fails every top rule, passes every
    // dup rule; B fails every top rule ("xx yy zz xx" repeats at pos
    // 0/3: 22/26 chars) and dup-5/6
    val f = Repetition.addGopherNgramFlags(Repetition.addNgramSignals(df, "text"))
      .select("doc_id", "top_2gram_ok", "top_4gram_ok", "dup_5gram_ok", "dup_7gram_ok",
        "ngram_passes")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(f(0) == ((1L, false, false, true, true, false)))
    assert(f(1) == ((2L, false, false, false, true, false)))
    // empty / null / one-word docs profile as zeros and pass
    val z = Repetition.addGopherNgramFlags(Repetition.addNgramSignals(
      Seq((1L, ""), (2L, null: String), (3L, "word")).toDF("doc_id", "text"), "text"))
      .select("doc_id", "top_2gram_char_fraction", "dup_5gram_char_fraction", "ngram_passes")
      .as[(Long, Double, Double, Boolean)].collect()
    z.foreach(r => assert(r._2 == 0.0 && r._3 == 0.0 && r._4, s"doc ${r._1}"))
  }

  test("gopherNgramPasses: the fused predicate equals addGopherNgramFlags' ngram_passes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val corpus = (0L until 120L).map { i =>
      val base = (0 until 10 + rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.length)))
      // a third of the docs get a planted repeated phrase (dup 5..10-grams)
      val t = if (rnd.nextInt(3) == 0) {
        val phrase = base.take(12)
        (base ++ phrase).mkString(" ")
      } else base.mkString(" ")
      (i, t)
    } :+ (120L, null.asInstanceOf[String]) :+ (121L, "")
    val df = corpus.toDF("doc_id", "text")
    val viaFlags = Repetition.addGopherNgramFlags(Repetition.addNgramSignals(df, "text"))
      .select(col("doc_id"), col("ngram_passes"))
      .as[(Long, Boolean)].collect().toMap
    val viaPred = df
      .select(col("doc_id"), Repetition.gopherNgramPasses(col("text")).as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(viaFlags == viaPred)
    assert(viaFlags.values.exists(identity) && viaFlags.values.exists(!_))
    // no caps configured = vacuous pass, not an empty.reduce crash
    val vacuous = df
      .select(Repetition.gopherNgramPasses(col("text"), Map.empty, Map.empty).as("p"))
      .where(!col("p")).count()
    assert(vacuous == 0)
  }

  test("ngram kernel: equals the HOF formulation value-for-value on an adversarial corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260822L)
    val words = Vector("alpha", "beta", "gamma", "delta", "ee", "zeta", "x", "longerwordhere")
    val planted = (0L until 150L).map { i =>
      val base = (0 until 5 + rnd.nextInt(40)).map(_ => words(rnd.nextInt(words.length)))
      val t = rnd.nextInt(4) match {
        case 0 => (base ++ base.take(8 + rnd.nextInt(8))).mkString(" ") // repeated phrase
        case 1 => (base ++ base).mkString(" ") // doubled doc
        case 2 => base.mkString("  ") // double spaces
        case _ => base.mkString(" ")
      }
      (i, t)
    }
    val edge = Seq(
      (900L, null.asInstanceOf[String]), (901L, ""), (902L, "word"),
      (903L, " leading and trailing  "), (904L, "a a a a a a a a a a a a"),
      (905L, "tabs\tand\nnewlines mixed\there ok"),
      (906L, "ünïcödé wörds ünïcödé wörds ünïcödé wörds"),
      (907L, ("lorem ipsum dolor sit amet " * 6).trim))
    val df = (planted ++ edge).toDF("doc_id", "text")
    val cols = Seq("top_2gram_char_fraction", "top_3gram_char_fraction",
      "top_4gram_char_fraction") ++ (5 to 10).map(n => s"dup_${n}gram_char_fraction")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id") +: cols.map(col): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to cols.length).map(r.getDouble).toVector)
      .toMap
    val kernel = rows(Repetition.addNgramSignals(df, "text"))
    val hof = rows(Repetition.addNgramSignalsHof(df, "text"))
    assert(kernel.keySet == hof.keySet)
    for (k <- kernel.keySet)
      assert(kernel(k) == hof(k), s"doc $k: kernel=${kernel(k)} hof=${hof(k)}")
    // the fused predicate agrees with the HOF predicate row-for-row
    val pKernel = df.select(col("doc_id"), Repetition.gopherNgramPasses(col("text")).as("p"))
      .as[(Long, Boolean)].collect().toMap
    val pHof = df.select(col("doc_id"), Repetition.gopherNgramPassesHof(col("text")).as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(pKernel == pHof)
    // the word-family gate kernel agrees with ITS HOF reference too —
    // at thresholds loose enough that decisions split both ways
    for ((minW, maxDup) <- Seq((50, 0.5), (5, 0.2), (0, 0.0))) {
      val wKernel = df.select(col("doc_id"),
        Repetition.gopherPasses(col("text"), minWords = minW, maxDupUnitFraction = maxDup).as("p"))
        .as[(Long, Boolean)].collect().toMap
      val wHof = df.select(col("doc_id"),
        Repetition.gopherPassesHof(col("text"), minWords = minW, maxDupUnitFraction = maxDup).as("p"))
        .as[(Long, Boolean)].collect().toMap
      assert(wKernel == wHof, s"minWords=$minW maxDup=$maxDup")
    }
    // the line-family gate kernel agrees with ITS HOF reference — on a
    // multi-line mutation of the corpus (3-word lines, some bulleted /
    // ellipsis-terminated / doubled) at thresholds that split decisions
    val multi = df.select(col("doc_id"),
      regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n").as("text"))
      .union(Seq(
        (950L, "- a\n- b\n- c"), (951L, "x...\ny...\nz"),
        (952L, "same line\nsame line\nsame line\nother")).toDF("doc_id", "text"))
    for ((dup, bul) <- Seq((0.3, 0.9), (0.0, 0.2), (1.0, 0.0))) {
      val lKernel = multi.select(col("doc_id"),
        Repetition.gopherLinePasses(col("text"),
          maxDupLineFraction = dup, maxBulletLineFraction = bul).as("p"))
        .as[(Long, Boolean)].collect().toMap
      val lHof = multi.select(col("doc_id"),
        Repetition.gopherLinePassesHof(col("text"),
          maxDupLineFraction = dup, maxBulletLineFraction = bul).as("p"))
        .as[(Long, Boolean)].collect().toMap
      assert(lKernel == lHof, s"dup=$dup bullet=$bul")
    }
  }

  test("gopherParagraphPasses: equals the addSignals paragraph-mode signals at the caps") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    val corpus = (0L until 120L).map { i =>
      val paras = (0 to rnd.nextInt(5)).map(j => s"para body ${i}_${j % 3} text")
      (i, paras.mkString("\n\n")) // j%3 -> repeated paragraphs within a doc
    } :+ (120L, null.asInstanceOf[String]) :+ (121L, "single paragraph only")
    val df = corpus.toDF("doc_id", "text")
    val viaSignals = Repetition.addSignals(df, "text", unitSep = "\\n\\n")
      .select(col("doc_id"),
        (col("dup_unit_fraction") <= 0.3 && col("dup_unit_char_fraction") <= 0.2).as("p"))
      .as[(Long, Boolean)].collect().toMap
    val viaPred = df
      .select(col("doc_id"), Repetition.gopherParagraphPasses(col("text")).as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(viaSignals == viaPred)
    assert(viaPred.values.exists(identity) && viaPred.values.exists(!_))
    assert(viaPred(120L) && viaPred(121L)) // null / single-paragraph pass vacuously
  }

  test("addLineFlags: hand-computed multi-line document") {
    import spark.implicits._
    val df = Seq((1L, "- A b ...\n- a B ...\nc")).toDF("doc_id", "text")
    val r = Repetition.addLineFlags(df, "text")
      .select(
        "n_lines", "n_distinct_lines", "dup_line_fraction", "dup_line_char_fraction",
        "bullet_line_fraction", "ellipsis_line_fraction",
        "dup_line_ok", "dup_line_chars_ok", "bullet_ok", "ellipsis_ok", "line_passes")
      .as[(Int, Int, Double, Double, Double, Double, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .head()
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // lowercased lines: ["- a b ...", "- a b ...", "c"]
    assert(r._1 == 3 && r._2 == 2)
    assert(r._3 == r6(1.0 / 3.0))
    assert(r._4 == r6(18.0 / 19.0)) // 2 x 9 dup chars over 9+9+1
    assert(r._5 == r6(2.0 / 3.0) && r._6 == r6(2.0 / 3.0))
    // defaults: dup 0.33>0.3 fail, dup chars 0.95>0.2 fail,
    // bullets 0.67<=0.9 ok, ellipsis 0.67>0.3 fail
    assert(r._7 == false && r._8 == false && r._9 == true && r._10 == false)
    assert(r._11 == false)
  }

  test("addLineFlags: single-line, empty and null docs profile as zeros and pass") {
    import spark.implicits._
    val df = Seq((1L, "one plain line"), (2L, "   "), (3L, null: String))
      .toDF("doc_id", "text")
    val rows = Repetition.addLineFlags(df, "text")
      .select("doc_id", "n_lines", "dup_line_fraction", "bullet_line_fraction", "line_passes")
      .as[(Long, Int, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 1, 0.0, 0.0, true)))
    assert(rows(1) == ((2L, 0, 0.0, 0.0, true)))
    assert(rows(2) == ((3L, 0, 0.0, 0.0, true)))
  }

  test("gopherLinePasses: the fused predicate equals addLineFlags' line_passes column") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val bodies = Vector("alpha beta", "gamma delta", "repeat me", "epsilon")
    val corpus = (0L until 150L).map { i =>
      val n = rnd.nextInt(8)
      val lines = (0 until n).map { _ =>
        val base = bodies(rnd.nextInt(bodies.length))
        val b = if (rnd.nextInt(3) == 0) s"- $base" else base
        if (rnd.nextInt(3) == 0) s"$b..." else b
      }
      (i, lines.mkString("\n"))
    } :+ (150L, null.asInstanceOf[String]) :+ (151L, "\n\n")
    val df = corpus.toDF("doc_id", "text")
    for ((mdup, mchar, mbul, mell) <- Seq((0.3, 0.2, 0.9, 0.3), (0.6, 0.5, 0.2, 0.1))) {
      val viaFlags = Repetition
        .addLineFlags(df, "text", mdup, mchar, mbul, mell)
        .select(col("doc_id"), col("line_passes"))
        .as[(Long, Boolean)].collect().toMap
      val viaPred = df
        .select(col("doc_id"),
          Repetition.gopherLinePasses(col("text"), mdup, mchar, mbul, mell).as("p"))
        .as[(Long, Boolean)].collect().toMap
      assert(viaFlags == viaPred)
      assert(viaFlags.values.exists(identity) && viaFlags.values.exists(!_))
    }
  }

  test("streaming: signals and gopher predicate at ingestion match batch digit-for-digit") {
    // every signal is a stateless per-row projection, so the profile
    // (and the rule gate) can run AT INGESTION on a stream with no
    // state — this pins the stream plan to the batch plan exactly
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().take(120)

    def profiled(df: org.apache.spark.sql.DataFrame) =
      Repetition.addSignals(df, "text")
        .withColumn("passes", Repetition.gopherPasses(col("text"),
          minWords = 20, minMeanWordLen = 4.0, maxDupUnitFraction = 0.6))
        // the line and full-n-gram families are the same stateless
        // shape — pin them to the batch plan in the same pass
        .withColumn("line_passes", Repetition.gopherLinePasses(col("text")))
        .withColumn("ngram_passes", Repetition.gopherNgramPasses(col("text")))
        .select("doc_id", "dup_unit_fraction", "dup_unit_char_fraction",
          "top_ngram_char_fraction", "dup_ngram_unit_fraction", "passes",
          "line_passes", "ngram_passes")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = profiled(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_rep").outputMode("append").start()
    input.addData(corpus.take(50).toSeq)
    q.processAllAvailable()
    input.addData(corpus.drop(50).toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_rep")
      .as[(Long, Double, Double, Double, Double, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    val batch = profiled(corpus.toSeq.toDF("doc_id", "text"))
      .as[(Long, Double, Double, Double, Double, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(got.toSeq == batch.toSeq && got.length == corpus.length)
    assert(got.exists(_._6) && got.exists(!_._6)) // the gate splits the stream
  }
}
