package graft

import scala.util.Random

import graft.link.Linker
import graft.ops.Sequences
import graft.synth.{GenConfig, TranscriptGen}

/** Seeded randomized invariants (SURVEY §5.2). */
class PropertySpec extends SparkSpec {

  test("W1 invariant: edge count == sum over convs of (n_turns - 1)") {
    import spark.implicits._
    for (seed <- Seq(1L, 7L, 13L)) {
      val cfg = GenConfig(seed = seed, numConvs = 30, numEntities = 20)
      val turns = TranscriptGen.transcripts(spark, cfg).toDF()
      val edges = Sequences.leadEdges(turns, "conv_id", Seq("turn_idx"), "turn_idx").count()
      val expected = (0L until cfg.numConvs.toLong)
        .map(c => TranscriptGen.numTurnsOf(cfg, c) - 1L)
        .sum
      assert(edges == expected, s"seed=$seed")
    }
  }

  test("leadEdgesChunked == leadEdges for any chunk size (mega-session skew variant)") {
    import spark.implicits._
    val rnd = new Random(31)
    // sparse, non-contiguous order values; several sessions; order
    // values straddling chunk boundaries
    val rows = (0 until 12).flatMap { s =>
      val n = 1 + rnd.nextInt(30)
      var ord = 0
      (0 until n).map { i =>
        ord += 1 + rnd.nextInt(5)
        (s"s$s", ord, s * 1000 + i)
      }
    }
    val df = rows.toDF("sess", "ord", "id")
    val want = Sequences
      .leadEdges(df, "sess", Seq("ord"), "id")
      .select($"sess", $"src", $"dst")
      .as[(String, Int, Int)].collect().toSet
    for (chunk <- Seq(1, 3, 8, 1 << 20)) {
      val got = Sequences
        .leadEdgesChunked(df, "sess", "ord", "id", chunk)
        .as[(String, Int, Int)].collect().toSet
      assert(got == want, s"chunkSize=$chunk: missing=${(want diff got).take(3)} extra=${(got diff want).take(3)}")
    }
  }

  test("cumulativeChunked == cumulative for any chunk size (two-phase scan)") {
    import spark.implicits._
    val rnd = new Random(43)
    val rows = (0 until 10).flatMap { s =>
      var ord = 0
      (0 until 1 + rnd.nextInt(40)).map { _ =>
        ord += 1 + rnd.nextInt(4)
        (s"s$s", ord, rnd.nextDouble() * 100)
      }
    }
    val df = rows.toDF("sess", "ord", "v")
    def norm(d: org.apache.spark.sql.DataFrame) = d
      .select($"sess", $"ord", org.apache.spark.sql.functions.round($"run", 6).as("run"))
      .as[(String, Int, Double)].collect().toSet
    val want = norm(Sequences.cumulative(df, "sess", Seq("ord"), "v", "run"))
    for (chunk <- Seq(1, 5, 16, 1 << 20)) {
      val got = norm(Sequences.cumulativeChunked(df, "sess", "ord", "v", "run", chunk))
      assert(got == want, s"chunkSize=$chunk")
    }
  }

  test("tokenSim: symmetric, bounded, reflexive") {
    val rnd = new Random(42)
    val words = Vector("alpha", "bravo", "charlie", "delta", "the", "inc", "xylophone")
    def randName() = (0 until 1 + rnd.nextInt(3)).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    for (_ <- 1 to 300) {
      val (a, b) = (randName(), randName())
      val ab = Linker.tokenSim(a, b)
      val ba = Linker.tokenSim(b, a)
      assert(math.abs(ab - ba) < 1e-12, s"symmetry: '$a' vs '$b'")
      assert(ab >= 0.0 && ab <= 1.0)
      assert(Linker.tokenSim(a, a) == 1.0)
    }
  }

  test("minhash signature: jaccard estimator is unbiased-ish on random sets") {
    val rnd = new Random(7)
    val cfg = Linker.LshConfig(numBands = 32, rowsPerBand = 4) // 128 hashes
    for (_ <- 1 to 20) {
      val base = Array.fill(200)(rnd.nextLong())
      val keep = rnd.nextDouble() * 0.8 + 0.1
      val b = base.filter(_ => rnd.nextDouble() < keep) ++ Array.fill(30)(rnd.nextLong())
      val trueJ = Linker.exactJaccard(base, b)
      val sa = Linker.signature(base, cfg)
      val sb = Linker.signature(b, cfg)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      assert(math.abs(est - trueJ) < 0.2, f"est=$est%.2f true=$trueJ%.2f")
    }
  }

  test("LSH blocking recall: link edges cover >= 95% of above-threshold pairs") {
    import spark.implicits._
    val dict = graft.kg.Dictionary.build(11L, 120)
    val cfg = Linker.LshConfig()
    // exact oracle: all pairs with tokenSim >= threshold
    val want = (for {
      a <- dict; b <- dict if a.surfaceId < b.surfaceId
      if Linker.tokenSim(a.surface, b.surface) >= cfg.jaccardThreshold
    } yield (a.surfaceId, b.surfaceId)).toSet
    val dictDf = spark.createDataset(dict.map(s => (s.surfaceId, s.surface))).toDF("id", "surface")
    val got = Linker
      .linkEdges(spark, dictDf, cfg)
      .map(e => (e.src, e.dst))
      .collect()
      .toSet
    assert(want.nonEmpty)
    assert(got.subsetOf(want), s"false positives: ${(got -- want).take(3)}")
    val recall = (got & want).size.toDouble / want.size
    info(f"blocking recall = $recall%.4f over ${want.size} true pairs")
    assert(recall >= 0.95)
  }

  test("linkEdges handles single-informative-token surfaces (ANSI element_at regression)") {
    import spark.implicits._
    // "Google" / "Google Inc" tokenize to ONE informative token each
    // (Inc is a stop token) — the prefix-blocking key used to throw
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4 ANSI mode.
    val surfaces = Seq(
      (1L, "Google"),
      (2L, "Google Inc"),
      (3L, "Yarrow Systems"),
      (4L, "Yarrow Systems Inc")
    ).toDF("id", "surface")
    val got = Linker.linkEdges(spark, surfaces).map(e => (e.src, e.dst)).collect().toSet
    assert(got.contains((1L, 2L)), s"single-token variants must link: $got")
    assert(got.contains((3L, 4L)))
    assert(!got.exists { case (a, b) => (a <= 2) != (b <= 2) }, s"cross-entity link: $got")
  }

  test("imputeGroupMedian: per-group median, global fallback, null group keeps own median") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some(1.0)), ("g1", Some(3.0)), ("g1", None),          // g1 median 2.0
      ("g2", None), ("g2", None),                                  // all-null group -> global
      (null.asInstanceOf[String], Some(10.0)), (null, None),       // NULL group median 10.0
      ("g3", Some(5.0))
    ).toDF("grp", "v")
    val got = graft.ops.Stats
      .imputeGroupMedian(df, "grp", "v", "v_imp")
      .select($"grp", $"v", $"v_imp")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2)))
      .toSet
    // global median over non-null values {1,3,10,5} = 4.0
    assert(got == Set(
      ("g1", Some(1.0), 1.0), ("g1", Some(3.0), 3.0), ("g1", None, 2.0),
      ("g2", None, 4.0), ("g2", None, 4.0),
      (null, Some(10.0), 10.0), (null, None, 10.0),
      ("g3", Some(5.0), 5.0)
    ), s"got $got")
    // plan shape: no single-partition window exchange
    val plan = graft.ops.Stats.imputeGroupMedian(df, "grp", "v", "v_imp")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "global median must not be a Window")
  }

  test("weightedJaccard with uniform weights equals plain jaccard") {
    val rnd = new Random(5)
    for (_ <- 1 to 50) {
      // shingle arrays are distinct by construction (shingles() dedups)
      val a = Array.fill(30)(rnd.nextLong() % 40).distinct
      val b = Array.fill(30)(rnd.nextLong() % 40).distinct
      val j = Linker.exactJaccard(a, b)
      val wj = Linker.weightedJaccard(a, b, _ => 1.0)
      assert(math.abs(j - wj) < 1e-12)
    }
    // idf downweights common shingles: sharing only the common shingle
    // scores lower than sharing only the rare one
    val w: Long => Double = x => if (x == 1L) 0.1 else 5.0
    val common = Linker.weightedJaccard(Array(1L, 2L), Array(1L, 3L), w)
    val rare = Linker.weightedJaccard(Array(1L, 2L), Array(2L, 3L), w)
    assert(rare > common)
  }

  test("salting invariance: hotspot aggregation equals its salted two-phase form") {
    import spark.implicits._
    // the north_rule skew pattern: salted partial agg then merge must
    // equal the direct aggregation
    val rnd = new Random(3)
    val rows = Seq.fill(5000)((rnd.nextInt(40).toLong, rnd.nextInt(25))).toDF("cell", "sess")
    val direct = rows
      .groupBy($"cell")
      .agg(org.apache.spark.sql.functions.countDistinct($"sess").as("n"))
      .as[(Long, Long)]
      .collect()
      .toMap
    val salted = rows
      .withColumn("salt", org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.hash($"sess"), org.apache.spark.sql.functions.lit(8)))
      .groupBy($"cell", $"salt")
      .agg(org.apache.spark.sql.functions.collect_set($"sess").as("ss"))
      .groupBy($"cell")
      .agg(org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.array_distinct(org.apache.spark.sql.functions.flatten(org.apache.spark.sql.functions.collect_list($"ss")))).as("n"))
      .as[(Long, Int)]
      .collect()
      .toMap
    assert(direct.forall { case (k, v) => salted(k).toLong == v })
  }

  test("explodeRuns: row count == sum of clamped window sizes; every row inside its window") {
    import spark.implicits._
    val rnd = new Random(17)
    val turns = (0 until 8).flatMap { s =>
      (0 until 5 + rnd.nextInt(20)).map(i => (s.toLong, i * 10L, s * 1000L + i))
    }.toDF("conv", "ord", "payload")
    val lens = turns.groupBy($"conv").count().as[(Long, Long)].collect().toMap
    val runs = (0 until 8).map { s =>
      val a = 1 + rnd.nextInt(10); val b = a + rnd.nextInt(15)
      (s.toLong, a, b)
    }
    val runsDf = runs.toDF("conv_id", "start_idx", "end_idx")
    val out = graft.link.SegmentRuns.explodeRuns(turns, runsDf, "conv", Seq("ord"))
    val expected = runs.map { case (s, a, b) =>
      val n = lens(s)
      math.max(0L, math.min(b.toLong, n) - a.toLong + 1L) // clamp to session length
    }.sum
    assert(out.count() == expected)
    assert(out.where($"turn_pos" < $"start_idx" || $"turn_pos" > $"end_idx").isEmpty)
    // payload integrity: each exploded row's payload matches its position
    assert(out.where($"payload" =!= $"conv" * 1000L + ($"turn_pos" - 1)).isEmpty)
  }

  test("oriented edges: reverse-traversal symmetry (i,o)->(j,o') iff (j,!o')->(i,!o)") {
    import spark.implicits._
    import graft.path.OrientedPaths
    val rnd = new Random(23)
    val segs = (1 to 25).map { i =>
      def pt() = (rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01)
      val (sa, so) = pt(); val (ea, eo) = pt()
      (i.toLong, sa, so, ea, eo)
    }
    val df = segs.toDF("seg_id", "slat", "slon", "elat", "elon")
    val edges = OrientedPaths
      .orientedEdges(df, "seg_id", "slat", "slon", "elat", "elon", tolM = 200.0)
      .select($"src", $"dst").as[(Long, Long)].collect().toSet
    assert(edges.nonEmpty)
    // reversing a hop flips both orientations: head(i,o)~tail(j,o')
    // is the same point pair as head(j,1-o')~tail(i,1-o)
    def flip(n: Long): Long = if (n % 2 == 0) n + 1 else n - 1
    assert(edges.forall { case (a, b) => edges.contains((flip(b), flip(a))) })
  }
}
