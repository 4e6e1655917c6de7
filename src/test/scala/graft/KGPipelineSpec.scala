package graft

import graft.extract.{AhoCorasick, Mentions}
import graft.kg.Dictionary
import graft.link.Linker
import graft.pipeline.KGPipeline
import graft.synth.{GenConfig, TranscriptGen}

class KGPipelineSpec extends SparkSpec {

  val cfg = GenConfig(seed = 42L, numConvs = 60, numEntities = 40)
  lazy val dict = Dictionary.build(cfg.seed, cfg.numEntities)

  test("transcript generation is deterministic and parallelism-invariant") {
    import spark.implicits._
    val a = TranscriptGen
      .transcripts(spark, cfg)
      .repartition(1)
      .map(t => (t.conv_id, t.turn_idx, t.text))
      .collect()
      .sortBy(r => (r._1, r._2))
    val b = TranscriptGen
      .transcripts(spark, cfg)
      .repartition(7)
      .map(t => (t.conv_id, t.turn_idx, t.text))
      .collect()
      .sortBy(r => (r._1, r._2))
    assert(a.length > 300)
    assert(a.sameElements(b)) // per-turn text equality under stable ordering
  }

  test("aho-corasick finds dictionary surfaces with word boundaries") {
    val ac = AhoCorasick.build(
      Seq(("Acme Corp", 1L), ("Acme", 2L), ("me Co", 3L))
    )
    val ms = ac.findMentions("I met Acme Corp and Acme yesterday")
    // leftmost-longest: "Acme Corp" wins over "Acme" and "me Co"
    assert(ms.map(_.id) == List(1L, 2L))
    assert(ac.findMentions("Acmes everywhere").isEmpty) // boundary guard
  }

  test("mention extraction recovers every generated mention and triple") {
    val ac = AhoCorasick.build(dict.map(s => (s.surface, s.surfaceId)))
    var turns = 0
    for (convIdx <- 0L until cfg.numConvs.toLong;
         t <- 0 until TranscriptGen.numTurnsOf(cfg, convIdx)) {
      turns += 1
      val content = TranscriptGen.turnContent(cfg, convIdx, t)
      val turn = TranscriptGen.turnOf(cfg, convIdx, t)
      val ex = Mentions.extractTurn(ac, turn)
      val got = ex.mentions.map(_.entity_id).sorted
      val want = content.mentions.map(_.surfaceId).sorted
      assert(got == want, s"mentions mismatch conv=$convIdx turn=$t text='${turn.text}'")
      val gotT = ex.triples.map(t0 => (t0.subj, t0.pred, t0.obj))
      val wantT = content.triple.toSeq.map { case (a, p, b) => (a.surfaceId, p, b.surfaceId) }
      assert(gotT == wantT, s"triples mismatch conv=$convIdx turn=$t text='${turn.text}'")
    }
    assert(turns > 300)
  }

  test("LSH linking + CC recover the ground-truth surface grouping") {
    import spark.implicits._
    val mapping = KGPipeline
      .canonicalMapping(spark, dict, Linker.LshConfig())
      .as[(Long, Long)]
      .collect()
      .toMap
    val truth = dict.map(s => s.surfaceId -> s.canonicalId).toMap
    val wrong = truth.keys.filter(k => mapping(k) != truth(k))
    // allow a tiny slack (typo variants can fall under the threshold)
    assert(
      wrong.size.toDouble / truth.size <= 0.02,
      s"misgrouped=${wrong.size}/${truth.size}: ${wrong.take(5).map(k => dict.find(_.surfaceId == k).get)}"
    )
  }

  test("end-to-end triple set matches the oracle at P/R >= 0.95") {
    import spark.implicits._
    val turns = TranscriptGen.transcripts(spark, cfg)
    val res = KGPipeline.run(spark, turns, dict)
    val got = res.edges
      .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
      .collect()
      .toSet
    val want = TranscriptGen
      .expectedTriplesLocal(cfg)
      .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
      .toSet
    assert(want.nonEmpty)
    val tp = (got & want).size.toDouble
    val precision = if (got.isEmpty) 0.0 else tp / got.size
    val recall = tp / want.size
    info(f"triples: got=${got.size} want=${want.size} P=$precision%.4f R=$recall%.4f")
    assert(precision >= 0.95, f"precision $precision%.4f")
    assert(recall >= 0.95, f"recall $recall%.4f")

    // vertices cover every entity referenced by edges
    val vIds = res.vertices.map(_.entity_id).collect().toSet
    val eIds = got.flatMap(t => Seq(t._1, t._3))
    assert(eIds.subsetOf(vIds))
  }

  test("end-to-end P/R holds at medium scale (500 entities, mega-convs)") {
    import spark.implicits._
    val mid = GenConfig(seed = 17L, numConvs = 200, numEntities = 500)
    val midDict = Dictionary.build(mid.seed, mid.numEntities)
    val got = KGPipeline
      .run(spark, TranscriptGen.transcripts(spark, mid), midDict)
      .edges
      .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
      .collect()
      .toSet
    val want = TranscriptGen
      .expectedTriplesLocal(mid)
      .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
      .toSet
    val tp = (got & want).size.toDouble
    val p = if (got.isEmpty) 0.0 else tp / got.size
    val r = tp / want.size
    info(f"medium-scale: got=${got.size} want=${want.size} P=$p%.4f R=$r%.4f")
    assert(p >= 0.95 && r >= 0.95)
  }

  test("pipeline result is identical at different parallelism") {
    import spark.implicits._
    val small = cfg.copy(numConvs = 25)
    def runAt(parts: Int): Set[(Long, String, Long, String, Int)] = {
      val turns = TranscriptGen.transcripts(spark, small).repartition(parts)
      KGPipeline
        .run(spark, turns, dict)
        .edges
        .map(e => (e.subj, e.pred, e.obj, e.conv_id, e.turn_idx))
        .collect()
        .toSet
    }
    assert(runAt(1) == runAt(8))
  }
}
