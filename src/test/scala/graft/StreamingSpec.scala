package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Turn
import graft.streaming.StreamingKG

class StreamingSpec extends SparkSpec {

  private def turn(conv: String, idx: Int, text: String = "x"): Turn =
    Turn(conv, idx, "user", text, None, new Timestamp(1704067200000L + idx * 1000L))

  test("streaming consecutive edges: out-of-order turns across batches emit each edge once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val edges = StreamingKG.consecutiveEdges(spark, input.toDS())
    val q = edges.writeStream
      .format("memory")
      .queryName("chain_edges")
      .outputMode("append")
      .start()

    // batch 1: conv a turns 0,2 (2 buffered — 1 missing), conv b turn 0
    input.addData(turn("a", 0), turn("a", 2), turn("b", 0))
    q.processAllAvailable()
    // batch 2: the missing a:1 arrives + b:1
    input.addData(turn("a", 1), turn("b", 1))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM chain_edges").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 0, 1), ("a", 1, 2), ("b", 0, 1)))
  }

  test("replayed already-emitted turns neither re-emit edges nor grow state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val edges = StreamingKG.consecutiveEdges(spark, input.toDS())
    val q = edges.writeStream
      .format("memory")
      .queryName("chain_edges_replay")
      .outputMode("append")
      .start()

    input.addData(turn("a", 0), turn("a", 1))
    q.processAllAvailable()
    // replay processed turns (duplicate delivery) + one new turn; the
    // replays must not re-enter the buffer (idx < nextExpected) — the
    // pre-fix behavior accumulated them forever in ConvState.buffered
    input.addData(turn("a", 0), turn("a", 1), turn("a", 2))
    q.processAllAvailable()
    input.addData(turn("a", 0)) // replay again once state is past it
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT * FROM chain_edges_replay").as[(String, Int, Int)].collect().toList
    assert(got.sorted == List(("a", 0, 1), ("a", 1, 2)))
  }

  test("streaming edge sink: batch-idempotent appends, replay skipped, restart-safe") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val edges = Seq(
      (1L, "p", 2L, "c1", 0),
      (3L, "p", 4L, "c2", 1)
    ).toDF("subj", "pred", "obj", "conv_id", "turn_idx")

    val n0 = graft.graph.Materialize.appendEdgesBatch(spark, edges, out, batchId = 0L, numBuckets = 4)
    assert(n0 == 2)
    // replay of a committed batch (checkpoint restart) is a no-op
    assert(graft.graph.Materialize.appendEdgesBatch(spark, edges, out, 0L, 4) == 0L)
    // next batch appends
    val more = Seq((5L, "p", 6L, "c3", 0)).toDF("subj", "pred", "obj", "conv_id", "turn_idx")
    assert(graft.graph.Materialize.appendEdgesBatch(spark, more, out, 1L, 4) == 1L)
    val back = spark.read.parquet(s"$out/edges")
    assert(back.count() == 3)
    assert(back.select("subj").as[Long].collect().sorted.sameElements(Array(1L, 3L, 5L)))

    // end-to-end through the streaming query (one micro-batch)
    implicit val sqlCtx = spark.sqlContext
    val cfg = graft.synth.GenConfig(numConvs = 5, numEntities = 15)
    val dict = graft.kg.Dictionary.build(cfg.seed, cfg.numEntities)
    val bc = spark.sparkContext.broadcast(dict.toArray)
    val turns = graft.synth.TranscriptGen.transcriptsLocal(cfg)
    val input = MemoryStream[Turn]
    val out2 = java.nio.file.Files.createTempDirectory("graft_stream_e2e").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val q = StreamingKG.streamEdgesToTable(spark, input.toDS(), bc, out2, ckpt, numBuckets = 4)
    input.addData(turns)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$out2/edges").count()
    val batchTriples = graft.extract.Mentions
      .extract(spark, spark.createDataset(turns), bc)
      .flatMap(_.triples)
      .count()
    assert(streamed == batchTriples && streamed > 0)
  }

  test("watermarked windowed turn counts: late data dropped, windows finalize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L // aligned to a minute boundary
    def at(ms: Long, conv: String, idx: Int, role: String) =
      Turn(conv, idx, role, "x", None, new Timestamp(base + ms))

    val input = MemoryStream[Turn]
    val counts = StreamingKG.turnCountsByWindow(spark, input.toDS(), "1 minute", "2 minutes")
    val q = counts.writeStream
      .format("memory")
      .queryName("turn_counts")
      .outputMode("append")
      .start()

    // window [0, 60s): 2 user + 1 assistant
    input.addData(at(0, "a", 0, "user"), at(30000, "a", 1, "assistant"), at(45000, "b", 0, "user"))
    q.processAllAvailable()
    // advance event time far past the watermark so the first window finalizes
    input.addData(at(400000, "a", 2, "user"))
    q.processAllAvailable()
    // LATE row for the closed first window: must be dropped
    input.addData(at(10000, "c", 0, "user"))
    q.processAllAvailable()
    input.addData(at(800000, "a", 3, "user")) // close the 400s window too
    q.processAllAvailable()
    q.stop()

    val got = spark
      .sql("SELECT window_start, role, n_turns FROM turn_counts")
      .as[(Timestamp, String, Long)]
      .collect()
      .map { case (ws, r, n) => (ws.getTime - base, r, n) }
      .toSet
    assert(got.contains((0L, "user", 2L)), s"got $got")
    assert(got.contains((0L, "assistant", 1L)))
    assert(!got.contains((0L, "user", 3L)), "late row must not re-open the closed window")
  }

  test("streaming triples match the batch extractor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = graft.synth.GenConfig(numConvs = 10, numEntities = 20)
    val dict = graft.kg.Dictionary.build(cfg.seed, cfg.numEntities)
    val bc = spark.sparkContext.broadcast(dict.toArray)
    val turns = graft.synth.TranscriptGen.transcriptsLocal(cfg)

    val input = MemoryStream[Turn]
    val triples = StreamingKG.streamingTriples(spark, input.toDS(), bc)
    val q = triples.writeStream
      .format("memory")
      .queryName("stream_triples")
      .outputMode("append")
      .start()
    input.addData(turns)
    q.processAllAvailable()
    q.stop()

    val got = spark
      .sql("SELECT subj, pred, obj, conv_id, turn_idx FROM stream_triples")
      .as[(Long, String, Long, String, Int)]
      .collect()
      .toSet
    val batch = graft.extract.Mentions
      .extract(spark, spark.createDataset(turns), bc)
      .flatMap(e => e.triples.map(t => (t.subj, t.pred, t.obj, e.conv_id, e.turn_idx)))
      .collect()
      .toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming exact dedup: within-watermark duplicates suppressed across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = StreamingKG.streamingDedupExact(
      input.toDS().toDF("doc_id", "text", "ts"),
      tsCol = "ts",
      watermarkDelay = "10 minutes",
      keyCols = Seq("text")
    )
    val q = deduped.writeStream
      .format("memory")
      .queryName("stream_dedup")
      .outputMode("append")
      .start()

    val t0 = 1704067200000L
    // batch 1: two copies of "aa" in one batch + a distinct "bb"
    input.addData((1L, "aa", new Timestamp(t0)), (2L, "aa", new Timestamp(t0 + 1000)),
      (3L, "bb", new Timestamp(t0 + 2000)))
    q.processAllAvailable()
    // batch 2: another "aa" within the watermark horizon -> suppressed;
    // a new key "cc" -> emitted
    input.addData((4L, "aa", new Timestamp(t0 + 60000)), (5L, "cc", new Timestamp(t0 + 61000)))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT doc_id, text FROM stream_dedup")
      .as[(Long, String)].collect().toSet
    assert(got.map(_._2) == Set("aa", "bb", "cc"))
    assert(got.count(_._2 == "aa") == 1) // exactly one survivor for the duplicated key
  }
}
