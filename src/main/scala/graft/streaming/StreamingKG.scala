package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.extract.{AhoCorasick, Mentions}
import graft.kg.SurfaceForm
import graft.model.{RawTriple, Turn}

/** Structured-Streaming ingestion of the transcript stream.
  *
  * Triple extraction is stateless per turn (the trie scan needs no
  * ordering), so it streams as a plain mapPartitions. The ORDER-
  * dependent operator — consecutive-turn chain edges, the reference's
  * edge construction (/root/reference/src/GraphBuilder.jl:109-111) —
  * needs per-conversation state: turns may arrive out of order across
  * micro-batches, so each conversation buffers pending turn indices
  * and emits edge (i-1, i) exactly once, when i becomes contiguous
  * with the emitted prefix. State is per-conv and bounded by the
  * out-of-orderness window (pair with a watermark on ts in
  * production).
  */
object StreamingKG {

  final case class ChainEdge(conv_id: String, src_turn: Int, dst_turn: Int)

  /** Per-conv state: next expected turn index + buffered early turns. */
  final case class ConvState(nextExpected: Int, buffered: Set[Int])

  /** @param idleTimeoutMs when > 0, a conversation whose state has seen
    *        no input for this long is evicted (ProcessingTimeTimeout) —
    *        bounds total state under abandoned/garbled conversations.
    *        0 keeps state forever (exact, test-friendly default). The
    *        event-time alternative is a watermark on ts + timeout on
    *        the watermark; processing-time is the conservative choice
    *        when transcript ts skew is unbounded.
    */
  def consecutiveEdges(
      spark: SparkSession,
      turns: Dataset[Turn],
      idleTimeoutMs: Long = 0L
  ): Dataset[ChainEdge] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ChainEdge](
        OutputMode.Append(),
        timeoutConf
      ) { (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
        if (state.hasTimedOut) {
          // abandoned conversation: drop its out-of-order buffer
          state.remove()
          Iterator.empty
        } else {
          val st = state.getOption.getOrElse(ConvState(0, Set.empty))
          // replays of already-emitted indices (idx < nextExpected) must
          // not enter the buffer — they can never become contiguous again
          // and would grow state without bound under duplicate input
          var buffered = st.buffered ++ rows.map(_.turn_idx).filter(_ >= st.nextExpected)
          var next = st.nextExpected
          val out = scala.collection.mutable.ListBuffer.empty[ChainEdge]
          while (buffered.contains(next)) {
            if (next > 0) out += ChainEdge(convId, next - 1, next)
            buffered -= next
            next += 1
          }
          state.update(ConvState(next, buffered))
          if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          out.iterator
        }
      }
  }

  /** Stateless streaming triple extraction (same trie, same semantics
    * as the batch path — shared code, one decode of the dictionary per
    * executor).
    */
  def streamingTriples(
      spark: SparkSession,
      turns: Dataset[Turn],
      bcSurfaces: Broadcast[Array[SurfaceForm]]
  ): Dataset[RawTriple] = {
    import spark.implicits._
    Mentions.extract(spark, turns, bcSurfaces).flatMap { e =>
      e.triples.map(t => RawTriple(t.subj, t.pred, t.obj, e.conv_id, e.turn_idx))
    }
  }

  /** Event-time windowed turn-rate aggregation with a watermark — the
    * streaming-monitoring companion of the batch A-family aggregates:
    * counts per (tumbling ts window, role), with state eviction bounded
    * by `watermarkDelay` of event-time lateness (rows later than that
    * are dropped, state for closed windows is released). Append output
    * emits a window only once it is final; Update emits running counts.
    */
  def turnCountsByWindow(
      spark: SparkSession,
      turns: Dataset[Turn],
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    turns
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("role"),
        col("n_turns")
      )
  }

  /** Streaming exact dedup for the training-data family: keep the first
    * row per key, suppress duplicates whose event time falls within the
    * watermark horizon of the first occurrence.
    * `dropDuplicatesWithinWatermark` bounds dedup state by EVENT TIME —
    * the streaming-safe contract: an unbounded-history exact dedup is a
    * batch job over the corpus ([[graft.dedup.Dedup.exact]]); the
    * streaming form removes the re-deliveries and near-in-time copies
    * that ingestion pipelines actually produce (at-least-once sources,
    * retry storms), with state that a 10^12-row stream can afford.
    * A duplicate arriving LATER than the watermark delay re-emits — by
    * design; route the output through the batch dedup for the global
    * guarantee.
    */
  def streamingDedupExact(
      df: org.apache.spark.sql.DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keyCols: Seq[String]
  ): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** End-to-end streaming edge sink: extracted triples land in the
    * batch-idempotent edge layout via foreachBatch +
    * [[graft.graph.Materialize.appendEdgesBatch]] — a micro-batch
    * replayed after a checkpoint restart is skipped by the batch
    * ledger, so the sink is exactly-once per batch. (Canonicalization
    * runs downstream in batch: the CC mapping is a corpus-level
    * fixpoint, not a per-batch operation.)
    */
  def streamEdgesToTable(
      spark: SparkSession,
      turns: Dataset[Turn],
      bcSurfaces: Broadcast[Array[SurfaceForm]],
      outDir: String,
      checkpointDir: String,
      numBuckets: Int = 32
  ): org.apache.spark.sql.streaming.StreamingQuery =
    streamingTriples(spark, turns, bcSurfaces).toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.graph.Materialize.appendEdgesBatch(spark, batch, outDir, batchId, numBuckets)
        ()
      }
      .start()
}
