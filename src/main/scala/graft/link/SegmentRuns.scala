package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-run detail explode — graft of the reference's
  * `extract_single_segment_runs` (/root/reference/src/SegmentRuns.jl:21-38):
  * materialize one row per (run, turn inside the run's window), i.e. the
  * `run_data` rows that feed the CS1 preprocessing pipeline
  * (/root/reference/examples/main.jl:165-189). The reference slices its
  * in-memory vertex dict per run range; here the turn stream gets a
  * per-conversation position and the run windows join on a position
  * range.
  */
object SegmentRuns {

  /** Explode run windows into their constituent turn rows.
    *
    * @param turns the turn stream; position is assigned as
    *        `row_number() over (partition by convCol order by orderCols)`
    *        — 1-based, the same convention as
    *        [[WindowMatch.bestWindowPerSession]] output windows.
    * @param runs one row per run: `conv_id`, `start_idx`, `end_idx`
    *        (1-based inclusive) plus any carry-through columns
    *        (pattern_id, score, ...). Runs are pattern-match output —
    *        driver-sized relative to the stream — so the default plan
    *        broadcasts them: the turn stream is shuffled ONCE (the
    *        position window's conv_id exchange) and the range join is
    *        map-side. Set `broadcastRuns = false` when the run table is
    *        itself huge; the join then shuffles on the conv key.
    * @return turn rows + `turn_pos` + the run's columns; a turn covered
    *         by k runs appears k times (one per run), exactly like the
    *         reference's per-run `run_data` slices.
    */
  def explodeRuns(
      turns: DataFrame,
      runs: DataFrame,
      convCol: String,
      orderCols: Seq[String],
      broadcastRuns: Boolean = true
  ): DataFrame = {
    require(!turns.columns.contains("turn_pos"),
      "turns already has a turn_pos column — it would be silently overwritten")
    val w = Window.partitionBy(col(convCol)).orderBy(orderCols.map(col): _*)
    val pos = turns.withColumn("turn_pos", row_number().over(w))
    val r = if (broadcastRuns) broadcast(runs) else runs
    pos
      .join(
        r,
        pos(convCol) === r("conv_id") &&
          pos("turn_pos") >= r("start_idx") && pos("turn_pos") <= r("end_idx")
      )
      .drop(r("conv_id"))
  }
}
