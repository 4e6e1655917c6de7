package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence / window operators over session-grouped ordered records —
  * the reference's per-ride chain semantics generalized. All are pure
  * logical-plan builders: one hash exchange on the session key, sort
  * within partitions, then window functions (whole-stage codegen'd).
  * SURVEY §2.5 W1-W5, §2.4 A10-A12.
  */
object Sequences {

  /** W1: consecutive-record edges within a session
    * (/root/reference/src/GraphBuilder.jl:109-111). One shuffle on
    * `sessionCol`; no self-join.
    */
  def leadEdges(df: DataFrame, sessionCol: String, orderCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(col(sessionCol)).orderBy(orderCols.map(col): _*)
    df.select(
      col(sessionCol),
      col(idCol).as("src"),
      lead(col(idCol), 1).over(w).as("dst")
    ).where(col("dst").isNotNull)
  }

  /** W1 under MEGA-SESSION skew (north_rule: "mega-conversations
    * handled explicitly"): `leadEdges` puts a whole session in one
    * task — fine at the contract's bounded conversation sizes, but a
    * pathological 10^9-turn conversation would stall one executor.
    * This variant chunks the numeric order column into fixed ranges,
    * windows within (session, chunk), and stitches chunk boundaries
    * with one extra narrow self-join of per-chunk FIRST rows onto
    * per-chunk LAST rows — no task ever sees more than `chunkSize`
    * rows of one session. Property-tested equal to `leadEdges`.
    *
    * Requires a numeric `orderCol` (turn_idx-style). Order ties are the
    * caller's contract, exactly as in `leadEdges`.
    */
  def leadEdgesChunked(
      df: DataFrame,
      sessionCol: String,
      orderCol: String,
      idCol: String,
      chunkSize: Int = 1 << 20
  ): DataFrame = {
    val chunked = df.select(
      col(sessionCol),
      col(orderCol),
      col(idCol),
      floor(col(orderCol) / chunkSize).cast("long").as("_chunk")
    )
    val w = Window.partitionBy(col(sessionCol), col("_chunk")).orderBy(col(orderCol))
    val within = chunked
      .select(
        col(sessionCol),
        col(idCol).as("src"),
        lead(col(idCol), 1).over(w).as("dst")
      )
      .where(col("dst").isNotNull)

    // boundary stitch: each chunk's LAST row pairs with the NEXT
    // non-empty chunk's FIRST row. Both sides are one row per
    // (session, chunk) — narrow aggregation, tiny join.
    val wAsc = Window.partitionBy(col(sessionCol), col("_chunk")).orderBy(col(orderCol).asc)
    val wDesc = Window.partitionBy(col(sessionCol), col("_chunk")).orderBy(col(orderCol).desc)
    val lasts = chunked
      .withColumn("_rn", row_number().over(wDesc))
      .where(col("_rn") === 1)
      .select(col(sessionCol), col("_chunk"), col(idCol).as("src"), col(orderCol).as("_ord"))
    val firsts = chunked
      .withColumn("_rn", row_number().over(wAsc))
      .where(col("_rn") === 1)
      .select(col(sessionCol).as("_s2"), col("_chunk").as("_c2"), col(idCol).as("dst"))
    // successive non-empty chunks may skip ids (sparse order values):
    // rank chunks per session and join rank -> rank+1
    val wChunks = Window.partitionBy(col(sessionCol)).orderBy(col("_chunk"))
    val lastRanked = lasts.withColumn("_k", row_number().over(wChunks))
    val firstRanked = firsts.withColumn(
      "_k2",
      row_number().over(Window.partitionBy(col("_s2")).orderBy(col("_c2")))
    )
    val stitched = lastRanked
      .join(
        firstRanked,
        col(sessionCol) === col("_s2") && col("_k") + 1 === col("_k2")
      )
      .select(col(sessionCol), col("src"), col("dst"))

    within.union(stitched)
  }

  /** A11: running sum along the session
    * (/root/reference/src/Utils.jl:279-288).
    */
  def cumulative(df: DataFrame, sessionCol: String, orderCols: Seq[String], valueCol: String, as: String): DataFrame = {
    val w = Window
      .partitionBy(col(sessionCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(col(valueCol)).over(w))
  }

  /** A11 under MEGA-SESSION skew: the classic two-phase distributed
    * scan. Phase 1 computes within-chunk running sums (window over
    * (session, chunk) — bounded tasks); phase 2 computes each chunk's
    * EXCLUSIVE offset as a running sum over the per-chunk totals (one
    * tiny row per chunk) and adds it back. Property-tested equal to
    * `cumulative` modulo float association (hence round results).
    */
  def cumulativeChunked(
      df: DataFrame,
      sessionCol: String,
      orderCol: String,
      valueCol: String,
      as: String,
      chunkSize: Int = 1 << 20
  ): DataFrame = {
    val chunked = df.withColumn("_chunk", floor(col(orderCol) / chunkSize).cast("long"))
    val wIn = Window
      .partitionBy(col(sessionCol), col("_chunk"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = chunked.withColumn("_within", sum(col(valueCol)).over(wIn))

    val totals = chunked
      .groupBy(col(sessionCol).as("_s2"), col("_chunk").as("_c2"))
      .agg(sum(col(valueCol)).as("_total"))
    val wOff = Window
      .partitionBy(col("_s2"))
      .orderBy(col("_c2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      // lit(0L), not lit(0.0): an integral value column must keep its
      // type (long + long stays long; long 0 coerces under double sums)
      .withColumn("_offset", coalesce(sum(col("_total")).over(wOff), lit(0L)))
      .select(col("_s2"), col("_c2"), col("_offset"))

    within
      .join(offsets, col(sessionCol) === col("_s2") && col("_chunk") === col("_c2"))
      .withColumn(as, col("_within") + col("_offset"))
      .drop("_chunk", "_within", "_s2", "_c2", "_offset")
  }

  /** W4+W5: consecutive-pair transitions with gap filters and delta
    * features (/root/reference/src/DataPreprocessing.jl:330-397).
    */
  def transitions(
      df: DataFrame,
      sessionCol: String,
      orderCols: Seq[String],
      tsCol: String,
      valueCol: String,
      maxGapSeconds: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(sessionCol)).orderBy(orderCols.map(col): _*)
    df.select(
      col(sessionCol),
      col(tsCol).as("from_ts"),
      col(valueCol).as("from_value"),
      lead(col(tsCol), 1).over(w).as("to_ts"),
      lead(col(valueCol), 1).over(w).as("to_value"),
      row_number().over(w).as("order_index")
    ).where(col("to_ts").isNotNull)
      // TIMESTAMP_NTZ has no direct double cast in Spark 4; route via
      // LTZ (identity under the UTC session timezone)
      .withColumn(
        "gap_seconds",
        col("to_ts").cast("timestamp").cast("double") - col("from_ts").cast("timestamp").cast("double")
      )
      .where(col("gap_seconds") <= lit(maxGapSeconds))
      .withColumn("delta_value", col("to_value") - col("from_value"))
  }

  /** A12: segment characteristics — conditional aggregates over
    * consecutive deltas (/root/reference/src/SegmentAnalysis.jl:32-81):
    * total ascent (positive deltas), descent, absolute variation, max
    * positive delta.
    */
  def segmentCharacteristics(
      df: DataFrame,
      sessionCol: String,
      orderCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(sessionCol)).orderBy(orderCols.map(col): _*)
    val d = df
      .withColumn("delta", lead(col(valueCol), 1).over(w) - col(valueCol))
      .where(col("delta").isNotNull)
    d.groupBy(col(sessionCol))
      .agg(
        round(sum(when(col("delta") > 0, col("delta")).otherwise(lit(0.0))), 6).as("total_ascent"),
        round(sum(when(col("delta") < 0, -col("delta")).otherwise(lit(0.0))), 6).as("total_descent"),
        round(sum(abs(col("delta"))), 6).as("total_variation"),
        round(max(col("delta")), 6).as("max_delta"),
        count(lit(1)).as("n_pairs")
      )
  }

  /** A10: unique coverage — canonicalized distinct consecutive cell
    * pairs (/root/reference/src/GraphUtils.jl:18-103): quantize,
    * lead-pair, least/greatest canonical ordering, distinct.
    */
  def uniqueCoverage(
      df: DataFrame,
      sessionCol: String,
      orderCols: Seq[String],
      cellCol: Column
  ): DataFrame = {
    val w = Window.partitionBy(col(sessionCol)).orderBy(orderCols.map(col): _*)
    df.select((Seq(col(sessionCol), cellCol.as("cell")) ++ orderCols.map(col)): _*)
      .withColumn("next_cell", lead(col("cell"), 1).over(w))
      .where(col("next_cell").isNotNull && col("next_cell") =!= col("cell"))
      .select(
        least(col("cell"), col("next_cell")).as("cell_a"),
        greatest(col("cell"), col("next_cell")).as("cell_b")
      )
      .distinct()
  }

  /** W6/O7: per-group downsample + cap
    * (/root/reference/src/Visualizer.jl:192-197).
    */
  def downsample(df: DataFrame, sessionCol: String, orderCols: Seq[String], every: Int, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(sessionCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("rn", row_number().over(w))
      .where((col("rn") - 1) % every === 0)
      .withColumn("kept", row_number().over(w))
      .where(col("kept") <= cap)
      .drop("rn", "kept")
  }
}
