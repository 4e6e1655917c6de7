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
