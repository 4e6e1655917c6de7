package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking / join-shaped operators: grid hotspots, engineered-key
  * equi-joins, bounded theta self-joins, anti-join resume.
  * SURVEY §2.3 J2/J3/J5, §2.4 A8/A9, §2.7 SO4.
  */
object Blocks {

  /** F5: grid quantization — the key-engineering primitive that turns
    * the reference's theta joins into equi-joins
    * (/root/reference/src/GraphUtils.jl:38-44).
    */
  def gridCell(c: Column, res: Double): Column =
    floor(c / lit(res)).cast("long")

  /** A8: hotspot cells — quantize, count distinct sessions per cell,
    * keep cells with >= minReps (/root/reference/src/GraphUtils.jl:117-162).
    * Exact distinct here; `approx_count_distinct` is the documented
    * 10^12-scale variant (SURVEY §2.4 note).
    */
  def hotspotCells(df: DataFrame, sessionCol: String, valueCol: String, res: Double, minReps: Long): DataFrame =
    df.select(col(sessionCol), gridCell(col(valueCol), res).as("cell"))
      .groupBy(col("cell"))
      .agg(countDistinct(col(sessionCol)).as("n_sessions"))
      .where(col("n_sessions") >= minReps)

  /** A9: session with the most points in hot cells — semi-join against
    * the hot cells then count + argmax
    * (/root/reference/src/GraphUtils.jl:168-188). The hot-cell side is
    * tiny -> broadcast semi-join, no full shuffle of the fact side.
    */
  def hottestSession(df: DataFrame, sessionCol: String, valueCol: String, res: Double, minReps: Long): DataFrame = {
    val hot = hotspotCells(df, sessionCol, valueCol, res, minReps)
    val scored = df
      .select(col(sessionCol), gridCell(col(valueCol), res).as("cell"))
      .join(broadcast(hot.select(col("cell"))), Seq("cell"), "left_semi")
      .groupBy(col(sessionCol))
      .agg(count(lit(1)).as("hot_points"))
    // argmax with deterministic tie-break on the session key
    scored
      .orderBy(col("hot_points").desc, col(sessionCol).asc)
      .limit(1)
  }

  /** J2: engineered-key equi-join against a small dimension — the
    * weather-cache pattern (/root/reference/src/TCXParser.jl:267-318):
    * key = (grid cell, hour-truncated ts); dimension broadcast.
    */
  def gridHourJoin(facts: DataFrame, dim: DataFrame, keyCols: Seq[String]): DataFrame =
    facts.join(broadcast(dim), keyCols)

  /** J5: bounded self theta-join — pairs within `tol` of each other
    * (/root/reference/src/PathFinder.jl:54-90). Banded into an
    * equi-join on the coarse cell + residual predicate: each left row
    * probes its own and neighboring band, so the crossJoin never
    * materializes. Requires ids to dedup the symmetric pair.
    */
  def proximitySelfJoin(df: DataFrame, idCol: String, valueCol: String, tol: Double): DataFrame = {
    val banded = df
      .select(col(idCol).as("id"), col(valueCol).as("v"))
      .withColumn("band", gridCell(col("v"), tol))
    val probe = banded
      .withColumn("probe_band", explode(array(col("band") - 1, col("band"), col("band") + 1)))
      .select(col("id").as("id_a"), col("v").as("v_a"), col("probe_band").as("band"))
    probe
      .join(banded.select(col("id").as("id_b"), col("v").as("v_b"), col("band")), Seq("band"))
      .where(col("id_a") < col("id_b") && abs(col("v_a") - col("v_b")) <= lit(tol))
      .select(col("id_a"), col("id_b"), round(abs(col("v_a") - col("v_b")), 6).as("dist"))
      .distinct()
  }

  /** SO4: idempotent-resume anti-join — rows whose key is NOT in the
    * checkpoint ledger (/root/reference/examples/updateWeatherNeo4j.jl:256-263).
    */
  def resumePending(facts: DataFrame, ledger: DataFrame, keyCols: Seq[String]): DataFrame =
    facts.join(ledger, keyCols, "left_anti")

  /** J1: nearest-neighbor enrichment join — for every fact row, the
    * dim row minimizing |factVal - dimVal|, copying the dim's payload
    * (the reference's closest-road-feature assignment,
    * /root/reference/src/TCXParser.jl:188-265). Dim is broadcast (it's
    * the small side by construction); argmin via ranked window with a
    * deterministic (distance, dim key) tie-break. At larger dim
    * cardinality the broad phase becomes a banded equi-join like
    * proximitySelfJoin.
    */
  def nearestNeighborJoin(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      factVal: String,
      dimKey: String,
      dimVal: String
  ): DataFrame = {
    // argmin per physical FACT ROW, not per factKey value: partitioning
    // on the key alone would silently collapse duplicate-key fact rows
    // to one enriched row. The row id is ephemeral (window-internal,
    // dropped) so its cross-run instability can't leak into the output.
    val withRowId = facts.withColumn("_fact_row", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fact_row"))
      .orderBy(abs(col(factVal) - col(dimVal)).asc, col(dimKey).asc)
    withRowId
      .join(broadcast(dim))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_fact_row")
      .withColumn("nn_dist", round(abs(col(factVal) - col(dimVal)), 6))
  }

  /** SO2: interval intersection length as a column expression —
    * greatest(0, min(ends) - max(starts))
    * (/root/reference/src/OverlappingSegmentsUtils.jl:232).
    */
  def intervalOverlap(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    greatest(lit(0.0), least(e1, e2) - greatest(s1, s2))
}
