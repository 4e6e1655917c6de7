package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity analytics over the materialized property graph — the
  * case-study pipelines of the reference re-expressed
  * (/root/reference/examples/main.jl:165-260; per-segment aggregates
  * /root/reference/src/DataPreprocessing.jl:178-274).
  * Input `edges`: (subj, pred, obj, conv_id, turn_idx).
  */
object EntityAggregates {

  /** Flagship slice (SURVEY §7.2): canonical entity pairs co-asserted
    * in >= minConvs distinct conversations, with evidence counts.
    * Plan: one hash shuffle on the (subj, obj) pair; countDistinct on
    * conv (exact here; approx_count_distinct at 10^12 scale).
    */
  def coOccurrence(edges: DataFrame, minConvs: Long): DataFrame =
    edges
      .select(
        least(col("subj"), col("obj")).as("entity_a"),
        greatest(col("subj"), col("obj")).as("entity_b"),
        col("conv_id")
      )
      .where(col("entity_a") =!= col("entity_b"))
      .groupBy(col("entity_a"), col("entity_b"))
      .agg(countDistinct(col("conv_id")).as("n_convs"), count(lit(1)).as("n_assertions"))
      .where(col("n_convs") >= minConvs)

  /** Per-entity profile: assertion counts in subject/object role,
    * distinct conversations, span of turn indices, dominant predicate
    * (deterministic mode) — the A3-profile analog over the KG.
    */
  def entityProfile(edges: DataFrame): DataFrame = {
    val roles = edges
      .select(col("subj").as("entity_id"), col("pred"), col("conv_id"), col("turn_idx"), lit(1).as("as_subj"))
      .union(
        edges.select(col("obj").as("entity_id"), col("pred"), col("conv_id"), col("turn_idx"), lit(0).as("as_subj"))
      )
    val base = roles
      .groupBy(col("entity_id"))
      .agg(
        count(lit(1)).as("n_assertions"),
        sum(col("as_subj")).as("n_as_subject"),
        countDistinct(col("conv_id")).as("n_convs"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn")
      )
    // dominant predicate = argmax over (cnt desc, pred asc), computed as
    // a map-side-partial min_by over the lexicographic (-cnt, pred) key
    // instead of a row_number window + filter: same winner per entity
    // ((-cnt, pred) is unique within an entity — pred is the grouping
    // key), but no Sort/Window stage and no skew risk from a hot entity
    // funneling its predicate rows into one window task
    val predCounts = roles.groupBy(col("entity_id"), col("pred")).agg(count(lit(1)).as("cnt"))
    val topPred = predCounts
      .groupBy(col("entity_id"))
      .agg(min_by(col("pred"), struct((-col("cnt")).as("nc"), col("pred").as("p"))).as("top_pred"))
    base.join(topPred, Seq("entity_id"))
  }

  /** W4-analog over the KG: consecutive assertions within a
    * conversation — (pred -> next pred) transition counts, the
    * "run-level transitions" of the reference
    * (/root/reference/src/DataPreprocessing.jl:330-397).
    */
  def predicateTransitions(edges: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx").asc, col("subj").asc, col("obj").asc)
    edges
      .withColumn("next_pred", lead(col("pred"), 1).over(w))
      .where(col("next_pred").isNotNull)
      .groupBy(col("pred"), col("next_pred"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
