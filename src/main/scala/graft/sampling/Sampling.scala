package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction operators: deterministic sampling and
  * budget capping over a corpus — the steps between curation (dedup /
  * decontam / quality) and the final training mixture.
  *
  * Everything here is a pure function of the data (no RNG state, no
  * partition-order dependence), so mixes are reproducible across runs,
  * cluster sizes, and engines — the property that matters when a
  * 100-TB mix must be re-derivable byte-for-byte for an ablation.
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic hash of an id — Fibonacci /
    * golden-ratio multiplicative hashing (Knuth TAOCP §6.4): x *
    * floor(phi^-1 * M) mod M with M = 2^31-1. Consecutive ids step by
    * ~0.618 in [0,1) (low-discrepancy, no monotone prefix — a small-
    * multiplier LCG like 16807 leaves small ids tiny and ordered).
    * Chosen over xxhash64 because it is exactly replayable in ANY
    * engine with 64-bit integer arithmetic (the DuckDB oracle replays
    * it digit for digit; no overflow: (2^31-2) * 1327217885 < 2^62).
    */
  def idUniform(idCol: Column): Column =
    pmod(pmod(idCol, lit(2147483647L)) * lit(1327217885L), lit(2147483647L)) /
      lit(2147483647.0)

  /** Stratified sampling: keep each row with its stratum's rate,
    * decided by [[idUniform]] on the id — per-stratum Bernoulli with a
    * deterministic coin. A narrow filter (no shuffle, no sort); rates
    * for unlisted strata fall back to `defaultRate`.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(idUniform(col(idCol)) < rate)
  }

  /** Per-group token-budget cap: keep rows in deterministic
    * (orderCols) order while the running token total (INCLUDING the
    * current row) stays within `budget` — the "take documents from
    * each source until its budget is spent" mix rule. One shuffle on
    * the group key (the window); rows beyond the budget are dropped,
    * never truncated mid-document.
    */
  def tokenBudgetCap(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      tokensCol: String,
      budget: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_running", sum(col(tokensCol)).over(w))
      .where(col("_running") <= budget)
      .drop("_running")
  }
}
