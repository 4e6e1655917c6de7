package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SO5 — schema union under evolution: transcript shards written at
  * different pipeline versions gain/lose columns (the reference's
  * loose per-record property bags make every record its own "schema").
  * `unionEvolved` aligns by NAME and fills columns missing on either
  * side with NULL — the Iceberg schema-evolution read semantics
  * expressed over plain DataFrames. Column ORDER follows the first
  * frame (then first-seen for new columns), so the result is stable
  * regardless of shard order modulo that first frame.
  */
object SchemaOps {

  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionEvolved needs at least one frame")
    dfs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Project every frame to the intersection of their columns (the
    * conservative variant when downstream can't tolerate NULL-filled
    * evolution columns).
    */
  def unionCommon(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionCommon needs at least one frame")
    val common = dfs.map(_.columns.toSeq).reduce((a, b) => a.filter(b.toSet))
    require(common.nonEmpty, "no common columns across frames")
    dfs.map(_.select(common.map(col): _*)).reduce(_ union _)
  }
}
