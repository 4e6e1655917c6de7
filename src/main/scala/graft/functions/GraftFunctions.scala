package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom functions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API (the function-registry route is the lightweight end of the
  * SparkSessionExtensions spectrum — no custom Rule/Strategy is
  * required for any operator here, SURVEY §4.1).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot",
      exprs => VectorExpressions.VectorDot(exprs(0), exprs(1)),
      "scala_udf"
    )
    reg.createOrReplaceTempFunction(
      "vec_norm",
      exprs => VectorExpressions.VectorNorm(exprs.head),
      "scala_udf"
    )
    reg.createOrReplaceTempFunction(
      "jaccard_distinct",
      exprs => VectorExpressions.JaccardDistinct(exprs(0), exprs(1)),
      "scala_udf"
    )
    spark.udf.register("det_mode", org.apache.spark.sql.functions.udaf(DeterministicMode))
  }
}
