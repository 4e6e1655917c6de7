package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom functions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API (the function-registry route is the lightweight end of the
  * SparkSessionExtensions spectrum — no custom Rule/Strategy is
  * required for any operator here, SURVEY §4.1).
  */
object GraftFunctions {

  // Arity is validated in the builder lambda: the function registry
  // invokes it with however many arguments the SQL call supplied, and a
  // bare exprs(1) would surface as IndexOutOfBoundsException instead of
  // a readable analysis error.
  private def expectArity(
      name: String,
      n: Int,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
  ): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> ""
        )
      )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot",
      exprs => {
        expectArity("vec_dot", 2, exprs)
        VectorExpressions.VectorDot(exprs(0), exprs(1))
      },
      "scala_udf"
    )
    reg.createOrReplaceTempFunction(
      "vec_norm",
      exprs => {
        expectArity("vec_norm", 1, exprs)
        VectorExpressions.VectorNorm(exprs.head)
      },
      "scala_udf"
    )
    reg.createOrReplaceTempFunction(
      "jaccard_distinct",
      exprs => {
        expectArity("jaccard_distinct", 2, exprs)
        VectorExpressions.JaccardDistinct(exprs(0), exprs(1))
      },
      "scala_udf"
    )
    spark.udf.register("det_mode", org.apache.spark.sql.functions.udaf(DeterministicMode))
  }
}
