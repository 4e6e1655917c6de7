package graft

import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {
  test("custom expressions are SQL-registered and codegen-consistent") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("vecs")
    val row = spark
      .sql("SELECT vec_dot(a, b) AS d, vec_norm(a) AS n FROM vecs")
      .head()
    assert(math.abs(row.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-9)
    // interpreted eval path matches codegen
    import graft.functions.VectorExpressions._
    val viaCol = df.select(vec_dot($"a", $"b")).head().getDouble(0)
    assert(viaCol == row.getDouble(0))
    // det_mode UDAF via SQL
    val m = Seq(("x"), ("y"), ("y"), ("a"), ("x")).toDF("v")
    m.createOrReplaceTempView("modes")
    assert(spark.sql("SELECT det_mode(v) FROM modes").head().getString(0) == "x") // tie x/y -> smallest
  }
}
