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

  test("jaccard_distinct matches the scalar scorer on random distinct sets") {
    import spark.implicits._
    import graft.functions.VectorExpressions._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200) { i =>
      def set() = Array.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", jaccard_distinct($"a", $"b").as("j"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == graft.link.Linker.exactJaccard(a, b), s"id=$id")
    }
    // empty vs empty = 1.0; empty vs non-empty = 0.0; null propagates
    val edge = Seq(
      (1L, Array.empty[Long], Array.empty[Long]),
      (2L, Array.empty[Long], Array(1L, 2L))
    ).toDF("id", "a", "b")
    val e = edge.select($"id", jaccard_distinct($"a", $"b").as("j")).as[(Long, Double)].collect().toMap
    assert(e(1L) == 1.0 && e(2L) == 0.0)
    val withNull = Seq((1L, Some(Array(1L)), None: Option[Array[Long]])).toDF("id", "a", "b")
    assert(withNull.select(jaccard_distinct($"a", $"b")).head().isNullAt(0))
    // SQL registration
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("jd")
    val viaSql = spark.sql("SELECT id, jaccard_distinct(a, b) FROM jd").as[(Long, Double)].collect().toMap
    assert(viaSql == got)
  }

  test("jaccard_distinct accepts parquet-typed nullable-element arrays; null ELEMENT errors readably") {
    import spark.implicits._
    import graft.functions.VectorExpressions._
    // parquet round-trip types list elements containsNull=true even
    // when the data has no nulls — the expression must still analyze
    val tmp = java.nio.file.Files.createTempDirectory("graft_jd").toString
    Seq((1L, Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("id", "a", "b")
      .write.mode("overwrite").parquet(tmp)
    val pq = spark.read.parquet(tmp)
    assert(pq.schema("a").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val j = pq.select(jaccard_distinct($"a", $"b")).head().getDouble(0)
    assert(j == 2.0 / 4.0)
    // an ACTUAL null element raises the contract error, not an opaque NPE
    graft.functions.GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT jaccard_distinct(array(1L, CAST(NULL AS BIGINT)), array(1L))").collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(err).exists(c => Option(c.getMessage).exists(_.contains("null array element"))),
      s"got: $err")
  }
}
