package graft

import org.apache.spark.sql.functions._

import graft.ops.{Blocks, Stats}

/** Regression locks for operator-contract edges found in review:
  * NULL groups, duplicate keys, empty inputs, dimension mismatches.
  */
class OperatorContractSpec extends SparkSpec {

  test("profile keeps the NULL group and breaks mode ties nulls-last") {
    import spark.implicits._
    val df = Seq(
      (Some("g1"), 1.0, Some("a")), (Some("g1"), 3.0, Some("a")),
      (None, 5.0, Some("x")), (None, 7.0, None) // NULL group; NULL string ties value
    ).toDF("g", "v", "s")
    val got = Stats.profile(df, Seq("g"), Seq("v"), Seq("s")).collect()
    assert(got.length == 2, s"NULL group must not vanish: ${got.toSeq}")
    val nullRow = got.find(_.isNullAt(0)).get
    assert(nullRow.getAs[Long]("n_rows") == 2)
    // count tie between "x" (1) and NULL (1): nulls-last ASC picks "x"
    assert(nullRow.getAs[String]("s_mode") == "x")
  }

  test("nearestNeighborJoin enriches every fact row, including duplicate keys") {
    import spark.implicits._
    val facts = Seq((1L, 10.0), (1L, 99.0), (2L, 50.0)).toDF("k", "probe")
    val dim = Seq(("d1", 12.0), ("d2", 95.0), ("d3", 55.0)).toDF("dk", "dv")
    val got = Blocks.nearestNeighborJoin(facts, dim, "k", "probe", "dk", "dv")
      .select($"k", $"probe", $"dk").as[(Long, Double, String)].collect().toSet
    assert(got == Set((1L, 10.0, "d1"), (1L, 99.0, "d2"), (2L, 50.0, "d3")),
      s"duplicate-key fact rows must each keep their own nearest dim: $got")
  }

  test("dropHighMissing: empty input keeps all columns; boundary kept") {
    import spark.implicits._
    val empty = Seq.empty[(Option[Int], Option[String])].toDF("a", "b")
    assert(Stats.dropHighMissing(empty, 50.0).columns.toSeq == Seq("a", "b"))
    // exactly-at-threshold column is KEPT ('exceeds' semantics)
    val half = Seq((Some(1), Some("x")), (None, Some("y"))).toDF("a", "b")
    assert(Stats.dropHighMissing(half, 50.0).columns.toSeq == Seq("a", "b"))
    assert(Stats.dropHighMissing(half, 49.0).columns.toSeq == Seq("b"))
  }

  test("vec_dot throws on dimension mismatch instead of scoring a prefix") {
    import spark.implicits._
    import graft.functions.VectorExpressions._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))
    ).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(vec_dot($"a", $"b")).collect()
    }
    def rootMessages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ rootMessages(t.getCause)
    assert(rootMessages(e).exists(_.contains("length mismatch")), e.toString)
  }
}
