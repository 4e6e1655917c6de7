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

  test("imputeGroupMode: per-group mode, global fallback, deterministic ties") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some("x")), ("g1", Some("x")), ("g1", Some("y")), ("g1", None),
      ("g2", None), // group with no non-null values -> global mode
      ("g3", Some("b")), ("g3", Some("a")), ("g3", Some("b")), ("g3", Some("a")), ("g3", None)
    ).toDF("g", "v")
    val out = Stats.imputeGroupMode(df, "g", "v", "v_imp")
      .groupBy($"g").agg(collect_set($"v_imp").as("vals"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("g1").toSet == Set("x", "y")) // null filled with group mode x
    // global mode: x/a/b all have 2 occurrences -> smallest value 'a'
    assert(out("g2") == Seq("a"))
    assert(out("g3").toSet == Set("a", "b")) // tie a/b -> smallest 'a' fills the null
  }

  test("imputeGroupMode on an all-null column keeps every row (empty global mode)") {
    import spark.implicits._
    val df = Seq(("g1", None: Option[String]), ("g2", None)).toDF("g", "v")
    val out = Stats.imputeGroupMode(df, "g", "v", "v_imp")
    assert(out.count() == 2) // a crossJoin against the empty mode frame dropped these
    assert(out.where($"v_imp".isNotNull).count() == 0)
  }

  test("cleanPipeline replays the reference process_json_data semantics") {
    import spark.implicits._
    // col all_null -> dropped (M1); col mostly_null -> dropped (M2 at 50%);
    // num gets per-group median imputation; s gets per-group mode; s
    // constant-'unknown' col dropped (M3); survivors default-backstopped (M4)
    val df = Seq(
      ("g1", Some(1.0), Some("x"), None: Option[String], Some("unknown"), None: Option[Double]),
      ("g1", Some(3.0), Some("x"), None, Some("unknown"), None),
      ("g1", None, None, Some("only"), Some("unknown"), None),
      ("g2", Some(10.0), Some("z"), None, Some("unknown"), None)
    ).toDF("g", "num", "s", "mostly_null", "const_unknown", "all_null")
    val out = Stats.cleanPipeline(df, "g", 50.0)
    assert(out.columns.toSeq == Seq("g", "num", "s"))
    val byG = out.orderBy($"g", $"num").as[(String, Double, String)].collect().toSeq
    // g1's missing num -> group median of (1,3) = 2.0; g1's missing s -> mode x
    assert(byG == Seq(("g1", 1.0, "x"), ("g1", 2.0, "x"), ("g1", 3.0, "x"), ("g2", 10.0, "z")))
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
