package graft

import graft.model.SchemaOps

class SchemaOpsSpec extends SparkSpec {

  test("unionEvolved aligns by name and null-fills evolution columns") {
    import spark.implicits._
    val v1 = Seq(("c1", 0, "hi")).toDF("conv_id", "turn_idx", "text")
    val v2 = Seq(("c2", 1, "yo", "bash")).toDF("conv_id", "turn_idx", "text", "tool")
    val v3 = Seq(("c3", 2)).toDF("conv_id", "turn_idx") // column dropped
    val u = SchemaOps.unionEvolved(Seq(v1, v2, v3))
    assert(u.columns.toSeq == Seq("conv_id", "turn_idx", "text", "tool"))
    assert(u.count() == 3)
    val rows = u.collect().map(r => (r.getString(0), Option(r.get(2)), Option(r.get(3)))).toSet
    assert(rows == Set(
      ("c1", Some("hi"), None),
      ("c2", Some("yo"), Some("bash")),
      ("c3", None, None)
    ))
  }

  test("unionCommon projects to the shared columns") {
    import spark.implicits._
    val v1 = Seq(("c1", 0, "hi")).toDF("conv_id", "turn_idx", "text")
    val v3 = Seq(("c3", 2)).toDF("conv_id", "turn_idx")
    val u = SchemaOps.unionCommon(Seq(v1, v3))
    assert(u.columns.toSeq == Seq("conv_id", "turn_idx"))
    assert(u.count() == 2)
  }
}
