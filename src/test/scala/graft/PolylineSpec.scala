package graft

import graft.ops.Polyline
import graft.ops.Polyline.Pt

class PolylineSpec extends SparkSpec {

  test("douglas-peucker keeps endpoints and the significant vertex") {
    // classic fixture: spike in the middle survives, collinear noise dies
    val pts = IndexedSeq(Pt(0, 0), Pt(1, 0.05), Pt(2, 0.1), Pt(3, 5), Pt(4, 0.1), Pt(5, 0))
    val simp = Polyline.simplify(pts, 1.0)
    assert(simp.head == pts.head && simp.last == pts.last)
    assert(simp.contains(Pt(3, 5)))
    assert(simp.length < pts.length)
    // epsilon larger than the spike: only endpoints remain
    assert(Polyline.simplify(pts, 10.0) == IndexedSeq(pts.head, pts.last))
    // tiny epsilon: everything survives... except exactly collinear points
    assert(Polyline.simplify(pts, 1e-9).length >= 5)
    // degenerate inputs
    assert(Polyline.simplify(IndexedSeq(Pt(1, 1)), 1.0) == IndexedSeq(Pt(1, 1)))
    assert(Polyline.simplify(IndexedSeq.empty, 1.0).isEmpty)
  }

  test("simplifySessions groups, sorts by order column, reduces points") {
    import spark.implicits._
    val rows = (0 until 100).map(i => ("s1", i.toLong, i.toDouble, if (i == 50) 100.0 else 0.0)) ++
      (0 until 10).map(i => ("s2", i.toLong, i.toDouble, i.toDouble)) // straight line
    val df = rows.toDF("sess", "ord", "x", "y")
    val out = Polyline
      .simplifySessions(spark, df, "sess", "ord", "x", "y", 0.5)
      .as[(String, Int, Int, Seq[Double], Seq[Double])]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(out("s1")._2 == 100 && out("s1")._3 <= 5) // spike + endpoints
    assert(out("s2")._2 == 10 && out("s2")._3 == 2) // collinear -> endpoints
    // simplified polyline of s1 contains the spike x=50
    assert(out("s1")._4.contains(50.0))
  }
}
