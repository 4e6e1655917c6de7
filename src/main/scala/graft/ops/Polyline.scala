package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Polyline simplification — graft of the reference's recursive
  * Douglas-Peucker (/root/reference/src/Utils.jl:156-186), used for
  * viz-prep and query-payload reduction. Operates on a whole per-group
  * sequence, so it runs as a typed groupByKey.flatMapGroups (the "UDTF
  * over a sorted group" vehicle, SURVEY §2.11) — one shuffle on the
  * group key, group sorted in memory (per-group sizes are session-
  * bounded; cap upstream via downsampling for mega-sessions).
  */
object Polyline {

  final case class Pt(x: Double, y: Double)

  private def perpDist(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x
    val dy = b.y - a.y
    val n = math.sqrt(dx * dx + dy * dy)
    if (n == 0) math.sqrt((p.x - a.x) * (p.x - a.x) + (p.y - a.y) * (p.y - a.y))
    else math.abs(dy * p.x - dx * p.y + b.x * a.y - b.y * a.x) / n
  }

  /** Iterative Douglas-Peucker (explicit stack — no recursion-depth
    * limit on adversarial polylines).
    */
  def simplify(points: IndexedSeq[Pt], epsilon: Double): IndexedSeq[Pt] = {
    if (points.length < 3) return points
    val keep = new Array[Boolean](points.length)
    keep(0) = true
    keep(points.length - 1) = true
    val stack = scala.collection.mutable.Stack((0, points.length - 1))
    while (stack.nonEmpty) {
      val (s, e) = stack.pop()
      var dmax = 0.0
      var idx = -1
      var i = s + 1
      while (i < e) {
        val d = perpDist(points(i), points(s), points(e))
        if (d > dmax) { dmax = d; idx = i }
        i += 1
      }
      if (dmax > epsilon && idx > 0) {
        keep(idx) = true
        stack.push((s, idx))
        stack.push((idx, e))
      }
    }
    points.indices.collect { case i if keep(i) => points(i) }
  }

  /** Simplify one polyline per session: input (session, order, x, y)
    * -> output (session, n_in, n_out, xs, ys).
    */
  def simplifySessions(
      spark: SparkSession,
      df: DataFrame,
      sessionCol: String,
      orderCol: String,
      xCol: String,
      yCol: String,
      epsilon: Double
  ): DataFrame = {
    import spark.implicits._
    df.select(
      col(sessionCol).cast("string").as("session"),
      col(orderCol).cast("long").as("ord"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")
    ).as[(String, Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (session, rows) =>
        val pts = rows.toIndexedSeq.sortBy(_._2).map(r => Pt(r._3, r._4))
        val simp = simplify(pts, epsilon)
        Iterator((session, pts.length, simp.length, simp.map(_.x), simp.map(_.y)))
      }
      .toDF("session", "n_in", "n_out", "xs", "ys")
  }
}
