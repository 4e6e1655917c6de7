package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small shared Column helpers used across operators. */
object Cols {

  /** A temp-column name guaranteed absent from `existing` — operators
    * that stage internal columns must not clobber (or collide with) a
    * caller's columns of the same name (e.g. composing an operator with
    * another operator's output that already carries `cluster_id`).
    */
  def fresh(existing: Set[String], base: String): String = {
    var name = base
    var i = 0
    while (existing.contains(name)) { i += 1; name = s"${base}_$i" }
    name
  }

  /** Exact floor-division of an integral column by a positive constant,
    * entirely in 64-bit integer arithmetic. The double route
    * (`floor(c.cast("double") / n)`) loses precision above 2^53 — chunk
    * boundaries near the top of a long id space would silently drift.
    * SQL `div` truncates toward zero, so a negative non-divisible value
    * is adjusted down by one; this form never leaves the long range
    * (the subtract-the-remainder form underflowed for values within n
    * of Long.MinValue — an ANSI ARITHMETIC_OVERFLOW).
    */
  def floorDivLong(c: Column, n: Long): Column = {
    require(n > 0, s"floorDivLong divisor must be positive, got $n")
    val q = call_function("div", c, lit(n))
    when(c < 0 && pmod(c, lit(n)) =!= 0, q - 1).otherwise(q)
  }
}
