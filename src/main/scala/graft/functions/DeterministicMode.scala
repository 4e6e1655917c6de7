package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.11): string mode with a deterministic
  * tie-break (highest count, then smallest value) — the reference's
  * mode aggregate (/root/reference/src/DataPreprocessing.jl:234-251)
  * needs reproducible ties for oracle parity, which the built-in
  * `mode()` does not guarantee. Buffer is a count map; merge is
  * map-union — associative + commutative, so Catalyst can run it as
  * partial/final aggregation.
  */
object DeterministicMode extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  }

  override def finish(red: Map[String, Long]): String =
    if (red.isEmpty) null
    else red.minBy { case (k, v) => (-v, k) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
