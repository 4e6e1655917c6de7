package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's EXACT greedy overlap-fraction dedup
  * (/root/reference/src/OverlappingSegmentsUtils.jl:220,229-240):
  * candidates sorted by weight (run count) descending are accepted iff
  * their overlap fraction against EVERY already-accepted candidate is
  * below `frac`, where overlap fraction = |range intersection| /
  * min(|range a|, |range b|). This is reference-parity dedup for users
  * who need the exact greedy clustering; [[ConnectedComponents]] +
  * min-id canonicalization is the sanctioned scalable approximation
  * (the two agree on non-adversarial inputs — property-tested).
  *
  * The greedy replay is inherently sequential WITHIN a candidate group
  * (each accept depends on all prior accepts), so the distributed form
  * parallelizes ACROSS groups (one group = one reference sequence's
  * candidate set, driver-sized by the reference's own regime) via
  * flatMapGroups — one shuffle on the group key, no driver collect.
  */
object GreedyOverlapDedup {

  /** Inclusive integer interval with a ranking weight. */
  final case class Interval(id: Long, start: Int, end: Int, weight: Long)

  /** |intersection| / min(len) over inclusive integer ranges. */
  def overlapFrac(a: Interval, b: Interval): Double = {
    val common = math.min(a.end, b.end) - math.max(a.start, b.start) + 1
    if (common <= 0) 0.0
    else {
      val minLen = math.min(a.end - a.start + 1, b.end - b.start + 1)
      common.toDouble / minLen
    }
  }

  /** Greedy replay in deterministic order: weight desc, start asc,
    * id asc (the reference sorts by run count desc; the start/id keys
    * pin ties).
    */
  def greedy(cands: Seq[Interval], frac: Double): Seq[Interval] = {
    val sorted = cands.sortBy(c => (-c.weight, c.start, c.id))
    val accepted = collection.mutable.ArrayBuffer.empty[Interval]
    for (c <- sorted) {
      if (!accepted.exists(a => overlapFrac(c, a) >= frac)) accepted += c
    }
    accepted.toSeq
  }

  /** Distributed per-group replay: input rows (group, id, start, end,
    * weight); output = accepted rows, same columns. One shuffle on the
    * group key; each group replays independently.
    */
  def perGroup(spark: SparkSession, df: DataFrame, frac: Double): DataFrame = {
    import spark.implicits._
    df.select(
      df("group").cast("string"),
      df("id").cast("long"),
      df("start").cast("int"),
      df("end").cast("int"),
      df("weight").cast("long")
    ).as[(String, Long, Int, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val cands = it.map { case (_, id, s, e, w) => Interval(id, s, e, w) }.toSeq
        greedy(cands, frac).iterator.map(c => (g, c.id, c.start, c.end, c.weight))
      }
      .toDF("group", "id", "start", "end", "weight")
  }
}
