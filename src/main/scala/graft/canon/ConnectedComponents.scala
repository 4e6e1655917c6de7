package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components via alternating large-star / small-star
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii: "Connected
  * Components in MapReduce and Beyond", SoCC 2014) — the algorithm the
  * north_star names for entity canonicalization. Pure DataFrame ops:
  * each round is a groupBy(min) + join + union; no collect_list, so a
  * 10^9-member component never materializes a neighbor list in one
  * task (the usual OOM of naive label propagation).
  *
  * Graft of the reference's greedy overlap dedup
  * (/root/reference/src/OverlappingSegmentsUtils.jl:229-240): clusters
  * of the "same entity" relation, canonical id = min member id.
  *
  * Each iteration localCheckpoints to truncate lineage (north_rule:
  * checkpointed iterations).
  */
object ConnectedComponents {

  /** @param edges DataFrame with long columns (src, dst), undirected.
    * @param driverLocalThreshold below this edge count the graph is
    *        union-found on the driver (one collect instead of ~7
    *        shuffle stages x N iterations — the reference's legitimate
    *        tiny-graph-on-driver pattern, cf. BFS at
    *        /root/reference/src/PathFinder.jl:92-148). The distributed
    *        large-star/small-star path is the 10^9-edge route; both are
    *        property-tested to agree.
    * @return DataFrame (id: Long, component: Long) covering every node
    *         that appears in `edges` (callers attach singletons via a
    *         left join + coalesce).
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      maxIter: Int = 50,
      driverLocalThreshold: Long = 1000000L
  ): DataFrame = {
    import spark.implicits._

    // persist: the probe and the iteration loop both consume the edge
    // set, and executeTake's incremental rounds would otherwise re-run
    // the (possibly expensive) upstream DAG several times
    val edgePairs = edges
      .selectExpr("cast(src as long) src", "cast(dst as long) dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (driverLocalThreshold > 0) {
        // limit-probe: only pay a full scan when clearly large
        val sample = edgePairs.limit((driverLocalThreshold + 1).toInt).as[(Long, Long)].collect()
        if (sample.length <= driverLocalThreshold) {
          return runDriverLocal(spark, sample)
        }
      }
      runDistributed(spark, edgePairs, maxIter)
    } finally edgePairs.unpersist()
  }

  /** Weighted-union union-find on the driver. */
  private def runDriverLocal(spark: SparkSession, edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges if a != b) {
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    val nodes = edges.iterator.flatMap { case (a, b) => Iterator(a, b) }.toArray.distinct
    spark.createDataset(nodes.map(n => (n, find(n))).toSeq).toDF("id", "component")
  }

  private def runDistributed(spark: SparkSession, edges: DataFrame, maxIter: Int): DataFrame = {
    import spark.implicits._

    def canonical(e: DataFrame): DataFrame =
      e.select(
        least($"src", $"dst").as("src2"),
        greatest($"src", $"dst").as("dst2")
      ).where($"src2" =!= $"dst2")
        .select($"dst2".as("u"), $"src2".as("v")) // orient u > v
        .distinct()

    // edge set fingerprint for the convergence check: cheap aggregate,
    // no except() shuffle-diff of two full edge sets
    def fingerprint(e: DataFrame): (Long, Long) = {
      val row = e
        .agg(
          count(lit(1)).as("c"),
          coalesce(bit_xor(xxhash64($"u", $"v")), lit(0L)).as("h")
        )
        .head()
      (row.getLong(0), row.getLong(1))
    }

    var cur = canonical(edges).localCheckpoint(true)
    var fp = fingerprint(cur)
    var iter = 0
    var done = cur.isEmpty

    while (!done && iter < maxIter) {
      // ---- large-star: connect strictly-larger neighbors to the min.
      val sym = cur
        .select($"u".as("a"), $"v".as("b"))
        .union(cur.select($"v".as("a"), $"u".as("b")))
      val mins = sym.groupBy($"a").agg(min($"b").as("mb"))
      val ls = sym
        .join(mins, "a")
        .select($"b".as("n"), least($"a", $"mb").as("m"), $"a")
        .where($"n" > $"a")
        .select($"n".as("src"), $"m".as("dst"))

      // ---- small-star: connect smaller-or-equal neighbors (and self)
      // to the min of the smaller neighborhood. Large-star output is
      // already oriented (n > a >= m) — rename only, no re-canonical
      // shuffle; duplicates are folded by the end-of-iteration distinct.
      val lsCanon = ls.select($"src".as("u"), $"dst".as("v")).where($"u" =!= $"v")
      val sMins = lsCanon.groupBy($"u").agg(min($"v").as("m"))
      val ss = lsCanon
        .join(sMins, "u")
        .select($"v".as("n"), $"m")
        .union(sMins.select($"u".as("n"), $"m"))
        .where($"n" =!= $"m")
        .select($"n".as("u"), $"m".as("v"))
        .distinct()

      val next = ss.localCheckpoint(true)
      val nfp = fingerprint(next)
      done = nfp == fp || next.isEmpty
      fp = nfp
      cur = next
      iter += 1
    }

    // At fixpoint every edge is (member -> root). Roots map to themselves.
    // Returned UNPERSISTED: `cur` is an eager localCheckpoint, so each
    // action re-runs only the final union+distinct; callers that consume
    // the mapping repeatedly own (and can release) their own persist —
    // a persist here leaked executor storage across repeated CC runs.
    val members = cur.select($"u".as("id"), $"v".as("component"))
    val roots = cur.select($"v".as("id"), $"v".as("component")).distinct()
    members.union(roots).distinct()
  }
}
