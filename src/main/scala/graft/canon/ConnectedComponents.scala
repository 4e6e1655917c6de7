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
    * @return DataFrame (id: Long, component: Long) covering every node
    *         that appears in `edges` (callers attach singletons via a
    *         left join + coalesce).
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
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
      // to the min of the smaller neighborhood.
      val lsCanon = canonical(ls)
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
    val members = cur.select($"u".as("id"), $"v".as("component"))
    val roots = cur.select($"v".as("id"), $"v".as("component")).distinct()
    members.union(roots).distinct().persist(StorageLevel.MEMORY_AND_DISK)
  }
}
