package graft.path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversal over the canonical entity graph — graft of the
  * reference's segment-path BFS
  * (/root/reference/src/PathFinder.jl:92-148): adjacency from the
  * edge table, BFS shortest path between two entities.
  *
  * Two implementations with the same contract:
  *   - driver-local BFS for small entity graphs (the reference's own
  *     regime — segments << records; legitimate and exact)
  *   - iterative frontier-join BFS in DataFrames for entity graphs
  *     that don't fit a driver (10^8+ entities), checkpoint-friendly
  */
object EntityPaths {

  /** Distinct undirected adjacency from a (subj, obj) edge table. */
  def adjacency(edges: DataFrame): DataFrame =
    edges
      .select(col("subj").cast("long").as("a"), col("obj").cast("long").as("b"))
      .union(edges.select(col("obj").cast("long").as("a"), col("subj").cast("long").as("b")))
      .where(col("a") =!= col("b")) // after the union: both orientations drop self-loops
      .distinct()

  /** Driver-local BFS; returns the path (list of entity ids) or None. */
  def shortestPathLocal(spark: SparkSession, edges: DataFrame, from: Long, to: Long): Option[Seq[Long]] = {
    import spark.implicits._
    if (from == to) return Some(Seq(from))
    val adj = adjacency(edges).as[(Long, Long)].collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val parent = scala.collection.mutable.LongMap.empty[Long]
    val queue = scala.collection.mutable.Queue(from)
    parent(from) = from
    while (queue.nonEmpty && !parent.contains(to)) {
      val u = queue.dequeue()
      for (v <- adj.getOrElse(u, Array.empty[Long]) if !parent.contains(v)) {
        parent(v) = u
        queue += v
      }
    }
    if (!parent.contains(to)) None
    else {
      val path = scala.collection.mutable.ListBuffer(to)
      while (path.head != from) path.prepend(parent(path.head))
      Some(path.toSeq)
    }
  }

  /** Distributed BFS: iterative frontier expansion via join; returns
    * (id, dist, parent) for every reached node up to maxDepth. Each
    * round is one broadcast-or-shuffle join + anti-join; frontiers are
    * localCheckpointed to truncate lineage (same pattern as CC).
    */
  def bfsDistances(
      spark: SparkSession,
      edges: DataFrame,
      from: Long,
      maxDepth: Int = 20
  ): DataFrame = {
    import spark.implicits._
    val adj = adjacency(edges).persist(StorageLevel.MEMORY_AND_DISK)
    var visited = Seq((from, 0)).toDF("id", "dist").localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      val next = frontier
        .join(adj, frontier("id") === adj("a"))
        .select(adj("b").as("id"))
        .distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next
      }
    }
    adj.unpersist()
    visited
  }
}
