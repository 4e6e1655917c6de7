package graft.path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversal over the canonical entity graph — graft of the
  * reference's segment-path BFS
  * (/root/reference/src/PathFinder.jl:92-148): adjacency from the
  * edge table, BFS distances + parent pointers, shortest-path
  * reconstruction.
  *
  * Two implementations with the same contract (dispatch mirrors
  * [[graft.canon.ConnectedComponents.run]]):
  *   - driver-local BFS for small entity graphs (the reference's own
  *     regime — segments << records; it collects the whole segment
  *     graph at PathFinder.jl:92; legitimate and exact). A limit-probe
  *     pays at most `driverLocalThreshold + 1` edge rows to decide.
  *   - iterative frontier-join BFS in DataFrames for entity graphs
  *     that don't fit a driver (10^8+ entities), one join + anti-join
  *     per level, localCheckpointed to truncate lineage.
  *
  * Determinism: both paths emit the SAME parent pointers — parent(v) =
  * the smallest neighbor id among v's distance-(d-1) predecessors — so
  * reconstructed paths are unique and cross-engine-checkable (the
  * q_bfs_path DuckDB oracle replays exactly this tie-break).
  */
object EntityPaths {

  /** Distinct adjacency from a (subj, obj) edge table — undirected by
    * default (both directions), directed when the edge table already
    * encodes direction (e.g. the oriented 2N-node segment graph,
    * [[OrientedPaths]]).
    */
  def adjacency(edges: DataFrame, directed: Boolean = false): DataFrame = {
    val fwd = edges.select(col("subj").cast("long").as("a"), col("obj").cast("long").as("b"))
    val all =
      if (directed) fwd
      else fwd.union(edges.select(col("obj").cast("long").as("a"), col("subj").cast("long").as("b")))
    all.where(col("a") =!= col("b")).distinct() // drop self-loops
  }

  /** Driver-local BFS distances + min-id parents over a collected
    * (already direction-resolved) edge list. parent(from) = from.
    */
  private def bfsLocal(edges: Array[(Long, Long)], from: Long, maxDepth: Int): Array[(Long, Int, Long)] = {
    val adj = scala.collection.mutable.LongMap.empty[scala.collection.mutable.ArrayBuffer[Long]]
    val radj = scala.collection.mutable.LongMap.empty[scala.collection.mutable.ArrayBuffer[Long]]
    for ((a, b) <- edges if a != b) {
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      radj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    val dist = scala.collection.mutable.LongMap.empty[Int]
    dist(from) = 0
    var frontier = Array(from)
    var d = 0
    while (frontier.nonEmpty && d < maxDepth) {
      d += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (u <- frontier; v <- adj.getOrElse(u, Nil) if !dist.contains(v)) {
        dist(v) = d
        next += v
      }
      frontier = next.toArray
    }
    dist.iterator.map { case (v, dv) =>
      val parent =
        if (v == from) from
        else radj(v).iterator.filter(u => dist.getOrElse(u, Int.MaxValue) == dv - 1).min
      (v, dv, parent)
    }.toArray
  }

  /** Driver-local BFS; returns the (deterministic min-parent) path as a
    * list of entity ids, or None if unreachable.
    */
  def shortestPathLocal(
      spark: SparkSession,
      edges: DataFrame,
      from: Long,
      to: Long,
      directed: Boolean = false
  ): Option[Seq[Long]] = {
    import spark.implicits._
    if (from == to) return Some(Seq(from))
    val collected = adjacency(edges, directed).as[(Long, Long)].collect()
    val rows = bfsLocal(collected, from, Int.MaxValue)
    reconstruct(rows.map { case (id, d, p) => id -> (d, p) }.toMap, from, to)
  }

  private def reconstruct(byId: Map[Long, (Int, Long)], from: Long, to: Long): Option[Seq[Long]] =
    byId.get(to).map { _ =>
      val path = scala.collection.mutable.ListBuffer(to)
      while (path.head != from) path.prepend(byId(path.head)._2)
      path.toSeq
    }

  /** BFS from `from`: returns (id, dist, parent) for every node reached
    * within maxDepth, parent = min neighbor id at dist-1 (parent(from) =
    * from). Dispatch: graphs whose edge table fits the limit-probe run
    * union-find-style on the driver (one collect — the reference's own
    * tiny-segment-graph regime, ~20 fixed Spark jobs saved); larger
    * graphs run the iterative frontier-join loop, one shuffle join +
    * anti-join per level, each level localCheckpointed.
    */
  def bfsDistances(
      spark: SparkSession,
      edges: DataFrame,
      from: Long,
      maxDepth: Int = 20,
      driverLocalThreshold: Long = 1000000L,
      directed: Boolean = false
  ): DataFrame = {
    import spark.implicits._
    bfsDispatch(spark, edges, from, maxDepth, driverLocalThreshold, directed) match {
      case Left(rows) => spark.createDataset(rows.toSeq).toDF("id", "dist", "parent")
      case Right(df)  => df
    }
  }

  /** Regime dispatch shared by [[bfsDistances]] and the path
    * reconstructions: Left = the driver-local (id, dist, parent) rows
    * (graph fit the limit-probe — the reference's own regime), Right =
    * the distributed frontier-join result. Exposing the local rows lets
    * the path walkers traverse the parent map in-process instead of
    * issuing one tiny Spark job per hop against a DataFrame that was
    * driver-sized to begin with.
    */
  private[path] def bfsDispatch(
      spark: SparkSession,
      edges: DataFrame,
      from: Long,
      maxDepth: Int,
      driverLocalThreshold: Long,
      directed: Boolean
  ): Either[Array[(Long, Int, Long)], DataFrame] = {
    import spark.implicits._
    val adj = adjacency(edges, directed).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (driverLocalThreshold > 0) {
        // limit-probe: only pay a full scan when clearly large (same
        // pattern as ConnectedComponents.run — executeTake stops early)
        val sample = adj.limit((driverLocalThreshold + 1).toInt).as[(Long, Long)].collect()
        if (sample.length <= driverLocalThreshold) {
          return Left(bfsLocal(sample, from, maxDepth))
        }
      }
      Right(bfsDistributed(spark, adj, from, maxDepth))
    } finally adj.unpersist()
  }

  private def bfsDistributed(spark: SparkSession, adj: DataFrame, from: Long, maxDepth: Int): DataFrame = {
    import spark.implicits._
    var visited = Seq((from, 0, from)).toDF("id", "dist", "parent").localCheckpoint(true)
    var frontier = visited.select($"id")
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      // every frontier node is at dist-1, so min(a) over the join IS the
      // min distance-(d-1) predecessor — the deterministic parent rule
      val next = frontier
        .join(adj, frontier("id") === adj("a"))
        .select(adj("b").as("id"), adj("a").as("parent"))
        .join(visited.select($"id"), Seq("id"), "left_anti")
        .groupBy($"id")
        .agg(min($"parent").as("parent"))
        .select($"id", lit(depth).as("dist"), $"parent")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select($"id")
      }
    }
    visited
  }

  /** Shortest path from `from` to `to` (same dispatch as
    * [[bfsDistances]]). When the BFS ran driver-local (the common
    * regime) the parent map is already in-process and the walk issues
    * ZERO further Spark jobs; in the distributed regime reconstruction
    * walks the parent pointers — at most maxDepth tiny lookups against
    * the checkpointed BFS output, never a full collect of the reached
    * set. Reference: /root/reference/src/PathFinder.jl:123-136.
    */
  def shortestPath(
      spark: SparkSession,
      edges: DataFrame,
      from: Long,
      to: Long,
      maxDepth: Int = 20,
      driverLocalThreshold: Long = 1000000L,
      directed: Boolean = false
  ): Option[Seq[Long]] = {
    if (from == to) return Some(Seq(from))
    bfsDispatch(spark, edges, from, maxDepth, driverLocalThreshold, directed) match {
      case Left(rows) =>
        reconstruct(rows.map { case (id, d, p) => id -> (d, p) }.toMap, from, to)
      case Right(df) =>
        val bfs = df.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          if (bfs.where(col("id") === to).isEmpty) None
          else {
            val path = scala.collection.mutable.ListBuffer(to)
            while (path.head != from) {
              val p = bfs.where(col("id") === path.head).select(col("parent")).head().getLong(0)
              path.prepend(p)
            }
            Some(path.toSeq)
          }
        } finally bfs.unpersist()
    }
  }

  /** Deterministic demo path: from `from` to the farthest reached node
    * (max dist, min id among ties), as (step, id) rows — step 0 = from.
    * Driver-local regime: the farthest target and the whole walk happen
    * in-process (no per-hop jobs). Distributed regime: one tiny lookup
    * per hop (path length <= maxDepth) over the persisted BFS output;
    * the path itself is driver-sized by construction (<= maxDepth + 1
    * rows).
    */
  def pathToFarthest(
      spark: SparkSession,
      edges: DataFrame,
      from: Long,
      maxDepth: Int = 20,
      driverLocalThreshold: Long = 1000000L
  ): DataFrame = {
    import spark.implicits._
    bfsDispatch(spark, edges, from, maxDepth, driverLocalThreshold, directed = false) match {
      case Left(rows) =>
        val byId = rows.map { case (id, d, p) => id -> (d, p) }.toMap
        val (tid, tdist) = rows.iterator
          .map { case (id, d, _) => (id, d) }
          .reduce((x, y) => if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x)
        val path = scala.collection.mutable.ListBuffer(tid)
        while (path.head != from) path.prepend(byId(path.head)._2)
        assert(path.length == tdist + 1, s"parent chain length ${path.length} != dist+1 ${tdist + 1}")
        spark.createDataset(path.toSeq.zipWithIndex.map { case (id, step) => (step, id) }).toDF("step", "id")
      case Right(df) =>
        val bfs = df.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val target: Row = bfs.orderBy(col("dist").desc, col("id").asc).limit(1).head()
          val tid = target.getLong(0)
          val tdist = target.getInt(1)
          val path = scala.collection.mutable.ListBuffer(tid)
          while (path.head != from) {
            val p = bfs.where(col("id") === path.head).select(col("parent")).head().getLong(0)
            path.prepend(p)
          }
          assert(path.length == tdist + 1, s"parent chain length ${path.length} != dist+1 ${tdist + 1}")
          spark.createDataset(path.toSeq.zipWithIndex.map { case (id, step) => (step, id) }).toDF("step", "id")
        } finally bfs.unpersist()
    }
  }
}
