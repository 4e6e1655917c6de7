package graft.path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Orientation-aware segment traversal — the reference's 2N-node
  * forward/reversed encoding (/root/reference/src/PathFinder.jl:54-90):
  * a segment can be traversed forward (start -> end) or reversed
  * (end -> start); a hop (i, o) -> (j, o') exists when the point where
  * you FINISH i under o (its head) is within `tolM` meters of the point
  * where you START j under o' (its tail). The 4 head/tail combinations
  * per ordered pair are the reference's 4 endpoint-distance tests
  * (PathFinder.jl:73-88). The resulting graph is DIRECTED — reversing a
  * hop flips both orientations — so traversal uses the directed BFS.
  *
  * Node encoding: node = segId * 2 + orient (orient 0 = forward,
  * 1 = reversed), exactly the reference's 2N scheme (PathFinder.jl:61-62).
  *
  * Plan shape: endpoint rows are 2 per segment per side — narrow. The
  * candidate join bands on a tol-sized latitude cell (same
  * no-crossJoin shape as Blocks.proximitySelfJoin: explode the head
  * side into its 3 neighbor cells, equi-join, exact haversine
  * residual). Segments are canonical entities (<< records), so at any
  * realistic scale this is a small self-join; the banding keeps it
  * safe even when it isn't.
  */
object OrientedPaths {

  val Forward = 0
  val Reversed = 1

  def nodeId(segId: Long, orient: Int): Long = segId * 2 + orient
  def segOf(node: Long): Long = node / 2
  def orientOf(node: Long): Int = (node % 2).toInt

  /** Directed oriented hop edges (src, dst, dist_m) from a segment
    * endpoint table (segCol, startLatCol, startLonCol, endLatCol,
    * endLonCol). Self-hops between the two orientations of one segment
    * are excluded (the reference never chains a segment to itself,
    * PathFinder.jl:68).
    */
  def orientedEdges(
      segments: DataFrame,
      segCol: String,
      startLat: String,
      startLon: String,
      endLat: String,
      endLon: String,
      tolM: Double
  ): DataFrame = {
    val s = segments.select(
      col(segCol).cast("long").as("seg"),
      col(startLat).cast("double").as("slat"),
      col(startLon).cast("double").as("slon"),
      col(endLat).cast("double").as("elat"),
      col(endLon).cast("double").as("elon")
    )
    // head(seg, F) = end point, head(seg, R) = start point;
    // tail(seg, F) = start point, tail(seg, R) = end point
    val heads = s
      .select(col("seg").as("hseg"), (col("seg") * 2).as("src"), col("elat").as("hlat"), col("elon").as("hlon"))
      .union(s.select(col("seg"), (col("seg") * 2 + 1).as("src"), col("slat").as("hlat"), col("slon").as("hlon")))
    val tails = s
      .select(col("seg").as("tseg"), (col("seg") * 2).as("dst"), col("slat").as("tlat"), col("slon").as("tlon"))
      .union(s.select(col("seg"), (col("seg") * 2 + 1).as("dst"), col("elat").as("tlat"), col("elon").as("tlon")))

    // 1-D latitude banding at tol-sized cells: two points within tolM
    // are within one lat cell of each other, so exploding the head side
    // into its 3 neighbor cells + equi-join is recall-complete; the
    // haversine residual is exact.
    val dLat = tolM / 111320.0
    val headsBanded = heads
      .withColumn("c0", floor(col("hlat") / dLat).cast("long"))
      .withColumn("cell", explode(array(col("c0") - 1, col("c0"), col("c0") + 1)))
      .drop("c0")
    val tailsBanded = tails.withColumn("cell", floor(col("tlat") / dLat).cast("long"))

    headsBanded
      .join(tailsBanded, Seq("cell"))
      .where(col("hseg") =!= col("tseg"))
      .withColumn("dist_m", Geo.haversineMeters(col("hlat"), col("hlon"), col("tlat"), col("tlon")))
      .where(col("dist_m") <= tolM)
      .select(col("src"), col("dst"), round(col("dist_m"), 3).as("dist_m"))
      .distinct() // a pair can meet in up to 2 of the 3 probed cells
  }

  /** Orientation-aware shortest path between two segments
    * (PathFinder.jl:92-148 composed with the 2N encoding): start from
    * EITHER orientation of `fromSeg` (a virtual super-source hop),
    * finish at either orientation of `toSeg` (min dist; forward wins
    * ties). Returns the decoded (segId, orient) sequence.
    */
  def shortestOrientedPath(
      spark: SparkSession,
      orientedEdges: DataFrame,
      fromSeg: Long,
      toSeg: Long,
      maxDepth: Int = 20,
      driverLocalThreshold: Long = 1000000L
  ): Option[Seq[(Long, Int)]] = {
    import spark.implicits._
    // the virtual super-source is node -1, which is nodeId(-1, Reversed)
    // of a hypothetical segment -1 — negative seg ids would collide
    require(fromSeg >= 0 && toSeg >= 0, "segment ids must be non-negative")
    val virt = -1L
    val aug = orientedEdges
      .select(col("src").as("subj"), col("dst").as("obj"))
      .union(Seq((virt, nodeId(fromSeg, Forward)), (virt, nodeId(fromSeg, Reversed))).toDF("subj", "obj"))
    EntityPaths.bfsDispatch(spark, aug, virt, maxDepth + 1, driverLocalThreshold, directed = true) match {
      case Left(rows) =>
        // driver-local regime: target selection + parent walk happen
        // in-process — zero Spark jobs beyond the dispatch probe
        val byId = rows.map { case (id, d, p) => id -> (d, p) }.toMap
        val target = Seq(nodeId(toSeg, Forward), nodeId(toSeg, Reversed))
          .flatMap(n => byId.get(n).map(dp => (n, dp._1)))
          .sortBy { case (n, d) => (d, n) } // min dist; forward (even id) wins ties
          .headOption
        target.map { case (t, _) =>
          val path = scala.collection.mutable.ListBuffer(t)
          while (path.head != virt) path.prepend(byId(path.head)._2)
          path.toSeq.drop(1).map(n => (segOf(n), orientOf(n)))
        }
      case Right(df) =>
        val bfs = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val targets = bfs
            .where(col("id").isin(nodeId(toSeg, Forward), nodeId(toSeg, Reversed)))
            .orderBy(col("dist").asc, col("id").asc) // min dist; forward (even id) wins ties
            .limit(1)
            .collect()
          if (targets.isEmpty) None
          else {
            val path = scala.collection.mutable.ListBuffer(targets.head.getLong(0))
            while (path.head != virt) {
              val p = bfs.where(col("id") === path.head).select(col("parent")).head().getLong(0)
              if (p == virt) path.prepend(virt)
              else path.prepend(p)
            }
            Some(path.toSeq.drop(1).map(n => (segOf(n), orientOf(n))))
          }
        } finally bfs.unpersist()
    }
  }
}
