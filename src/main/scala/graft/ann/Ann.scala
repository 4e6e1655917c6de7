package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — the
  * correct plan when |queries| << |corpus|; the corpus is scanned once,
  * never shuffled). Scale path: sign-random-projection LSH bucketing
  * (Charikar 2002): corpus rows hash into 2^p hyperplane-sign buckets;
  * queries probe their own bucket (+ optional multi-probe neighbors),
  * turning the crossJoin into an equi-join.
  */
object Ann {

  /** Brute-force exact cosine top-k per query. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorExpressions._
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_n", vec_norm(col("q_vec")))
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_n", vec_norm(col("c_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineWithNorms(col("q_vec"), col("c_vec"), col("q_n"), col("c_n")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic random hyperplanes: component j of plane p is a
    * unit-hash-derived value in [-1, 1). Shared with
    * [[graft.dedup.Dedup.cosinePairsApprox]] so both SRP users bucket
    * identically.
    */
  private[graft] def hyperplane(seed: Long, p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(j => Hashing.toUnit(Hashing.mix3(seed, p.toLong, j.toLong)) * 2 - 1)

  /** Sign-random-projection bucket id of a vector. */
  def srpBucket(vec: Array[Float], planes: Array[Array[Double]]): Int = {
    var b = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val pl = planes(p)
      var j = 0
      while (j < vec.length && j < pl.length) { dot += vec(j) * pl(j); j += 1 }
      if (dot >= 0) b |= (1 << p)
      p += 1
    }
    b
  }

  /** LSH-bucketed ANN top-k: L independent SRP tables of p planes each
    * (the classic recall amplification: one p-plane table collides
    * near-orthogonal neighbors with prob ~cos-angle^p; L tables give
    * 1-(1-r)^L). Equi-join on (table, bucket), exact cosine within the
    * bucket, pair-dedup across tables. Cost knob: the corpus is
    * emitted L times (narrow rows); recall knob: multi-probe flips
    * each plane bit of the query's bucket.
    */
  def lshTopK(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 4,
      numTables: Int = 8,
      dim: Int = -1, // <= 0: infer from the first corpus vector
      seed: Long = 42L,
      multiProbe: Boolean = true
  ): DataFrame = {
    import spark.implicits._
    val d =
      if (dim > 0) dim
      else
        corpus.select(col(vecCol)).limit(1).as[Seq[Float]].collect()
          .headOption.map(_.length).getOrElse(1) // empty corpus -> empty result
    val pls = Array.tabulate(numTables, numPlanes)((t, p) =>
      hyperplane(seed, t * numPlanes + p, d)
    )
    val bc = spark.sparkContext.broadcast(pls)

    val c = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        bc.value.indices.iterator.map(t => (id, v, t, srpBucket(v, bc.value(t))))
      }
      .toDF("neighbor_id", "c_vec", "table", "bucket")

    val q = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        bc.value.indices.iterator.flatMap { t =>
          val b = srpBucket(v, bc.value(t))
          val probes =
            if (multiProbe) b +: Array.tabulate(numPlanes)(p => b ^ (1 << p))
            else Array(b)
          probes.distinct.iterator.map(pb => (id, v, t, pb))
        }
      }
      .toDF("query_id", "q_vec", "table", "bucket")

    import graft.functions.VectorExpressions._
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("c_vec")), 6))
      // a (query, neighbor) pair can meet in several probed buckets
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  @inline private[ann] def cosineOf(a: Array[Float], b: Array[Float]): Double = cosineArr(a, b)

  @inline private def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** IVF (inverted-file) ANN top-k: a coarse quantizer of `numLists`
    * centroids partitions the corpus into cells; queries probe their
    * `nProbe` nearest cells; exact cosine inside the probed cells.
    * Centroids are picked deterministically from the corpus (hash-
    * evenly spaced sample — k-means would sharpen cells but the
    * assignment/probe machinery is identical), broadcast to both
    * sides; the join is an equi-join on the cell id. The standard
    * FAISS-style scale path when the corpus outgrows brute force.
    */
  def ivfTopK(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numLists: Int = 16,
      nProbe: Int = 4,
      kmeansIters: Int = 0
  ): DataFrame = {
    import spark.implicits._
    val corp = corpus.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    // deterministic coarse quantizer: one centroid per hash-bucket of
    // the id space (min id per bucket -> stable under any partitioning).
    // Plan shape: min-per-cell over NARROW (cell, id) rows — map-side
    // partial agg, numLists-row shuffle — then a broadcast semi-fetch of
    // the numLists winning vectors. The previous row_number() window
    // dragged every (id, vec) row through an exchange before any real
    // work (11.7 s of the sf0.1 bench). `kmeansIters` > 0 sharpens the
    // hash-sample centroids with Lloyd iterations ([[KMeans.fit]] — one
    // narrow corpus pass each); 0 keeps the zero-extra-pass quantizer.
    val initial: Array[Array[Float]] =
      if (kmeansIters > 0) KMeans.fit(spark, corpus, idCol, vecCol, numLists, kmeansIters).centroids
      else KMeans.initCentroids(spark, corpus, idCol, vecCol, numLists)
    val centroids = initial.zipWithIndex.map { case (v, i) => (i, v) }
    val bcCent = spark.sparkContext.broadcast(centroids)

    def nearestCells(v: Array[Float], n: Int): Array[Int] =
      bcCent.value
        .map { case (cell, cv) => (cell, cosineArr(v, cv)) }
        .sortBy { case (cell, s) => (-s, cell) }
        .take(n)
        .map(_._1)

    val assigned = corp
      .map { case (id, v) => (id, v, nearestCells(v, 1).head) }
      .toDF("neighbor_id", "c_vec", "cell")

    val probes = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) => nearestCells(v, nProbe).map(c => (id, v, c)) }
      .toDF("query_id", "q_vec", "cell")

    import graft.functions.VectorExpressions._
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes
      .join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("c_vec")), 6))
      // a (query, neighbor) pair can meet in several probed buckets
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
