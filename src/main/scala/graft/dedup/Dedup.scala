package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.link.Linker
import graft.text.TextOps
import graft.util.Hashing

/** Deduplication suite for training-data pipelines: exact,
  * normalized-exact, MinHash-LSH near-dup, SimHash near-dup,
  * n-gram-Jaccard pair scoring, embedding-cosine near-dup. Each
  * variant keeps the same output contract: either a survivors table
  * (keep min id per group) or a pair table (id_a < id_b, score).
  *
  * Scale notes: exact dedup is one hash shuffle on the key; LSH
  * variants shuffle the (band, hash) key over the corpus (narrow rows:
  * id + signature); cosine near-dup blocks on SimHash-style
  * sign-random-projection buckets to avoid the quadratic pair space.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical key column. */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact dedup after normalization (case / punctuation / whitespace
    * folding) — catches trivially-mutated copies.
    */
  def normalizedExact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df.withColumn("_norm", TextOps.normalized(col(textCol))), idCol, "_norm")
      .drop("_norm")

  /** Word n-gram shingles of a text (the unit for Jaccard/MinHash). */
  def wordShingles(text: String, n: Int): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array(Hashing.hashString(toks.mkString(" ")))
    else (0 to toks.length - n).map(i => Hashing.hashString(toks.slice(i, i + n).mkString(" "))).distinct.toArray
  }

  /** MinHash-LSH near-duplicate pairs: texts whose word-shingle Jaccard
    * >= threshold. Blocking + exact re-scoring (no false positives;
    * recall = LSH banding recall).
    */
  def minhashNearDupPairs(
      spark: SparkSession,
      df: DataFrame, // (id, text)
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.7,
      numBands: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    import spark.implicits._
    val cfg = Linker.LshConfig(
      shingleK = shingleN,
      numBands = numBands,
      rowsPerBand = rowsPerBand,
      jaccardThreshold = threshold
    )
    val withSig = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, t) =>
          val sh = wordShingles(t, cfg.shingleK)
          (id, sh, Linker.signature(sh, cfg))
        }
      }
      .toDF("id", "sh", "sig")

    val banded = withSig
      .select(
        $"id",
        $"sh",
        explode(
          expr(
            s"transform(sequence(0, ${cfg.numBands - 1}), " +
              s"b -> struct(b as band, hash(slice(sig, b * ${cfg.rowsPerBand} + 1, ${cfg.rowsPerBand}), b) as bh))"
          )
        ).as("bk")
      )
      .select($"id", $"sh", $"bk.band", $"bk.bh")

    banded
      .select($"band", $"bh", $"id".as("id_a"), $"sh".as("sh_a"))
      .join(banded.select($"band", $"bh", $"id".as("id_b"), $"sh".as("sh_b")), Seq("band", "bh"))
      .where($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b")
      .agg(first($"sh_a").as("sh_a"), first($"sh_b").as("sh_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) => (a, b, Linker.exactJaccard(sa, sb)) }
      .toDF("id_a", "id_b", "jaccard")
      .where($"jaccard" >= cfg.jaccardThreshold)
  }

  /** Brute-force n-gram Jaccard pairs (the small-scale oracle for the
    * LSH variant; O(n^2) — test scale only).
    */
  def exactJaccardPairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double
  ): DataFrame = {
    import spark.implicits._
    val sh = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, t) => (id, wordShingles(t, shingleN)) }
      .toDF("id", "sh")
    sh.select($"id".as("id_a"), $"sh".as("sh_a"))
      .crossJoin(sh.select($"id".as("id_b"), $"sh".as("sh_b")))
      .where($"id_a" < $"id_b")
      .as[(Long, Array[Long], Long, Array[Long])]
      .map { case (a, sa, b, sb) => (a, b, Linker.exactJaccard(sa, sb)) }
      .toDF("id_a", "id_b", "jaccard")
      .where($"jaccard" >= threshold)
  }

  /** SimHash near-duplicate pairs: hamming distance <= maxBits over
    * 64-bit signatures. Blocking: split the signature into
    * (maxBits + 1) chunks — by pigeonhole, any pair within maxBits
    * agrees exactly on at least one chunk -> equi-join per chunk,
    * exact hamming residual. 100% recall, no crossJoin.
    */
  def simhashNearDupPairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBits: Int = 3
  ): DataFrame = {
    import spark.implicits._
    val chunks = maxBits + 1
    val bits = 64 / chunks
    val sigs = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, TextOps.simhash64(t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
      }
      .toDF("id", "sig")
    val banded = sigs.select(
      $"id",
      $"sig",
      explode(
        expr(
          s"transform(sequence(0, ${chunks - 1}), " +
            s"c -> struct(c as chunk, shiftright(sig, c * $bits) & ${(1L << bits) - 1} as ck))"
        )
      ).as("bk")
    ).select($"id", $"sig", $"bk.chunk", $"bk.ck")
    banded
      .select($"chunk", $"ck", $"id".as("id_a"), $"sig".as("sig_a"))
      .join(banded.select($"chunk", $"ck", $"id".as("id_b"), $"sig".as("sig_b")), Seq("chunk", "ck"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sig_a", $"sig_b")
      .distinct()
      .as[(Long, Long, Long, Long)]
      .map { case (a, b, sa, sb) => (a, b, TextOps.hamming64(sa, sb)) }
      .toDF("id_a", "id_b", "hamming")
      .where($"hamming" <= maxBits)
  }

  /** Embedding cosine near-duplicate pairs: cosine >= threshold via the
    * codegen'd VectorDot expression, norms precomputed per side BEFORE
    * the join (one array traversal per pair instead of three). Bounded
    * self-join: at test scale a crossJoin; the scale path buckets by
    * sign-random-projection first (see Ann.lshTopK).
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions._
    val a = df
      .select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
      .withColumn("n_a", vec_norm(col("v_a")))
    val b = df
      .select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
      .withColumn("n_b", vec_norm(col("v_b")))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosineWithNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")), 6))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
