package graft

import graft.text.TextOps

class WinnowingSpec extends SparkSpec {

  test("winnowing: shared substrings of guarantee length share a fingerprint") {
    val k = 5
    val w = 4
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val copy = "INTRO TEXT " + base + " AND AN OUTRO"
    val fa = TextOps.winnowingFingerprints(base, k, w).toSet
    val fb = TextOps.winnowingFingerprints(copy.toUpperCase, k, w).toSet // case-folded
    // the full base string is shared and far longer than w + k - 1
    val overlap = (fa & fb).size.toDouble / fa.size
    info(f"fingerprint overlap on embedded copy: $overlap%.3f")
    assert(overlap >= 0.7)

    // unrelated texts share (almost) nothing
    val fc = TextOps.winnowingFingerprints(
      "completely different material with other words entirely unrelated content", k, w).toSet
    assert((fa & fc).size.toDouble / fa.size < 0.1)
  }

  test("winnowing: deterministic, handles degenerate inputs") {
    assert(TextOps.winnowingFingerprints("").isEmpty)
    assert(TextOps.winnowingFingerprints("ab").length == 1)
    val a = TextOps.winnowingFingerprints("some repeated text some repeated text")
    val b = TextOps.winnowingFingerprints("some repeated text some repeated text")
    assert(a.sorted.sameElements(b.sorted))
  }

  test("winnowing near-dup detection over a distributed corpus") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
    val clipped = d.map { case (id, t) =>
      (id + 500000L, t.split(" ").drop(2).mkString(" ")) // shifted copy
    }
    val fps = d.union(clipped).flatMap { case (id, t) =>
      TextOps.winnowingFingerprints(t).map(f => (id, f))
    }.toDF("id", "fp")
    // docs sharing >= 50% of the smaller side's fingerprints
    val counts = fps.groupBy($"id").count().withColumnRenamed("count", "n")
    val shared = fps.as("a").join(fps.as("b"), Seq("fp"))
      .where($"a.id" < $"b.id")
      .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"))
      .count()
    val pairs = shared
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .where($"count" >= org.apache.spark.sql.functions.least($"n_a", $"n_b") * 0.8)
      .select($"id_a", $"id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val nDocs = d.count()
    // every (doc, shifted copy) pair must be detected. Cross-doc pairs
    // are allowed: the driver's synthetic docs draw from a ~20-word
    // vocabulary, so unrelated docs genuinely share long substrings.
    val want = (0L until nDocs).map(i => (i, i + 500000L)).toSet
    assert(want.subsetOf(pairs), s"missed copies: ${(want -- pairs).take(5)}")
  }
}
