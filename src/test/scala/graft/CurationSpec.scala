package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.pipeline.Curation
import graft.text.TextOps

class CurationSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("curate: output satisfies every stage's constraint, each stage removes something") {
    import spark.implicits._
    val all = spark.read.parquet(docs)
    val corpus = all.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))
    val eval = all.where(col("doc_id") % 20 === 0).select(col("text"))
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val out = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 20, rates, 0.1)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    assert(out.nonEmpty && out.length < corpus.count())

    // stage 1: no two survivors share a normalized text
    val normed = corpus.select(col("doc_id"), TextOps.normalized(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    val survivors = out.map(_._1).toSet
    assert(survivors.toSeq.map(normed).distinct.length == survivors.size)

    // stage 2: no survivor shares a gram with the eval slice
    val evalGrams = eval.as[String].collect().flatMap(t => Dedup.wordShingles(t, 3)).toSet
    out.foreach { case (id, t, _) =>
      assert(!Dedup.wordShingles(t, 3).exists(evalGrams.contains), s"doc $id contaminated")
    }

    // stage 3: every survivor meets the token floor
    out.foreach { case (id, t, _) =>
      assert(t.trim.split("\\s+").count(_.nonEmpty) >= 20, s"doc $id under floor")
    }

    // stage 4: every survivor's hash is under its stratum rate, and no
    // qualified doc under the rate was dropped (exact sample replay)
    def goldenHash(id: Long): Double = {
      def pmod(x: Long, m: Long): Long = ((x % m) + m) % m
      pmod(pmod(id, 2147483647L) * 1327217885L + pmod(id, 2147483629L) * 1709782614L,
        2147483647L) / 2147483647.0
    }
    out.foreach { case (id, _, lang) =>
      assert(goldenHash(id) < rates.getOrElse(lang, 0.1), s"doc $id over rate")
    }
    val preSample = Curation
      .curate(spark, corpus, eval, "doc_id", "text", "lang", "text", 20,
        Map.empty, 1.0) // rate 1.0 = no sampling
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    assert(preSample.length > out.length) // sampling removed something
    val expected = preSample.filter { case (id, lang) =>
      goldenHash(id) < rates.getOrElse(lang, 0.1)
    }.map(_._1).toSet
    assert(survivors == expected)

    // determinism under partitioning
    val again = Curation
      .curate(spark, corpus.repartition(7), eval, "doc_id", "text", "lang", "text", 20, rates, 0.1)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == survivors)
  }
}
