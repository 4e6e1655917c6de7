package graft

import org.apache.spark.sql.functions._

import graft.graph.Materialize
import graft.kg.Dictionary
import graft.pipeline.KGPipeline
import graft.synth.{GenConfig, TranscriptGen}
import graft.viz.VizPrep

class EndToEndSpec extends SparkSpec {

  test("pipeline -> materialize -> manifest: counts line up; resume after partial write") {
    import spark.implicits._
    val cfg = GenConfig(seed = 5L, numConvs = 40, numEntities = 30)
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    val res = KGPipeline.run(spark, TranscriptGen.transcripts(spark, cfg), dict)
    val edges = res.edges.toDF().cache()
    val nEdges = edges.count()
    assert(nEdges > 0)

    val out = java.nio.file.Files.createTempDirectory("graft_e2e").toString

    // simulate an interrupted first write: only half the buckets' convs
    val firstHalf = edges.where(pmod(xxhash64($"conv_id"), lit(8)) < 4)
    Materialize.writeEdges(spark, firstHalf, out, numBuckets = 8)
    val ledger1 = Materialize.completedBuckets(spark, out).count()
    assert(ledger1 == 4) // only 4 buckets had data

    // resume with the FULL edge set: completed buckets skipped,
    // missing buckets written; final content == full edge set
    val written2 = Materialize.writeEdges(spark, edges, out, numBuckets = 8)
    assert(written2 == 4)
    Materialize.writeVertices(res.vertices.toDF(), out)
    val (v, e) = Materialize.stats(spark, out)
    assert(e == nEdges)
    assert(v == res.vertices.count())

    // written rows match the pipeline's edge multiset exactly
    val back = spark.read.parquet(s"$out/edges")
      .select($"subj", $"pred", $"obj", $"conv_id", $"turn_idx")
      .as[(Long, String, Long, String, Int)]
      .collect()
      .sorted
    val mem = edges
      .select($"subj", $"pred", $"obj", $"conv_id", $"turn_idx")
      .as[(Long, String, Long, String, Int)]
      .collect()
      .sorted
    assert(back.sameElements(mem))

    // manifest reflects the snapshot
    val manifestPath = Materialize.writeManifest(spark, out)
    val json = scala.io.Source.fromFile(manifestPath.replace("file:", "")).mkString
    assert(json.contains(s""""edges_rows":$nEdges"""))
    assert(json.contains(""""files":["""))

    // CSV sink round-trips row count
    Materialize.writeCsv(res.vertices.toDF().select($"entity_id", $"type"), s"$out/vertices_csv")
    assert(spark.read.option("header", "true").csv(s"$out/vertices_csv").count() == v)
  }

  test("RunPipeline: spark-submit entry runs end-to-end and resumes as a no-op") {
    val cfg = GenConfig(seed = 9L, numConvs = 30, numEntities = 25)
    val dict = Dictionary.build(cfg.seed, cfg.numEntities)
    val turns = TranscriptGen.transcripts(spark, cfg)
    val out = java.nio.file.Files.createTempDirectory("graft_runpipe").toString

    val (v1, e1, w1) = RunPipeline.run(spark, turns, dict, out, numBuckets = 8)
    assert(v1 > 0 && e1 > 0 && w1 > 0)
    // restart with identical input: every bucket is in the lineage
    // ledger -> zero buckets rewritten, identical table contents
    val (v2, e2, w2) = RunPipeline.run(spark, turns, dict, out, numBuckets = 8)
    assert(w2 == 0 && v2 == v1 && e2 == e1)
    // arg parsing round-trip
    val a = RunPipeline.parse(List("--synth", "100:40", "--out", "/x", "--buckets", "16"))
    assert(a.synth.contains((100, 40)) && a.out == "/x" && a.buckets == 16)
  }

  test("driver contract: entry() smoke returns rows; queries/oracle keys align") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle key must have a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("geojson viz-prep renders ordered linestrings per session") {
    import spark.implicits._
    val rows = Seq(
      ("a", 2, 3.0, 4.0), ("a", 1, 1.0, 2.0), ("a", 3, 5.0, 6.0),
      ("b", 1, 0.5, 0.5)
    ).toDF("sess", "ord", "x", "y")
    val out = VizPrep
      .geoJsonLines(rows, "sess", Seq("ord"), "x", "y")
      .as[(String, Int, String)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(out("a")._2 == 3)
    assert(out("a")._3.contains("[1.0,2.0],[3.0,4.0],[5.0,6.0]")) // order respected
    assert(out("b")._3.contains("\"type\":\"LineString\""))
  }

  test("leaflet viewer shell: index.html + one FeatureCollection per session, capped + deterministic") {
    import spark.implicits._
    val rows = Seq(
      ("a", 2, 3.0, 4.0), ("a", 1, 1.0, 2.0),
      ("b", 1, 0.5, 0.5), ("b", 2, 0.7, 0.9),
      ("c", 1, 9.0, 9.0), ("c", 2, 9.5, 9.5)
    ).toDF("sess", "ord", "x", "y")
    val out = java.nio.file.Files.createTempDirectory("graft_leaflet").toString
    // maxSessions=2 keeps sessions a and b (ascending key), drops c
    val n = VizPrep.writeLeafletViewer(spark, rows, "sess", Seq("ord"), "x", "y", out, maxSessions = 2)
    assert(n == 2)
    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "index.html")))
    assert(html.contains("leaflet@1.9.4") && html.contains("setView"))
    assert(html.contains("geojson/a.geojson") && html.contains("geojson/b.geojson"))
    assert(!html.contains("geojson/c.geojson"))
    val fcA = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "geojson", "a.geojson")))
    assert(fcA.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(fcA.contains("[1.0,2.0],[3.0,4.0]")) // ordered linestring inside
    // center = bbox midpoint over ALL points (c included in extent):
    // x and y both span [0.5, 9.5] -> center (5.0, 5.0)
    assert(html.contains("setView([5.0, 5.0]"), html.split("\n").find(_.contains("setView")).mkString)
  }
}
