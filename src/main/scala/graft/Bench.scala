package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one fresh JVM per measured config (see BASELINE.md —
  * back-to-back sessions contaminate each other via GC/JIT). Prints ONE
  * JSON line. Attribution rules:
  *   - a warm-up pass scans every input table once, so the first timed
  *     query doesn't absorb scan/codegen warm-up
  *   - the KG pipeline build (the shared input of all kg_* queries) is
  *     timed as its own entry, `kg_pipeline_build`; the kg_* entries
  *     then measure only their own work over the cached graph
  *   - queries run in sorted-name order (stable across rounds)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // warm-up failures must not abort the bench — a missing table only
    // affects the queries that read it (whose timed body also catches)
    tables.foreach(t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () })

    // a query that throws must NOT read as a fast success: its entry is
    // still timed, but it lands in the errors map (and the JSON carries
    // "errors" + "n_errors" so a regression is visible in the artifact)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timed(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch {
        case e: Throwable =>
          errors(name) =
            e.getClass.getName + ": " + Option(e.getMessage).getOrElse("").take(200)
      }
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    results("kg_pipeline_build") = timed("kg_pipeline_build")(SparkEntry.prepareKg(spark, sfDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = timed(name)(fn(spark, sfDir).count())
    }

    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => jq(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jq(k) + ":" + jq(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""n_errors":${errors.size},"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // self-record the full JSON to a file as well: stdout capture has
    // been truncated mid-line by harness tails before, and ambient
    // contention spikes are easier to adjudicate against an in-repo
    // artifact written by the run itself (bench_last.json is
    // gitignored — the committed artifacts are the named BENCH_* files)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] self-record failed: $e") }
    spark.stop()
  }
}
