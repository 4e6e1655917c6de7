package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Curation
import graft.pipeline.Curation.NearDupStage

/** The spark-submit entry of the training-corpus curation recipe:
  * corpus + held-out eval slice -> curated corpus parquet, plus the
  * audit tables a data owner wants next to the mix (the contamination
  * report, and the per-doc span profile when the boilerplate stage is
  * on).
  *
  *   spark-submit --class graft.RunCuration <jar> \
  *     --docs <parquetDir> --eval <parquetDir> --out <dir> \
  *     [--min-tokens N] [--quality-floor F] \
  *     [--neardup exact:<t> | lsh:<t>] [--max-dup-fraction F] \
  *     [--shingle-n N] [--span-shingle-n N] [--span-min-df N] \\
  *     [--rates en=0.5,zh=0.25] [--default-rate F] [--redact]
  *
  * Input contract: corpus table with (doc_id long, text string,
  * <strata> string, ...); eval table with (text string). Column names
  * override via --id-col/--text-col/--strata-col/--eval-text-col.
  * The curated corpus is written partitioned by the strata column
  * (the mix consumer reads one stratum at a time); the decontam
  * report is the narrow (id, n_shared_grams) audit table.
  */
object RunCuration {

  final case class Args(
      docs: String = "",
      eval: String = "",
      out: String = "",
      idCol: String = "doc_id",
      textCol: String = "text",
      strataCol: String = "lang",
      evalTextCol: String = "text",
      minTokens: Int = 0,
      qualityFloor: Option[Double] = None,
      nearDup: NearDupStage = NearDupStage.Off,
      maxDupFraction: Option[Double] = None,
      shingleN: Int = 13,
      spanShingleN: Int = 6,
      spanMinDf: Int = 2,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      redact: Boolean = false
  )

  private def numD(flag: String, v: String): Double =
    try v.toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$flag expects a number, got '$v'") }

  private def numI(flag: String, v: String): Int =
    try v.toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$flag expects an integer, got '$v'") }

  def parseNearDup(v: String): NearDupStage = v.split(":", 2) match {
    case Array("off") => NearDupStage.Off
    case Array("exact", t) => NearDupStage.ExactJaccard(numD("--neardup exact", t))
    case Array("lsh", t) => NearDupStage.MinHashLsh(numD("--neardup lsh", t))
    case _ =>
      throw new IllegalArgumentException(
        s"--neardup expects off | exact:<threshold> | lsh:<threshold>, got '$v'")
  }

  def parseRates(v: String): Map[String, Double] =
    v.split(",").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, r) => k -> numD("--rates", r)
        case _ => throw new IllegalArgumentException(s"--rates expects k=v[,k=v...], got '$kv'")
      }
    }.toMap

  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case "--docs" :: v :: rest => parse(rest, acc.copy(docs = v))
    case "--eval" :: v :: rest => parse(rest, acc.copy(eval = v))
    case "--out" :: v :: rest => parse(rest, acc.copy(out = v))
    case "--id-col" :: v :: rest => parse(rest, acc.copy(idCol = v))
    case "--text-col" :: v :: rest => parse(rest, acc.copy(textCol = v))
    case "--strata-col" :: v :: rest => parse(rest, acc.copy(strataCol = v))
    case "--eval-text-col" :: v :: rest => parse(rest, acc.copy(evalTextCol = v))
    case "--min-tokens" :: v :: rest => parse(rest, acc.copy(minTokens = numI("--min-tokens", v)))
    case "--quality-floor" :: v :: rest =>
      parse(rest, acc.copy(qualityFloor = Some(numD("--quality-floor", v))))
    case "--neardup" :: v :: rest => parse(rest, acc.copy(nearDup = parseNearDup(v)))
    case "--max-dup-fraction" :: v :: rest =>
      parse(rest, acc.copy(maxDupFraction = Some(numD("--max-dup-fraction", v))))
    case "--shingle-n" :: v :: rest => parse(rest, acc.copy(shingleN = numI("--shingle-n", v)))
    case "--span-shingle-n" :: v :: rest =>
      parse(rest, acc.copy(spanShingleN = numI("--span-shingle-n", v)))
    case "--span-min-df" :: v :: rest =>
      parse(rest, acc.copy(spanMinDf = numI("--span-min-df", v)))
    case "--rates" :: v :: rest => parse(rest, acc.copy(rates = parseRates(v)))
    case "--default-rate" :: v :: rest =>
      parse(rest, acc.copy(defaultRate = numD("--default-rate", v)))
    case "--redact" :: rest => parse(rest, acc.copy(redact = true))
    case Nil => acc
    case other => throw new IllegalArgumentException(s"unknown args: $other")
  }

  /** Composable core (spec-tested): curate, write the partitioned
    * corpus + the decontam audit report (+ span profile when the
    * boilerplate stage is on), return (input, curated) counts.
    */
  def run(spark: SparkSession, docs: DataFrame, eval: DataFrame, a: Args): (Long, Long) = {
    val staged = Curation.curateStaged(
      spark, docs, eval,
      a.idCol, a.textCol, a.strataCol, a.evalTextCol,
      a.minTokens, a.rates, a.defaultRate, a.shingleN,
      a.nearDup, a.qualityFloor, a.maxDupFraction, a.spanShingleN, a.spanMinDf)
    // three writes consume the staged plans; without pinning, EACH
    // action would replay the dedup + near-dup pair join (the dominant
    // cost) from scratch. Persist the post-near-dup corpus (the shared
    // expensive prefix) and the two small audit tables; at the
    // 100-TB point the equivalent is one staging parquet of
    // afterNearDup that all three writes scan.
    import org.apache.spark.storage.StorageLevel
    val pinned = staged.afterNearDup.persist(StorageLevel.MEMORY_AND_DISK) ::
      staged.contaminationReport.persist(StorageLevel.MEMORY_AND_DISK) ::
      staged.spanProfile.map(_.persist(StorageLevel.MEMORY_AND_DISK)).toList
    try {
      // PII scrubbing runs LAST, on the shipped mix only (earlier
      // stages must see the original text so dedup/decontam semantics
      // match their oracles)
      val shipped =
        if (a.redact) staged.sampled.withColumn(a.textCol, graft.text.Redact.redact(col(a.textCol)))
        else staged.sampled
      shipped.write.mode("overwrite").partitionBy(a.strataCol).parquet(s"${a.out}/corpus")

      // audit tables are the EXACT (persisted) plans the stages
      // thresholded — the report the anti-join consumed, the span
      // profile the cap read; an audit computed over a different
      // corpus could contradict the drop decisions it explains
      staged.contaminationReport
        .write.mode("overwrite").parquet(s"${a.out}/decontam_report")
      staged.spanProfile.foreach(
        _.write.mode("overwrite").parquet(s"${a.out}/span_stats"))
    } finally pinned.foreach(_.unpersist())

    val in = docs.count()
    val outN = spark.read.parquet(s"${a.out}/corpus").count()
    (in, outN)
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv.toList)
    require(a.docs.nonEmpty && a.eval.nonEmpty && a.out.nonEmpty,
      "--docs, --eval and --out are required")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .appName("graft-curation")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(a.docs)
    val eval = spark.read.parquet(a.eval)
    val (in, out) = run(spark, docs, eval, a)
    println(s"""{"input_docs":$in,"curated_docs":$out,"out":"${a.out}"}""")
    spark.stop()
  }
}
