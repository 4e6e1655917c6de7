package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Materialize
import graft.sampling.Sampling
import graft.text.TextOps

/** The spark-submit entry of the mix-assembly step: a curated corpus
  * (e.g. [[RunCuration]]'s output) -> tokenizer-ready training
  * contexts. Composes the deterministic mix family end to end —
  * optional epochs-per-source upsampling, the deterministic order
  * shuffle, next-fit sequence packing over the SHUFFLED order, and
  * the assembled per-sequence texts — and writes the lineage a
  * trainer audits:
  *
  *   contexts/      (seq_id, seq_text, n_docs) — resumable bucketed
  *   assignments/   (<id>[, copy_idx], shuffle_pos, n_tokens, seq_id,
  *                  seq_offset) — which doc copy landed where
  *   mix_manifest/  one row: input/mixed/sequence counts, token
  *                  totals, max sequence tokens, mean fill fraction
  *   mix_report/    per-stratum rows/unique-docs/tokens of the mixed
  *                  stream packing consumed (written when the corpus
  *                  carries the strata column)
  *
  *   spark-submit --class graft.RunMix <jar> \
  *     --corpus <parquetDir> --out <dir> \
  *     [--id-col doc_id] [--text-col text] [--strata-col lang] \
  *     [--tokens-col C]   (precomputed token counts; default counts
  *                         whitespace tokens of the text column) \
  *     [--upsample k=v[,k=v...]] [--default-upsample F] \
  *     [--token-budget N]  (per-stratum cap in deterministic id
  *                          order, applied after upsampling — epoch
  *                          copies spend budget — and before the
  *                          shuffle) \
  *     [--max-tokens N] [--chunk-docs N] [--shuffle-buckets N] \
  *     [--sep S] [--buckets N] [--fresh]
  *
  * Packing uses `shuffle_pos` as its key: positions are contiguous
  * 0-based ranks, so the packer's id-chunks are exactly runs of the
  * training order and every context holds consecutive shuffled docs.
  * The whole composition is deterministic; it is value-pinned against
  * DuckDB as `q_mix_contexts` (shuffle rank -> recursive-CTE packing
  * walk -> string_agg), and the un-upsampled path of this entry is
  * spec-pinned digit-for-digit equal to the library composition.
  *
  * Input rows may already carry a `copy_idx` column (RunCuration's
  * --upsample output): copies then shuffle independently via a
  * hash-composite key. With neither copies nor --upsample the shuffle
  * key is the raw id. xxhash64 collisions on the composite key only
  * make the relative order of the two colliding copies tie-broken
  * arbitrarily; all other positions stay deterministic.
  *
  * Scale shape: upsampling is a map-side explode; the shuffle is the
  * bucket-histogram rank (no single-task window); packing tasks are
  * bounded by `chunkDocs`; the context assembly joins text on the
  * position key and its groups are bounded by `maxTokens` characters.
  * The contexts write goes through the bucket-ledger resumable sink,
  * and the run config is fingerprint-pinned next to the output.
  */
object RunMix {

  final case class Args(
      corpus: String = "",
      out: String = "",
      idCol: String = "doc_id",
      textCol: String = "text",
      strataCol: String = "lang",
      tokensCol: Option[String] = None,
      upsample: Map[String, Double] = Map.empty,
      defaultUpsample: Double = 1.0,
      tokenBudget: Option[Long] = None,
      maxTokens: Long = 2048L,
      chunkDocs: Int = 4096,
      shuffleBuckets: Int = 4096,
      sep: String = " ",
      buckets: Int = 32,
      fresh: Boolean = false
  )

  private def numD(flag: String, v: String): Double =
    try v.toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$flag expects a number, got '$v'") }

  private def numI(flag: String, v: String): Int =
    try v.toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$flag expects an integer, got '$v'") }

  private def numL(flag: String, v: String): Long =
    try v.toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$flag expects an integer, got '$v'") }

  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case "--corpus" :: v :: rest => parse(rest, acc.copy(corpus = v))
    case "--out" :: v :: rest => parse(rest, acc.copy(out = v))
    case "--id-col" :: v :: rest => parse(rest, acc.copy(idCol = v))
    case "--text-col" :: v :: rest => parse(rest, acc.copy(textCol = v))
    case "--strata-col" :: v :: rest => parse(rest, acc.copy(strataCol = v))
    case "--tokens-col" :: v :: rest => parse(rest, acc.copy(tokensCol = Some(v)))
    case "--upsample" :: v :: rest =>
      parse(rest, acc.copy(upsample = RunCuration.parseFactorMap("--upsample", v)))
    case "--default-upsample" :: v :: rest =>
      parse(rest, acc.copy(defaultUpsample = numD("--default-upsample", v)))
    case "--token-budget" :: v :: rest =>
      parse(rest, acc.copy(tokenBudget = Some(numL("--token-budget", v))))
    case "--max-tokens" :: v :: rest => parse(rest, acc.copy(maxTokens = numL("--max-tokens", v)))
    case "--chunk-docs" :: v :: rest => parse(rest, acc.copy(chunkDocs = numI("--chunk-docs", v)))
    case "--shuffle-buckets" :: v :: rest =>
      parse(rest, acc.copy(shuffleBuckets = numI("--shuffle-buckets", v)))
    case "--sep" :: v :: rest => parse(rest, acc.copy(sep = v))
    case "--buckets" :: v :: rest => parse(rest, acc.copy(buckets = numI("--buckets", v)))
    case "--fresh" :: rest => parse(rest, acc.copy(fresh = true))
    case Nil => acc
    case other => throw new IllegalArgumentException(s"unknown args: $other")
  }

  private[graft] def upsampleOn(a: Args): Boolean =
    a.upsample.nonEmpty || a.defaultUpsample != 1.0

  private[graft] def configFingerprint(a: Args): String = {
    val ups = a.upsample.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    Seq(
      s"corpus=${a.corpus}", s"idCol=${a.idCol}", s"textCol=${a.textCol}",
      s"strataCol=${a.strataCol}", s"tokensCol=${a.tokensCol}",
      s"upsample=$ups", s"defaultUpsample=${a.defaultUpsample}",
      s"tokenBudget=${a.tokenBudget}",
      s"maxTokens=${a.maxTokens}", s"chunkDocs=${a.chunkDocs}",
      s"shuffleBuckets=${a.shuffleBuckets}", s"sep=${a.sep}", s"buckets=${a.buckets}"
    ).mkString(";")
  }

  /** Composable core (spec-tested): assemble the mix, write contexts
    * through the resumable sink plus the assignment lineage and the
    * one-row manifest; returns (mixed rows, sequences written).
    */
  def run(spark: SparkSession, corpus: DataFrame, a: Args): (Long, Long) = {
    import spark.implicits._
    if (a.fresh) {
      val p = new org.apache.hadoop.fs.Path(a.out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    graft.util.ConfigPin.pin(spark, s"${a.out}/_mix_config.txt",
      configFingerprint(a), "pass --fresh to rebuild")

    val mixed0 =
      if (upsampleOn(a)) {
        require(corpus.columns.contains(a.strataCol),
          s"--upsample needs the strata column '${a.strataCol}' on the corpus")
        // a corpus that already carries copy_idx was upsampled upstream
        // (RunCuration --upsample); re-upsampling would overwrite the
        // copy index and mint duplicate (id, copy_idx) pairs — i.e.
        // nondeterministic positions. Epochs are applied exactly once.
        require(!corpus.columns.contains("copy_idx"),
          "corpus already carries epoch copies (copy_idx) — drop --upsample here or " +
            "re-run the upstream step without it")
        Sampling.upsample(corpus, a.strataCol, a.idCol, a.upsample, a.defaultUpsample)
      } else corpus
    val hasCopies = mixed0.columns.contains("copy_idx")
    val names = mixed0.columns.toSet
    val cKey = graft.util.Cols.fresh(names, "_mix_key")
    val cTok = a.tokensCol.getOrElse(graft.util.Cols.fresh(names + cKey, "n_tokens"))
    val withTok = mixed0.withColumn(cTok,
      if (a.tokensCol.isDefined) col(cTok).cast("long")
      else TextOps.tokenCount(col(a.textCol)).cast("long"))
    // optional per-stratum token budget ("take documents from each
    // source until its budget is spent"), in deterministic id order,
    // BEFORE the shuffle — the chunked two-phase scan, so a
    // billion-doc stratum never lands in one task
    val capped = a.tokenBudget.fold(withTok) { b =>
      require(withTok.columns.contains(a.strataCol),
        s"--token-budget needs the strata column '${a.strataCol}' on the corpus")
      Sampling.tokenBudgetCap(withTok, a.strataCol,
        if (hasCopies) Seq(a.idCol, "copy_idx") else Seq(a.idCol), cTok, b)
    }
    // shuffle key: the raw id, or a hash composite when epoch copies
    // share the id (each copy must land at its own position)
    val keyed = capped.withColumn(cKey,
      if (hasCopies) xxhash64(col(a.idCol), col("copy_idx")) else col(a.idCol).cast("long"))
    val positioned = Sampling.shufflePositions(keyed, cKey, a.shuffleBuckets).drop(cKey)

    // the packing walk + the context assembly + the manifest all read
    // the positioned plan (itself a shuffle + upsample over the whole
    // corpus): pin it once — the 100-TB equivalent is one staging
    // parquet of (id, pos, tokens) all consumers scan
    import org.apache.spark.storage.StorageLevel
    val pinned = positioned.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val assigned = Sampling
        .packSequences(pinned, "shuffle_pos", cTok, a.maxTokens, a.chunkDocs)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val contexts = Sampling
          .sequenceTextsFromAssignment(pinned, assigned, "shuffle_pos", a.textCol, a.sep)
        val seqsWritten = Materialize.writeBucketedResumable(
          spark, contexts, s"${a.out}/contexts", "seq_id", a.buckets)

        // lineage: which doc (copy) landed at which position in which
        // sequence — joined narrow on the position key
        val lineageCols =
          Seq(col(a.idCol)) ++ (if (hasCopies) Seq(col("copy_idx")) else Nil) ++
            Seq(col("shuffle_pos"))
        assigned
          .join(pinned.select(lineageCols: _*), Seq("shuffle_pos"))
          .withColumnRenamed(cTok, "n_tokens")
          .write.mode("overwrite").parquet(s"${a.out}/assignments")

        // one-row manifest over the assignment (narrow): the totals a
        // trainer sanity-checks before a run
        assigned
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("seq_id")).as("n_sequences"),
            coalesce(sum(col(cTok)), lit(0L)).as("total_tokens"),
            coalesce(max(col("seq_offset") + col(cTok)), lit(0L)).as("max_seq_tokens"))
          .withColumn("max_tokens", lit(a.maxTokens))
          .withColumn("mean_fill",
            when(col("n_sequences") > 0L,
              round(col("total_tokens") / (col("n_sequences") * lit(a.maxTokens.toDouble)), 6))
              .otherwise(lit(0.0)))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"${a.out}/mix_manifest")

        // per-stratum composition of the mixed stream (post-upsample,
        // post-budget — what packing actually consumed), when the
        // corpus carries the strata column
        if (pinned.columns.contains(a.strataCol)) {
          pinned
            .groupBy(col(a.strataCol).as("stratum"))
            .agg(
              count(lit(1)).as("n_rows"),
              countDistinct(col(a.idCol)).as("n_unique_docs"),
              coalesce(sum(col(cTok)), lit(0L)).as("n_tokens"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"${a.out}/mix_report")
        }

        System.err.println(s"[mix] wrote $seqsWritten/${a.buckets} pending context buckets")
        val mixedRows = pinned.count()
        val nSeqs = spark.read
          .schema(contexts.schema.add(Materialize.BucketCol, "int"))
          .parquet(s"${a.out}/contexts").count()
        (mixedRows, nSeqs)
      } finally assigned.unpersist()
    } finally pinned.unpersist()
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv.toList)
    require(a.corpus.nonEmpty && a.out.nonEmpty, "--corpus and --out are required")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .appName("graft-mix")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(a.corpus)
    val (mixedRows, nSeqs) = run(spark, corpus, a)
    println(s"""{"mixed_rows":$mixedRows,"sequences":$nSeqs,"out":"${a.out}"}""")
    spark.stop()
  }
}
