package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Materialize
import graft.pipeline.Curation
import graft.pipeline.Curation.{NearDupStage, SpanAction}

/** The spark-submit entry of the training-corpus curation recipe:
  * corpus + held-out eval slice -> curated corpus parquet, plus the
  * audit tables a data owner wants next to the mix (the contamination
  * report, the per-doc span profile when the boilerplate stage is on,
  * the near-dup pair/cluster tables when that stage is on, the
  * common-line table when the line-dedup stage is on, the
  * per-rule gopher flag counts when a repetition-rule stage is on —
  * word family and/or line family, one report table each — and the
  * pre/post PII counts when redaction is on).
  *
  *   spark-submit --class graft.RunCuration <jar> \
  *     --docs <parquetDir> --eval <parquetDir> --out <dir> \
  *     [--min-tokens N] [--quality-floor F] \
  *     [--neardup exact:<t>[:<shingleN>] | lsh:<t>[:<shingleN>[:<bands>:<rows>]]] \
  *     [--max-dup-fraction F] [--span-action drop|cut] \
  *     [--gopher default | k=v[,k=v...]] \
  *     [--gopher-lines default | k=v[,k=v...]] \
  *     [--gopher-ngrams default | top-N=v,dup-N=v[,...]] \
  *     [--line-dedup <minDf>] \
  *     [--shingle-n N] [--span-shingle-n N] [--span-min-df N] \
  *     [--rates en=0.5,zh=0.25] [--default-rate F] \
  *     [--upsample en=2.5,code=4] [--default-upsample F] [--redact] \
  *     [--buckets N] [--fresh]
  *
  * Input contract: corpus table with (doc_id long, text string,
  * <strata> string, ...); eval table with (text string). Column names
  * override via --id-col/--text-col/--strata-col/--eval-text-col.
  * The curated corpus is written partitioned by the strata column
  * (the mix consumer reads one stratum at a time) THROUGH the
  * bucket-ledger resumable sink ([[Materialize.writeBucketedResumable]]):
  * a killed run re-invoked with the same arguments skips its completed
  * buckets and finishes the rest — at the 100-TB point that is the
  * difference between resuming and restarting. Resume assumes the SAME
  * input and flags; pass --fresh to clear a stale output dir first.
  *
  * --upsample is the epochs-per-source mix knob
  * ([[graft.sampling.Sampling.upsample]]): the SHIPPED corpus carries
  * floor(factor) copies of every surviving doc in that stratum plus a
  * coin-gated extra for the fractional part (rows gain a `copy_idx`
  * column). It runs AFTER sampling and redaction, so audits that read
  * per-document decisions (decontam/span/gopher/neardup) are
  * copy-free while mix_report and the PII pre/post counts see the
  * shipped multiset. Note --rates and --upsample share the same
  * deterministic id coin: a stratum sampled at rate r and upsampled
  * with fractional part f picks correlated subsets by construction —
  * use rates to shrink a stratum (< 1 epoch) and factors to grow one
  * (> 1 epoch), not both on the same stratum.
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
      spanAction: SpanAction = SpanAction.DropDocs,
      gopher: Option[Curation.GopherRules] = None,
      gopherLines: Option[Curation.GopherLineRules] = None,
      gopherNgrams: Option[Curation.GopherNgramRules] = None,
      lineDedupMinDf: Option[Int] = None,
      shingleN: Int = 13,
      spanShingleN: Int = 6,
      spanMinDf: Int = 2,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      upsample: Map[String, Double] = Map.empty,
      defaultUpsample: Double = 1.0,
      redact: Boolean = false,
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

  /** `exact:<t>[:<shingleN>]` or `lsh:<t>[:<shingleN>[:<bands>:<rows>]]`
    * — the banding geometry is the knob that trades LSH recall for
    * cost, so it belongs on the CLI, not buried in a default.
    */
  def parseNearDup(v: String): NearDupStage = v.split(":") match {
    case Array("off") => NearDupStage.Off
    case Array("exact", t) => NearDupStage.ExactJaccard(numD("--neardup exact", t))
    case Array("exact", t, n) =>
      NearDupStage.ExactJaccard(numD("--neardup exact", t), numI("--neardup exact shingleN", n))
    case Array("lsh", t) => NearDupStage.MinHashLsh(numD("--neardup lsh", t))
    case Array("lsh", t, n) =>
      NearDupStage.MinHashLsh(numD("--neardup lsh", t), numI("--neardup lsh shingleN", n))
    case Array("lsh", t, n, bands, rows) =>
      NearDupStage.MinHashLsh(
        numD("--neardup lsh", t), numI("--neardup lsh shingleN", n),
        numI("--neardup lsh bands", bands), numI("--neardup lsh rows", rows))
    case _ =>
      throw new IllegalArgumentException(
        "--neardup expects off | exact:<t>[:<shingleN>] | lsh:<t>[:<shingleN>[:<bands>:<rows>]], " +
          s"got '$v'")
  }

  def parseSpanAction(v: String): SpanAction = v match {
    case "drop" => SpanAction.DropDocs
    case "cut" => SpanAction.CutSpans
    case _ => throw new IllegalArgumentException(s"--span-action expects drop | cut, got '$v'")
  }

  /** `default` for the stock thresholds, or `k=v[,k=v...]` overriding
    * them (keys: min-words, max-words, min-mean-word-len,
    * max-mean-word-len, min-alpha-fraction, max-dup-unit-fraction,
    * max-top-ngram-fraction); unknown keys fail fast.
    */
  def parseGopher(v: String): Curation.GopherRules =
    if (v == "default") Curation.GopherRules()
    else
      v.split(",").filter(_.nonEmpty).foldLeft(Curation.GopherRules()) { (r, kv) =>
        kv.split("=", 2) match {
          case Array("min-words", x) => r.copy(minWords = numI("--gopher min-words", x))
          case Array("max-words", x) => r.copy(maxWords = numI("--gopher max-words", x))
          case Array("min-mean-word-len", x) =>
            r.copy(minMeanWordLen = numD("--gopher min-mean-word-len", x))
          case Array("max-mean-word-len", x) =>
            r.copy(maxMeanWordLen = numD("--gopher max-mean-word-len", x))
          case Array("min-alpha-fraction", x) =>
            r.copy(minAlphaWordFraction = numD("--gopher min-alpha-fraction", x))
          case Array("max-dup-unit-fraction", x) =>
            r.copy(maxDupUnitFraction = numD("--gopher max-dup-unit-fraction", x))
          case Array("max-top-ngram-fraction", x) =>
            r.copy(maxTopNgramCharFraction = numD("--gopher max-top-ngram-fraction", x))
          case _ => throw new IllegalArgumentException(
            s"--gopher expects default | k=v[,k=v...] with known keys, got '$kv'")
        }
      }

  /** `default` for the stock line-rule thresholds, or `k=v[,k=v...]`
    * overriding them (keys: max-dup-line-fraction,
    * max-dup-line-char-fraction, max-bullet-fraction,
    * max-ellipsis-fraction); unknown keys fail fast.
    */
  def parseGopherLines(v: String): Curation.GopherLineRules =
    if (v == "default") Curation.GopherLineRules()
    else
      v.split(",").filter(_.nonEmpty).foldLeft(Curation.GopherLineRules()) { (r, kv) =>
        kv.split("=", 2) match {
          case Array("max-dup-line-fraction", x) =>
            r.copy(maxDupLineFraction = numD("--gopher-lines max-dup-line-fraction", x))
          case Array("max-dup-line-char-fraction", x) =>
            r.copy(maxDupLineCharFraction = numD("--gopher-lines max-dup-line-char-fraction", x))
          case Array("max-bullet-fraction", x) =>
            r.copy(maxBulletLineFraction = numD("--gopher-lines max-bullet-fraction", x))
          case Array("max-ellipsis-fraction", x) =>
            r.copy(maxEllipsisLineFraction = numD("--gopher-lines max-ellipsis-fraction", x))
          case _ => throw new IllegalArgumentException(
            s"--gopher-lines expects default | k=v[,k=v...] with known keys, got '$kv'")
        }
      }

  /** `default` for the published Table A1 caps, or `k=v[,k=v...]`
    * overriding individual caps (keys: `top-2..top-4`, `dup-5..dup-10`);
    * unknown keys or n outside the family fail fast.
    */
  def parseGopherNgrams(v: String): Curation.GopherNgramRules =
    if (v == "default") Curation.GopherNgramRules()
    else
      v.split(",").filter(_.nonEmpty).foldLeft(Curation.GopherNgramRules()) { (r, kv) =>
        kv.split("=", 2) match {
          case Array(k, x) if k.startsWith("top-") =>
            val n = numI("--gopher-ngrams top-n", k.stripPrefix("top-"))
            if (!r.topCaps.contains(n))
              throw new IllegalArgumentException(s"--gopher-ngrams: unknown top n '$k' (2..4)")
            r.copy(topCaps = r.topCaps.updated(n, numD(s"--gopher-ngrams $k", x)))
          case Array(k, x) if k.startsWith("dup-") =>
            val n = numI("--gopher-ngrams dup-n", k.stripPrefix("dup-"))
            if (!r.dupCaps.contains(n))
              throw new IllegalArgumentException(s"--gopher-ngrams: unknown dup n '$k' (5..10)")
            r.copy(dupCaps = r.dupCaps.updated(n, numD(s"--gopher-ngrams $k", x)))
          case _ => throw new IllegalArgumentException(
            s"--gopher-ngrams expects default | k=v[,k=v...] with top-N/dup-N keys, got '$kv'")
        }
      }

  def parseRates(v: String): Map[String, Double] = parseFactorMap("--rates", v)

  private[graft] def parseFactorMap(flag: String, v: String): Map[String, Double] =
    v.split(",").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, r) => k -> numD(flag, r)
        case _ => throw new IllegalArgumentException(s"$flag expects k=v[,k=v...], got '$kv'")
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
    case "--span-action" :: v :: rest => parse(rest, acc.copy(spanAction = parseSpanAction(v)))
    case "--gopher" :: v :: rest => parse(rest, acc.copy(gopher = Some(parseGopher(v))))
    case "--gopher-lines" :: v :: rest =>
      parse(rest, acc.copy(gopherLines = Some(parseGopherLines(v))))
    case "--gopher-ngrams" :: v :: rest =>
      parse(rest, acc.copy(gopherNgrams = Some(parseGopherNgrams(v))))
    case "--line-dedup" :: v :: rest =>
      val m = numI("--line-dedup", v)
      // minDf=1 marks EVERY non-empty line common and blanks the whole
      // corpus — fail fast instead of shipping an empty mix
      if (m < 2) throw new IllegalArgumentException(
        s"--line-dedup expects minDf >= 2 (got $m): every line has df >= 1")
      parse(rest, acc.copy(lineDedupMinDf = Some(m)))
    case "--shingle-n" :: v :: rest => parse(rest, acc.copy(shingleN = numI("--shingle-n", v)))
    case "--span-shingle-n" :: v :: rest =>
      parse(rest, acc.copy(spanShingleN = numI("--span-shingle-n", v)))
    case "--span-min-df" :: v :: rest =>
      parse(rest, acc.copy(spanMinDf = numI("--span-min-df", v)))
    case "--rates" :: v :: rest => parse(rest, acc.copy(rates = parseRates(v)))
    case "--default-rate" :: v :: rest =>
      parse(rest, acc.copy(defaultRate = numD("--default-rate", v)))
    case "--upsample" :: v :: rest =>
      parse(rest, acc.copy(upsample = parseFactorMap("--upsample", v)))
    case "--default-upsample" :: v :: rest =>
      parse(rest, acc.copy(defaultUpsample = numD("--default-upsample", v)))
    case "--redact" :: rest => parse(rest, acc.copy(redact = true))
    case "--buckets" :: v :: rest => parse(rest, acc.copy(buckets = numI("--buckets", v)))
    case "--fresh" :: rest => parse(rest, acc.copy(fresh = true))
    case Nil => acc
    case other => throw new IllegalArgumentException(s"unknown args: $other")
  }

  /** Canonical string of every semantics-bearing argument (rates
    * sorted for map-order stability). The resumable sink's ledger keys
    * on bucket id only, so a re-run with DIFFERENT flags or inputs
    * against an existing output dir would silently keep the old
    * buckets while rewriting the audits from the new config — the
    * fingerprint turns that into a fail-fast instead.
    */
  private[graft] def configFingerprint(a: Args): String = {
    val rates = a.rates.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    Seq(
      s"docs=${a.docs}", s"eval=${a.eval}", s"idCol=${a.idCol}", s"textCol=${a.textCol}",
      s"strataCol=${a.strataCol}", s"evalTextCol=${a.evalTextCol}",
      s"minTokens=${a.minTokens}", s"qualityFloor=${a.qualityFloor}",
      s"nearDup=${a.nearDup}", s"maxDupFraction=${a.maxDupFraction}",
      s"spanAction=${a.spanAction}", s"shingleN=${a.shingleN}",
      s"spanShingleN=${a.spanShingleN}", s"spanMinDf=${a.spanMinDf}",
      s"rates=$rates", s"defaultRate=${a.defaultRate}", s"redact=${a.redact}",
      s"buckets=${a.buckets}"
      // the gopher/upsample segments are emitted only when their stage
      // is on: stage-off runs keep the pre-flag fingerprint format, so
      // an in-flight output dir stays resumable across the upgrade
    ).++(a.gopher.map(g => s"gopher=$g"))
      .++(a.gopherLines.map(g => s"gopherLines=$g"))
      .++(a.gopherNgrams.map { g =>
        // render sorted: Map.toString order is size- and hash-dependent
        val caps = (g.topCaps.toSeq.sorted.map { case (n, c) => s"top$n=$c" } ++
          g.dupCaps.toSeq.sorted.map { case (n, c) => s"dup$n=$c" }).mkString(",")
        s"gopherNgrams=$caps"
      })
      .++(a.lineDedupMinDf.map(m => s"lineDedupMinDf=$m"))
      .++(if (upsampleOn(a)) {
        val fs = a.upsample.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
        Seq(s"upsample=$fs", s"defaultUpsample=${a.defaultUpsample}")
      } else Nil)
      .mkString(";")
  }

  private[graft] def upsampleOn(a: Args): Boolean =
    a.upsample.nonEmpty || a.defaultUpsample != 1.0

  /** Pin the run config next to the output: first run records it,
    * every later run must match or pass --fresh (resume is only sound
    * against the same input and flags).
    */
  private def requireSameConfig(spark: SparkSession, a: Args): Unit =
    graft.util.ConfigPin.pin(spark, s"${a.out}/_curation_config.txt",
      configFingerprint(a), "pass --fresh to rebuild")

  /** Per-type PII totals over a corpus (one aggregation; null sums of
    * an empty corpus fold to 0).
    */
  private def piiTotals(df: DataFrame, textCol: String): Seq[(String, Long)] = {
    val aggs = graft.text.Redact.piiCounts(col(textCol)).map { case (n, c) =>
      sum(c).cast("long").as(n)
    }
    val row = df.select(aggs: _*).head()
    row.schema.fieldNames.toSeq.zipWithIndex.map { case (n, i) =>
      n -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }
  }

  // shared audit-aggregation helpers (gopher_report / gopher_line_report):
  // flag counts and signal distributions as non-null values even over an
  // empty evaluated corpus (sum/percentile of nothing is NULL; the audit
  // contract is concrete zeros — same fold piiTotals does)
  private def cnt(c: String) =
    coalesce(sum(when(col(c), 1L).otherwise(0L)), lit(0L)).as(s"n_$c")
  private def pct(c: String, p: Double) =
    coalesce(round(percentile(col(c), lit(p)), 6), lit(0.0)).as(f"p${(p * 100).toInt}%d_$c")
  private def mx(c: String) = coalesce(max(col(c)), lit(0.0)).as(s"max_$c")

  /** Composable core (spec-tested): curate, write the curated corpus
    * through the resumable bucket-ledger sink, write the audit tables
    * (decontam report always; span profile when the boilerplate stage
    * is on; near-dup pairs + transitive clusters when that stage is
    * on; pre/post PII counts when --redact), return (input, curated)
    * counts.
    */
  def run(spark: SparkSession, docs: DataFrame, eval: DataFrame, a: Args): (Long, Long) = {
    import spark.implicits._
    if (a.fresh) {
      val p = new org.apache.hadoop.fs.Path(a.out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    requireSameConfig(spark, a)
    val staged = Curation.curateStaged(
      spark, docs, eval,
      a.idCol, a.textCol, a.strataCol, a.evalTextCol,
      a.minTokens, a.rates, a.defaultRate, a.shingleN,
      a.nearDup, a.qualityFloor, a.maxDupFraction, a.spanShingleN, a.spanMinDf,
      a.spanAction, a.gopher, a.gopherLines, a.gopherNgrams, a.lineDedupMinDf)
    // several writes + count/audit aggregations consume the staged
    // plans; without pinning, EACH action would replay the dedup +
    // near-dup pair join (the dominant cost) from scratch. Persist the
    // shared expensive prefixes (the pair table FIRST so the corpus
    // chain's survivor anti-join reuses it) and the small audit
    // tables; at the 100-TB point the equivalent is one staging
    // parquet of afterNearDup that all consumers scan.
    import org.apache.spark.storage.StorageLevel
    val pinned =
      staged.deduped.persist(StorageLevel.MEMORY_AND_DISK) ::
        staged.nearDupPairs.map(_.persist(StorageLevel.MEMORY_AND_DISK)).toList :::
        staged.afterNearDup.persist(StorageLevel.MEMORY_AND_DISK) ::
        // when the line stage is on, the whole downstream chain reads
        // the rebuilt corpus (afterLineDedup is afterNearDup itself
        // otherwise — do not double-persist the same plan)
        staged.commonLineTable.map(_.persist(StorageLevel.MEMORY_AND_DISK)).toList :::
        (if (staged.commonLineTable.isDefined)
           List(staged.afterLineDedup.persist(StorageLevel.MEMORY_AND_DISK))
         else Nil) :::
        staged.contaminationReport.persist(StorageLevel.MEMORY_AND_DISK) ::
        staged.spanReport.map(_.persist(StorageLevel.MEMORY_AND_DISK)).toList :::
        staged.spanProfile.map(_.persist(StorageLevel.MEMORY_AND_DISK)).toList :::
        // the gopher audit re-aggregates the pre-rules plan; unpinned,
        // that would replay the span join + decontam anti-join above
        // the pinned prefixes a second time
        staged.gopherEvaluated.map(_.persist(StorageLevel.MEMORY_AND_DISK)).toList :::
        staged.sampled.persist(StorageLevel.MEMORY_AND_DISK) :: Nil
    // PII scrubbing runs LAST, on the shipped mix only (earlier
    // stages must see the original text so dedup/decontam semantics
    // match their oracles). Upsampling expands AFTER the scrub so
    // the regex rewrite runs once per base row, not once per copy —
    // the Generate sits above the redaction Project in one stage.
    def expand(df: DataFrame): DataFrame =
      if (upsampleOn(a))
        graft.sampling.Sampling.upsample(df, a.strataCol, a.idCol, a.upsample, a.defaultUpsample)
      else df
    val shipped = expand(
      if (a.redact) staged.sampled.withColumn(a.textCol, graft.text.Redact.redact(col(a.textCol)))
      else staged.sampled)
    // read-backs use the KNOWN schema (shipped cols + the bucket
    // partition dir): schema inference dies on a legitimately-empty
    // corpus (every doc filtered) where the dynamic partitioned
    // write leaves no parquet files — an aggressive config should
    // ship empty audits, not crash after all the stage work
    def readCorpus(): DataFrame = spark.read
      .schema(shipped.schema.add(Materialize.BucketCol, "int"))
      .parquet(s"${a.out}/corpus")
    try {
      val bucketsWritten = Materialize.writeBucketedResumable(
        spark, shipped, s"${a.out}/corpus", a.idCol, a.buckets, Seq(a.strataCol))

      // audit tables are the EXACT (persisted) plans the stages
      // thresholded — the report the anti-join consumed, the span
      // profile the cap read, the pair table the survivor policy
      // scanned; an audit computed over a different corpus could
      // contradict the drop decisions it explains
      staged.contaminationReport
        .write.mode("overwrite").parquet(s"${a.out}/decontam_report")
      staged.spanProfile.foreach(
        _.write.mode("overwrite").parquet(s"${a.out}/span_stats"))
      staged.nearDupPairs.foreach { pairs =>
        pairs.write.mode("overwrite").parquet(s"${a.out}/neardup_pairs")
        // transitive clusters of the same pair graph (the audit view a
        // reviewer groups removals by), over the post-dedup corpus
        graft.dedup.Dedup
          .nearDupClusters(spark, staged.deduped.select(col(a.idCol)), pairs, a.idCol)
          .write.mode("overwrite").parquet(s"${a.out}/neardup_clusters")
      }
      staged.commonLineTable.foreach { tbl =>
        // the EXACT fingerprint table the line cut consumed, enriched
        // with a representative normalized line per fingerprint (a
        // df-bounded second pass over the pre-cut corpus)
        graft.dedup.LineDedup
          .commonLineAudit(staged.afterNearDup, a.idCol, a.textCol, tbl)
          .write.mode("overwrite").parquet(s"${a.out}/common_lines")
      }
      a.gopher.zip(staged.gopherEvaluated).foreach { case (r, evaluated) =>
        // per-rule pass counts over the exact corpus the gopher stage
        // thresholded — which rules bit, and how hard, at these
        // thresholds (one aggregation row; n_passes is the stage's
        // survivor count)
        val flagged = graft.text.Repetition.addGopherFlags(
          graft.text.Repetition.addSignals(
            evaluated.select(col(a.idCol), col(a.textCol)), a.textCol),
          a.textCol,
          minWords = r.minWords, maxWords = r.maxWords,
          minMeanWordLen = r.minMeanWordLen, maxMeanWordLen = r.maxMeanWordLen,
          minAlphaWordFraction = r.minAlphaWordFraction,
          maxDupUnitFraction = r.maxDupUnitFraction,
          maxTopNgramCharFraction = r.maxTopNgramCharFraction)
        // signal distribution alongside the rule counts — the numbers an
        // operator tunes thresholds FROM (exact percentile: sorts the
        // already-round(·,6) signal values, deterministic under any
        // partitioning; approx sketches merge order-dependently)
        flagged
          .agg(count(lit(1)).as("n_evaluated"), cnt("words_ok"), cnt("word_len_ok"),
            cnt("alpha_ok"), cnt("dup_unit_ok"), cnt("top_ngram_ok"), cnt("passes"),
            pct("dup_unit_fraction", 0.5), pct("dup_unit_fraction", 0.9),
            mx("dup_unit_fraction"),
            pct("top_ngram_char_fraction", 0.5), pct("top_ngram_char_fraction", 0.9),
            mx("top_ngram_char_fraction"),
            coalesce(round(percentile(col("word_count"), lit(0.5)), 1), lit(0.0))
              .as("p50_word_count"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"${a.out}/gopher_report")
      }
      a.gopherLines.zip(staged.gopherEvaluated).foreach { case (r, evaluated) =>
        // the line-family twin of gopher_report: per-rule pass counts
        // and signal distributions over the same evaluated corpus (each
        // family's report shows its OWN bite at these thresholds; with
        // both stages on the final survivor count is their conjunction)
        val flagged = graft.text.Repetition.addLineFlags(
          evaluated.select(col(a.idCol), col(a.textCol)), a.textCol,
          maxDupLineFraction = r.maxDupLineFraction,
          maxDupLineCharFraction = r.maxDupLineCharFraction,
          maxBulletLineFraction = r.maxBulletLineFraction,
          maxEllipsisLineFraction = r.maxEllipsisLineFraction)
        flagged
          .agg(count(lit(1)).as("n_evaluated"),
            cnt("dup_line_ok"), cnt("dup_line_chars_ok"), cnt("bullet_ok"),
            cnt("ellipsis_ok"), cnt("line_passes"),
            pct("dup_line_fraction", 0.5), pct("dup_line_fraction", 0.9),
            mx("dup_line_fraction"),
            pct("dup_line_char_fraction", 0.9), mx("dup_line_char_fraction"),
            pct("bullet_line_fraction", 0.9), pct("ellipsis_line_fraction", 0.9),
            coalesce(round(percentile(col("n_lines"), lit(0.5)), 1), lit(0.0))
              .as("p50_n_lines"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"${a.out}/gopher_line_report")
      }
      a.gopherNgrams.zip(staged.gopherEvaluated).foreach { case (r, evaluated) =>
        // the n-gram-family report: per-rule pass counts at the
        // configured caps, plus the tail of the smallest top-n and
        // dup-n signals (the rules that bite first when tightening)
        val topNs = r.topCaps.keys.toSeq.sorted
        val dupNs = r.dupCaps.keys.toSeq.sorted
        val flagged = graft.text.Repetition.addGopherNgramFlags(
          graft.text.Repetition.addNgramSignals(
            evaluated.select(col(a.idCol), col(a.textCol)), a.textCol, topNs, dupNs),
          r.topCaps, r.dupCaps)
        val aggs = Seq(count(lit(1)).as("n_evaluated")) ++
          topNs.map(n => cnt(s"top_${n}gram_ok")) ++
          dupNs.map(n => cnt(s"dup_${n}gram_ok")) ++
          Seq(cnt("ngram_passes")) ++
          topNs.headOption.toSeq.flatMap(n => Seq(
            pct(s"top_${n}gram_char_fraction", 0.9), mx(s"top_${n}gram_char_fraction"))) ++
          dupNs.headOption.toSeq.flatMap(n => Seq(
            pct(s"dup_${n}gram_char_fraction", 0.9), mx(s"dup_${n}gram_char_fraction")))
        flagged
          .agg(aggs.head, aggs.tail: _*)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"${a.out}/gopher_ngram_report")
      }
      if (a.redact) {
        // pre/post scrub counts per PII type over the SHIPPED mix —
        // the table a data owner checks to see what redaction did
        // (post-counts are re-scans of the redacted text: residuals
        // mean a pattern gap, not a failed replace). Pre reads the
        // pinned sampled plan; post reads the corpus parquet just
        // written (one column scan, not a pipeline replay)
        // pre-counts expand through the same upsampling as the shipped
        // corpus so pre and post scan the identical doc multiset
        val pre = piiTotals(expand(staged.sampled), a.textCol)
        val post = piiTotals(readCorpus(), a.textCol)
        pre.zip(post).map { case ((n, p), (_, q)) => (n, p, q) }
          .toDF("pii_type", "n_pre", "n_post")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"${a.out}/pii_counts")
      }
      // mix composition over the SHIPPED corpus: per-stratum doc /
      // character / whitespace-token totals — the one-glance answer to
      // "what did we actually ship". Reads the corpus parquet just
      // written (a two-column scan), never a pipeline replay
      readCorpus()
        .groupBy(col(a.strataCol).as("stratum"))
        .agg(
          count(lit(1)).as("n_docs"),
          // with --upsample these differ: n_docs counts shipped copies
          // (epoch-weighted rows), n_unique_docs the underlying docs
          countDistinct(col(a.idCol)).as("n_unique_docs"),
          coalesce(sum(length(col(a.textCol)).cast("long")), lit(0L)).as("n_chars"),
          coalesce(sum(graft.text.TextOps.tokenCount(col(a.textCol)).cast("long")), lit(0L))
            .as("n_tokens"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${a.out}/mix_report")
      System.err.println(s"[curation] wrote $bucketsWritten/${a.buckets} pending buckets")
    } finally pinned.foreach(_.unpersist())

    val in = docs.count()
    val outN = readCorpus().count()
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
