package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Training-mix construction operators: deterministic sampling and
  * budget capping over a corpus — the steps between curation (dedup /
  * decontam / quality) and the final training mixture.
  *
  * Everything here is a pure function of the data (no RNG state, no
  * partition-order dependence), so mixes are reproducible across runs,
  * cluster sizes, and engines — the property that matters when a
  * 100-TB mix must be re-derivable byte-for-byte for an ablation.
  */
object Sampling {

  private val M1 = 2147483647L // 2^31 - 1 (prime)
  private val M2 = 2147483629L // the next prime below M1
  private val A1 = 1327217885L // floor(phi^-1 * M1) — golden-ratio step
  private val A2 = 1709782614L // chosen so (A1 + A2) mod M1 = floor((sqrt(2)-1) * M1)

  /** Uniform-in-[0,1) deterministic hash of an id: the sum of two
    * Fibonacci-style multiplicative hashes (Knuth TAOCP §6.4) taken
    * against two coprime moduli,
    *
    *   u(id) = ((id mod M1)·A1 + (id mod M2)·A2) mod M1 / M1
    *
    * with M1 = 2^31-1 and M2 = 2^31-19 (both prime). A single residue
    * would make the coin periodic with period M1 (~2.1e9) — ids
    * congruent mod M1 would repeat sample membership exactly. The
    * two-residue form repeats only when BOTH residues agree, i.e. with
    * period M1·M2 ≈ 4.6e18 (~2^62): effectively the whole non-negative
    * 64-bit id space. Sequential ids still step low-discrepancy (by
    * (A1+A2) mod M1 ≈ 0.414·M1, the silver ratio — no monotone prefix;
    * a small-multiplier LCG like 16807 leaves small ids tiny and
    * ordered). Chosen over xxhash64 because it is exactly replayable in
    * ANY engine with 64-bit integer arithmetic (the DuckDB oracle
    * replays it digit for digit): the largest intermediate,
    * (M1-1)·A1 + (M2-1)·A2 ≈ 6.5e18, stays below 2^63.
    * Edge: u(0) = 0, so id 0 is sampled at any positive rate.
    */
  def idUniform(idCol: Column): Column =
    pmod(pmod(idCol, lit(M1)) * lit(A1) + pmod(idCol, lit(M2)) * lit(A2), lit(M1)) /
      lit(2147483647.0)

  /** Stratified sampling: keep each row with its stratum's rate,
    * decided by [[idUniform]] on the id — per-stratum Bernoulli with a
    * deterministic coin. A narrow filter (no shuffle, no sort); rates
    * for unlisted strata fall back to `defaultRate`. Raising a rate
    * only ever ADDS rows (the coin is fixed per id), so mixes at
    * different rates are nested, not resampled.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(idUniform(col(idCol)) < rate)
  }

  // a temp-column name guaranteed absent from the caller's columns (a
  // caller's `_running` column must survive the operator untouched)
  private def fresh(existing: Set[String], base: String): String =
    graft.util.Cols.fresh(existing, base)

  /** Deterministic fractional upsampling — the "epochs per source"
    * mix knob: each row is emitted `floor(factor)` times plus one more
    * copy when [[idUniform]] of its id lands under the fractional
    * part (so factor 2.5 means every doc twice and HALF the docs —
    * always the same half — a third time). Rows whose copy count is 0
    * (factor < 1 and the coin misses) are dropped, which makes
    * factors < 1 behave exactly like [[stratified]] at that rate.
    * Output rows carry `copy_idx` (0-based) so a downstream shuffle
    * can spread the copies (shuffle on a composite of id and copy_idx
    * — copies share the id coin by construction).
    *
    * Deterministic and engine-replayable like the rest of the mix
    * family; raising a factor only ever ADDS copies (the integer part
    * grows monotonically and the same fixed coin gates the fractional
    * copy), so mixes at different epoch counts are nested. Scale
    * shape: a narrow map-side explode — zero shuffle, no state.
    */
  def upsample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      factors: Map[String, Double],
      defaultFactor: Double = 1.0
  ): DataFrame = {
    // NOTE the per-row cost at the top of this range: each row
    // materializes a copies-sized array via sequence()+explode, so a
    // factor near the 1e6 cap is a ~1M-element array PER DOCUMENT per
    // task — an OOM hazard the range check alone does not guard.
    // Real epoch factors are single digits; treat anything beyond ~1e3
    // as a mis-specified mix, not a supported operating point.
    require((factors.values ++ Seq(defaultFactor)).forall(f => f >= 0.0 && f <= 1e6),
      "upsample factors must be in [0, 1e6]")
    val names = df.columns.toSet
    val cN = fresh(names, "_ups_n")
    val f = factors.foldLeft(lit(defaultFactor)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val copies =
      floor(f).cast("long") + when(idUniform(col(idCol)) < f - floor(f), 1L).otherwise(0L)
    df.withColumn(cN, copies)
      .where(col(cN) > 0L) // sequence() needs start <= stop
      .withColumn("copy_idx", explode(sequence(lit(0L), col(cN) - 1L)))
      .drop(cN)
  }

  /** Per-group token-budget cap: keep rows in deterministic
    * (orderCols) order while the running token total (INCLUDING the
    * current row) stays within `budget` — the "take documents from
    * each source until its budget is spent" mix rule. Rows beyond the
    * budget are dropped, never truncated mid-document.
    *
    * Scale shape: a training mix has a handful of sources with
    * billions of documents each, so a plain
    * `Window.partitionBy(source)` would put an ENTIRE source in one
    * task — the mega-group straggler. When the leading order column is
    * numeric, the running sum instead uses the two-phase chunked scan
    * (the same pattern as [[graft.ops.Sequences.cumulativeChunked]]):
    * phase 1 windows within (group, floor(orderHead / chunkSize)) —
    * tasks bounded by `chunkSize` rows, not by |source| — and phase 2
    * adds each chunk's exclusive offset, computed as a running sum
    * over the tiny per-chunk totals. A non-numeric leading order
    * column cannot be chunked order-consistently and falls back to the
    * single-window form (callers at scale should order by a numeric
    * id, as every caller in this library does).
    */
  def tokenBudgetCap(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      tokensCol: String,
      budget: Long,
      chunkSize: Int = 1 << 20
  ): DataFrame = {
    require(orderCols.nonEmpty, "tokenBudgetCap needs at least one order column")
    val headNumeric =
      df.schema.fields.find(_.name == orderCols.head).exists(_.dataType.isInstanceOf[NumericType])
    if (!headNumeric) return tokenBudgetCapWindowed(df, groupCol, orderCols, tokensCol, budget)

    val names = df.columns.toSet
    val cChunk = fresh(names, "_tbc_chunk")
    val cWithin = fresh(names, "_tbc_within")
    val cGrp = fresh(names, "_tbc_grp")
    val cChunk2 = fresh(names, "_tbc_chunk2")
    val cOffset = fresh(names, "_tbc_offset")

    // chunk ids are monotone in the (orderCols) order because rows
    // sharing the leading value share a chunk and the leading column
    // orders first — so per-chunk offsets compose into the exact
    // group-wide running sum. Integral order keys use exact 64-bit
    // floor-division (the double route silently drifts above 2^53);
    // fractional keys ARE doubles, so the double floor is exact there.
    val headIntegral = df.schema.fields.find(_.name == orderCols.head).exists(f =>
      f.dataType == org.apache.spark.sql.types.ByteType ||
        f.dataType == org.apache.spark.sql.types.ShortType ||
        f.dataType == org.apache.spark.sql.types.IntegerType ||
        f.dataType == org.apache.spark.sql.types.LongType)
    val chunkOf =
      if (headIntegral)
        graft.util.Cols.floorDivLong(col(orderCols.head).cast("long"), chunkSize.toLong)
      else floor(col(orderCols.head).cast("double") / chunkSize).cast("long")
    val chunked = df.withColumn(cChunk, chunkOf)
    val wIn = Window
      .partitionBy(col(groupCol), col(cChunk))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = chunked.withColumn(cWithin, sum(col(tokensCol)).over(wIn))

    val totals = chunked
      .groupBy(col(groupCol).as(cGrp), col(cChunk).as(cChunk2))
      .agg(sum(col(tokensCol)).as(cOffset))
    val wOff = Window
      .partitionBy(col(cGrp))
      .orderBy(col(cChunk2))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn(cOffset, coalesce(sum(col(cOffset)).over(wOff), lit(0L)))
      .select(col(cGrp), col(cChunk2), col(cOffset))

    within
      // null-safe equality: a null group key (or null-order chunk) must
      // behave exactly like the window form, where null is its own
      // partition — plain === would silently drop those rows
      .join(offsets, col(groupCol) <=> col(cGrp) && col(cChunk) <=> col(cChunk2))
      .where(col(cWithin) + col(cOffset) <= budget)
      .drop(cChunk, cWithin, cGrp, cChunk2, cOffset)
  }

  /** Next-fit sequence packing: walk documents in ascending `idCol`
    * order and append each to the current training sequence while the
    * sequence's token total stays within `maxTokens`; otherwise open a
    * new sequence. A document larger than `maxTokens` gets a sequence
    * of its own (next-fit isolates it automatically: it opens a new
    * sequence, and the following document cannot join it). This is the
    * step AFTER [[tokenBudgetCap]]: the mix is chosen, and each
    * document needs a (sequence, offset) slot so fixed-length training
    * contexts can be assembled without truncating mid-document.
    *
    * Packing is defined PER ID-CHUNK (`floorDiv(id, chunkDocs)`): the
    * greedy walk restarts at each chunk boundary. Global next-fit is
    * inherently sequential — one walk over 10^12 documents cannot
    * parallelize — so the chunked form IS the semantics, not an
    * approximation of something else: every engine (and the DuckDB
    * oracle) replays it exactly, each chunk packs independently in one
    * bounded task, and the only waste is at most one under-filled
    * sequence per chunk boundary. Within a chunk the walk is a single
    * linear `aggregate` over the chunk's (id, tokens) array (collected
    * per group — bounded by `chunkDocs` rows, never by corpus size).
    *
    * Returns `(idCol, tokensCol, seq_id, seq_offset)` (id and tokens
    * cast to bigint) — the assignment table, narrow by construction
    * (text never rides the exchange);
    * join it back to the corpus on `idCol` to materialize sequences.
    * `seq_id = chunk * chunkDocs + seq_local` is globally unique and
    * deterministic (`seq_local < docs-in-chunk <= chunkDocs`);
    * `seq_offset` is the token count preceding the document within its
    * sequence. `idCol` must be integral, unique and non-null; null
    * token counts pack as 0.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maxTokens: Long,
      chunkDocs: Int = 4096
  ): DataFrame = {
    // the sentinel below is maxTokens + 1; Long.MaxValue would wrap it
    // negative (and ANSI mode would reject the add anyway)
    require(maxTokens > 0 && maxTokens < Long.MaxValue,
      s"packSequences maxTokens must be in (0, Long.MaxValue), got $maxTokens")
    require(chunkDocs > 0, s"packSequences chunkDocs must be positive, got $chunkDocs")
    val names = df.columns.toSet
    val cChunk = fresh(names, "_ps_chunk")
    val cArr = fresh(names, "_ps_arr")
    val cP = fresh(names, "_ps_p")

    val elemType = "array<struct<id:bigint,tok:bigint,seq:bigint,off:bigint>>"
    // acc = (packed-so-far, current sequence index, current run).
    // seq starts at -1 with a sentinel run > maxTokens, so the first
    // element always "opens" sequence 0 through the same branch every
    // later element uses — no special first-row case.
    val packedArr = aggregate(
      col(cArr),
      struct(
        array().cast(elemType).as("out"),
        lit(-1L).as("seq"),
        lit(maxTokens + 1).cast("long").as("run")),
      (s, x) => {
        val open = s.getField("run") + x.getField("tok") > maxTokens
        val seq = when(open, s.getField("seq") + 1L).otherwise(s.getField("seq"))
        val off = when(open, lit(0L)).otherwise(s.getField("run"))
        val run = when(open, x.getField("tok")).otherwise(s.getField("run") + x.getField("tok"))
        struct(
          concat(
            s.getField("out"),
            array(struct(
              x.getField("id").as("id"), x.getField("tok").as("tok"),
              seq.as("seq"), off.as("off")))).as("out"),
          seq.as("seq"),
          run.as("run"))
      },
      s => s.getField("out"))

    df.select(
        graft.util.Cols.floorDivLong(col(idCol).cast("long"), chunkDocs.toLong).as(cChunk),
        col(idCol).cast("long").as("id"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("tok"))
      // array_sort on (id, tok) structs orders by id — the walk order
      // is deterministic whatever order collect_list saw the rows in
      .groupBy(col(cChunk))
      .agg(array_sort(collect_list(struct(col("id"), col("tok")))).as(cArr))
      .select(col(cChunk), explode(packedArr).as(cP))
      .select(
        col(s"$cP.id").as(idCol),
        col(s"$cP.tok").as(tokensCol),
        (col(cChunk) * chunkDocs.toLong + col(s"$cP.seq")).as("seq_id"),
        col(s"$cP.off").as("seq_offset"))
  }

  /** Assembled training contexts from [[packSequences]]: one row per
    * sequence with the member documents' text joined by `sep` in
    * packing order — the table a tokenizer/writer consumes directly.
    * Ties on offset cannot happen for positive token counts, but
    * zero-token documents share an offset, so the join order key is
    * `(seq_offset, id)` — deterministic always.
    *
    * Scale shape: the assignment is narrow; the corpus joins it on the
    * id key (shuffle join on the corpus' own key — co-partitionable),
    * and the groupBy(seq_id) task is bounded by `maxTokens` characters
    * of text by construction, so no mega-group exists even when the
    * corpus is skewed.
    */
  def sequenceTexts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tokensCol: String,
      maxTokens: Long,
      chunkDocs: Int = 4096,
      sep: String = " "
  ): DataFrame =
    sequenceTextsFromAssignment(
      df, packSequences(df, idCol, tokensCol, maxTokens, chunkDocs), idCol, textCol, sep)

  /** [[sequenceTexts]] over a PRECOMPUTED [[packSequences]] assignment
    * — for callers that also persist/write the assignment itself (the
    * lineage table) and must not pay the packing walk twice.
    */
  def sequenceTextsFromAssignment(
      df: DataFrame,
      assigned: DataFrame, // (idCol, seq_id, seq_offset, ...)
      idCol: String,
      textCol: String,
      sep: String = " "
  ): DataFrame = {
    val names = df.columns.toSet
    val cM = fresh(names, "_sq_m")
    assigned
      .join(df.select(col(idCol).cast("long").as(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("seq_id"))
      .agg(
        array_sort(collect_list(struct(
          col("seq_offset").as("off"), col(idCol).as("id"), col(textCol).as("txt")))).as(cM))
      .select(
        col("seq_id"),
        concat_ws(sep, transform(col(cM), m => m.getField("txt"))).as("seq_text"),
        size(col(cM)).cast("long").as("n_docs"))
  }

  /** Deterministic training-order shuffle with an explicit global
    * position: `shuffle_pos` is the 0-based rank of the row under
    * `(idUniform(id), id)` — a reproducible decorrelation of crawl /
    * source order (consecutive ids land ~0.414·range apart), identical
    * across runs, cluster sizes and engines.
    *
    * Scale shape: a naive global `row_number()` window is ONE task
    * holding the whole corpus. Here the coin is uniform in [0,1) by
    * construction, so `floor(u · buckets)` is a balanced
    * range-partitioning of the final order: rank within bucket (window
    * over ~rows/buckets rows), then add each bucket's exclusive offset
    * (a running sum over the `buckets`-row count table, broadcast
    * back). Set `buckets` so rows/buckets fits a task — the same
    * histogram trick a distributed sort's range exchange uses, but
    * with cross-engine-deterministic boundaries.
    */
  def shufflePositions(df: DataFrame, idCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"shufflePositions buckets must be positive, got $buckets")
    val names = df.columns.toSet
    val cU = fresh(names, "_shf_u")
    val cB = fresh(names, "_shf_b")
    val cR = fresh(names, "_shf_r")
    val cB2 = fresh(names, "_shf_b2")
    val cOff = fresh(names, "_shf_off")

    val withU = df
      .withColumn(cU, idUniform(col(idCol)))
      // least(): u < 1 mathematically, but u·buckets can round UP to
      // exactly `buckets` in doubles — clamp the top edge into the
      // last bucket instead of minting a phantom one
      .withColumn(cB, least(floor(col(cU) * buckets), lit(buckets - 1)).cast("long"))
    val wIn = Window.partitionBy(col(cB)).orderBy(col(cU).asc, col(idCol).asc)
    val counts = withU.groupBy(col(cB).as(cB2)).agg(count(lit(1)).as(cOff))
    val wOff = Window.orderBy(col(cB2)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn(cOff, coalesce(sum(col(cOff)).over(wOff), lit(0L)))

    withU
      .withColumn(cR, row_number().over(wIn).cast("long"))
      // null-safe join (<=>): a null id yields a null coin, and
      // least(null, buckets-1) SKIPS the null — the row lands in the
      // LAST bucket (buckets-1), not a null bucket; the <=> is kept so
      // a future change to the bucket expression cannot silently drop
      // such rows through the offset join. Positions are only fully
      // deterministic under the unique-non-null-id contract
      .join(broadcast(offsets), col(cB) <=> col(cB2))
      .withColumn("shuffle_pos", col(cOff) + col(cR) - 1L)
      .drop(cU, cB, cR, cB2, cOff)
  }

  /** The single-window reference form of [[tokenBudgetCap]] — same
    * semantics, one task per group (fine when no group is huge; the
    * property suite pins the chunked form equal to this one).
    */
  private[graft] def tokenBudgetCapWindowed(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      tokensCol: String,
      budget: Long
  ): DataFrame = {
    val cRun = fresh(df.columns.toSet, "_tbc_running")
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cRun, sum(col(tokensCol)).over(w))
      .where(col(cRun) <= budget)
      .drop(cRun)
  }
}
