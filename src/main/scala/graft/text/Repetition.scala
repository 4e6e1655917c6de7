package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition signals — the Gopher / MassiveText
  * repetition-removal family (Rae et al. 2021, "Scaling Language
  * Models", Table A1): duplicated-unit fraction, characters inside
  * duplicated units, the most-characters n-gram, and the fraction of
  * tokens covered by any n-gram that repeats WITHIN the document.
  * [[graft.dedup.SpanDedup]] finds text duplicated ACROSS documents;
  * this operator profiles repetition INSIDE one document — the "same
  * sentence looping forever" failure mode that cross-document dedup
  * cannot see.
  *
  * Scale shape: every signal is a pure scan-side Column expression
  * (higher-order functions over the split-token array — no UDF, no
  * shuffle, no state). Per-document cost is bounded by document
  * length: the duplicated-unit and top-n-gram passes run over a SORTED
  * copy of the array (one `array_sort` + one linear `aggregate` — the
  * run-length trick, O(L log L)); the n-gram cover pass uses the
  * positional sort-and-mark (sort (gram, pos), mark sorted neighbors,
  * restore window order) — O(L log L) as well, independent of how
  * repetitive the document is, plus an O(L·n) cover walk.
  *
  * The `unitSep` parameter picks the repetition granularity:
  * `"\n"` profiles duplicate LINES (the Gopher dup-line rules),
  * `"\\s+"` (default) profiles duplicate WORDS — the corpus here is
  * single-line, so the oracled query exercises the word form and a
  * spec covers the line form.
  */
object Repetition {

  /** Lowercased, empty-filtered repetition units of `text`; null-safe
    * (null text profiles as an empty document).
    */
  def units(text: Column, unitSep: String = "\\s+"): Column =
    coalesce(
      filter(transform(split(lower(text), unitSep), t => trim(t)), t => t =!= ""),
      array().cast("array<string>"))

  /** Characters occupied by runs of length >= 2 in a SORTED array:
    * one linear `aggregate` carrying (previous value, run length,
    * accumulated chars). Entering a run's second element adds both
    * occurrences' chars retroactively; each further element adds its
    * own.
    */
  private def dupRunChars(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0L).as("acc")),
      (s, x) => {
        val run = when(x <=> s.getField("prev"), s.getField("run") + 1).otherwise(lit(1))
        val add = when(run === 2, length(x).cast("long") * 2L)
          .when(run > 2, length(x).cast("long"))
          .otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"), (s.getField("acc") + add).as("acc"))
      },
      s => s.getField("acc"))

  /** Space-joined positional n-grams of a unit array (empty below n). */
  private def ngrams(u: Column, n: Int): Column =
    if (n == 1) u
    else
      when(
        size(u) >= n,
        transform(
          sequence(lit(0), size(u) - n),
          i => concat_ws(" ", slice(u, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))

  /** Max over equal-runs of a SORTED array of (run length ×
    * element chars) — the "most characters occupied by one repeated
    * value" statistic, one linear `aggregate`.
    */
  private def topRunChars(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0L).as("best")),
      (s, x) => {
        val run = when(x <=> s.getField("prev"), s.getField("run") + 1).otherwise(lit(1))
        struct(
          x.as("prev"),
          run.as("run"),
          greatest(s.getField("best"), run.cast("long") * length(x)).as("best"))
      },
      s => s.getField("best"))

  /** Adds the repetition-signal columns to `df`:
    *
    *   - `n_units`, `n_distinct_units` — unit counts;
    *   - `dup_unit_fraction` — 1 − distinct/total (the fraction of
    *     unit occurrences that are repeats of an earlier one);
    *   - `dup_unit_char_fraction` — characters inside units occurring
    *     >= 2 times, over all unit characters;
    *   - `top_ngram_char_fraction` — characters occupied by the
    *     single most-characters repeated `topN`-gram (count × gram
    *     length, maximised over grams — deterministic, no tie-break
    *     needed), over the document's raw character length;
    *   - `dup_ngram_positions` — `coverN`-gram windows whose gram
    *     occurs >= 2 times in THIS document;
    *   - `covered_units` / `dup_ngram_unit_fraction` — units sitting
    *     under at least one such repeated window (union of covers),
    *     and their fraction of `n_units`.
    *
    * All fractions are `round(·, 6)` for cross-engine replay; empty /
    * null / sub-n documents profile as zeros.
    */
  def addSignals(
      df: DataFrame,
      textCol: String,
      topN: Int = 2,
      coverN: Int = 2,
      unitSep: String = "\\s+"
  ): DataFrame = {
    import graft.util.Cols.fresh
    val names = df.columns.toSet
    val cU = fresh(names, "_rep_u")
    val cS = fresh(names + cU, "_rep_s")

    val u = col(cU)
    val t = size(u)
    val totChars = aggregate(u, lit(0L), (acc, x) => acc + length(x))

    df.withColumn(cU, units(col(textCol), unitSep))
      // the (dup window positions, covered units) pair as ONE
      // self-bound struct — safe under any downstream column pruning
      // (each reference evaluates the whole linear pass once)
      .withColumn(cS, coverStats(u, coverN))
      .withColumn("n_units", t)
      .withColumn("n_distinct_units", size(array_distinct(u)))
      .withColumn(
        "dup_unit_fraction",
        when(t > 0, round((t - col("n_distinct_units")).cast("double") / t, 6))
          .otherwise(lit(0.0)))
      .withColumn(
        "dup_unit_char_fraction",
        when(totChars > 0, round(dupRunChars(array_sort(u)).cast("double") / totChars, 6))
          .otherwise(lit(0.0)))
      .withColumn("top_ngram_char_fraction", topNgramCharFrac(u, col(textCol), topN))
      .withColumn("dup_ngram_positions", col(cS).getField("dup_pos"))
      .withColumn("covered_units", col(cS).getField("cov"))
      .withColumn(
        "dup_ngram_unit_fraction",
        when(t > 0, round(col(cS).getField("cov").cast("double") / t, 6)).otherwise(lit(0.0)))
      .drop(cU, cS)
  }

  /** struct(dup_pos, cov) for the coverN-gram pass: windows whose gram
    * repeats within the document, and the units under at least one
    * such window — the same self-bound positional sort-and-mark as
    * [[dupNgramCoverFrac]] (flags restored to window order, probes
    * O(1)); sub-n documents yield (0, 0).
    */
  private def coverStats(u0: Column, n: Int): Column =
    element_at(
      transform(
        array(u0),
        u => {
          val t = size(u)
          when(
            t >= n,
            element_at(
              transform(
                array(ngrams(u, n)),
                g => {
                  val m = size(g)
                  val posGrams = zip_with(
                    g, sequence(lit(0), m - 1), (gr, p) => struct(gr.as("g"), p.as("p")))
                  element_at(
                    transform(
                      array(array_sort(posGrams)),
                      sorted => {
                        val marked = transform(
                          sequence(lit(0), m - 1),
                          i => {
                            val cur = element_at(sorted, i + 1)
                            val prevEq = when(
                              i > 0,
                              cur.getField("g") <=> element_at(sorted, i).getField("g"))
                              .otherwise(lit(false))
                            val nextEq = when(
                              i < m - 1,
                              cur.getField("g") <=> element_at(sorted, i + 2).getField("g"))
                              .otherwise(lit(false))
                            struct(cur.getField("p").as("p"), (prevEq || nextEq).as("f"))
                          })
                        element_at(
                          transform(
                            array(transform(array_sort(marked), s => s.getField("f"))),
                            flags =>
                              struct(
                                size(filter(flags, x => x)).as("dup_pos"),
                                size(filter(
                                  sequence(lit(0), t - 1),
                                  j =>
                                    exists(
                                      sequence(
                                        greatest(lit(0), j - (n - 1)),
                                        least(j, m - 1)),
                                      i => element_at(flags, i + 1)))).as("cov"))),
                          lit(1))
                      }),
                    lit(1))
                }),
              lit(1)))
            .otherwise(struct(lit(0).as("dup_pos"), lit(0).as("cov")))
        }),
      lit(1))

  /** Gopher-style document quality rules over the repetition signals
    * plus word-shape statistics (Rae et al. 2021 Table A1, adapted to
    * the signals computable from text alone). Adds one boolean column
    * per rule and `passes` = their conjunction; thresholds are
    * parameters because corpus profiles differ. Line-based rules
    * (bullet / ellipsis line fractions) need multi-line text — run
    * [[addSignals]] with `unitSep = "\n"` for those.
    */
  def addGopherFlags(
      df: DataFrame, // must already carry addSignals columns for textCol
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordFraction: Double = 0.8,
      maxDupUnitFraction: Double = 0.5,
      maxTopNgramCharFraction: Double = 0.2
  ): DataFrame = {
    import graft.util.Cols.fresh
    val cU = fresh(df.columns.toSet, "_gph_u")
    val u = col(cU)
    val t = size(u)
    val totChars = aggregate(u, lit(0L), (acc, x) => acc + length(x))
    val alphaWords = size(filter(u, w => w.rlike("[a-z]")))
    df.withColumn(cU, units(col(textCol)))
      .withColumn("word_count", t)
      .withColumn(
        "mean_word_len",
        when(t > 0, round(totChars.cast("double") / t, 6)).otherwise(lit(0.0)))
      .withColumn(
        "alpha_word_fraction",
        when(t > 0, round(alphaWords.cast("double") / t, 6)).otherwise(lit(0.0)))
      .withColumn("words_ok", col("word_count").between(minWords, maxWords))
      .withColumn("word_len_ok", col("mean_word_len").between(minMeanWordLen, maxMeanWordLen))
      .withColumn("alpha_ok", col("alpha_word_fraction") >= minAlphaWordFraction)
      .withColumn("dup_unit_ok", col("dup_unit_fraction") <= maxDupUnitFraction)
      .withColumn("top_ngram_ok", col("top_ngram_char_fraction") <= maxTopNgramCharFraction)
      .withColumn(
        "passes",
        col("words_ok") && col("word_len_ok") && col("alpha_ok") &&
          col("dup_unit_ok") && col("top_ngram_ok"))
      .drop(cU)
  }

  /** Published caps of the full Gopher n-gram rule family (Rae et al.
    * 2021 Table A1): the top-n-gram character fraction for n = 2..4
    * and the duplicated-n-gram character fraction for n = 5..10.
    */
  val TopNgramCaps: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupNgramCaps: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** Duplicated-n-gram character-cover fraction of a unit array:
    * characters of the units under at least one n-gram window that
    * repeats within the document, over all unit characters. Built as
    * NESTED one-element-`transform` let-bindings pinning the gram
    * array, its sorted positional form and the per-window dup flags to
    * ONE evaluation each — Spark has no subexpression elimination
    * across higher-order-function subtrees, and CollapseProject will
    * inline a once-referenced temp column INTO the probe lambda, where
    * it would re-evaluate per probed window (O(L² log L) per document,
    * measured as a stuck scan).
    *
    * Duplicate detection is a positional sort-and-mark: sort
    * (gram, pos) structs, mark each as duplicated iff it equals a
    * sorted neighbor, then restore window order by re-sorting the
    * (pos, flag) marks — O(L log L) total, independent of how
    * repetitive the document is (a membership probe against the
    * distinct-duplicated-gram set is O(L·d), quadratic on a fully
    * repetitive document). The cover walk is O(L·n).
    *
    * The unit-array ARGUMENT is also self-let-bound: the cover walk
    * reads it O(L) times (`element_at(u, j+1)` per unit), so if a
    * caller hands an expression — or a column an optimizer pass later
    * inlines back into this tree (CollapseProject does exactly that
    * when the column's other consumers are pruned away) — an unbound
    * argument would re-tokenize the document per probed unit
    * (measured: 54 s vs 6.5 s for the 9-family pass at sf0.1).
    */
  private def dupNgramCoverFrac(u0: Column, n: Int): Column =
    element_at(transform(array(u0), u => dupNgramCoverFracBound(u, n)), lit(1))

  /** Top-n-gram character fraction with the same argument
    * self-binding: `ngrams` slices its unit array once per window, so
    * an inlined-tokenizer argument would re-tokenize per window.
    */
  private def topNgramCharFrac(u0: Column, text: Column, n: Int): Column =
    element_at(
      transform(
        array(u0),
        u =>
          when(
            size(u) >= n,
            round(
              topRunChars(array_sort(ngrams(u, n))).cast("double") /
                greatest(length(text), lit(1)),
              6))
            .otherwise(lit(0.0))),
      lit(1))

  private def dupNgramCoverFracBound(u: Column, n: Int): Column = {
    val t = size(u)
    val totChars = aggregate(u, lit(0L), (acc, x) => acc + length(x))
    // CASE WHEN evaluates the branch lazily: sub-n / empty documents
    // never build the gram machinery (whose sequences assume m >= 1)
    when(
      t >= n && totChars > 0,
      element_at(
        transform(
          array(ngrams(u, n)),
          g => {
            val m = size(g)
            val posGrams =
              zip_with(g, sequence(lit(0), m - 1), (gr, p) => struct(gr.as("g"), p.as("p")))
            element_at(
              transform(
                array(array_sort(posGrams)),
                sorted => {
                  val marked = transform(
                    sequence(lit(0), m - 1),
                    i => {
                      val cur = element_at(sorted, i + 1)
                      val prevEq = when(
                        i > 0,
                        cur.getField("g") <=> element_at(sorted, i).getField("g"))
                        .otherwise(lit(false))
                      val nextEq = when(
                        i < m - 1,
                        cur.getField("g") <=> element_at(sorted, i + 2).getField("g"))
                        .otherwise(lit(false))
                      struct(cur.getField("p").as("p"), (prevEq || nextEq).as("f"))
                    })
                  element_at(
                    transform(
                      array(transform(array_sort(marked), s => s.getField("f"))),
                      flags => {
                        val coveredChars = aggregate(
                          sequence(lit(0), t - 1),
                          lit(0L),
                          (acc, j) =>
                            acc + when(
                              exists(
                                sequence(greatest(lit(0), j - (n - 1)), least(j, m - 1)),
                                i => element_at(flags, i + 1)),
                              length(element_at(u, j + 1)).cast("long")).otherwise(lit(0L)))
                        round(coveredChars.cast("double") / totChars, 6)
                      }),
                    lit(1))
                }),
              lit(1))
          }),
        lit(1)))
      .otherwise(lit(0.0))
  }

  /** The FULL Gopher n-gram signal family ([[addSignals]] computes one
    * topN and one coverN; this computes the whole Table A1 set in one
    * scan): for each n in `topNs` a `top_{n}gram_char_fraction` —
    * characters occupied by the single most-characters repeated n-gram
    * over the document's raw character length — and for each n in
    * `coverNs` a `dup_{n}gram_char_fraction` — characters of the UNITS
    * sitting under at least one n-gram window that repeats within this
    * document (union of covers, each character counted once), over all
    * unit characters.
    *
    * Same scale shape as [[addSignals]]: pure scan-side evaluation,
    * no UDF, no shuffle. Per-doc cost per n is O(L·n) hashing plus the
    * duplicate check — repetitiveness-independent (the compiled kernel
    * counts grams in a hash map; the HOF reference form uses the
    * equivalent positional sort-and-mark, O(L log L)). Fractions are
    * `round(·, 6)`; empty / null / sub-n documents profile as zeros.
    */
  def addNgramSignals(
      df: DataFrame,
      textCol: String,
      topNs: Seq[Int] = TopNgramCaps.keys.toSeq.sorted,
      coverNs: Seq[Int] = DupNgramCaps.keys.toSeq.sorted,
      unitSep: String = "\\s+"
  ): DataFrame = {
    import graft.util.Cols.fresh
    // one compiled kernel call per row computes the whole family (the
    // HOF formulation — kept below as addNgramSignalsHof, spec-pinned
    // equal — evaluates interpreted lambdas per array element); the
    // element_at references collapse into one Project where codegen
    // subexpression elimination evaluates the kernel once
    val cS = fresh(df.columns.toSet, "_rep_sig")
    val sig = graft.functions.TextExpressions
      .ngram_signals(coalesce(col(textCol), lit("")), unitSep, topNs, coverNs)
    val withS = df.withColumn(cS, sig)
    val withTop = topNs.zipWithIndex.foldLeft(withS) { case (d, (n, i)) =>
      d.withColumn(s"top_${n}gram_char_fraction", element_at(col(cS), i + 1))
    }
    val withCover = coverNs.zipWithIndex.foldLeft(withTop) { case (d, (n, i)) =>
      d.withColumn(s"dup_${n}gram_char_fraction", element_at(col(cS), topNs.length + i + 1))
    }
    withCover.drop(cS)
  }

  /** The original higher-order-function formulation of
    * [[addNgramSignals]] — retained as the equivalence reference for
    * the kernel (RepetitionSpec pins the two equal value-for-value).
    */
  private[graft] def addNgramSignalsHof(
      df: DataFrame,
      textCol: String,
      topNs: Seq[Int] = TopNgramCaps.keys.toSeq.sorted,
      coverNs: Seq[Int] = DupNgramCaps.keys.toSeq.sorted,
      unitSep: String = "\\s+"
  ): DataFrame = {
    import graft.util.Cols.fresh
    val cU = fresh(df.columns.toSet, "_rep_nu")
    val u = col(cU)
    val withU = df.withColumn(cU, units(col(textCol), unitSep))
    val withTop = topNs.foldLeft(withU) { (d, n) =>
      d.withColumn(s"top_${n}gram_char_fraction", topNgramCharFrac(u, col(textCol), n))
    }
    val withCover = coverNs.foldLeft(withTop) { (d, n) =>
      d.withColumn(s"dup_${n}gram_char_fraction", dupNgramCoverFrac(u, n))
    }
    withCover.drop(cU)
  }

  /** One `_ok` flag per [[addNgramSignals]] column at the given caps
    * (defaults: the published Table A1 thresholds) plus
    * `ngram_passes` = their conjunction. `df` must already carry the
    * signal columns.
    */
  def addGopherNgramFlags(
      df: DataFrame,
      topCaps: Map[Int, Double] = TopNgramCaps,
      dupCaps: Map[Int, Double] = DupNgramCaps
  ): DataFrame = {
    val withTop = topCaps.toSeq.sorted.foldLeft(df) { case (d, (n, cap)) =>
      d.withColumn(s"top_${n}gram_ok", col(s"top_${n}gram_char_fraction") <= cap)
    }
    val withDup = dupCaps.toSeq.sorted.foldLeft(withTop) { case (d, (n, cap)) =>
      d.withColumn(s"dup_${n}gram_ok", col(s"dup_${n}gram_char_fraction") <= cap)
    }
    val allOk =
      (topCaps.keys.toSeq.sorted.map(n => col(s"top_${n}gram_ok")) ++
        dupCaps.keys.toSeq.sorted.map(n => col(s"dup_${n}gram_ok")))
        .reduceOption(_ && _)
        .getOrElse(lit(true)) // no caps configured = vacuous pass
    withDup.withColumn("ngram_passes", allOk)
  }

  /** The n-gram rule conjunction as ONE predicate Column (the filter
    * form of [[addNgramSignals]]+[[addGopherNgramFlags]]): the unit
    * array is tokenized once via the one-element-`transform`
    * let-binding, and each cover-n's flag array is let-bound the same
    * way (the window `exists` probes it O(L·n) times — unbound, the
    * dup-set membership map would recompute per probe). Pinned equal
    * to the `ngram_passes` flag by spec.
    */
  def gopherNgramPasses(
      text: Column,
      topCaps: Map[Int, Double] = TopNgramCaps,
      dupCaps: Map[Int, Double] = DupNgramCaps,
      unitSep: String = "\\s+"
  ): Column =
    graft.functions.TextExpressions.ngram_passes(
      coalesce(text, lit("")), unitSep, topCaps.toSeq.sorted, dupCaps.toSeq.sorted)

  /** The original higher-order-function formulation of
    * [[gopherNgramPasses]] — retained as the equivalence reference for
    * the kernel (RepetitionSpec pins the two equal row-for-row).
    */
  private[graft] def gopherNgramPassesHof(
      text: Column,
      topCaps: Map[Int, Double] = TopNgramCaps,
      dupCaps: Map[Int, Double] = DupNgramCaps,
      unitSep: String = "\\s+"
  ): Column =
    element_at(
      transform(
        array(units(text, unitSep)),
        u => {
          val topOks = topCaps.toSeq.sorted.map { case (n, cap) =>
            topNgramCharFrac(u, text, n) <= cap
          }
          val dupOks = dupCaps.toSeq.sorted.map { case (n, cap) =>
            dupNgramCoverFrac(u, n) <= cap
          }
          (topOks ++ dupOks).reduceOption(_ && _).getOrElse(lit(true))
        }),
      lit(1))

  /** Gopher-style LINE rules for multi-line documents (Rae et al. 2021
    * Table A1's line family): fraction of duplicate lines / of
    * characters inside duplicate lines, and the fraction of lines
    * starting with a bullet or ending with an ellipsis. The word-level
    * rules ([[addGopherFlags]]) cannot see these — a scraped page whose
    * every line is `- item ...` has perfectly ordinary word statistics.
    *
    * Lines are the `unitSep = "\n"` repetition units (trimmed,
    * lowercased, empties dropped — bullet/ellipsis glyphs are
    * case-stable so one array serves all four signals). Same scale
    * shape as [[addSignals]]: pure scan-side Column expressions, one
    * `array_sort` + linear `aggregate` per document, no UDF, no
    * shuffle. Empty / single-line / null documents profile as zeros
    * (and therefore pass — a one-line doc has no line-repetition
    * evidence against it).
    *
    * Adds `n_lines`, `n_distinct_lines`, `dup_line_fraction`,
    * `dup_line_char_fraction`, `bullet_line_fraction`,
    * `ellipsis_line_fraction`, one `_ok` flag per rule, and
    * `line_passes` = their conjunction. Fractions are `round(·, 6)`
    * for cross-engine replay.
    */
  def addLineFlags(
      df: DataFrame,
      textCol: String,
      maxDupLineFraction: Double = 0.3,
      maxDupLineCharFraction: Double = 0.2,
      maxBulletLineFraction: Double = 0.9,
      maxEllipsisLineFraction: Double = 0.3
  ): DataFrame = {
    import graft.util.Cols.fresh
    val cL = fresh(df.columns.toSet, "_rep_l")
    val l = col(cL)
    val n = size(l)
    val totChars = aggregate(l, lit(0L), (acc, x) => acc + length(x))
    def frac(num: Column): Column =
      when(n > 0, round(num.cast("double") / n, 6)).otherwise(lit(0.0))
    df.withColumn(cL, units(col(textCol), "\n"))
      .withColumn("n_lines", n)
      .withColumn("n_distinct_lines", size(array_distinct(l)))
      .withColumn("dup_line_fraction", frac(n - col("n_distinct_lines")))
      .withColumn(
        "dup_line_char_fraction",
        when(totChars > 0, round(dupRunChars(array_sort(l)).cast("double") / totChars, 6))
          .otherwise(lit(0.0)))
      .withColumn("bullet_line_fraction", frac(size(filter(l, x => x.rlike(BulletPat)))))
      .withColumn("ellipsis_line_fraction", frac(size(filter(l, x => x.rlike(EllipsisPat)))))
      .withColumn("dup_line_ok", col("dup_line_fraction") <= maxDupLineFraction)
      .withColumn("dup_line_chars_ok", col("dup_line_char_fraction") <= maxDupLineCharFraction)
      .withColumn("bullet_ok", col("bullet_line_fraction") <= maxBulletLineFraction)
      .withColumn("ellipsis_ok", col("ellipsis_line_fraction") <= maxEllipsisLineFraction)
      .withColumn(
        "line_passes",
        col("dup_line_ok") && col("dup_line_chars_ok") &&
          col("bullet_ok") && col("ellipsis_ok"))
      .drop(cL)
  }

  /** Line starts with a bullet glyph (after the units() trim). */
  private val BulletPat = "^[-*•]"

  /** Line ends with a three-dot or single-glyph ellipsis. */
  private val EllipsisPat = "(\\.\\.\\.|…)$"

  /** The line-rule conjunction as ONE predicate Column (the filter
    * form of [[addLineFlags]], mirroring [[gopherPasses]]): the line
    * array is tokenized once via the same one-element-`transform`
    * let-binding, thresholds compare the same `round(·, 6)` values, so
    * a doc passes here iff its `line_passes` flag is true (pinned by
    * spec).
    */
  def gopherLinePasses(
      text: Column,
      maxDupLineFraction: Double = 0.3,
      maxDupLineCharFraction: Double = 0.2,
      maxBulletLineFraction: Double = 0.9,
      maxEllipsisLineFraction: Double = 0.3
  ): Column =
    graft.functions.TextExpressions.gopher_line_passes(
      coalesce(text, lit("")), "\n", BulletPat, EllipsisPat,
      Seq(maxDupLineFraction, maxDupLineCharFraction,
        maxBulletLineFraction, maxEllipsisLineFraction))

  /** The original higher-order-function formulation of
    * [[gopherLinePasses]] — retained as the equivalence reference for
    * the kernel (RepetitionSpec pins the two equal row-for-row).
    */
  private[graft] def gopherLinePassesHof(
      text: Column,
      maxDupLineFraction: Double = 0.3,
      maxDupLineCharFraction: Double = 0.2,
      maxBulletLineFraction: Double = 0.9,
      maxEllipsisLineFraction: Double = 0.3
  ): Column =
    element_at(
      transform(
        array(units(text, "\n")),
        l => {
          val n = size(l)
          val totChars = aggregate(l, lit(0L), (acc, x) => acc + length(x))
          def frac(num: Column): Column =
            when(n > 0, round(num.cast("double") / n, 6)).otherwise(lit(0.0))
          val dupFrac = frac(n - size(array_distinct(l)))
          val dupCharFrac =
            when(totChars > 0, round(dupRunChars(array_sort(l)).cast("double") / totChars, 6))
              .otherwise(lit(0.0))
          dupFrac <= maxDupLineFraction &&
            dupCharFrac <= maxDupLineCharFraction &&
            frac(size(filter(l, x => x.rlike(BulletPat)))) <= maxBulletLineFraction &&
            frac(size(filter(l, x => x.rlike(EllipsisPat)))) <= maxEllipsisLineFraction
        }),
      lit(1))

  /** The Gopher PARAGRAPH rules (Table A1's remaining pair: duplicate
    * paragraph fraction <= 0.30, duplicate paragraph character
    * fraction <= 0.20) as ONE predicate Column. Paragraphs are the
    * `"\n\n"` repetition units — [[addSignals]] with that `unitSep`
    * computes the same two signals as `dup_unit_fraction` /
    * `dup_unit_char_fraction` (pinned equal by spec); this is the
    * fused filter form a curation pipeline composes with the other
    * family gates. Sub-two-paragraph documents pass vacuously.
    */
  def gopherParagraphPasses(
      text: Column,
      maxDupParagraphFraction: Double = 0.3,
      maxDupParagraphCharFraction: Double = 0.2
  ): Column =
    element_at(
      transform(
        array(units(text, "\n\n")),
        u => {
          val n = size(u)
          val totChars = aggregate(u, lit(0L), (acc, x) => acc + length(x))
          val dupFrac =
            when(n > 0, round((n - size(array_distinct(u))).cast("double") / n, 6))
              .otherwise(lit(0.0))
          val dupCharFrac =
            when(totChars > 0, round(dupRunChars(array_sort(u)).cast("double") / totChars, 6))
              .otherwise(lit(0.0))
          dupFrac <= maxDupParagraphFraction && dupCharFrac <= maxDupParagraphCharFraction
        }),
      lit(1))

  /** The whole Gopher rule conjunction as ONE predicate Column — the
    * form a curation pipeline filters with (`df.where(gopherPasses(
    * col("text")))`): no added columns to drop, fuses with neighboring
    * predicates into one filter over the scan, zero shuffle. The unit
    * array is tokenized ONCE per row (the conjunction is built inside
    * a `transform` lambda over a one-element array — a let-binding,
    * since Spark's subexpression elimination does not deduplicate
    * higher-order-function subtrees). Thresholds compare the same
    * `round(·, 6)` signal values [[addSignals]]/[[addGopherFlags]]
    * emit, so a doc passes here iff its `passes` flag is true (pinned
    * by spec on a random corpus).
    */
  def gopherPasses(
      text: Column,
      topN: Int = 2,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordFraction: Double = 0.8,
      maxDupUnitFraction: Double = 0.5,
      maxTopNgramCharFraction: Double = 0.2,
      unitSep: String = "\\s+"
  ): Column =
    graft.functions.TextExpressions.gopher_word_passes(
      coalesce(text, lit("")), unitSep, topN,
      Seq(minWords.toDouble, maxWords.toDouble, minMeanWordLen, maxMeanWordLen,
        minAlphaWordFraction, maxDupUnitFraction, maxTopNgramCharFraction))

  /** The original higher-order-function formulation of [[gopherPasses]]
    * — retained as the equivalence reference for the kernel
    * (RepetitionSpec pins the two equal row-for-row).
    */
  private[graft] def gopherPassesHof(
      text: Column,
      topN: Int = 2,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordFraction: Double = 0.8,
      maxDupUnitFraction: Double = 0.5,
      maxTopNgramCharFraction: Double = 0.2,
      unitSep: String = "\\s+"
  ): Column =
    element_at(
      transform(
        array(units(text, unitSep)),
        u => {
          val t = size(u)
          val totChars = aggregate(u, lit(0L), (acc, x) => acc + length(x))
          val meanLen =
            when(t > 0, round(totChars.cast("double") / t, 6)).otherwise(lit(0.0))
          val alphaFrac = when(
            t > 0,
            round(size(filter(u, w => w.rlike("[a-z]"))).cast("double") / t, 6))
            .otherwise(lit(0.0))
          val dupFrac = when(
            t > 0,
            round((t - size(array_distinct(u))).cast("double") / t, 6))
            .otherwise(lit(0.0))
          val topFrac = when(
            t >= topN,
            round(
              topRunChars(array_sort(ngrams(u, topN))).cast("double") /
                greatest(length(text), lit(1)),
              6))
            .otherwise(lit(0.0))
          t.between(minWords, maxWords) &&
            meanLen.between(minMeanWordLen, maxMeanWordLen) &&
            alphaFrac >= minAlphaWordFraction &&
            dupFrac <= maxDupUnitFraction &&
            topFrac <= maxTopNgramCharFraction
        }),
      lit(1))
}
