package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Statistical profiling, imputation and schema-cleaning operators —
  * the reference's DataPreprocessing module re-expressed as
  * metadata-driven selects and single-pass aggregates.
  * SURVEY §2.4 A3/A5/A6, §2.10 M1-M4.
  */
object Stats {

  /** A3: full stats profile per group
    * (/root/reference/src/DataPreprocessing.jl:178-274): mean, exact
    * median, sample stddev, min, max per numeric column; deterministic
    * mode per string column; count + countDistinct. Exact `percentile`
    * (not approx) for oracle parity; swap to `percentile_approx` at
    * 10^12-row scale with documented epsilon.
    *
    * Fidelity tail of the reference profile:
    *  - `provenanceCol` — countDistinct of the provenance key as
    *    `n_sources` (the reference's `num_files_involved`,
    *    /root/reference/src/DataPreprocessing.jl:203-205,222-223)
    *  - `centroidCols` — per-group mean of each coordinate column as
    *    `centroid_<c>` (the reference's segment centroid,
    *    /root/reference/src/DataPreprocessing.jl:207-214)
    * Both are extra aggregates in the SAME single groupBy pass — no
    * additional shuffle.
    */
  def profile(
      df: DataFrame,
      groupCols: Seq[String],
      numCols: Seq[String],
      strCols: Seq[String],
      provenanceCol: Option[String] = None,
      centroidCols: Seq[String] = Nil
  ): DataFrame = {
    val numAggs = numCols.flatMap { c =>
      Seq(
        round(avg(col(c)), 6).as(s"${c}_mean"),
        round(expr(s"percentile($c, 0.5)"), 6).as(s"${c}_median"),
        round(stddev_samp(col(c)), 6).as(s"${c}_std"),
        round(min(col(c)), 6).as(s"${c}_min"),
        round(max(col(c)), 6).as(s"${c}_max")
      )
    } ++ provenanceCol.map(p => countDistinct(col(p)).as("n_sources")).toSeq ++
      centroidCols.map(c => round(avg(col(c)), 6).as(s"centroid_$c"))
    val cntAggs = Seq(count(lit(1)).as("n_rows"))
    val base = df.groupBy(groupCols.map(col): _*).agg((numAggs ++ cntAggs).head, (numAggs ++ cntAggs).tail: _*)
    // deterministic mode per string col: max count, tie-break smallest
    // value with NULL LAST (DuckDB's ASC default — keeps the oracle
    // rule identical when a NULL string ties a real value). The join
    // back is NULL-SAFE so a NULL group keeps its profile row instead
    // of silently vanishing through an equi-join.
    strCols.foldLeft(base) { (acc, c) =>
      val counted = df
        .groupBy((groupCols :+ c).map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      val w = Window
        .partitionBy(groupCols.map(col): _*)
        .orderBy(col("cnt").desc, col(c).asc_nulls_last)
      val modes0 = counted
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select((groupCols.map(g => col(g).as(s"_m_$g")) :+ col(c).as(s"${c}_mode")): _*)
      val cond = groupCols.map(g => acc(g) <=> modes0(s"_m_$g")).reduce(_ && _)
      acc.join(modes0, cond).drop(groupCols.map(g => s"_m_$g"): _*)
    }
  }

  /** A5: per-column null percentage in ONE pass
    * (/root/reference/src/DataPreprocessing.jl:90-92). Output: one row
    * per column (column_name, missing_pct).
    */
  def missingPct(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      round(avg(when(col(c).isNull, 1.0).otherwise(0.0)) * 100, 6).as(c)
    )
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (column_name, missing_pct)
    row.select(
      explode(
        array(cols.map(c => struct(lit(c).as("column_name"), col(c).as("missing_pct"))): _*)
      ).as("kv")
    ).select(col("kv.column_name"), col("kv.missing_pct"))
  }

  /** A6: per-group median imputation with global-median fallback
    * (/root/reference/src/DataPreprocessing.jl:101-135).
    *
    * Plan shape: the global median is a regular aggregate broadcast back
    * onto every row — NOT a `Window.partitionBy(lit(1))`, which funnels
    * the whole table through one task (single-partition bottleneck /
    * OOM at scale). Group medians come from a groupBy (map-side partial
    * agg + one shuffle on the group key) joined back null-safely, so a
    * NULL group keeps its own median exactly like the window did.
    */
  def imputeGroupMedian(df: DataFrame, groupCol: String, valueCol: String, as: String): DataFrame = {
    val grp = df
      .groupBy(col(groupCol).as("_gkey"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("_grp_med"))
    val glob = df.agg(expr(s"percentile($valueCol, 0.5)").as("_glob_med"))
    df.join(grp, col(groupCol) <=> col("_gkey"), "left")
      .crossJoin(broadcast(glob))
      .withColumn(as, round(coalesce(col(valueCol), col("_grp_med"), col("_glob_med")), 6))
      .drop("_gkey", "_grp_med", "_glob_med")
  }

  /** A6 (string half): per-group deterministic MODE imputation with
    * global-mode fallback — the reference fills string columns with the
    * per-file mode exactly like numerics get the median
    * (/root/reference/src/DataPreprocessing.jl:113-134). Mode rule
    * matches [[profile]]/q_mode_agg: max count over NON-NULL values,
    * ties to the smallest value. Same plan shape as
    * [[imputeGroupMedian]]: one groupBy + null-safe join back + one
    * broadcast global row — no single-partition window.
    */
  def imputeGroupMode(df: DataFrame, groupCol: String, valueCol: String, as: String): DataFrame = {
    val nonNull = df.where(col(valueCol).isNotNull)
    val counted = nonNull
      .groupBy(col(groupCol).as("_gkey"), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(col("_gkey")).orderBy(col("_cnt").desc, col("_v").asc)
    val grpMode = counted
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("_gkey"), col("_v").as("_grp_mode"))
    val globMode = nonNull
      .groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("_v").asc)
      .limit(1)
      .select(col("_v").as("_glob_mode"))
    // LEFT join on true, not crossJoin: an all-null column has an EMPTY
    // global-mode frame, and a crossJoin against it would silently drop
    // every input row instead of keeping the nulls
    df.join(grpMode, col(groupCol) <=> col("_gkey"), "left")
      .join(broadcast(globMode), lit(true), "left")
      .withColumn(as, coalesce(col(valueCol), col("_grp_mode"), col("_glob_mode")))
      .drop("_gkey", "_grp_mode", "_glob_mode")
  }

  /** M5: the reference's whole cleaning pipeline composed
    * (`process_json_data`, /root/reference/src/DataPreprocessing.jl:165-176):
    * (M1+M2) drop columns with missing pct > threshold -> (A6) impute
    * remaining numerics with per-group median and strings with
    * per-group mode (global fallback each) -> (M3) drop constant-
    * "unknown" string columns -> (M4) type-directed default backstop.
    * Column decisions are metadata-driven selects computed from ONE
    * stats pass each — the per-column work never becomes per-column
    * jobs over the data.
    */
  def cleanPipeline(df: DataFrame, groupCol: String, missingThreshold: Double): DataFrame = {
    val kept = dropHighMissing(df, missingThreshold)
    val imputed = kept.schema.fields.foldLeft(kept) { (acc, f) =>
      if (f.name == groupCol) acc
      else
        f.dataType match {
          case _: NumericType =>
            imputeGroupMedian(acc, groupCol, f.name, f.name + "_imp")
              .drop(f.name).withColumnRenamed(f.name + "_imp", f.name)
          case StringType =>
            imputeGroupMode(acc, groupCol, f.name, f.name + "_imp")
              .drop(f.name).withColumnRenamed(f.name + "_imp", f.name)
          case _ => acc
        }
    }
    val fin = fillDefaults(dropConstantUnknown(imputed))
    // restore the input's column order for the survivors (M3 may drop)
    fin.select(kept.columns.filter(fin.columns.contains).map(col): _*)
  }

  /** M1/M2: drop columns whose missing percentage EXCEEDS `threshold`
    * (boundary kept; 100.0 = only fully-missing). Two jobs: one stats
    * pass, one metadata-driven select — never a per-column job. An
    * empty input has no evidence of missingness (avg over 0 rows is
    * NULL) — every column is kept.
    */
  def dropHighMissing(df: DataFrame, threshold: Double): DataFrame = {
    val cols = df.columns.toSeq
    val pct = missingPct(df, cols)
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
      .toMap
    val keep = cols.filter(c => pct(c) <= threshold)
    df.select(keep.map(col): _*)
  }

  /** M3: drop string columns that are constant `unknown`
    * (/root/reference/src/DataPreprocessing.jl:137-148).
    */
  def dropConstantUnknown(df: DataFrame): DataFrame = {
    val strCols = df.schema.fields.collect { case f if f.dataType == StringType => f.name }.toSeq
    if (strCols.isEmpty) df
    else {
      val aggs = strCols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val drop = strCols.filter { c =>
        r.getAs[String](s"${c}_min") == "unknown" && r.getAs[String](s"${c}_max") == "unknown"
      }
      df.drop(drop: _*)
    }
  }

  /** M4: type-directed default backstop
    * (/root/reference/src/DataPreprocessing.jl:150-163).
    */
  def fillDefaults(df: DataFrame): DataFrame = {
    val (numCols, strCols) = df.schema.fields.partition(_.dataType.isInstanceOf[NumericType])
    df.na
      .fill(0.0, numCols.map(_.name))
      .na.fill("unknown", strCols.filter(_.dataType == StringType).map(_.name))
  }

  /** O2: top value(s) by count, keeping ties at the max
    * (/root/reference/examples/case_study_1.jl:98-126).
    */
  def topWithTies(df: DataFrame, keyCol: String): DataFrame = {
    val counted = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val mx = counted.agg(max(col("cnt")).as("mx"))
    counted.join(broadcast(mx), counted("cnt") === mx("mx")).select(col(keyCol), col("cnt"))
  }

  /** The case-study-1 TAIL composed (reference
    * /root/reference/examples/case_study_1.jl:98-126): top keys with
    * ties kept, then the tied winners deduped by a caller-supplied
    * normalized form — keep the smallest key per normalization group
    * (the reference's pairwise-similarity dedup of tied winners, with
    * the similarity expressed as normalizer equality so the operator
    * stays a deterministic window over the tiny winner set).
    */
  def topWithTiesDeduped(df: DataFrame, keyCol: String, normalizer: Column => Column): DataFrame = {
    val winners = topWithTies(df, keyCol)
    val w = Window.partitionBy(normalizer(col(keyCol))).orderBy(col(keyCol).asc)
    winners
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
