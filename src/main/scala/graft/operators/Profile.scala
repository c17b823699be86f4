package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling in one scan — the routine data-quality pass a
  * training-data pipeline runs before (and after) every transform: value
  * distributions and per-column summary stats over terabytes must cost
  * exactly one read with map-side partial aggregation, never a pass per
  * statistic.
  */
object Profile {

  /** Fixed-range histogram of `valueCol`: `bins` equal-width buckets over
    * [lo, hi), out-of-range values clamped into the edge buckets (so the
    * histogram doubles as an outlier count), nulls dropped. One scan, one
    * partial→final count aggregate on a dense int key; the result is
    * `bins` rows regardless of input size. Bucket arithmetic is plain
    * IEEE floor/divide so any engine reproduces it bit-for-bit. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins > 0, "histogram: bins must be positive")
    require(hi > lo, "histogram: hi must exceed lo")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(w)),
      lit(0.0)), lit((bins - 1).toDouble)).cast("int")
    df.where(col(valueCol).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(w)).as("bin_hi"),
        col("cnt"))
  }

  /** Bounded-memory approximate quantiles from a [[histogram]]: for each
    * requested fraction q, the first bin where the cumulative count
    * reaches q·N, linearly interpolated inside the bin — the two-scan,
    * `bins`-rows-of-state alternative to an exact percentile (q41), which
    * is a holistic sort aggregate. Error is bounded by the bin width.
    * The cumulative window runs over the `bins`-row histogram (metadata
    * scale, single partition by construction — NOT a data-sized sort).
    * All arithmetic is plain IEEE divide/multiply on exact integer
    * counts, reproducible in any engine. Clamped-edge caveat inherited
    * from [[histogram]]: mass outside [lo, hi) sits in the edge bins. */
  def histogramQuantiles(df: DataFrame, valueCol: String, lo: Double,
                         hi: Double, bins: Int,
                         qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "histogramQuantiles: fractions must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = histogram(df, valueCol, lo, hi, bins)
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("total", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // one histogram evaluation for ALL fractions: fan each bin row out to
    // every q, keep the first bin whose cumulative count reaches q·N
    val target = col("q") * col("total").cast("double")
    h.select(col("*"), explode(array(qs.map(lit): _*)).as("q"))
      .where(col("cum").cast("double") >= target)
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("q")).orderBy(col("bin"))))
      .where(col("__rn") === 1)
      .select(col("q"),
        (col("bin_lo") + lit(w) *
          ((target - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double"))).as("value"))
  }

  /** Grouped Pearson correlation + least-squares fit of y on x in ONE
    * scan via exact sufficient statistics: inputs are quantized to
    * integers (×`scale`, rounded — e.g. 100 for 2-decimal money), the
    * five sums (Σx, Σy, Σx², Σy², Σxy) accumulate as DECIMAL(38,0) —
    * exact, order-independent, mergeable partials, the distributed-ML
    * pattern for fitting millions of per-group models in one pass — and
    * only the final formula runs in (deterministic) double arithmetic.
    * Spark's built-in `corr` accumulates IEEE doubles, so its result
    * depends on partition order; this one is bit-identical everywhere.
    * Requires |x·scale|, |y·scale| < ~3·10⁹ so per-row products fit a
    * long (the DECIMAL sums then never overflow). */
  def corrRegression(df: DataFrame, groupCol: String, xCol: String,
                     yCol: String, scale: Int = 100): DataFrame = {
    val xq = round(col(xCol) * scale).cast("long")
    val yq = round(col(yCol) * scale).cast("long")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,0)")).cast("double")
    val g = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), dsum(xq).as("sx"), dsum(yq).as("sy"),
        dsum(xq * xq).as("sxx"), dsum(yq * yq).as("syy"),
        dsum(xq * yq).as("sxy"))
    val nd = col("n").cast("double")
    val covN = nd * col("sxy") - col("sx") * col("sy")
    val varXN = nd * col("sxx") - col("sx") * col("sx")
    val varYN = nd * col("syy") - col("sy") * col("sy")
    val slopeQ = covN / varXN // in quantized units; scale cancels in corr
    g.select(col(groupCol), col("n"),
      (covN / (sqrt(varXN) * sqrt(varYN))).as("corr"),
      slopeQ.as("slope"), // y/x units: scale cancels (both quantized alike)
      (((col("sy") - slopeQ * col("sx")) / nd) / scale).as("intercept"))
  }

  /** Per-GROUP [[histogramQuantiles]]: bounded-memory approximate
    * quantiles for every group in one histogram pass — the scale path
    * for grouped percentiles (the exact grouped percentile is a holistic
    * sort agg PER GROUP). State is groups × bins rows; the cumulative
    * window partitions by group so no global ordering exists anywhere. */
  def histogramQuantilesBy(df: DataFrame, groupCol: String, valueCol: String,
                           lo: Double, hi: Double, bins: Int,
                           qs: Seq[Double]): DataFrame = {
    require(bins > 0 && hi > lo, "histogramQuantilesBy: bad bin config")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "histogramQuantilesBy: fractions must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(w)),
      lit(0.0)), lit((bins - 1).toDouble)).cast("int")
    val h = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), bin.as("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(w))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol))))
    val target = col("q") * col("total").cast("double")
    h.select(col("*"), explode(array(qs.map(lit): _*)).as("q"))
      .where(col("cum").cast("double") >= target)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol), col("q")).orderBy(col("bin"))))
      .where(col("__rn") === 1)
      .select(col(groupCol), col("q"),
        (col("bin_lo") + lit(w) *
          ((target - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double"))).as("value"))
  }

  /** Per-group z-score outlier report in TWO passes (one stats agg + one
    * broadcast-back probe): mean and population σ from EXACT quantized
    * sufficient statistics (×`scale`, DECIMAL sums — order-independent,
    * the same discipline as [[corrRegression]]), outliers = points with
    * |x − mean| > k·σ. The parametric companion to [[madOutlierCounts]]
    * (σ is cheaper but a single extreme point inflates it; MAD resists).
    * Requires |x·scale| < ~3·10⁹ so per-row squares fit a long. */
  def zscoreOutlierCounts(df: DataFrame, groupCol: String, valueCol: String,
                          k: Double = 3.0, scale: Int = 100): DataFrame = {
    // |xq| ≤ floor(√Long.MaxValue): past it xq·xq wraps SILENTLY in long
    // arithmetic and σ comes out wrong with no symptom — make the
    // documented precondition a checked one (same loud-guard discipline
    // as RangeJoin's fan-out cap)
    val maxAbs = 3037000499L
    val xq0 = round(col(valueCol) * scale).cast("long")
    val xq = when(abs(xq0) <= maxAbs, xq0)
      .otherwise(raise_error(concat(
        lit(s"zscoreOutlierCounts: |$valueCol * $scale| = "), abs(xq0),
        lit(s" exceeds $maxAbs — the per-row square would overflow long; " +
          "lower `scale` or pre-clip the column"))).cast("long"))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,0)")).cast("double")
    val stats = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), dsum(xq).as("sx"), dsum(xq * xq).as("sxx"))
      .withColumn("__meanq", col("sx") / col("n").cast("double"))
      .withColumn("__stdq",
        sqrt(col("sxx") / col("n").cast("double") - col("__meanq") * col("__meanq")))
    df.where(col(valueCol).isNotNull)
      .join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"),
        first(col("__meanq") / scale).as("mean"),
        first(col("__stdq") / scale).as("std"),
        sum(when(abs(xq.cast("double") - col("__meanq")) >
          lit(k) * col("__stdq"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Distribution drift between a reference corpus and a candidate batch
    * — the "did this week's crawl change shape" gate run before new data
    * joins a training mix. Total-variation distance over a shared
    * fixed-range histogram, computed in EXACT integer arithmetic:
    * per-bin gap = |cnt_ref·n_cand − cnt_cand·n_ref| accumulates as
    * DECIMAL (cross-multiplied so no ratio is ever taken per bin), and
    * only the final TV = Σgap / (2·n_ref·n_cand) is one double division
    * — the report is bit-identical under any partitioning or engine, the
    * same discipline as every other gate here. Output is ONE row: sizes,
    * tv_distance ∈ [0,1], the worst bin and its probability gap.
    *
    * Scale shape: two histogram scans (bins rows each), a bins-row
    * full-outer join, and a bins-row aggregate — the corpora are read
    * once each and never joined to each other. */
  def histogramDrift(ref: DataFrame, cand: DataFrame, valueCol: String,
                     lo: Double, hi: Double, bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hr = histogram(ref, valueCol, lo, hi, bins)
      .select(col("bin"), col("cnt").as("cr"))
    val hc = histogram(cand, valueCol, lo, hi, bins)
      .select(col("bin"), col("cnt").as("cc"))
    val j = hr.join(hc, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    driftTail(j)
  }

  /** [[histogramDrift]] where the candidate is a PREDICATE-SELECTED
    * subset of `ref` — the common drift-gate shape (slice vs corpus,
    * q106): both histograms come from ONE scan via a conditional count
    * instead of two scans + a full-outer join. Values identical to
    * `histogramDrift(ref, ref.where(candPred), …)`: a subset's occupied
    * bins are a subset of the reference's, so the outer join degenerates
    * to the fused aggregate. */
  def histogramDriftWithin(ref: DataFrame, candPred: org.apache.spark.sql.Column,
                           valueCol: String, lo: Double, hi: Double,
                           bins: Int): DataFrame = {
    require(bins > 0, "histogramDriftWithin: bins must be positive")
    require(hi > lo, "histogramDriftWithin: hi must exceed lo")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(w)),
      lit(0.0)), lit((bins - 1).toDouble)).cast("int")
    driftTail(ref.where(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cr"), count(when(candPred, lit(1))).as("cc")))
  }

  /** Shared TV-distance tail over a (bin, cr, cc) histogram pair. */
  private def driftTail(j: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = j.agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"))
    val gapped = j.crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(col("cr").cast("decimal(19,0)") * col("nc").cast("decimal(19,0)")
          - col("cc").cast("decimal(19,0)") * col("nr").cast("decimal(19,0)")))
    gapped
      .withColumn("__rn",
        row_number().over(Window.orderBy(col("gap").desc, col("bin"))))
      .groupBy(col("nr"), col("nc"))
      .agg(sum(col("gap")).as("__gapsum"),
        max(when(col("__rn") === 1, col("bin"))).as("worst_bin"),
        max(when(col("__rn") === 1, col("gap"))).as("__worstgap"))
      .select(col("nr").as("n_ref"), col("nc").as("n_cand"),
        (col("__gapsum").cast("double")
          / (lit(2.0) * col("nr").cast("double") * col("nc").cast("double")))
          .as("tv_distance"),
        col("worst_bin"),
        (col("__worstgap").cast("double")
          / (col("nr").cast("double") * col("nc").cast("double")))
          .as("worst_bin_gap"))
  }

  /** Per-column table statistics in ONE scan — the ANALYZE TABLE surface
    * an optimizer (or a human) reads before planning: row count, null
    * count, min/max for numeric columns, and a KMV distinct-count
    * estimate for every column (≤ k longs of aggregate state per column,
    * [[graft.functions.Sketches]] — counting exact distincts per column
    * would be one full shuffle EACH). String values hash via their cast;
    * restrict to string/integral columns (double→string formatting is
    * not engine-portable). */
  def tableStats(df: DataFrame, numericCols: Seq[String],
                 stringCols: Seq[String], k: Int = 64): DataFrame = {
    import graft.functions.Sketches
    val cols = numericCols ++ stringCols
    require(cols.nonEmpty, "tableStats: need at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      val base = Seq(count(col(c)).as(s"__n_$c"),
        Sketches.kmvSketch(Sketches.hash63(col(c).cast("string")), k)
          .as(s"__sk_$c"))
      if (numericCols.contains(c))
        base ++ Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
      else base
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val (mn, mx) =
        if (numericCols.contains(c)) (col(s"__min_$c"), col(s"__max_$c"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        (col("__rows") - col(s"__n_$c")).as("nulls"),
        mn.as("col_min"), mx.as("col_max"),
        Sketches.kmvEstimate(col(s"__sk_$c"), k).as("ndv_est"))
    }
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation) and the count of points beyond `k`·MAD — the
    * mean/stddev-free outlier gate (a single 10⁹ outlier drags a mean;
    * the median shrugs). Exact medians are holistic sort aggregates by
    * definition, so this is the EXACTNESS contract; the bounded-memory
    * path at scale is [[histogramQuantiles]] on the deviations, exactly
    * as q83 is to q41. Two grouped percentile passes (values, then
    * deviations after a broadcast-back of the medians) + one conditional
    * count — group keys and doubles shuffle, nothing wider. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.where(v.isNotNull).groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("med"))
    df.where(v.isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(v - col("med")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("median"),
        percentile(col("__dev"), lit(0.5)).as("mad"))
      .select(col(groupCol), col("n"), col("median"), col("mad"))
  }

  /** [[madOutliers]] plus the outlier count per group: points with
    * |x − median| > k·MAD. Degenerate groups (MAD = 0, over half the mass
    * on one value) count only points strictly off the median — the
    * standard convention, shared by the oracle. */
  def madOutlierCounts(df: DataFrame, groupCol: String, valueCol: String,
                       k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = madOutliers(df, groupCol, valueCol)
    df.where(v.isNotNull)
      .join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"), first(col("median")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(abs(v - col("median")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-column summary of numeric columns — row count, null count, min,
    * max, sum, mean — computed in ONE scan: a single wide aggregate (all
    * stats for all columns as one partial→final hash agg), then an explode
    * to one output row per column. Sums route through DECIMAL(28,10) so
    * the result is addition-order-independent (IEEE double sums differ by
    * partitioning); the mean is that exact sum with one double divide. */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "summarize: need at least one column")
    val aggExprs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__${c}_n"),
        min(col(c)).cast("double").as(s"__${c}_min"),
        max(col(c)).cast("double").as(s"__${c}_max"),
        sum(col(c).cast("decimal(28,10)")).cast("double").as(s"__${c}_sum"))
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__${c}_n").as("n"),
        (col("__rows") - col(s"__${c}_n")).as("nulls"),
        col(s"__${c}_min").as("col_min"),
        col(s"__${c}_max").as("col_max"),
        col(s"__${c}_sum").as("col_sum"),
        (col(s"__${c}_sum") / col(s"__${c}_n").cast("double")).as("col_mean"))
    }
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }

  /** SNAPSHOT DRIFT — per-column stat deltas between two table states
    * (e.g. two root-manifest versions of the same table via
    * `PartitionSnapshots.read(asOf)`): row/null counts, min/max, mean on
    * each side plus the relative mean shift, flagged against `relTol`.
    * The between-commits data-quality monitor a training pipeline runs
    * before promoting a snapshot: a bad upstream batch shows up as a
    * mean/null-fraction jump BEFORE anything consumes it, and unlike the
    * WAP gate (absolute rules) this catches "valid but different"
    * regressions. Cost: one [[summarize]] wide agg per side — two scans,
    * a columnar projection of just `cols`, and a tiny col_name join; at
    * 100 TB the from-side is typically the already-profiled previous run
    * (cache the summarize output, diff for free). */
  def snapshotDrift(from: DataFrame, to: DataFrame, cols: Seq[String],
                    relTol: Double = 0.05): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      summarize(df, cols).select(col("col_name"),
        col("n").as(s"n_$sfx"), col("nulls").as(s"nulls_$sfx"),
        col("col_min").as(s"min_$sfx"), col("col_max").as(s"max_$sfx"),
        col("col_mean").as(s"mean_$sfx"))
    side(from, "from").join(side(to, "to"), Seq("col_name"))
      .withColumn("mean_rel_delta",
        when(abs(col("mean_from")) > lit(0.0),
          abs(col("mean_to") - col("mean_from")) / abs(col("mean_from"))))
      .withColumn("mean_drift",
        when(col("mean_rel_delta").isNotNull,
          col("mean_rel_delta") > lit(relTol))
          // zero/NULL from-mean: any change at all counts as drift
          .otherwise(not(col("mean_to") <=> col("mean_from"))))
  }
}
