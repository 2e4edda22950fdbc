package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functions.CleanFns

/** Serving-layer analytics operators — the query shapes the reference
  * serves through Trino/Superset over its star schema, plus the
  * window-analytics used inside the curated builds (lag/lead running
  * measures, latest-per-key, top-N).
  *
  * All combinators are shuffle-minimal: one hash partitioning by the
  * group/entity key per operator, dims broadcast in star joins.
  */
object Analytics {

  /** Star join: fact ⋈ small dims, every dim broadcast — the
    * fact_stock_daily pattern (curated/fact_stock_daily.py) where the
    * 100 TB fact is joined to kB..MB dims without shuffling the fact. */
  def starJoin(fact: DataFrame,
               dims: Seq[(DataFrame, Column)],
               joinType: String = "left"): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond, joinType)
    }

  /** Latest record per key (lakehouse upsert/compaction read pattern,
    * and the `dropDuplicates` usage in the reference dims). Ties on
    * `orderCol` are broken by `tieBreak` so results are deterministic. */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: Column,
                   tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCol.desc, tieBreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Top-N rows per group, deterministic via tieBreak. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], orderCol: Column,
                   tieBreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCol.desc, tieBreak.asc)
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Per-entity sequence analytics: row_number, lag value, running
    * sum — the building blocks of the reference's SCD2 and its
    * delta_in_week/month/year measures. */
  def sequenceStats(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                    valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("seq", row_number().over(w))
      .withColumn("prev_value", lag(valueCol, 1).over(w))
      .withColumn("running_total", sum(valueCol).over(running))
  }

  /** Gap-based sessionization (batch form): a new session starts when
    * the gap to the previous event of the same entity exceeds
    * `gapMillis`. Returns one row per session with start/end/count/sum.
    * The streaming twin lives in graft.streaming.Speed (stateful
    * flatMapGroupsWithState). */
  def sessionize(df: DataFrame, key: String, ts: String, valueCol: String,
                 gapMillis: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cast: no-op on TimestampType, makes TIMESTAMP_NTZ inputs legal
    // for unix_millis (gap arithmetic is tz-offset-invariant either way)
    df.withColumn("__ms", unix_millis(col(ts).cast("timestamp")))
      .withColumn("__prev_ms", lag(col("__ms"), 1).over(w))
      .withColumn("__new_sess",
        when(col("__prev_ms").isNull ||
          col("__ms") - col("__prev_ms") > gapMillis, 1).otherwise(0))
      .withColumn("session_id", sum(col("__new_sess")).over(running))
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        CleanFns.roundRepro(sum(col(valueCol)), 2).as("session_value"))
  }

  /** Deterministic uniform sample of k rows per group: order by a
    * hash of the row id and keep the first k. Equivalent to reservoir
    * sampling with uniform weights, but reproducible across runs and
    * engines (md5 is everywhere) — the right way to downsample a
    * training corpus per language/source without a seed dependency. */
  def deterministicSample(df: DataFrame, keys: Seq[String], idCol: String,
                          k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic WEIGHTED k-sample per group without replacement —
    * Efraimidis–Spirakis exponential races with a hash-derived
    * uniform, so "sample the mixture proportional to quality weight"
    * is reproducible run-to-run and engine-to-engine (the property a
    * training-mix builder needs for auditability). Each row draws
    * u ∈ (0,1] from 52 md5 bits of its id and races with key =
    * −ln(u)/w; the k SMALLEST keys per group win — exactly a weighted
    * draw without replacement (Efraimidis & Spirakis 2006, via the
    * monotone log transform of u^{1/w}).
    *
    * Scale shape: one scan + one per-group window (rank over the
    * group's keys; same shape as every top-k-per-group here — heavy
    * groups sort within their partition, never globally). Weights
    * clamp to ≥1 so zero/negative weights cannot divide by zero.
    * Returns the sampled rows + their `rank`. */
  def weightedSample(df: DataFrame, keys: Seq[String], idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (v.cast("double") + lit(1.0)) / lit(4503599627370496.0) // 2^52
    val key = -log(u) / greatest(col(weightCol), lit(1)).cast("double")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__key").asc, col(idCol).asc)
    df.withColumn("__key", key)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("__key")
  }

  /** First-two-hex-digit md5 bound keeping ~`percent` of the id space
    * ("zz" orders above every hex pair = keep-all). Shared by BOTH
    * sampling ops so the threshold arithmetic can never drift between
    * them. */
  private[operators] def md5Bound(percent: Int): String = {
    require(percent >= 0 && percent <= 100, s"bad percent $percent")
    if (percent >= 100) "zz" else f"${percent * 256 / 100}%02x"
  }

  /** Deterministic fraction sample: keep rows whose id-hash falls in
    * the first `percent` of the md5 space (engine-portable). */
  def deterministicFraction(df: DataFrame, idCol: String,
                            percent: Int): DataFrame =
    if (percent == 100) df
    else df.where(
      substring(md5(col(idCol).cast("string")), 1, 2) < md5Bound(percent))

  /** Mixture sampling: per-group keep-percentages — the training-data
    * MIXING op (e.g. keep 50% of English, 25% of German, 10% of the
    * rest). A pure map-side filter on the md5 of the row id: no
    * shuffle, no seed, identical row set on every run and engine, and
    * membership is stable under corpus growth (a kept row stays kept
    * when weights are unchanged — incremental loads sample
    * consistently). Groups absent from `percents` keep
    * `defaultPercent`. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    percents: Map[String, Int],
                    defaultPercent: Int = 100): DataFrame = {
    val boundCol = percents.toSeq.sortBy(_._1).foldRight(
      lit(md5Bound(defaultPercent))) { case ((g, p), els) =>
      when(col(groupCol) === g, lit(md5Bound(p))).otherwise(els)
    }
    df.where(substring(md5(col(idCol).cast("string")), 1, 2) < boundCol)
  }

  /** Rebalance a skewed group distribution toward UNIFORM: any group
    * holding more than its fair share (total/Ngroups) of rows is
    * downsampled to it; smaller groups keep everything. The
    * multilingual-corpus balancing op — unlike [[mixtureSample]] the
    * keep-rates are DERIVED from the observed distribution (one
    * tiny aggregate), not caller-fixed.
    *
    * Engine-portable determinism: the keep decision for an
    * oversized group is `substr(md5(id), 1, 8) < hex(floor(frac *
    * 2^32))` — a 32-bit hash threshold (finer than mixtureSample's
    * 8-bit, since derived fractions aren't round percents); the
    * keep-all branch is decided in INTEGER arithmetic
    * (cnt * Ngroups <= total), so no float boundary can flip it.
    * Group counts are driver-small by construction; the scoring pass
    * is a pure map-side filter — zero shuffles. */
  def rebalanceToUniform(df: DataFrame, groupCol: String,
                         idCol: String): DataFrame = {
    // null-group rows are dropped (they fall through the when-chain to
    // false, matching the oracle's inner join) — and must not NPE here
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("c"))
      .collect().filter(!_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getLong(1))
    require(counts.nonEmpty, "rebalanceToUniform: empty input")
    val total = counts.map(_._2).sum
    val g = counts.length
    // bound per group, or None = keep all (integer-exact decision)
    val bounds: Seq[(String, Option[String])] = counts.toSeq.map {
      case (grp, cnt) =>
        grp -> (if (cnt * g <= total) None
        else {
          // same double-op order as the oracle SQL: total/g/cnt
          val frac = total.toDouble / g / cnt
          Some(f"${math.floor(frac * 4294967296.0).toLong}%08x")
        })
    }
    val keep = bounds.sortBy(_._1).foldRight(lit(false)) {
      case ((grp, bound), els) =>
        val cond = bound match {
          case None => lit(true)
          case Some(b) =>
            substring(md5(col(idCol).cast("string")), 1, 8) < lit(b)
        }
        when(col(groupCol) === grp, cond).otherwise(els)
    }
    df.where(keep)
  }

  /** COHORT RETENTION over an event stream: users grouped by the week
    * they first appeared, then for each (cohort, week-offset) the
    * count of cohort members active that week and the share of the
    * cohort they represent — the product-analytics retention triangle.
    *
    * Scale shape: first-seen is one user-keyed aggregate; weekly
    * activity is a distinct over (user, week) — both partial-aggregate
    * map-side, and the join back is user-keyed (the same partitioning
    * Spark reuses). Counts are integers and the only float (the
    * retention share) is a single rounded division — engine-portable.
    * Weeks truncate to Monday (`date_trunc('week')`) in both Spark
    * and DuckDB. */
  /** Robust per-group outlier report: median / MAD (median absolute
    * deviation) and the count of points beyond `scale`·MAD — the
    * outlier gate that, unlike [[anomalyZScore]]'s mean/stddev, a few
    * extreme points cannot drag. Median and MAD round to cents
    * BEFORE the threshold comparison so every engine derives the
    * same cut from the same values. Three passes over the group
    * (median → MAD → count), each a group-keyed aggregate with the
    * group-size-bounded exact percentile; at 100 TB swap the exact
    * percentile for approx_percentile (the q_approx_percentile
    * machinery) — the shape stays identical. The per-group median
    * tables are group-cardinality-sized and broadcast. */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  scale: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(keyCol)).agg(
      CleanFns.roundRepro(percentile(col(valCol), lit(0.5)), 2).as("med"))
    val dev = df.join(broadcast(med), Seq(keyCol))
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = dev.groupBy(col(keyCol)).agg(
      CleanFns.roundRepro(percentile(col("__dev"), lit(0.5)), 2).as("mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .groupBy(col(keyCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__dev") > lit(scale) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col(keyCol), col("n_events"), col("med"), col("mad"),
        col("n_outliers"))
  }

  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val week = (c: Column) => to_date(date_trunc("week", c))
    val firstSeen = events.groupBy(col(userCol))
      .agg(week(min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), week(col(tsCol)).as("act_week")).distinct()
    val counts = active.join(firstSeen, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
    // cohort size via a window over the counts frame — joining a
    // filtered copy of `counts` back to itself would recompute the
    // whole aggregate subtree twice; the offset-0 row always exists
    // (a cohort's first week contains its members' first events)
    val sizeW = Window.partitionBy(col("cohort_week"))
    counts
      .withColumn("__cohort_size",
        max(when(col("week_offset") === 0, col("users"))).over(sizeW))
      .withColumn("retention_pct", CleanFns.roundRepro(
        col("users") / col("__cohort_size").cast("double"), 4))
      .drop("__cohort_size")
  }

  /** Trailing z-score ANOMALY detection over a per-key daily series —
    * flag days whose value sits `zCut` standard deviations from the
    * trailing `days`-day baseline (current day EXCLUDED from its own
    * baseline, as an anomaly would mask itself).
    *
    * Engine-portable by construction: `valueCol` must be an INTEGER
    * column (price in cents, counts) so the windowed sums are exact
    * and order-free — mean/std/z then derive from identical integers
    * through one fixed expression, bit-identical in any engine. The
    * squared term is computed in decimal(38,0) — a long*long product
    * would silently wrap at |v| ≳ 3e9 (square > Long.MAX) while other
    * engines raise; decimal keeps Σx² exact for |v| < 1e19 with
    * window sums to 1e38, far past any cent magnitude. The three
    * window aggregates (n, Σx, Σx²) share one RANGE frame over
    * epoch days: one shuffle, one sort. Days with fewer than
    * `minBaseline` trailing observations emit z = null, flagged 0. */
  def anomalyZScore(df: DataFrame, keyCol: String, dateCol: String,
                    valueCol: String, days: Int = 30, zCut: Double = 3.0,
                    minBaseline: Int = 10): DataFrame = {
    val epoch = datediff(col(dateCol), to_date(lit("1970-01-01")))
    val w = Window.partitionBy(col(keyCol)).orderBy("__epoch")
      .rangeBetween(-days.toLong, -1)
    val x = col(valueCol).cast("double")
    val base = df.withColumn("__epoch", epoch)
      .withColumn("__n", count(col(valueCol)).over(w))
      .withColumn("__s1", sum(col(valueCol)).over(w).cast("double"))
      .withColumn("__s2",
        sum(col(valueCol).cast("decimal(19,0)") *
          col(valueCol).cast("decimal(19,0)")).over(w).cast("double"))
    val mean = col("__s1") / col("__n")
    val variance = (col("__s2") - col("__s1") * col("__s1") / col("__n")) /
      (col("__n") - 1)
    val std = sqrt(variance)
    base
      .withColumn("z", when(col("__n") >= minBaseline && std > 0,
        CleanFns.roundRepro((x - mean) / std, 4)))
      .withColumn("is_anomaly",
        coalesce((abs(col("z")) >= zCut).cast("int"), lit(0)))
      .drop("__epoch", "__n", "__s1", "__s2")
  }

  /** ORDERED FUNNEL analysis: per entity, how deep into the stage
    * sequence s₁ → s₂ → … → sₙ it progressed, where stage k counts
    * only if it happens STRICTLY AFTER stage k−1 was first reached
    * (the product-analytics funnel; out-of-order events don't count).
    *
    * One pass: stage flags are CHAINED RUNNING-MAX windows over the
    * same (entity, order) window — hit_k = event is s_k AND the
    * running max of r_{k−1} over STRICTLY PRECEDING rows is 1;
    * r_k = running max of hit_k. All n windows share one partitioning
    * and sort, so the whole funnel costs ONE shuffle + ONE sort
    * regardless of stage count, then a per-entity aggregate. Returns
    * (entityCol, reached_1 … reached_n) — one row per entity.
    * `orderCols` must be a TOTAL order (add a unique id after the
    * timestamp) or ties make the strictly-before test nondeterministic. */
  def funnel(events: DataFrame, entityCol: String, typeCol: String,
             stages: Seq[String], orderCols: Seq[Column]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    val running = w.rowsBetween(Window.unboundedPreceding, 0)
    val strictlyBefore = w.rowsBetween(Window.unboundedPreceding, -1)
    var df = events.withColumn("__r1",
      max(when(col(typeCol) === stages.head, 1).otherwise(0))
        .over(running))
    for (k <- 2 to stages.length) {
      val hit = when(col(typeCol) === stages(k - 1) &&
        coalesce(max(col(s"__r${k - 1}")).over(strictlyBefore),
          lit(0)) === 1, 1).otherwise(0)
      df = df.withColumn(s"__r$k", max(hit).over(running))
    }
    df.groupBy(col(entityCol))
      .agg(max(col("__r1")).as("reached_1"),
        (2 to stages.length).map(k =>
          max(col(s"__r$k")).as(s"reached_$k")): _*)
  }

  /** Calendar GAP-FILL with last-observation-carried-forward — the
    * stock-market-holiday semantics of the reference's price series
    * (a missing day reads as the last known state, flagged). The
    * scalable formulation generates fill rows from each observation
    * itself: one window (lead of the next observed date per key) and
    * a map-side `sequence` explode — NO calendar build, NO
    * calendar×series join, one shuffle total. Each row emits its own
    * date plus every gap date before the next observation, values
    * carried verbatim, `is_filled` marking synthesized rows.
    * Dates must be unique per key (aggregate first — that total order
    * is also what makes the fill deterministic). */
  def gapFillDaily(df: DataFrame, keyCol: String,
                   dateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    df.withColumn("__next", lead(col(dateCol), 1).over(w))
      .withColumn("__fill", explode(sequence(col(dateCol),
        coalesce(date_sub(col("__next"), 1), col(dateCol)))))
      .withColumn("is_filled",
        (col("__fill") =!= col(dateCol)).cast("int"))
      .drop(dateCol, "__next")
      .withColumnRenamed("__fill", dateCol)
  }

  /** Trailing N-day window aggregate (RANGE frame over epoch days) —
    * the delta_in_week/month-style trailing measures of the reference,
    * computed scalably: one shuffle on the entity key, peers included
    * via the range frame. */
  def trailingWindow(df: DataFrame, keys: Seq[String], dateCol: Column,
                     valueCol: Column, days: Int): DataFrame = {
    val epochDay = datediff(dateCol.cast("date"),
      lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("epoch_day"))
      .rangeBetween(-(days - 1), 0)
    df.withColumn("epoch_day", epochDay)
      .withColumn("trailing_sum", CleanFns.roundRepro(sum(valueCol).over(w), 2))
      .withColumn("trailing_n", count(lit(1)).over(w))
  }

  /** Time-series bucketing: date_trunc + grouped measures (speed-layer
    * serving view). */
  def timeBucket(df: DataFrame, ts: String, unit: String,
                 dims: Seq[String], valueCol: String): DataFrame =
    df.groupBy((date_trunc(unit, col(ts)).as("bucket") +:
        dims.map(col)): _*)
      .agg(
        count(lit(1)).as("n"),
        CleanFns.roundRepro(sum(col(valueCol)), 2).as("total_value"),
        CleanFns.roundRepro(avg(col(valueCol)), 4).as("avg_value"))

  /** OHLC candle resampling — the reference domain's bread and
    * butter (its fact tables are daily stock bars; dashboards roll
    * them up to weekly/monthly candles): per key per `unit` bucket,
    * open = first value, close = last value (event-time order, id
    * tie-break so the candle is deterministic under equal
    * timestamps), high/low/volume. One aggregate, one shuffle keyed
    * by (key, bucket); open/close ride min_by/max_by over a
    * (ts, id) struct — no sort, no window, map-side partials. */
  def ohlcResample(df: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, valueCol: String,
                   unit: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(
        min_by(col(valueCol), struct(col(tsCol), col(idCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("close"),
        count(lit(1)).as("n_ticks"))

  /** Volume-weighted average value per key per day —
    * Σ(value·weight)/Σ(weight) in micro-unit integer arithmetic:
    * both value and the final ratio floor to 1e-4, so the division
    * happens over exact integers and any engine derives the same
    * cents. Weight 0 groups report NULL (no volume, no VWAP). */
  def vwap(df: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, weightCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(
        sum(floor(col(valueCol) * lit(10000.0) + lit(0.5)).cast("long") *
          col(weightCol).cast("long")).as("__pv"),
        sum(col(weightCol).cast("long")).as("volume"))
      .select(col(keyCol), col("day"), col("volume"),
        when(col("volume") > 0,
          CleanFns.roundRepro(
            (col("__pv") / col("volume")).cast("double") / lit(10000.0), 4))
          .otherwise(lit(null).cast("double")).as("vwap"))
}
