package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CleanFns

/** Column-level data profiling — the "describe my table" report every
  * data-quality gate runs before accepting a load (null counts,
  * cardinalities, ranges, numeric means). The reference stack gets
  * this from warehouse tooling over its star schema
  * (lambda-lakehouse's Superset/Trino layer); here it is one operator.
  *
  * Shape at 100 TB: ONE aggregate over the input producing a single
  * row of per-column statistics (the exact distinct counts make
  * Catalyst plan an Expand — one scan, k× row expansion with map-side
  * partial aggregation per distinct column, the standard
  * multiple-DISTINCT plan), then a driver-tiny unpivot via `stack`
  * into one output row per column. No window, no join, no second
  * scan; the output is k rows regardless of input size.
  */
object Profiling {

  /** Per-column profile of `df`: (column_name, n_rows, n_nulls,
    * n_distinct, min_num, max_num, avg_num, min_str, max_str).
    * Numeric columns report rounded numeric min/max/avg; string
    * columns report lexicographic min/max; date/timestamp columns
    * report their day-grain ISO string range (day grain keeps the
    * rendering engine-portable). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs: Seq[Column] = cols.flatMap { c =>
      val base = Seq(
        count(lit(1)).as(s"__${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__nd"))
      val typed = fields(c) match {
        case _: NumericType => Seq(
          CleanFns.roundRepro(min(col(c)).cast("double"), 4).as(s"__${c}__minn"),
          CleanFns.roundRepro(max(col(c)).cast("double"), 4).as(s"__${c}__maxn"),
          CleanFns.roundRepro(avg(col(c)), 4).as(s"__${c}__avg"),
          lit(null).cast("string").as(s"__${c}__mins"),
          lit(null).cast("string").as(s"__${c}__maxs"))
        case _: StringType => Seq(
          lit(null).cast("double").as(s"__${c}__minn"),
          lit(null).cast("double").as(s"__${c}__maxn"),
          lit(null).cast("double").as(s"__${c}__avg"),
          min(col(c)).as(s"__${c}__mins"),
          max(col(c)).as(s"__${c}__maxs"))
        case _: TimestampType | _: DateType | _: TimestampNTZType => Seq(
          lit(null).cast("double").as(s"__${c}__minn"),
          lit(null).cast("double").as(s"__${c}__maxn"),
          lit(null).cast("double").as(s"__${c}__avg"),
          min(col(c).cast("date")).cast("string").as(s"__${c}__mins"),
          max(col(c).cast("date")).cast("string").as(s"__${c}__maxs"))
        case other =>
          throw new IllegalArgumentException(
            s"profile: unsupported column type for $c: $other")
      }
      base ++ typed
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one row per column; the input
    // to stack is one row, so this is driver-scale regardless of |df|
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"__${c}__n"), col(s"__${c}__nulls"),
        col(s"__${c}__nd"), col(s"__${c}__minn"), col(s"__${c}__maxn"),
        col(s"__${c}__avg"), col(s"__${c}__mins"), col(s"__${c}__maxs"))
    }
    one.select(stack(lit(cols.size) +: stackArgs: _*)
      .as(Seq("column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "avg_num", "min_str", "max_str")))
  }

  /** Join/aggregation-key skew diagnostic — the report you run BEFORE
    * picking a partition strategy at 100 TB: per candidate key
    * column, the row/key counts, the hottest key and its share, and
    * the key-distribution entropy (micro-nats; ln(n_keys)·1e6 = the
    * uniform ceiling, so share+entropy together say "one viral key"
    * vs "broadly flat"). The numbers that decide salting (q_salted_agg)
    * vs AQE skew-join vs plain hash partitioning.
    *
    * Shape: per column, one groupBy(key) count (map-side partial
    * aggregation collapses hot keys per mapper — the diagnostic
    * itself never suffers the skew it measures), then a single-row
    * reduce over the key-count table: top key via min(struct(-cnt,
    * key)) (most frequent, ties to the smaller key), entropy as a
    * per-key floored-micro term sum (order-free, engine-exact). The
    * per-column results (one row each) union driver-side — k plans,
    * each O(distinct keys) after its scan. NULL keys count as a key
    * (rendered " null" — they'd collide in one reducer all the
    * same). */
  /** Population-stability-index drift report between a reference and
    * a current slice of the same numeric column — the monitor a
    * pipeline runs on every ingest to catch upstream distribution
    * shift before it poisons training mixes. The value is bucketed
    * into `nBuckets` fixed-width cent bins (clamped at the top);
    * per-bucket PSI terms use Laplace-smoothed shares (+1/+nBuckets,
    * so a bucket empty on one side stays finite) and floor to
    * micro-nats — order-free, engine-exact. Only OBSERVED buckets
    * emit rows (both engines see the same data, so the same set);
    * Σ psi_term_micro ≳ 200000 (0.2 nats) is the usual page-someone
    * threshold.
    *
    * Scale shape: ONE scan, one groupBy(bucket) with two conditional
    * counts (map-side partial agg; nBuckets-bounded result), totals
    * broadcast back — no join of two aggregates, no second pass.
    * Returns (bucket, n_ref, n_cur, psi_term_micro). */
  def psiDrift(df: DataFrame, valueCol: String, isRef: Column,
               centsPerBucket: Int = 500, nBuckets: Int = 20): DataFrame = {
    val cents = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val bucket = greatest(least(floor(cents / lit(centsPerBucket)),
      lit(nBuckets - 1)), lit(0)).cast("int")
    val cnts = df
      .select(bucket.as("bucket"), isRef.as("__ref"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("n_cur"))
    val tot = cnts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val p = (col("n_ref") + lit(1)).cast("double") /
      (col("__tr") + lit(nBuckets)).cast("double")
    val q = (col("n_cur") + lit(1)).cast("double") /
      (col("__tc") + lit(nBuckets)).cast("double")
    cnts.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(1000000.0) + lit(0.5))
          .cast("long").as("psi_term_micro"))
  }

  /** Two-sample Kolmogorov–Smirnov drift per group — the
    * distribution-free companion of [[psiDrift]] (no bucket widths to
    * choose; sensitive to any ECDF divergence, not just binned mass
    * shifts). D = max_x |F_ref(x) − F_cur(x)| computed EXACTLY in
    * integers: per distinct value, the cumulative-count cross
    * difference |cum_ref·n_cur − cum_cur·n_ref| is an integer, the
    * max is taken over it, and ONE floor-division to micro-units
    * happens at the end — any engine re-derives the result
    * bit-for-bit (the q_anomaly discipline).
    *
    * Returns (groupCol, n_ref, n_cur, ks_micro) for groups where both
    * samples are non-empty.
    *
    * Scale shape at 100 TB: one count aggregate on (group, value) —
    * map-side combined, heavy repeated values collapse per mapper —
    * then a prefix sum windowed PER GROUP (each group's distinct
    * values sort within its partition; groups are the parallelism
    * unit, as for any per-group ECDF) and a final per-group max.
    * Nothing pairwise, nothing quadratic. */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
              isRef: org.apache.spark.sql.Column): DataFrame = {
    val counts = df
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"),
        isRef.as("__ref"))
      .where(col("__v").isNotNull)
      .groupBy(col("__g"), col("__v"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__c1"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("__c2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"))
    counts
      .withColumn("__cum1", sum(col("__c1")).over(w))
      .withColumn("__cum2", sum(col("__c2")).over(w))
      .withColumn("__n1", sum(col("__c1")).over(wAll))
      .withColumn("__n2", sum(col("__c2")).over(wAll))
      .where(col("__n1") > 0 && col("__n2") > 0)
      .groupBy(col("__g"), col("__n1"), col("__n2"))
      // the cross difference cum1·n2 − cum2·n1 multiplies in
      // decimal(38,0), NOT long: in LongType it silently wraps once
      // n1·n2 exceeds 2⁶³ (~3·10⁹ rows a side) — with ANSI off that
      // is a wrong KS distance with no error. Values are unchanged
      // for in-range inputs (exact integer algebra either way).
      .agg(max(abs(col("__cum1").cast("decimal(38,0)") * col("__n2") -
        col("__cum2").cast("decimal(38,0)") * col("__n1"))).as("__d"))
      .select(col("__g").as(groupCol),
        col("__n1").as("n_ref"), col("__n2").as("n_cur"),
        // decimal(38,0) headroom (the chi2Assoc discipline): the
        // cross difference d ≤ n1·n2, so d·10⁶ ≤ 10³⁶ for samples up
        // to 10¹⁵ a side — comfortably decimal. Past that bound Spark
        // (ANSI off) would return NULL on decimal overflow, so the
        // loud chi2Assoc-style guard rides the projection instead of
        // letting an oversized input answer wrong silently.
        (expr("""CAST(__d AS DECIMAL(38,0)) * 1000000
               | div (CAST(__n1 AS DECIMAL(38,0)) * __n2)"""
          .stripMargin) +
          coalesce(assert_true(
            col("__n1") <= lit(1000000000000000L) &&
              col("__n2") <= lit(1000000000000000L),
            lit("ksDrift: sample sizes exceed the decimal(38,0) " +
              "headroom (~1e15 rows per side per group)"))
            .cast("long"), lit(0L))).as("ks_micro"))
  }

  def skewDiag(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "skewDiag needs at least one key column")
    keyCols.map { k =>
      val cnts = df.groupBy(coalesce(col(k).cast("string"),
          lit(" null")).as("__k"))
        .agg(count(lit(1)).as("__cnt"))
      val tot = cnts.agg(sum(col("__cnt")).as("__n"))
      cnts.crossJoin(broadcast(tot))
        .select(col("__k"), col("__cnt"), col("__n"),
          floor(col("__cnt") * -log(col("__cnt").cast("double") /
              col("__n")) * lit(1000000.0) / col("__n") + lit(0.5))
            .cast("long").as("__ent"))
        .agg(
          sum(col("__cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          min(struct((-col("__cnt")).as("nc"), col("__k").as("k")))
            .as("__top"),
          sum(col("__ent")).as("entropy_micro"))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("__top").getField("k").as("top_key"),
          (-col("__top").getField("nc")).as("top_cnt"),
          floor((-col("__top").getField("nc")) * lit(1000000.0) /
            col("n_rows")).cast("long").as("top_share_micro"),
          col("entropy_micro"))
    }.reduce(_.unionAll(_))
  }

  /** Chi-square association between two categorical columns — "is
    * the source mix independent of language?", the corpus-composition
    * drift test run before accepting a crawl batch (a chi² spike on
    * lang×source means one source's language profile moved).
    *
    * EXACT integer arithmetic, no transcendentals: each cell's
    * contribution (n−e)²/e with e = row·col/N is computed as
    * (n·N − row·col)² · 10⁶ div (row·col·N) over decimal(38,0) —
    * bit-identical on any engine (the q_anomaly discipline). The
    * decimal(38,0) headroom bounds N at ~10⁸ rows per test (diff can
    * reach N², so diff²·10⁶ ≤ N⁴·10⁶ needs N ≤ 10⁸ to stay inside 38
    * digits); a runtime assert fails loudly past the bound (with ANSI
    * off Spark would otherwise NULL on decimal overflow — silent).
    * Beyond that, run per partition — which is how a drift gate is
    * deployed anyway (today's batch vs reference).
    *
    * Shape at 100 TB: one corpus-sized count aggregate; everything
    * after runs on the CELL table (|a|·|b| rows — cardinality-sized),
    * where the marginals are windows and the grand total a one-row
    * broadcast. Σ chi2_term_micro / 10⁶ ≈ the χ² statistic,
    * dof = (|a|−1)(|b|−1).
    *
    * @return (aCol, bCol, n, row_n, col_n, chi2_term_micro). */
  def chi2Assoc(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("n"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val withTot = cells
      .withColumn("row_n", sum(col("n")).over(
        Window.partitionBy(col("__a"))))
      .withColumn("col_n", sum(col("n")).over(
        Window.partitionBy(col("__b"))))
      .crossJoin(broadcast(
        cells.agg(sum(col("n")).as("grand_n"))))
    val diff = d(col("n")) * d(col("grand_n")) -
      d(col("row_n")) * d(col("col_n"))
    withTot.select(
      col("__a").as(aCol), col("__b").as(bCol),
      col("n"), col("row_n"), col("col_n"),
      (diff * diff * d(lit(1000000L)))
        .as("__num"),
      (d(col("row_n")) * d(col("col_n")) * d(col("grand_n")))
        .as("__den"),
      col("grand_n").as("__gn"))
      // loud overflow guard: past the documented bound Spark (ANSI
      // off) would return NULL on decimal overflow — a silent wrong
      // answer. assert_true rides the projection (never pruned: its
      // null result is folded into the output column), so an
      // oversized input FAILS instead. Cost: one long compare per
      // cell row.
      .withColumn("chi2_term_micro", expr("__num div __den") +
        coalesce(assert_true(col("__gn") <= lit(100000000L),
          lit("chi2Assoc: grand_n exceeds the decimal(38,0) headroom " +
            "(~1e8 rows per test) — run per partition"))
          .cast("long"), lit(0L)))
      .drop("__num", "__den", "__gn")
  }

  /** Pearson correlation per group between two integer-valued
    * expressions — engine-reproducible: the five moment sums
    * accumulate EXACTLY in decimal(38,0) (one map-side-combining
    * aggregate, the q_anomaly overflow discipline), and the only
    * floating-point steps are one division and one sqrt over exact
    * integers — both correctly rounded under IEEE-754, so any engine
    * lands on the same bits. Degenerate groups (zero variance on
    * either side) yield NULL, like `corr`.
    *
    * @return (groupCols…, n, corr_micro) with corr_micro =
    *         floor(corr·10⁶ + 0.5). */
  def corrExact(df: DataFrame, groupCols: Seq[String], xCol: Column,
                yCol: Column): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val g = df.select(groupCols.map(col) :+ d(xCol).as("__x")
      :+ d(yCol).as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val n = d(col("n"))
    val cov = n * col("__sxy") - col("__sx") * col("__sy")
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    g.select(groupCols.map(col) :+ col("n") :+
      when(vx > 0 && vy > 0,
        floor(cov.cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")) * 1e6 + 0.5)
          .cast("long"))
        .as("corr_micro"): _*)
  }
}
