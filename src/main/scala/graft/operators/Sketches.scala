package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency sketching — the bounded-state answer to "what are the
  * hot keys" at 100 TB, where an exact per-key count table may itself
  * be too large to keep. Rides Spark's native `count_min_sketch`
  * aggregate (a codegen'd TypedImperativeAggregate with map-side
  * partial merge; sketch width/depth are fixed by (eps, confidence),
  * so executor state is CONSTANT regardless of key cardinality).
  */
object Sketches {

  /** Heavy hitters with a count-min-sketch accuracy contract. The
    * exact top-`k` (count desc, item asc) rides the same scan as the
    * verification twin — the driver gate hash-checks that every
    * sketch estimate obeys CMS's published one-sided bound
    * (exact ≤ est ≤ exact + 2·eps·N + 5). At 100 TB only the sketch
    * runs; it is the point of the operator — the exact twin is a
    * vocabulary-sized aggregate kept for the gate, while the sketch
    * is a few KB of executor state that answers point queries for
    * ANY item, not just the retained top-k.
    *
    * The only driver-side materializations are the serialized sketch
    * (width·depth counters, a few KB by construction) and the k
    * output rows — both bounded by parameters, never by |df|. */
  def heavyHitters(spark: SparkSession, df: DataFrame, itemCol: String,
                   k: Int, eps: Double = 0.0005,
                   confidence: Double = 0.9999): DataFrame = {
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val skRow = items.agg(
      expr(s"count_min_sketch(item, ${eps}d, ${confidence}d, 42)").as("sk"),
      count(lit(1)).as("n")).head()
    val sketch = CountMinSketch.readFrom(
      new ByteArrayInputStream(skRow.getAs[Array[Byte]]("sk")))
    val n = skRow.getAs[Long]("n")
    val slack = (2.0 * eps * n).toLong + 5L
    val top = items.groupBy(col("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item").asc)
      .limit(k)
      .collect() // k rows by construction
    val out = top.map { r =>
      val item = r.getString(0)
      val exact = r.getLong(1)
      val est = sketch.estimateCount(item)
      (item, exact,
        if (est >= exact && est <= exact + slack) 1 else 0)
    }
    spark.createDataFrame(out.toSeq)
      .toDF("item", "exact_cnt", "within_bound")
  }

  /** Heavy hitters via the NATIVE Misra-Gries aggregate
    * ([[graft.plans.MisraGriesTopK]]) — deterministic counter state
    * (≤ capacity entries per partial) instead of CMS's hashed grid,
    * and a GUARANTEED two-sided contract that holds under any merge
    * order: with N inputs and retained counter-mass M,
    * est(i) ≤ true(i) ≤ est(i) + (N−M)/(capacity+1), and every item
    * above that slack is certainly retained. The ok-flag asserts
    * exactly that contract per exact-top-k item (truth ≤ slack items
    * may legitimately be absent). Driver sees one bounded map plus k
    * rows, never a key-scale collect. */
  def topKGuaranteed(spark: SparkSession, df: DataFrame, itemCol: String,
                     k: Int, capacity: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val sk = GraftColumnBridge.column(
      graft.plans.MisraGriesTopK(
        GraftColumnBridge.expression(col("item")), capacity)
        .toAggregateExpression())
    val row = items.agg(sk.as("sketch"), count(lit(1)).as("n")).head()
    val counters = row.getMap[String, Long](0)
    val n = row.getLong(1)
    // (N−M)/(cap+1) floored is exact for integer bounds: an integer
    // ≤ the real slack is ≤ its floor
    val slack = (n - counters.values.sum) / (capacity + 1)
    val top = items.groupBy(col("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item").asc)
      .limit(k)
      .collect() // k rows by construction
    val out = top.map { r =>
      val item = r.getString(0)
      val exact = r.getLong(1)
      val ok = counters.get(item) match {
        case Some(est) => est <= exact && exact <= est + slack
        case None => exact <= slack
      }
      (item, exact, if (ok) 1 else 0)
    }
    spark.createDataFrame(out.toSeq)
      .toDF("item", "exact_cnt", "sketch_ok")
  }

  /** Per-GROUP Misra-Gries heavy hitters — one bounded sketch per
    * group (top tokens per source/domain, hot keys per tenant), and
    * the whole contract check stays COLUMNAR: unlike the global
    * [[topKGuaranteed]], nothing but the final result ever reaches
    * the driver, so group cardinality is unbounded. The sketch table
    * (one map per group, ≤ capacity entries) joins the per-group
    * exact top-k on the group key; per-group slack and the per-item
    * membership probe (`element_at` on the counter map) are plain
    * column expressions. The two-sided MG guarantee is asserted per
    * retained item: est ≤ true ≤ est + (N_g − M_g)/(capacity+1),
    * absent items must be ≤ slack.
    *
    * @return (groupCol, item, exact_cnt, sketch_ok). */
  def topKGuaranteedByGroup(df: DataFrame, groupCol: String,
                            itemCol: String, k: Int,
                            capacity: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.expressions.Window
    val items = df.select(col(groupCol).cast("string").as("grp"),
        col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull && col("grp").isNotNull)
    val sk = GraftColumnBridge.column(
      graft.plans.MisraGriesTopK(
        GraftColumnBridge.expression(col("item")), capacity)
        .toAggregateExpression())
    val sketches = items.groupBy(col("grp"))
      .agg(sk.as("__sketch"), count(lit(1)).as("__n"))
      .withColumn("__mass",
        coalesce(aggregate(map_values(col("__sketch")), lit(0L), _ + _),
          lit(0L)))
      // integral div (not /, which would go through double): floored
      // slack is exact for integer bounds, same as the global twin
      .withColumn("__slack", expr(s"(__n - __mass) div ${capacity + 1}"))
    val top = items.groupBy(col("grp"), col("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("exact_cnt").desc, col("item").asc)))
      .where(col("__rk") <= k)
    top.join(sketches, Seq("grp"))
      .select(col("grp").as(groupCol), col("item"), col("exact_cnt"),
        when(element_at(col("__sketch"), col("item")).isNotNull,
          (element_at(col("__sketch"), col("item")) <= col("exact_cnt"))
            && (col("exact_cnt") <=
              element_at(col("__sketch"), col("item")) + col("__slack")))
          .otherwise(col("exact_cnt") <= col("__slack"))
          .cast("int").as("sketch_ok"))
  }
}
