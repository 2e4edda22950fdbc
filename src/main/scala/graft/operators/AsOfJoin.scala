package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the LATEST right row of the
  * same key with rightTime <= leftTime (optionally within a
  * tolerance). The classic financial "trade joined to most recent
  * quote" — an operator Spark lacks natively.
  *
  * Implementation is the union-sort trick, NOT a range join:
  * tag both sides, union them, and carry the last-seen right row
  * forward with a running `last(ignoreNulls)` window per key. One
  * shuffle on the key, linear in rows — where a naive equi+range join
  * degenerates quadratically for hot keys (every left row × every
  * earlier right row survives the equi part), this stays O(n log n)
  * per key regardless of skew, which is what makes it usable on a
  * 100 TB trade table.
  *
  * Ordering: at equal timestamps the right row sorts BEFORE the left
  * row, so a right event exactly at leftTime matches (<= semantics,
  * same as DuckDB/kdb ASOF).
  */
object AsOfJoin {

  /** @param left       fact side (every row preserved — left join)
    * @param right      version/quote side
    * @param key        equi keys
    * @param leftTime   event-time column name on the left
    * @param rightTime  event-time column name on the right (may equal
    *                   leftTime's name; sides are tagged internally)
    * @param toleranceMillis  if >= 0, matches older than
    *                   leftTime - tolerance are discarded (null fill)
    * @param tieBreak   right-side columns that order equal-timestamp
    *                   right rows; the row GREATEST under this order
    *                   wins (e.g. a monotonic event id → latest wins).
    *                   Empty → ties resolve by a deterministic hash of
    *                   the right payload (stable but arbitrary; other
    *                   engines' ASOF may disagree on tied inputs).
    * @return left columns + right's non-key columns (right time
    *         surfaced as `matched_time`)
    */
  def apply(left: DataFrame, right: DataFrame, key: Seq[String],
            leftTime: String, rightTime: String,
            toleranceMillis: Long = -1L,
            tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.filterNot(key.contains).toSeq

    val l = left.select(
      key.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__is_l"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(
          org.apache.spark.sql.types.StructType(
            right.select(rightPayload.map(col): _*).schema)).as("__r")): _*)
    val r = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__is_l"),
        lit(null).cast(
          org.apache.spark.sql.types.StructType(
            left.select(leftCols.map(col): _*).schema)).as("__l"),
        struct(rightPayload.map(col): _*).as("__r")): _*)

    // final tie-break for equal-timestamp right rows (otherwise they
    // resolve by shuffle order, i.e. nondeterministically): caller's
    // columns if given, else a deterministic hash of the right payload
    val tieCols: Seq[Column] =
      if (tieBreak.nonEmpty) tieBreak.map(c => col(s"__r.$c"))
      else Seq(xxhash64(col("__r")))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__t") +: col("__is_l") +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.union(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__mt", last(when(col("__is_l") === 0, col("__t")),
        ignoreNulls = true).over(w))
      .where(col("__is_l") === 1)

    val withinTol =
      if (toleranceMillis < 0) matched
      else matched.withColumn("__keep",
          col("__mt").isNotNull &&
            unix_millis(col("__t")) - unix_millis(col("__mt")) <= toleranceMillis)
        .withColumn("__m", when(col("__keep"), col("__m")))
        .withColumn("__mt", when(col("__keep"), col("__mt")))
        .drop("__keep")

    withinTol.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__m.$c").as(c)) :+
        col("__mt").as("matched_time"): _*)
  }
}
