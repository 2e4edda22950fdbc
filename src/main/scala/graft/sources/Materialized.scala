package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates over snapshot
  * tables — the piece that turns the change feed into a 100 TB
  * workflow: a grouped COUNT/SUM rollup stays fresh by reading each
  * commit's DELTA (via `LakeWriter.changesBetween`) and merging the
  * touched groups, never re-scanning the source. Refresh cost is
  * O(delta + touched groups), not O(table): a daily commit touching
  * one day's rows updates the handful of groups that day hits, and
  * the MERGE rewrites only the MV files holding those groups.
  *
  * The maintained aggregates are the SELF-MAINTAINABLE ones under
  * insert+delete deltas — count and sum, where a delete subtracts
  * exactly what the matching insert added (min/max are NOT: a
  * deleted extremum needs a source re-scan to re-derive; compose
  * those on top as a periodic full refresh if needed).
  */
object Materialized {

  /** Refresh (or bootstrap) the COUNT/SUM materialized view of
    * `srcTable` grouped by `groupCols`, consuming every version
    * committed since the cursor last advanced. The MV is itself a
    * snapshot table with schema `groupCols ++ (n_rows, sum_<c>...)`
    * and one row per group; groups whose row count returns to zero
    * are deleted (file-pruned) rather than kept as tombstones.
    *
    * Replays are idempotent BY VALUE: a crash after the MV merge but
    * before the cursor advance re-derives the same touched-group
    * values from the same delta on the next run (the merge replaces
    * rows, it does not re-add) — with one exception, a replayed
    * bootstrap double-counts; bootstrap last, or wipe the MV with
    * the cursor. Group columns must be non-null (the usual MV key
    * contract; enforce upstream or bucket nulls explicitly).
    *
    * @param sumCols numeric source columns to maintain sums for
    * @return versions of `srcTable` processed this call */
  def refreshAgg(spark: SparkSession, srcTable: String, mvTable: String,
                 cursorPath: String, groupCols: Seq[String],
                 sumCols: Seq[String]): Seq[Long] =
    LakeWriter.processNewVersions(spark, srcTable, cursorPath) {
      (feed, _) =>
        val sign = when(col("_change_type") === "insert", 1L)
          .otherwise(-1L)
        val delta = feed.groupBy(groupCols.map(col): _*).agg(
          sum(sign).as("n_rows"),
          sumCols.map(c => sum(col(c) * sign).as(s"sum_$c")): _*)
        val valueCols = "n_rows" +: sumCols.map(c => s"sum_$c")
        val outCols = groupCols ++ valueCols
        if (LakeWriter.snapshotVersions(spark, mvTable).isEmpty) {
          LakeWriter.commitSnapshot(
            delta.where(col("n_rows") =!= 0L)
              .select(outCols.map(col): _*), mvTable): Unit
        } else {
          val current = LakeWriter.readSnapshot(spark, mvTable)
          // touched groups only: delta drives, current fills in the
          // prior totals (0 for groups the MV has not seen)
          val merged = delta.alias("d")
            .join(current.alias("m"), groupCols, "left")
            .select(groupCols.map(col) ++ valueCols.map(c =>
              // both sides null-guarded: a commit whose feed values for
              // a sumCol are all NULL yields a NULL delta sum, and an
              // unguarded + would wipe the group's accumulated total
              (coalesce(col(s"m.$c"), lit(0L)) +
                coalesce(col(s"d.$c"), lit(0L))).as(c)): _*)
          LakeWriter.mergeSnapshot(merged, mvTable, groupCols)
          // emptied groups leave the MV; the delete file-prunes
          LakeWriter.deleteFromSnapshot(spark, mvTable,
            col("n_rows") === 0L): Unit
        }
    }
}
