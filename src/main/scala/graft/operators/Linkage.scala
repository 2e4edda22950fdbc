package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — matching dirty strings back
  * to a clean dimension by edit distance. The scalable shape is the
  * classic BLOCKED similarity join: candidates are generated only
  * within a blocking key (here: first character + a length band
  * implied by the distance cap), never as an all-pairs cross — the
  * same never-quadratic posture as the MinHash/SimHash dedup family.
  */
object Linkage {

  /** Resolve each dirty record to its best dimension match by
    * Levenshtein distance (codegen'd built-in), searching only the
    * dirty record's block: same first character, |length delta| ≤
    * `maxDist` (an edit-distance lower bound, so the band never drops
    * a true match; callers whose dirt can touch char 1 should block
    * on a dirt-invariant key instead). Best = min distance, ties to
    * the lexicographically smallest candidate. Unmatched dirty rows
    * (no candidate within `maxDist`) are dropped — the caller
    * anti-joins for the residue if it wants a manual-review queue.
    *
    * The dimension's distinct name table is vocabulary-sized and
    * BROADCAST; the per-record windows are partitioned by the dirty
    * id, so no single-task sort exists anywhere. At 100 TB the block
    * key widens (more prefix chars) to keep per-block candidate
    * lists bounded — the blocking column is a parameter for exactly
    * that reason. */
  def fuzzyResolve(dirty: DataFrame, idCol: String, nameCol: String,
                   dim: DataFrame, dimNameCol: String,
                   maxDist: Int = 2,
                   blockOf: Column => Column = substring(_, 1, 1))
      : DataFrame = {
    val cands = dim.select(col(dimNameCol).as("matched_name")).distinct()
      .withColumn("__blk", blockOf(col("matched_name")))
    val scored = dirty
      .select(col(idCol), col(nameCol).as("dirty_name"),
        blockOf(col(nameCol)).as("__blk"))
      .join(broadcast(cands), Seq("__blk"))
      .where(abs(length(col("dirty_name")) - length(col("matched_name")))
        <= maxDist)
      .withColumn("dist", levenshtein(col("dirty_name"), col("matched_name")))
      .where(col("dist") <= maxDist)
    val perId = Window.partitionBy(col(idCol))
    scored
      .withColumn("n_candidates",
        count(lit(1)).over(perId).cast("int"))
      .withColumn("__rk", row_number().over(
        perId.orderBy(col("dist").asc, col("matched_name").asc)))
      .where(col("__rk") === 1)
      .select(col(idCol), col("dirty_name"), col("matched_name"),
        col("dist"), col("n_candidates"))
  }
}
