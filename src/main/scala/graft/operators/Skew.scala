package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salting for hot keys.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; these operators cover the cases AQE does not: skewed
  * AGGREGATION keys, and hash joins where one key dominates so badly
  * that a single task would own it.
  *
  * Salting is deterministic here (hash of a caller-chosen unique
  * column, not rand()) so results are reproducible run to run.
  */
object Skew {

  /** Two-phase (salted) sum/count aggregation: partial-aggregate on
    * (key, salt), then merge per key. A hot key's rows spread over
    * `salts` tasks instead of one. avg is reconstructed from
    * sum/count, so the result is exact. */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: Column,
                saltFrom: Column, salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts)))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"),
        count(valueCol).as("__pvals"))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__psum")).as("total"),
        sum(col("__pcnt")).as("n"),
        // avg over NON-NULL values only, matching avg() semantics
        when(sum(col("__pvals")) > 0,
          sum(col("__psum")) / sum(col("__pvals"))).as("avg"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, salts); the (small-ish, but above
    * broadcast threshold) right side is replicated `salts` times so
    * every (key, salt) bucket finds its match. Exact same rows as the
    * plain join, but a hot key now lands on `salts` tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: Column, salts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched right row once PER
    // SALT REPLICA — reject rather than silently multiply rows
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase.replace("leftouter", "left_outer")),
      s"saltedJoin cannot preserve unmatched right rows: $joinType")
    val l = left.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    // join strategy is left to the planner/AQE: a shuffle_hash hint
    // was measured at sf1 (6M-row left) and came out ~25% SLOWER than
    // the default — the dominant cost is the left side's (key, salt)
    // exchange, which is the inherent price of a non-broadcastable
    // salted join, not the merge/build step. (Cross-scale CPU ratios
    // for this operator are dominated by AQE broadcast-flipping the
    // tiny replicated dim at SMALL scale — the big-scale plan is the
    // honest shuffle join.)
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
