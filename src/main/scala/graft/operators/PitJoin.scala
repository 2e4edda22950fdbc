package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (as-of interval) join: attach to each fact row the
  * dimension version that was in effect at the fact's event time.
  *
  * Reference origin: fact_stock_daily's company join
  * (/root/reference/airflow/dags/spark_code/curated/fact_stock_daily.py:
  * `fact4` — symbol/country equality + datadate BETWEEN effective_from
  * AND effective_to). Interval semantics here are half-open
  * [from, to) to pair with Scd2.build — exactly one version matches.
  *
  * Scale: the join condition is equi (entity key) + range. Catalyst
  * plans the equi part as the join key, so this is a hash/sort-merge
  * join on entity — NOT a cartesian. SCD2 dims are usually small
  * (entity_count × avg_versions); when the dim fits the broadcast
  * threshold pass `broadcastDim = true` (default) and the fact table
  * is never shuffled at all.
  */
object PitJoin {

  def apply(fact: DataFrame, dim: DataFrame, entityKey: Seq[String],
            factTime: String, validFrom: String = "effective_from",
            validTo: String = "effective_to",
            joinType: String = "left",
            broadcastDim: Boolean = true): DataFrame = {
    // Explicit aliases: fact and dim often share lineage (dim built
    // from the same feed), which otherwise degenerates into trivially
    // true self-join predicates.
    val f = fact.alias("__pit_f")
    val d0 = dim.alias("__pit_d")
    val d = if (broadcastDim) broadcast(d0) else d0
    val keyCond = entityKey
      .map(k => col(s"__pit_f.$k") === col(s"__pit_d.$k")).reduce(_ && _)
    val rangeCond = col(s"__pit_f.$factTime") >= col(s"__pit_d.$validFrom") &&
      col(s"__pit_f.$factTime") < col(s"__pit_d.$validTo")
    val joined = f.join(d, keyCond && rangeCond, joinType)
    // drop the dim-side duplicate key columns
    entityKey.foldLeft(joined)((acc, k) => acc.drop(col(s"__pit_d.$k")))
  }
}
