package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staging-layer operators: align heterogeneous raw frames onto one
  * contract schema and union them.
  *
  * Re-expresses the reference's `format_stg`
  * (/root/reference/airflow/dags/utils/init_spark.py:118-147): every
  * country feed is coerced to the same (column, type) list — missing
  * columns become typed nulls, present ones are cast — then unioned
  * into a single staged table. Pure projections: zero shuffle, fully
  * codegen'd, column-pruning friendly.
  */
object Staging {

  /** Coerce `df` to exactly `contract` = ordered (name, sparkTypeDDL)
    * pairs. Missing columns → typed null; present → cast. */
  def alignTo(df: DataFrame, contract: Seq[(String, String)]): DataFrame = {
    val cols = contract.map { case (name, tpe) =>
      // resolve case-insensitively, like Spark's default analyzer —
      // a feed column differing only in case must NOT be null-replaced
      df.columns.find(_.equalsIgnoreCase(name)) match {
        case Some(actual) => col(actual).cast(tpe).as(name)
        case None         => lit(null).cast(tpe).as(name)
      }
    }
    df.select(cols: _*)
  }

  /** Align every source frame to the contract and union them — the
    * VN+US+JP → stg_stock pattern. `unionByName` would also work, but
    * aligning first keeps the output column ORDER deterministic. */
  def unionAligned(contract: Seq[(String, String)],
                   frames: DataFrame*): DataFrame =
    frames.map(alignTo(_, contract)).reduce(_.union(_))
}
