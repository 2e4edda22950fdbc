package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecFns
import graft.operators.Similarity

/** Persisted scalar-quantized embedding corpus — the STORAGE side of
  * the SQ8 tier: instead of recomputing codes from float vectors on
  * every query (what `sqTopK` does for its oracle-checked one-shot
  * form), the corpus is written ONCE as one byte per dimension plus a
  * one-row bounds sidecar, and every later scan reads 4× fewer bytes
  * than float32 parquet. At 100 TB this is the difference between a
  * 100 TB and a 25 TB ANN scan.
  *
  * Layout: `path/codes/` (idCol, codes array<byte>, offset-binary) and
  * `path/bounds/` (one row: dim, lo[], hi[]). The decode is the
  * native [[graft.plans.SqDecode]] kernel, so a read-and-rank plan
  * stays one whole-stage-codegen projection over the compact scan.
  * encode∘decode == the in-flight SqReconstruct round trip
  * (spec-asserted), so `sqTopK` over the decoded corpus returns
  * exactly what it returns over the raw floats. */
object QuantizedStore {

  /** Quantize and persist `corpus` (bounds derived from the corpus
    * itself). Overwrites any previous store at `path`. */
  def write(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
            path: String): Unit = {
    val (lo, hi) = Similarity.dimBounds(corpus, vecCol, dim)
    corpus.select(col(idCol),
        VecFns.sqEncode(col(vecCol), lo.toSeq, hi.toSeq).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((dim, lo.toSeq, hi.toSeq)).toDF("dim", "lo", "hi")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bounds")
  }

  /** Append a corpus DELTA under the store's FROZEN bounds — the
    * daily-ingest path at 100 TB: new vectors are coded against the
    * existing sidecar (re-deriving bounds from old∪new would silently
    * re-scale the meaning of every EXISTING code on disk). A new
    * value outside the frozen range CLAMPS to the boundary code (the
    * encode kernel saturates by design); sustained drift is a
    * monitored rewrite decision, never a hidden re-scale. Ids are not
    * deduplicated here — upstream exact dedup owns identity. */
  def append(delta: DataFrame, idCol: String, vecCol: String,
             path: String): Unit = {
    val spark = delta.sparkSession
    val b = spark.read.parquet(s"$path/bounds").head()
    val lo = b.getSeq[Double](b.fieldIndex("lo"))
    val hi = b.getSeq[Double](b.fieldIndex("hi"))
    delta.select(col(idCol),
        VecFns.sqEncode(col(vecCol), lo, hi).as("codes"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** The reconstructed corpus: (idCol, vecCol array<double>) — a pure
    * native-decode projection over the byte-code scan. */
  def read(spark: SparkSession, path: String, idCol: String,
           vecCol: String): DataFrame = {
    val b = spark.read.parquet(s"$path/bounds").head()
    val lo = b.getSeq[Double](b.fieldIndex("lo"))
    val hi = b.getSeq[Double](b.fieldIndex("hi"))
    spark.read.parquet(s"$path/codes")
      .select(col(idCol), VecFns.sqDecode(col("codes"), lo, hi).as(vecCol))
  }

  /** ANN straight off the store: rank the decoded corpus by cosine
    * against full-precision `queries` — the read side of the 4×
    * cheaper scan. Equals `Similarity.sqTopK` over the raw corpus
    * (spec-asserted): decode == the in-flight round trip, so nothing
    * is lost by going through storage. */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpus = read(spark, path, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), VecFns.norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), VecFns.norm(col(vecCol)).as("__cn"))
    Similarity.rankTopK(q, c, k)
  }
}
