package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeFeaturesStub` derives deterministic fake
  * features from the bytes. The Spark-side contract — schema,
  * batching shape, partitioning — is real: swap `stubFeatures` for a
  * JNI/codec call and nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap a textual column as a binary payload + metadata — stands in
    * for reading real media files into the lake. */
  def attachBinary(df: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit(mime).as("mime"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** ==== the decode seam ====
    * Deterministic fake "decoder": real code would parse the payload
    * with a codec here. Runs per-partition so a real implementation
    * amortizes codec init across a batch of rows (mapInPandas-style
    * batching, Scala edition). */
  private def stubFeatures(payload: Array[Byte]): (Long, Double, Array[Double]) = {
    if (payload == null || payload.isEmpty) (0L, 0.0, Array.fill(8)(0.0))
    else {
      val n = payload.length.toLong
      val mean = payload.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / n
      // 8-dim "embedding": byte histogram over 8 buckets, normalized.
      // Double-precision end to end: exact-int counts / n is the same
      // IEEE value any independent reimplementation (incl. the DuckDB
      // oracle) computes, so the features are verifiable bit-for-bit.
      val hist = Array.fill(8)(0.0)
      payload.foreach(b => hist((b & 0xFF) / 32) += 1.0)
      (n, mean, hist.map(_ / n))
    }
  }

  /** Batched feature extraction over the payloads. Output:
    * (media_id, n_bytes, byte_mean, features: array<float>). */
  def decodeFeaturesStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("byte_mean", DoubleType),
      StructField("features", ArrayType(DoubleType))))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition: init a real codec once here
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (n, mean, feats) = stubFeatures(payload)
          Row(id, n, mean, feats.toSeq)
        }
      }(enc)
  }

  /** Serving shape: the features array expanded to scalar columns
    * (f0..f{dim-1}) — a flat schema is what a feature store (and the
    * driver's pandas-based comparer, which cannot sort array columns)
    * expects downstream. */
  def decodeFeaturesFlatStub(media: DataFrame, dim: Int = 8): DataFrame =
    (0 until dim).foldLeft(decodeFeaturesStub(media)) { (d, i) =>
      d.withColumn(s"f$i", element_at(col("features"), i + 1).cast("double"))
    }.drop("features")

  /** "Resize": shrink each payload by keeping every `factor`-th byte —
    * the deterministic stub for an image/audio resample kernel. Runs
    * through the same per-partition seam as the decoder (swap the
    * decimation loop for a real resampler; schema and batching are
    * already production-shaped). */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("n_bytes", LongType)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte]
                  else r.getAs[Array[Byte]](1)
          val out = Array.tabulate(p.length / factor)(i => p(i * factor))
          Row(id, out, out.length.toLong)
        }
      }(enc)
  }

  /** Audio feature seam: treat the payload as 8-bit PCM (sample =
    * byte − 128), cut it into `frameLen`-sample windows every `stride`
    * samples, and emit the two classic per-frame features — mean
    * energy and zero-crossing rate. The per-partition batching is the
    * real contract (swap the loop for a codec/DSP call); the features
    * are exact integer-ratio doubles, so an independent
    * reimplementation (the DuckDB oracle) reproduces them
    * bit-for-bit. A payload shorter than one frame yields its single
    * partial frame; an empty payload yields no rows. */
  def audioFramesStub(media: DataFrame, frameLen: Int = 32,
                      stride: Int = 16): DataFrame = {
    require(frameLen >= 1 && stride >= 1, s"bad frame/stride $frameLen/$stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("n_samples", LongType),
      StructField("energy", DoubleType),
      StructField("zcr", DoubleType)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition: init a real decoder/DSP kernel once here
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte]
                  else r.getAs[Array[Byte]](1)
          if (p.isEmpty) Iterator.empty
          else {
            val nFrames = math.max(1, (p.length - frameLen) / stride + 1)
            (0 until nFrames).iterator.map { f =>
              val start = f * stride
              val end = math.min(start + frameLen, p.length)
              val s = Array.tabulate(end - start)(i =>
                (p(start + i) & 0xFF) - 128)
              val energy =
                s.foldLeft(0L)((a, x) => a + x.toLong * x).toDouble / s.length
              val zcr =
                if (s.length < 2) 0.0
                else (1 until s.length)
                  .count(i => (s(i) < 0) != (s(i - 1) < 0))
                  .toDouble / (s.length - 1)
              Row(id, f, s.length.toLong, energy, zcr)
            }
          }
        }
      }(enc)
  }

  /** "Frame sampling": slice `frameLen`-byte windows every `stride`
    * bytes from the payload — the plumbing (posexplode fan-out,
    * per-frame rows) is exactly what real video frame extraction
    * produces. */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        greatest(lit(1),
          ((length(col("payload")) - frameLen) / stride + 1).cast("int"))
          .as("n_frames"))
      .select(col("media_id"), posexplode(
        transform(sequence(lit(0), col("n_frames") - 1),
          i => col("payload").substr(i * stride + 1, lit(frameLen))))
        .as(Seq("frame_idx", "frame")))
}
