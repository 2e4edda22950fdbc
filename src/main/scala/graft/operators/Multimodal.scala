package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * Image decode/resize are REAL (JDK `javax.imageio`, PNG — see
  * `decodeImageFeatures` / `resizeImageNN`). The generic byte-feature
  * path (`decodeFeaturesStub`) and audio PCM framing remain
  * deterministic byte-level kernels behind the same batched seam: the
  * Spark-side contract — schema, batching shape, partitioning — is
  * production-shaped; swap the loop for a codec/DSP call and nothing
  * else changes.
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

  // ==== REAL image decode (JDK javax.imageio — zero extra jars) ====
  //
  // The decode seam below is NOT a stub: payloads are genuine PNG
  // byte streams, decoded with `javax.imageio.ImageIO`. Test media is
  // synthesized deterministically (pixel value = closed-form function
  // of (id, x, y)), so an independent reimplementation — the DuckDB
  // oracle — re-derives every feature from the formula without ever
  // touching PNG bytes, proving the encode→decode roundtrip faithful.

  /** Deterministic synthetic image dims: 8..16 × 8..16, a function of
    * the id so widths/heights vary across the corpus. */
  def synthDims(id: Long): (Int, Int) =
    (8 + (id % 9).toInt, 8 + ((id * 7) % 9).toInt)

  /** Deterministic synthetic RGB pixel at (x, y) for image `id`. */
  def synthPixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((id * 17 + x * 11 + y * 5) % 256).toInt,
    ((id * 23 + x * 3 + y * 19) % 256).toInt)

  private def synthImage(id: Long): java.awt.image.BufferedImage = {
    val (w, h) = synthDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = synthPixel(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize one real PNG per input id (batched per partition,
    * codec init amortized — ImageIO's disk cache is disabled once per
    * partition). Output: (media_id, payload, meta). */
  def encodeSyntheticPng(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType),
        StructField("n_bytes", LongType),
        StructField("source", StringType))))))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = pngBytes(synthImage(id))
          Row(id, bytes, Row("image/png", bytes.length.toLong, "synthetic"))
        }
      }(enc)
  }

  /** REAL image decode: parse each payload with `ImageIO.read`,
    * extract width/height, per-channel means and a 4-bucket luma
    * histogram (integer luma = (r+g+b)/3, bucket = luma/64 — exact
    * integer ratios, so the oracle reproduces them bit-for-bit).
    * Undecodable/empty payloads yield no row (count them upstream). */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("l0", DoubleType),
      StructField("l1", DoubleType),
      StructField("l2", DoubleType),
      StructField("l3", DoubleType)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img =
            if (p == null || p.isEmpty) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          if (img == null) Iterator.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            val lh = new Array[Long](4)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val cr = (rgb >> 16) & 0xFF
                val cg = (rgb >> 8) & 0xFF
                val cb = rgb & 0xFF
                sr += cr; sg += cg; sb += cb
                lh(((cr + cg + cb) / 3) / 64) += 1L
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val nd = n.toDouble
            Iterator.single(Row(id, w, h, n,
              sr / nd, sg / nd, sb / nd,
              lh(0) / nd, lh(1) / nd, lh(2) / nd, lh(3) / nd))
          }
        }
      }(enc)
  }

  /** REAL resize: decode with ImageIO, nearest-neighbor resample to
    * `outW`×`outH` (srcX = x·srcW/outW, integer floor — the mapping an
    * oracle can re-derive exactly), re-encode as PNG. */
  def resizeImageNN(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, s"bad out dims $outW x $outH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img =
            if (p == null || p.isEmpty) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          if (img == null) Iterator.empty
          else {
            val sw = img.getWidth; val sh = img.getHeight
            val out = new java.awt.image.BufferedImage(
              outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < outH) {
              var x = 0
              while (x < outW) {
                out.setRGB(x, y, img.getRGB(x * sw / outW, y * sh / outH))
                x += 1
              }
              y += 1
            }
            Iterator.single(Row(id, pngBytes(out), outW, outH))
          }
        }
      }(enc)
  }

  /** Perceptual image hash (average-hash) through the REAL decode
    * seam — the image-dedup primitive: decode the payload with
    * ImageIO, nearest-neighbor-sample an 8×8 luma grid (srcX =
    * x·w/8 integer floor, the [[resizeImageNN]] mapping), and set
    * bit i = y·8+x when cell luma · 64 > the grid's luma sum
    * (strictly — ties clear the bit; integer luma = (r+g+b)/3). Two
    * visually-identical images hash equal regardless of byte-level
    * encoding differences; near-dups differ in few bits, so the
    * downstream near-dup join is the SimHash hamming-band machinery
    * this engine already runs on text. The 64 bits return as two
    * unsigned 32-bit halves in BIGINTs (hash_hi, hash_lo) so an ANSI
    * oracle can re-derive them without 64-bit sign games.
    * Undecodable/empty payloads yield no row. */
  def imageAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("hash_hi", LongType, nullable = false),
      StructField("hash_lo", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img =
            if (p == null || p.isEmpty) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          if (img == null) Iterator.empty
          else {
            val sw = img.getWidth; val sh = img.getHeight
            val lum = new Array[Long](64)
            var tot = 0L
            var i = 0
            while (i < 64) {
              val rgb = img.getRGB((i % 8) * sw / 8, (i / 8) * sh / 8)
              val l = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                (rgb & 0xFF)) / 3
              lum(i) = l; tot += l
              i += 1
            }
            var lo = 0L; var hi = 0L
            i = 0
            while (i < 64) {
              if (lum(i) * 64L > tot) {
                if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
              }
              i += 1
            }
            Iterator.single(Row(id, hi, lo))
          }
        }
      }(enc)
  }

  /** REAL audio resampling: treat the payload as 8-bit PCM (sample =
    * byte − 128) and resample to exactly `outLen` samples by linear
    * interpolation. Sample i maps to source position
    * t = i·(len−1)/(outLen−1); with num = i·(len−1), den = outLen−1,
    * idx = num div den, rem = num mod den:
    *   out_i = s[idx] + (s[idx+1] − s[idx]) · rem / den
    * — all-integer operands and one double divide, so an independent
    * reimplementation (the DuckDB oracle) reproduces every sample
    * bit-for-bit. Endpoints are exact (rem = 0 at i = 0 and
    * i = outLen−1). A 1-sample payload is constant-extended; an empty
    * payload yields no rows. */
  def audioResampleLinear(media: DataFrame, outLen: Int): DataFrame = {
    require(outLen >= 2, s"outLen must be >= 2: $outLen")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_idx", IntegerType),
      StructField("sample", DoubleType)))
    val enc = Encoders.row(outSchema)
    val den = (outLen - 1).toLong
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte]
                  else r.getAs[Array[Byte]](1)
          if (p.isEmpty) Iterator.empty
          else {
            val s = (i: Int) => ((p(i) & 0xFF) - 128).toDouble
            (0 until outLen).iterator.map { i =>
              val v =
                if (p.length == 1) s(0)
                else {
                  val num = i.toLong * (p.length - 1)
                  val idx = (num / den).toInt
                  val rem = num % den
                  if (rem == 0) s(idx)
                  else s(idx) + (s(idx + 1) - s(idx)) * rem / den
                }
              Row(id, i, v)
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

  /** Scene-cut detection over frame-sampled video payloads — the
    * shot-boundary pass every video-curation pipeline runs before
    * per-scene captioning/sampling. Non-overlapping `frameLen`-byte
    * frames stand in for decoded video frames; per frame the decode
    * seam emits an integer LUMA proxy (unsigned byte sum — a real
    * decoder would emit the luma-plane sum), and the declarative tail
    * does the actual detection: lag-diff per media stream, a cut
    * where |diff| ≥ `cutThreshold`, and a running-sum `scene_id` so
    * downstream ops can group frames by shot.
    *
    * Scale shape: the seam is one batched per-partition pass over the
    * payload scan (no shuffle); the lag/diff/scene windows all share
    * ONE exchange keyed by media_id. Frame counts per stream are
    * bounded (len/frameLen), so no window buffers more than one
    * stream's frames. Integer math end to end — the oracle re-derives
    * every column exactly. */
  def sceneCuts(media: DataFrame, frameLen: Int = 64,
                cutThreshold: Long = 300L): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1: $frameLen")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("luma", LongType)))
    val enc = Encoders.row(outSchema)
    val frames = media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition: init a real video decoder once here
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.empty[Byte]
                  else r.getAs[Array[Byte]](1)
          if (p.isEmpty) Iterator.empty
          else {
            val nFrames = math.max(1, (p.length - frameLen) / frameLen + 1)
            (0 until nFrames).iterator.map { f =>
              val start = f * frameLen
              val end = math.min(start + frameLen, p.length)
              var s = 0L
              var i = start
              while (i < end) { s += (p(i) & 0xFF); i += 1 }
              Row(id, f, s)
            }
          }
        }
      }(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("diff",
        coalesce(col("luma") - lag(col("luma"), 1).over(w), lit(0L)))
      .withColumn("is_cut",
        (col("frame_idx") > 0 && abs(col("diff")) >= cutThreshold)
          .cast("int"))
      .withColumn("scene_id", sum(col("is_cut")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)).cast("int"))
  }
}
