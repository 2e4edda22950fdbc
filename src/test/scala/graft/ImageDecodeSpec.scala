package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Real-codec image path (javax.imageio): synthetic PNGs round-trip
  * through genuine encode→decode, features match the closed-form
  * pixel formula, nearest-neighbor resize is pixel-exact. */
class ImageDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")

  private def media(n: Int) =
    Multimodal.encodeSyntheticPng(docs.where(col("doc_id") < n), "doc_id")

  test("encodeSyntheticPng emits genuine PNG byte streams") {
    val rows = media(5).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      // PNG magic: 89 50 4E 47 0D 0A 1A 0A
      assert((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      val meta = r.getAs[Row]("meta")
      assert(meta.getAs[String]("mime") == "image/png")
      assert(meta.getAs[Long]("n_bytes") == p.length.toLong)
    }
  }

  test("decodeImageFeatures matches the closed-form pixel formula") {
    val out = Multimodal.decodeImageFeatures(media(20)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 20)
    (0L until 20L).foreach { id =>
      val (w, h) = Multimodal.synthDims(id)
      val px = for { y <- 0 until h; x <- 0 until w }
        yield Multimodal.synthPixel(id, x, y)
      val n = (w * h).toDouble
      val r = out(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getLong(3) == w.toLong * h)
      assert(r.getDouble(4) == px.map(_._1.toLong).sum / n, s"mean_r id=$id")
      assert(r.getDouble(5) == px.map(_._2.toLong).sum / n, s"mean_g id=$id")
      assert(r.getDouble(6) == px.map(_._3.toLong).sum / n, s"mean_b id=$id")
      val buckets = px.groupBy { case (cr, cg, cb) => ((cr + cg + cb) / 3) / 64 }
      (0 until 4).foreach { b =>
        assert(r.getDouble(7 + b) ==
          buckets.getOrElse(b, Seq.empty).size / n, s"l$b id=$id")
      }
    }
  }

  test("resizeImageNN is pixel-exact nearest-neighbor") {
    val resized = Multimodal.resizeImageNN(media(10), 8, 8).collect()
    assert(resized.length == 10)
    resized.foreach { r =>
      val id = r.getLong(0)
      val (sw, sh) = Multimodal.synthDims(id)
      assert(r.getInt(2) == 8 && r.getInt(3) == 8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth == 8 && img.getHeight == 8)
      for (y <- 0 until 8; x <- 0 until 8) {
        val (er, eg, eb) = Multimodal.synthPixel(id, x * sw / 8, y * sh / 8)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) == er && ((rgb >> 8) & 0xFF) == eg &&
          (rgb & 0xFF) == eb, s"pixel ($x,$y) id=$id")
      }
    }
  }

  test("upscale resize replicates source pixels (2x)") {
    val resized = Multimodal.resizeImageNN(media(3), 32, 32).collect()
    resized.foreach { r =>
      val id = r.getLong(0)
      val (sw, sh) = Multimodal.synthDims(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      for (y <- 0 until 32; x <- 0 until 32) {
        val (er, eg, eb) = Multimodal.synthPixel(id, x * sw / 32, y * sh / 32)
        assert((img.getRGB(x, y) & 0xFFFFFF) == ((er << 16) | (eg << 8) | eb))
      }
    }
  }

  test("streaming image decode == batch (same seam, readStream source)") {
    // the decode seam is mapPartitions — stateless, so it runs
    // unchanged in a micro-batch stream; this pins that the speed
    // layer can decode media with the SAME operator as the lake path
    val dir = java.nio.file.Files.createTempDirectory("graft_img_stream")
    try {
      val m = media(20).select($"media_id", $"payload")
      m.write.mode("overwrite").parquet(dir.toString)
      val stream = spark.readStream.schema(m.schema).parquet(dir.toString)
      val streamed = graft.streaming.Speed.runToBatch(spark,
        Multimodal.decodeImageFeatures(stream), "img_stream_feats",
        org.apache.spark.sql.streaming.OutputMode.Append())
      val batch = Multimodal.decodeImageFeatures(m)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
      assert(streamed.count() == 20)
    } finally {
      spark.sql("DROP TABLE IF EXISTS img_stream_feats")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("imageAHash matches an independent reimplementation of the formula") {
    val full = Multimodal.imageAHash(media(20)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(full.size == 20)
    (0L until 20L).foreach { id =>
      val (w, h) = Multimodal.synthDims(id)
      val lum = (0 until 64).map { i =>
        val (sx, sy) = ((i % 8) * w / 8, (i / 8) * h / 8)
        val (r, g, b) = Multimodal.synthPixel(id, sx, sy)
        ((r + g + b) / 3).toLong
      }
      val tot = lum.sum
      var hi = 0L; var lo = 0L
      lum.zipWithIndex.foreach { case (l, i) =>
        if (l * 64 > tot) {
          if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
        }
      }
      assert(full(id) == ((hi, lo)), s"id=$id")
    }
  }

  test("imageAHash: identical images hash equal; uniform image hashes zero") {
    // two media rows carrying the SAME payload bytes must collide
    val one = media(1).select(col("payload")).head().getAs[Array[Byte]](0)
    val twin = Seq((100L, one), (200L, one)).toDF("media_id", "payload")
    val hashes = Multimodal.imageAHash(twin).collect()
      .map(r => (r.getLong(1), r.getLong(2))).distinct
    assert(hashes.length == 1)
    // a flat gray image: every luma equals the mean, strict > never
    // fires, hash = 0
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, 0x808080)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val flat = Seq((1L, bos.toByteArray)).toDF("media_id", "payload")
    val fr = Multimodal.imageAHash(flat).head()
    assert(fr.getLong(1) == 0L && fr.getLong(2) == 0L)
  }

  test("undecodable and empty payloads yield no rows, not errors") {
    val junk = Seq(
      (1L, "not a png at all".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    assert(Multimodal.decodeImageFeatures(junk).count() == 0)
    assert(Multimodal.resizeImageNN(junk, 8, 8).count() == 0)
  }
}
