package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard export — the dataloader-facing physical
  * layout (one `<doc_id>.txt` entry per document, fixed-count shards)
  * that training jobs stream sequentially. Tars are byte-
  * deterministic: POSIX ustar headers with zeroed mtime/uid/gid,
  * fixed 0644 mode, entries in doc-id order — so shard bytes are a
  * pure function of (ids, texts) and the manifest's `total_bytes` is
  * re-derivable by an ANSI oracle from the tar size law
  * (512-byte header + content padded to 512, per entry; 1024-byte
  * zero trailer per shard).
  *
  * Scale shape: shard assignment is id-range arithmetic (id DIV
  * shardDocs) — no global window, no sort barrier; each shard's
  * entries stream through ONE mapGroups task holding shardDocs
  * documents (the operator's only memory bound — size shardDocs to
  * taste). Local-filesystem writes here; a cluster deployment points
  * `outDir` at shared storage and writes shard-temp + atomic-rename
  * (the same commit idiom as LakeWriter).
  * Returns the manifest (shard, n_entries, total_bytes).
  */
object TarShards {

  /** 512-byte POSIX ustar header for a regular file, deterministic. */
  def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(off: Int, width: Int, v: Long): Unit =
      // octal, zero-padded to width-1, NUL-terminated (GNU/POSIX both
      // accept; deterministic either way)
      put(off, ("%0" + (width - 1) + "o").format(v))
    put(0, name)                       // name[100]
    oct(100, 8, 420L)                  // mode 0644
    oct(108, 8, 0L)                    // uid
    oct(116, 8, 0L)                    // gid
    oct(124, 12, size)                 // size
    oct(136, 12, 0L)                   // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
    h(156) = '0'                       // typeflag: regular file
    put(257, "ustar")                  // magic (NUL-terminated by zeros)
    h(263) = '0'; h(264) = '0'         // version "00"
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, "%06o".format(sum))       // chksum: 6 octal digits
    h(154) = 0; h(155) = ' '
    h
  }

  private def pad(n: Long): Long = (512L - n % 512L) % 512L

  /** Export `df` as tar shards under `outDir` (wiped first — the
    * export is a full-layout rebuild, idempotent by construction).
    * Shard k holds ids [k·shardDocs, (k+1)·shardDocs). */
  def exportTarShards(df: DataFrame, textCol: String, idCol: String,
                      outDir: String, shardDocs: Int): DataFrame = {
    require(shardDocs >= 1, s"shardDocs must be >= 1: $shardDocs")
    val spark = df.sparkSession
    import spark.implicits._
    val dir = new java.io.File(outDir)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    dir.mkdirs()
    val rows: Dataset[(Long, String, Int)] = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .withColumn("shard", expr(s"CAST(id DIV $shardDocs AS INT)"))
      .as[(Long, String, Int)]
    rows.groupByKey(_._3).mapGroups { (shard, it) =>
      val entries = it.toArray.sortBy(_._1)
      val f = new java.io.File(dir, f"shard-$shard%05d.tar")
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f))
      var bytes = 0L
      try {
        entries.foreach { case (id, text, _) =>
          val content = Option(text).getOrElse("").getBytes("UTF-8")
          out.write(header(s"$id.txt", content.length.toLong))
          out.write(content)
          out.write(new Array[Byte](pad(content.length.toLong).toInt))
          bytes += 512L + content.length + pad(content.length.toLong)
        }
        out.write(new Array[Byte](1024)); bytes += 1024L
      } finally out.close()
      (shard, entries.length.toLong, bytes)
    }.toDF("shard", "n_entries", "total_bytes")
  }
}
