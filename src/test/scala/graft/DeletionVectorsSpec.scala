package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeletionVectors
import graft.sources.DeletionVectors.{DvDescriptor, RoaringArray}

/** Deletion-vector codec: Z85 (pinned to the public ZeroMQ test
  * vector), the RoaringBitmapArray portable format across all three
  * container kinds, the on-disk DV file wrapper with CRC
  * verification, and the descriptor-level read path. */
class DeletionVectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fs =
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())

  // --- Z85 ---

  test("DvContains cache keys by DV GENERATION, not file path alone") {
    // the interpreted path's ThreadLocal cache outlives a query on a
    // pooled executor thread: the same FILE read at two versions
    // carries two different bitmaps, and readDelta keys the kernel on
    // file + NUL + dvUniqueId so the second read never reuses
    // the first parse. Two generations of one file, distinct keys:
    val cache = new graft.plans.DvCache
    val bmA = DeletionVectors.serialize(Array(0L)) // deletes row 0
    val bmB = DeletionVectors.serialize(Array(1L)) // deletes row 1
    def k(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    assert(graft.plans.DvContains.test(cache, k("f\u0000uidA"), bmA, 0L))
    assert(!graft.plans.DvContains.test(cache, k("f\u0000uidA"), bmA, 1L))
    // generation B of the SAME file: a file-only key would serve the
    // stale parse (and wrongly report row 0 deleted / row 1 live)
    assert(!graft.plans.DvContains.test(cache, k("f\u0000uidB"), bmB, 0L))
    assert(graft.plans.DvContains.test(cache, k("f\u0000uidB"), bmB, 1L))
  }

  test("z85 matches the public ZeroMQ spec test vector") {
    // https://rfc.zeromq.org/spec/32/ : 86 4F D2 6F B5 59 F7 5B
    // encodes to "HelloWorld"
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("z85 uuid round-trips in exactly 20 chars") {
    val u = java.util.UUID.fromString("0c8cbf3a-88a4-4aae-9ee5-9d2cbe5d12a7")
    val enc = DeletionVectors.encodeUuid(u)
    assert(enc.length == 20)
    assert(DeletionVectors.decodeUuid(enc) == u)
    // arbitrary binary round-trips too (multiple of 4)
    val rnd = new scala.util.Random(7)
    val data = Array.fill(64)(rnd.nextInt().toByte)
    assert(DeletionVectors.z85Decode(
      DeletionVectors.z85Encode(data)).toSeq == data.toSeq)
  }

  test("z85 refuses bad lengths and bad characters") {
    intercept[IllegalArgumentException](
      DeletionVectors.z85Encode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](DeletionVectors.z85Decode("abcd"))
    intercept[IllegalArgumentException](DeletionVectors.z85Decode("abc,d"))
  }

  // --- RoaringBitmapArray portable format ---

  private def roundtrip(vals: Array[Long], runOpt: Boolean = false)
      : RoaringArray =
    RoaringArray.deserialize(DeletionVectors.serialize(vals, runOpt))

  test("array containers: sparse values round-trip") {
    val vals = Array(0L, 1L, 7L, 100L, 65535L, 65536L, 1000000L)
    val r = roundtrip(vals)
    assert(r.cardinality == vals.length)
    vals.foreach(v => assert(r.contains(v), s"missing $v"))
    Seq(2L, 8L, 99L, 65537L, 999999L).foreach(v =>
      assert(!r.contains(v), s"phantom $v"))
  }

  test("bitmap containers: >4096 values in one 16-bit key round-trip") {
    // every even value in [0, 10000): 5000 values -> bitset container
    val vals = (0L until 10000L by 2).toArray
    val r = roundtrip(vals)
    assert(r.cardinality == 5000)
    assert(r.contains(0L) && r.contains(9998L) && r.contains(4444L))
    assert(!r.contains(1L) && !r.contains(9999L) && !r.contains(10000L))
  }

  test("run containers: dense ranges round-trip under runOptimize") {
    val vals = ((100L to 200L) ++ (500L to 5000L) ++ Seq(9999L)).toArray
    val bytes = DeletionVectors.serialize(vals, runOptimize = true)
    val plain = DeletionVectors.serialize(vals)
    assert(bytes.length < plain.length, "runs should compress ranges")
    val r = RoaringArray.deserialize(bytes)
    assert(r.cardinality == vals.length)
    assert(r.contains(100L) && r.contains(200L) && r.contains(2500L) &&
      r.contains(9999L))
    assert(!r.contains(99L) && !r.contains(201L) && !r.contains(499L) &&
      !r.contains(5001L) && !r.contains(9998L))
  }

  // --- StreamingSerializer (executor-side incremental build) ---

  test("StreamingSerializer emits byte-identical output to serialize " +
    "across random container mixes") {
    val rnd = new scala.util.Random(1117)
    for (trial <- 0 until 40) {
      // mix of shapes: sparse singles, dense runs, >4096 bitset-sized
      // clumps, multi-high-key values — randomly composed per trial
      val vals = scala.collection.mutable.SortedSet[Long]()
      val nPieces = 1 + rnd.nextInt(5)
      for (_ <- 0 until nPieces) rnd.nextInt(4) match {
        case 0 => // sparse singles
          for (_ <- 0 until rnd.nextInt(200))
            vals += rnd.nextLong(1L << 40)
        case 1 => // a dense run (run container territory)
          val s = rnd.nextLong(1L << 20)
          for (v <- s until s + 1 + rnd.nextInt(8000)) vals += v
        case 2 => // >4096 in one 16-bit key (bitset container)
          val base = rnd.nextInt(8) * 65536L
          for (_ <- 0 until 5000) vals += base + rnd.nextInt(65536)
        case 3 => // high-key crossing
          val hi = (1L + rnd.nextInt(3)) << 32
          for (_ <- 0 until rnd.nextInt(50))
            vals += hi + rnd.nextInt(1 << 20)
      }
      val arr = vals.toArray
      for (runOpt <- Seq(false, true)) {
        val expect = DeletionVectors.serialize(arr, runOpt)
        val ser = new DeletionVectors.StreamingSerializer(
          runOpt, maxBytes = Int.MaxValue)
        arr.foreach(ser.add)
        assert(ser.cardinality == arr.length)
        assert(!ser.overflowed)
        val got = ser.result().get
        assert(got.toSeq == expect.toSeq,
          s"trial $trial runOpt=$runOpt: streaming/batch byte mismatch " +
            s"(${got.length} vs ${expect.length} bytes, n=${arr.length})")
      }
    }
  }

  test("StreamingSerializer empty build matches serialize of nothing") {
    val ser = new DeletionVectors.StreamingSerializer(true, 1 << 20)
    assert(ser.result().get.toSeq ==
      DeletionVectors.serialize(Array.emptyLongArray, true).toSeq)
  }

  test("StreamingSerializer overflow frees buffers, keeps exact count, " +
    "returns None; a fitting build of the same data succeeds") {
    // every even value in a wide range: array/bitset containers, no
    // run compression — serialization well over the 1 KB cap
    val vals = (0L until 200000L by 2).toArray
    val exact = DeletionVectors.serialize(vals, runOptimize = true)
    assert(exact.length > 1024)
    val small = new DeletionVectors.StreamingSerializer(true, 1024)
    vals.foreach(small.add)
    assert(small.overflowed)
    assert(small.cardinality == vals.length) // counting survives overflow
    assert(small.result().isEmpty)
    val fits = new DeletionVectors.StreamingSerializer(true, exact.length)
    vals.foreach(fits.add)
    assert(!fits.overflowed)
    assert(fits.result().get.toSeq == exact.toSeq)
    // one byte under the exact size: the final exact check refuses
    val under = new DeletionVectors.StreamingSerializer(
      true, exact.length - 1)
    vals.foreach(under.add)
    assert(under.result().isEmpty)
  }

  test("StreamingSerializer refuses unsorted and repeated indexes") {
    val ser = new DeletionVectors.StreamingSerializer(true, 1 << 20)
    ser.add(5L)
    intercept[IllegalArgumentException](ser.add(5L))
    intercept[IllegalArgumentException](ser.add(3L))
    intercept[IllegalArgumentException](ser.add(-1L))
  }

  test("values above 2^32 land in separate high-key bitmaps") {
    val big = (1L << 32) + 5L
    val bigger = (7L << 32) + 123456L
    val r = roundtrip(Array(3L, big, bigger))
    assert(r.contains(3L) && r.contains(big) && r.contains(bigger))
    assert(!r.contains(5L) && !r.contains((2L << 32) + 5L) &&
      !r.contains((7L << 32) + 123455L))
  }

  test("property: membership matches a reference Set across container mixes") {
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { round =>
      // mix: a dense run, a bitset-dense block, and sparse strays,
      // some beyond 2^32
      val set = scala.collection.mutable.TreeSet[Long]()
      (0 until 200).foreach(_ => set += rnd.nextInt(100000).toLong)
      val base = rnd.nextInt(50000).toLong
      (base until base + 300).foreach(set += _)
      if (round % 2 == 0)
        (0 until 5000).foreach(_ =>
          set += 200000L + rnd.nextInt(60000).toLong)
      (0 until 20).foreach(_ =>
        set += (1L << 32) + rnd.nextInt(1000000).toLong)
      val r = roundtrip(set.toArray, runOpt = round % 2 == 1)
      assert(r.cardinality == set.size)
      set.foreach(v => assert(r.contains(v)))
      (0 until 2000).foreach { _ =>
        val probe = rnd.nextLong().abs % (2L << 32)
        assert(r.contains(probe) == set.contains(probe), s"probe $probe")
      }
    }
  }

  test("deserialize refuses a wrong magic number") {
    val bytes = DeletionVectors.serialize(Array(1L, 2L))
    bytes(0) = (bytes(0) ^ 0xFF).toByte
    val e = intercept[Exception](RoaringArray.deserialize(bytes))
    assert(e.getMessage.contains("magic"))
  }

  // --- DV file wrapper ---

  test("multiple DVs share one .bin file at distinct offsets; CRC verified") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv").toString
    val bm1 = DeletionVectors.serialize(Array(1L, 3L, 5L))
    val bm2 = DeletionVectors.serialize((0L until 5000L).toArray)
    val p = new org.apache.hadoop.fs.Path(dir, "deletion_vector_test.bin")
    val offsets = DeletionVectors.writeDvFile(fs, p, Seq(bm1, bm2))
    assert(offsets == Seq(1, 1 + 4 + bm1.length + 4))
    def desc(off: Int, size: Int, card: Long) = DvDescriptor(
      "p", p.toString, Some(off), size, card)
    val got1 = DeletionVectors.readBitmapBytes(fs, dir,
      desc(offsets(0), bm1.length, 3))
    val got2 = DeletionVectors.readBitmapBytes(fs, dir,
      desc(offsets(1), bm2.length, 5000))
    assert(got1.toSeq == bm1.toSeq && got2.toSeq == bm2.toSeq)
    // declared size mismatch refuses (mis-offset or corrupt metadata)
    val e1 = intercept[Exception](DeletionVectors.readBitmapBytes(fs, dir,
      desc(offsets(0), bm1.length + 4, 3)))
    assert(e1.getMessage.contains("sizeInBytes"))
    // flip one data byte -> CRC refusal
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p.toString))
    raw(offsets(0) + 4 + 2) = (raw(offsets(0) + 4 + 2) ^ 0x01).toByte
    new java.io.File(dir, ".deletion_vector_test.bin.crc").delete()
    java.nio.file.Files.write(java.nio.file.Paths.get(p.toString), raw)
    val e2 = intercept[Exception](DeletionVectors.readBitmapBytes(fs, dir,
      desc(offsets(0), bm1.length, 3)))
    assert(e2.getMessage.contains("checksum"))
  }

  test("storageType=u resolves prefix + z85 uuid to the table-rooted path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dvu").toString
    val u = java.util.UUID.fromString("11111111-2222-3333-4444-555555555555")
    val bm = DeletionVectors.serialize(Array(2L, 4L))
    new java.io.File(dir, "ab").mkdirs()
    val p = new org.apache.hadoop.fs.Path(s"$dir/ab",
      s"deletion_vector_$u.bin")
    val off = DeletionVectors.writeDvFile(fs, p, Seq(bm)).head
    val d = DvDescriptor("u", "ab" + DeletionVectors.encodeUuid(u),
      Some(off), bm.length, 2)
    assert(DeletionVectors.dvFilePath(dir, d).getName ==
      s"deletion_vector_$u.bin")
    assert(DeletionVectors.readBitmapBytes(fs, dir, d).toSeq == bm.toSeq)
    // no-prefix form resolves at the table root
    val p2 = new org.apache.hadoop.fs.Path(dir, s"deletion_vector_$u.bin")
    val off2 = DeletionVectors.writeDvFile(fs, p2, Seq(bm)).head
    val d2 = DvDescriptor("u", DeletionVectors.encodeUuid(u),
      Some(off2), bm.length, 2)
    assert(DeletionVectors.readBitmapBytes(fs, dir, d2).toSeq == bm.toSeq)
  }

  test("inline DVs decode from the descriptor; z85 padding trims by sizeInBytes") {
    val bm = DeletionVectors.serialize(Array(0L, 10L, 20L))
    val padded =
      if (bm.length % 4 == 0) bm
      else java.util.Arrays.copyOf(bm, bm.length + 4 - bm.length % 4)
    val d = DvDescriptor("i", DeletionVectors.z85Encode(padded), None,
      bm.length, 3)
    val got = DeletionVectors.readBitmapBytes(fs, "/nowhere", d)
    assert(got.toSeq == bm.toSeq)
    val r = RoaringArray.deserialize(got)
    assert(r.contains(10L) && !r.contains(11L))
  }

  test("DvContains: generated code COMPILES and matches the interpreted kernel") {
    // GeneratePredicate.generate THROWS on a Janino compile failure —
    // this pins the hot filter to real whole-stage-compatible codegen
    // instead of a silent interpreted fallback
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.plans.DvContains(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, BinaryType, nullable = true),
      BoundReference(2, LongType, nullable = true))
    val pred = GeneratePredicate.generate(expr)
    pred.initialize(0)
    val bmA = DeletionVectors.serialize(Array(2L, 4L))
    val bmB = DeletionVectors.serialize(Array(7L))
    def row(f: String, bm: Array[Byte], idx: Long) =
      new GenericInternalRow(Array[Any](UTF8String.fromString(f), bm, idx))
    assert(pred.eval(row("fileA", bmA, 2L)))
    assert(!pred.eval(row("fileA", bmA, 3L)))
    // cache rolls over when the file key changes
    assert(pred.eval(row("fileB", bmB, 7L)))
    assert(!pred.eval(row("fileB", bmB, 2L)))
    assert(pred.eval(row("fileA", bmA, 4L)))
    // interpreted path agrees
    assert(expr.eval(row("fileA", bmA, 2L)) == true)
    assert(expr.eval(row("fileA", bmA, 3L)) == false)
  }

  test("unknown storageType refuses loudly") {
    val e = intercept[Exception](DeletionVectors.readBitmapBytes(fs, "/x",
      DvDescriptor("z", "whatever", None, 4, 1)))
    assert(e.getMessage.contains("storageType"))
  }
}
