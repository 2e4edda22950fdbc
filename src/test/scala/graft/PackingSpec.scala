package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Greedy sequence packing vs a straightforward in-memory reference,
  * including the edges (oversized docs, zero-token docs, exact fits)
  * and determinism under different input partitioning.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-memory reference: same greedy, one shard at a time. */
  private def reference(docs: Seq[(Long, Int)], budget: Int,
                        shards: Int): Set[(Long, Int, Int, Int, Int)] =
    docs.groupBy { case (id, _) => (id % shards).toInt }.flatMap {
      case (shard, ds) =>
        var seq = 0; var used = 0; var first = true
        ds.sortBy(_._1).map { case (id, n) =>
          if (first) { first = false; used = n }
          else if (used + n <= budget) used += n
          else { seq += 1; used = n }
          (id, shard, seq, n, used - n)
        }
    }.toSet

  private def run(docs: Seq[(Long, Int)], budget: Int, shards: Int,
                  parts: Int = 4): Set[(Long, Int, Int, Int, Int)] =
    Packing.packSequences(
        docs.toDF("doc_id", "n_tokens").repartition(parts),
        "doc_id", "n_tokens", budget, shards)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
      .toSet

  test("packs greedily in doc_id order within each shard") {
    val docs = Seq(1L -> 60, 3L -> 50, 5L -> 40, 7L -> 30, 9L -> 80)
    // one shard: 60+50 fit in 128; +40 overflows -> seq 1: 40+30; 80 fits? 40+30+80>128 -> wait
    val got = run(docs, budget = 128, shards = 1)
    assert(got == reference(docs, 128, 1))
    // explicit layout: seq0=[1@0, 3@60], seq1=[5@0, 7@40, 9: 40+30+80=150>128 -> seq2]
    assert(got == Set((1L, 0, 0, 60, 0), (3L, 0, 0, 50, 60),
      (5L, 0, 1, 40, 0), (7L, 0, 1, 30, 40), (9L, 0, 2, 80, 0)))
  }

  test("oversized and zero-token docs follow the recursion exactly") {
    val docs = Seq(1L -> 0, 2L -> 500, 3L -> 10, 4L -> 0, 5L -> 100)
    // budget 100: doc1 (0) opens seq0; doc2 (500) overflows -> seq1 alone;
    // doc3 -> seq2; doc4 (0) joins seq2; doc5: 10+0+100>100 -> seq3
    val got = run(docs, budget = 100, shards = 1)
    assert(got == reference(docs, 100, 1))
    assert(got == Set((1L, 0, 0, 0, 0), (2L, 0, 1, 500, 0),
      (3L, 0, 2, 10, 0), (4L, 0, 2, 0, 10), (5L, 0, 3, 100, 0)))
  }

  test("exact fit stays in the sequence") {
    val docs = Seq(1L -> 64, 2L -> 64, 3L -> 1)
    val got = run(docs, budget = 128, shards = 1)
    assert(got == Set((1L, 0, 0, 64, 0), (2L, 0, 0, 64, 64),
      (3L, 0, 1, 1, 0)))
  }

  test("shards pack independently; result is partitioning-invariant") {
    val docs = (1L to 97L).map(i => i -> ((i * 13 % 90) + 1).toInt)
    val ref = reference(docs, budget = 128, shards = 5)
    assert(run(docs, 128, 5, parts = 1) == ref)
    assert(run(docs, 128, 5, parts = 3) == ref)
    assert(run(docs, 128, 5, parts = 16) == ref)
    // every sequence respects the budget (no doc exceeds it here)
    val bySeq = ref.groupBy(t => (t._2, t._3)).values
    assert(bySeq.forall(_.toSeq.map(_._4).sum <= 128))
  }

  private def runBFD(docs: Seq[(Long, Int)], budget: Int, shards: Int,
                     parts: Int = 4): Set[(Long, Int, Int, Int, Int)] =
    Packing.packSequencesBFD(
        docs.toDF("doc_id", "n_tokens").repartition(parts),
        "doc_id", "n_tokens", budget, shards)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
      .toSet

  test("BFD packs largest-first into the fullest fitting bin") {
    // desc order: 300, 150, 120, 100, 90, 30 — hand-traced layout
    // (oversize 300 owns bin 0; 100 joins 150 in bin 1 at the fuller
    // of {150, 120}; 90 and 30 land in bin 2 behind 120)
    val docs = Seq(1L -> 150, 2L -> 120, 3L -> 100, 4L -> 90,
      5L -> 30, 6L -> 300)
    val got = runBFD(docs, budget = 256, shards = 1)
    assert(got == Set((6L, 0, 0, 300, 0), (1L, 0, 1, 150, 0),
      (2L, 0, 2, 120, 0), (3L, 0, 1, 100, 150), (4L, 0, 2, 90, 120),
      (5L, 0, 2, 30, 210)))
    // partitioning-invariant like the greedy
    assert(runBFD(docs, 256, 1, parts = 1) == got)
    assert(runBFD(docs, 256, 1, parts = 16) == got)
  }

  test("trainingLayout shuffles sequences within shards, packing intact") {
    val docs = (1L to 100L).map(i => (i, ((i * 29) % 90 + 10).toInt))
    val out = Packing.trainingLayout(
        docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        budget = 128, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    // identical packing columns to packSequencesBFD
    assert(out.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet ==
      runBFD(docs, 128, 4))
    // one seq_pos per sequence, covering 1..nSeqs within each shard
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val posBySeq = rows.groupBy(_._3).map { case (seq, rs) =>
        val ps = rs.map(_._6).distinct
        assert(ps.length == 1, s"shard $shard seq $seq has positions $ps")
        ps.head
      }.toSeq.sorted
      assert(posBySeq == (1 to posBySeq.length), s"shard $shard: $posBySeq")
    }
    // the shuffle actually permutes (md5 order != creation order)
    val somePermuted = out.groupBy(_._2).exists { case (_, rows) =>
      rows.exists(t => t._6 != t._3 + 1)
    }
    assert(somePermuted, "sequence shuffle is the identity?")
  }

  test("BFD never uses more sequences than greedy on mixed sizes") {
    val docs = (1L to 200L).map(i => (i, ((i * 37) % 120 + 10).toInt))
    def nSeqs(s: Set[(Long, Int, Int, Int, Int)]) =
      s.map(t => (t._2, t._3)).size
    val greedy = run(docs, budget = 256, shards = 4)
    val bfd = runBFD(docs, budget = 256, shards = 4)
    assert(nSeqs(bfd) <= nSeqs(greedy),
      s"bfd ${nSeqs(bfd)} vs greedy ${nSeqs(greedy)}")
    // both respect the budget for non-oversize sequences
    val bySeq = bfd.groupBy(t => (t._2, t._3)).values
    assert(bySeq.forall(g => g.toSeq.map(_._4).sum <= 256))
  }

  test("exportJsonlShards: hive-partitioned JSONL a dataloader can list and parse") {
    import graft.operators.Packing
    import org.apache.spark.sql.functions.{concat, lit, sum}
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl")
      .toString + "/export"
    val df = spark.range(0, 100).toDF("doc_id")
      .withColumn("text", concat(lit("t"), $"doc_id"))
    val sharded = df.join(
      Packing.shuffleShards(df, "doc_id"), "doc_id")
      .select($"doc_id", $"text", $"shard")
    val counts = Packing.exportJsonlShards(sharded, "shard", out)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 100L)
    // directory layout: one shard=<k> dir per shard, text files inside
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == counts.keySet.map(k => s"shard=$k"))
    // every line is valid JSON carrying exactly the data columns;
    // reading back through Spark's json reader recovers the rows
    val back = spark.read.json(
      spark.read.option("recursiveFileLookup", "false")
        .text(out + "/shard=*").select($"value".as("value"))
        .as[String])
    assert(back.count() == 100L)
    assert(back.columns.sorted.toSeq == Seq("doc_id", "text"))
    assert(back.select(sum($"doc_id")).head().getLong(0) == (0L until 100L).sum)
  }
}
