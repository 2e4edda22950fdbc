package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, run where the
  * data lives instead of exporting a corpus to a separate trainer.
  *
  * The 100 TB shape: all iterative state lives in the WORD-FREQUENCY
  * table — vocabulary-sized (Heaps' law), never corpus-sized. ONE
  * corpus scan builds (word, n); each merge iteration is one
  * vocabulary-sized pair-count aggregate (map-side partials absorb
  * hot pairs), a driver-tiny argmax (TakeOrdered limit 1), and a
  * fold-based merge projection; the word table localCheckpoints per
  * iteration so the unrolled lineage stays bounded (the PageRank
  * discipline). Ties break lexicographically — training is
  * deterministic and engine-reproducible, which is what lets a SQL
  * oracle re-derive the learned merges independently.
  *
  * Simplifications vs a production tokenizer (documented, not
  * hidden): character-level initial symbols (no byte fallback) and
  * no end-of-word marker — merges never cross word boundaries.
  */
object Tokenize {

  /** Left-to-right non-overlapping merge of adjacent (l, r) symbol
    * pairs into l+r, as a declarative fold over the symbol array:
    * state = (emitted symbols, pending symbol). After a merge the
    * pending slot clears, so a freshly-merged token cannot re-merge
    * within the same iteration — exactly BPE's single-pass rule. */
  private def mergePair(syms: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    def step(acc: Column, x: Column): Column =
      when(acc.getField("prev").isNull,
        struct(acc.getField("out").as("out"), x.as("prev")))
        .when(acc.getField("prev") === lit(l) && (x === lit(r)),
          struct(concat(acc.getField("out"), array(lit(l + r))).as("out"),
            lit(null).cast("string").as("prev")))
        .otherwise(
          struct(concat(acc.getField("out"),
            array(acc.getField("prev"))).as("out"), x.as("prev")))
    def finish(acc: Column): Column =
      when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev"))))
    aggregate(syms, init, step, finish)
  }

  /** Train `merges` BPE merges over the corpus text. Returns the
    * learned merge table (rank, left, right, pair_count), rank 0
    * first; stops early if no adjacent pair remains. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, s"bpeTrain: merges must be >= 1: $merges")
    val spark = df.sparkSession
    var words = df
      .select(explode(TextFns.tokens(TextFns.normalizeText(col(textCol))))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(col("n"), split(col("word"), "").as("syms"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val best = words
        .where(size(col("syms")) >= 2)
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("n"), col("p.0").as("l"), col("p.1").as("r"))
        .groupBy(col("l"), col("r")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((rank, l, r, c))
        val nextWords = words
          .withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint()
        // rank N-1's vocab-sized checkpoint blocks release once rank
        // N is materialized — a large merge budget would otherwise
        // pin one block set per rank for the session's lifetime
        org.apache.spark.sql.GraftCheckpointBridge
          .unpersistCheckpoint(words)
        words = nextWords
        rank += 1
      }
    }
    // the merge table is driver-side; the word table is not part of
    // the result — release its final checkpoint too
    org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(words)
    spark.createDataFrame(learned.toSeq)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Apply a learned merge table to text: segment each word by
    * replaying the merges in rank order (same fold as training), and
    * report per-document BPE token counts — the "how many tokens is
    * my corpus under this tokenizer" question every training-data
    * budget starts with. `mergeList` is the (left, right) sequence in
    * rank order, driver-small by construction (it was learned by
    * [[bpeTrain]], bounded by the merge budget).
    *
    * The fold replays on the DISTINCT-word table only (Heaps' law:
    * vocabulary ≪ occurrences — the same discipline training uses),
    * then per-word token lengths join back onto the per-doc word
    * counts; the corpus-sized side never runs a merge. */
  def bpeSegmentCount(df: DataFrame, textCol: String, idCol: String,
                      mergeList: Seq[(String, String)]): DataFrame = {
    val wc = df.select(col(idCol),
      explode(TextFns.tokens(TextFns.normalizeText(col(textCol))))
        .as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("cnt"))
    val seg = mergeList.foldLeft(
      wc.select(col("word")).distinct()
        .withColumn("syms", split(col("word"), ""))) {
      case (acc, (l, r)) =>
        acc.withColumn("syms", mergePair(col("syms"), l, r))
    }
    wc.join(seg.select(col("word"), size(col("syms")).as("n_tok")),
        "word")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_bpe_tokens"))
  }
}
