package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget
  * training sequences (the "pack short docs into one context window"
  * step every LLM pre-training pipeline runs between curation and
  * tokenized-shard output).
  *
  * Semantics (deterministic, engine-reproducible): documents are
  * sharded by `doc_id % shards`; within a shard, docs are taken in
  * doc_id order and appended to the current sequence while they fit
  * (`used + n_tokens <= budget`), else a new sequence starts. A doc
  * larger than the budget occupies a sequence of its own. Every doc
  * gets `(shard, seq_id, token_offset)` — the exact layout a
  * downstream tokenizer/writer materializes.
  *
  * Scale posture: the only shuffle moves (shard, doc_id, n_tokens) —
  * 16 bytes per document, never the text. Packing itself is a
  * sequential running-total scan with O(1) state: a window function
  * cannot express it (the accumulator RESETS on overflow — it is a
  * data-dependent prefix scan, which SQL needs recursion for), and
  * `flatMapGroups` would materialize whole shards; `mapPartitions`
  * over shard-sorted partitions streams instead. This and the
  * multimodal codec seam are the two places imperative
  * per-partition logic is genuinely the right Spark tool. Shard
  * count scales with the corpus (shards ≈ corpus_tokens /
  * tokens_per_output_shard), keeping per-task state trivial.
  */
object Packing {

  private[operators] case class PackIn(shard: Int, doc_id: Long,
                                       n_tokens: Int)
  private[operators] case class PackOut(doc_id: Long, shard: Int,
      seq_id: Int, n_tokens: Int, token_offset: Int)

  /** Pack `df` (must carry an integral id column and a token-count
    * column) into sequences of at most `budget` tokens within
    * `doc_id % shards` shards. Returns
    * (doc_id, shard, seq_id, n_tokens, token_offset). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Int, shards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(shards >= 1, s"shards must be >= 1: $shards")
    val spark = df.sparkSession
    import spark.implicits._
    prepared(df, idCol, tokensCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[PackIn]
      .mapPartitions { it =>
        // several shards may hash into one partition; the sort keys
        // them contiguously, so a shard change resets the scan state
        var curShard = -1
        var seq = 0
        var used = 0
        it.map { d =>
          if (d.shard != curShard) {
            curShard = d.shard; seq = 0; used = d.n_tokens
            PackOut(d.doc_id, d.shard, 0, d.n_tokens, 0)
          } else if (used + d.n_tokens <= budget) {
            val off = used; used += d.n_tokens
            PackOut(d.doc_id, d.shard, seq, d.n_tokens, off)
          } else {
            seq += 1; used = d.n_tokens
            PackOut(d.doc_id, d.shard, seq, d.n_tokens, 0)
          }
        }
      }
      .toDF()
  }

  /** Best-fit-decreasing packing: within a shard, docs are taken
    * LARGEST FIRST and each goes into the FULLEST already-open
    * sequence it fits (ties → lowest seq_id); no fit opens a new
    * sequence. Compared with [[packSequences]]' doc_id-order greedy,
    * BFD carries the classic 11/9·OPT+1 bin-packing bound — in
    * practice far less padding — at the cost of keeping every open
    * bin's load in memory (bounded: ≈ shard_tokens / budget entries
    * of 4 bytes; shard count scales with the corpus exactly as for
    * the greedy, so per-task state stays trivial. The linear best-fit
    * scan below is right for those sizes; swap in a capacity-keyed
    * TreeMap if bins-per-shard ever reaches millions).
    * Deterministic: (n_tokens DESC, doc_id) processing order and the
    * tie rule pin every assignment; same output schema as
    * [[packSequences]]. */
  def packSequencesBFD(df: DataFrame, idCol: String, tokensCol: String,
                       budget: Int, shards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(shards >= 1, s"shards must be >= 1: $shards")
    val spark = df.sparkSession
    import spark.implicits._
    prepared(df, idCol, tokensCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc,
        col("doc_id"))
      .as[PackIn]
      .mapPartitions { it =>
        var curShard = -1
        val loads = scala.collection.mutable.ArrayBuffer.empty[Int]
        it.map { d =>
          if (d.shard != curShard) { curShard = d.shard; loads.clear() }
          var best = -1
          var i = 0
          while (i < loads.length) {
            if (loads(i) + d.n_tokens <= budget &&
                (best == -1 || loads(i) > loads(best))) best = i
            i += 1
          }
          if (best == -1) {
            loads += d.n_tokens
            PackOut(d.doc_id, d.shard, loads.length - 1, d.n_tokens, 0)
          } else {
            val off = loads(best)
            loads(best) += d.n_tokens
            PackOut(d.doc_id, d.shard, best, d.n_tokens, off)
          }
        }
      }
      .toDF()
  }

  /** Deterministic GLOBAL SHUFFLE into training shards: shard = the
    * value of the first md5 hex digit of the id (16-way balanced),
    * position within shard = rank by the full md5 (seedless, engine-
    * portable, stable as the corpus grows within a shard refresh).
    * This is the "shuffle the corpus once, write ordered shards"
    * layout step every dataloader assumes; the only shuffle moves
    * (id, hash) pairs and each shard ranks independently — no global
    * sort. Returns (doc_id, shard, pos). */
  def shuffleShards(df: DataFrame, idCol: String): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    // hex digit value: '0'-'9' → 0-9, 'a'-'f' → 10-15 (md5 is
    // lowercase on both engines)
    val c = ascii(substring(h, 1, 1))
    val shard = when(c <= 57, c - 48).otherwise(c - 87).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), h.as("__h"), shard.as("__shard"))
      .withColumn("pos", row_number().over(w).cast("int"))
      .select(col(idCol), col("__shard").as("shard"), col("pos"))
  }

  /** Physical JSONL shard export — the dataloader-facing sink: every
    * row serializes to one JSON line (key-stable `to_json` over the
    * full row struct) and lands under its shard's own directory
    * (`shard=<k>/…`), one hive-style partition per shard so a
    * dataloader maps shard → file set with a directory listing. The
    * write is one codegen projection + a partitioned text write —
    * shard assignment upstream decides placement (see
    * [[shuffleShards]]); `filesPerShard` coalesces within shards via
    * repartition on the shard key. Returns the shard → row-count
    * frame so callers can assert the layout they shipped. */
  def exportJsonlShards(df: DataFrame, shardCol: String,
                        path: String): DataFrame = {
    val dataCols = df.columns.filterNot(_ == shardCol).toSeq
    df.select(col(shardCol),
        to_json(struct(dataCols.map(col): _*)).as("value"))
      .repartition(col(shardCol))
      .write.mode("errorifexists")
      .partitionBy(shardCol)
      .text(path)
    df.groupBy(col(shardCol)).agg(count(lit(1)).as("n_rows"))
  }

  /** Schema-on-read ingest of [[exportJsonlShards]] output (or any
    * JSONL landing zone — the reference stack's API-ingest shape):
    * PERMISSIVE parse with a corrupt-record column, so one mangled
    * line never kills a 100 TB load and nothing is SILENTLY dropped —
    * callers split good rows from the `_corrupt` audit column. The
    * hive `shard=k` directories surface as a partition column.
    * LAZY — nothing is cached. Spark refuses a query whose required
    * schema is ONLY the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); always
    * reference a data column alongside `_corrupt`, or audit by
    * difference via [[jsonlLineCount]] (bad = lines − good). */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession,
                      path: String, ddl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** One-row frame counting the landing zone's NON-EMPTY physical
    * lines (the JSON parser skips whitespace-only lines, so this is
    * exactly good + corrupt) — the cache-free audit companion to
    * [[readJsonlShards]]: n_bad = this − the good-row count. */
  def jsonlLineCount(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .agg(count(lit(1)).as("n_lines"))

  /** The full training EXPORT layout: pack docs into sequences
    * (best-fit-decreasing) and then SHUFFLE the sequences within each
    * shard — dataloaders consume sequences in shard order, so the
    * shuffle must happen at sequence grain, after packing.
    * `seq_pos` is the sequence's shuffled rank (1-based) within its
    * shard, from the md5 of (shard, seq_id): seedless, engine-
    * portable, stable per layout. The rank window reuses the packing
    * stage's shard partitioning — zero additional exchanges. */
  def trainingLayout(df: DataFrame, idCol: String, tokensCol: String,
                     budget: Int, shards: Int): DataFrame = {
    val packed = packSequencesBFD(df, idCol, tokensCol, budget, shards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__sh"), col("seq_id"))
    packed
      .withColumn("__sh", md5(concat_ws(":", col("shard"), col("seq_id"))))
      .withColumn("seq_pos", dense_rank().over(w).cast("int"))
      .drop("__sh")
  }

  private def prepared(df: DataFrame, idCol: String, tokensCol: String,
                       shards: Int): DataFrame =
    df.select(
      pmod(col(idCol).cast("long"), lit(shards.toLong)).cast("int")
        .as("shard"),
      col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("int").as("n_tokens"))

  /** The custom-operator variant of [[packSequences]]: plans a
    * [[graft.plans.PackSequencesNode]] whose PHYSICAL operator
    * declares its distribution/ordering requirements instead of
    * hand-placing repartition+sort — a child already clustered by
    * shard packs with no new shuffle. Identical output (the spec
    * asserts it). Requires `GraftExtensions` on the session (the
    * strategy must be registered, else planning fails). */
  def packSequencesPlan(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Int, shards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(shards >= 1, s"shards must be >= 1: $shards")
    import org.apache.spark.sql.GraftPlanBridge
    val p = prepared(df, idCol, tokensCol, shards)
    GraftPlanBridge.ofRows(df.sparkSession,
      graft.plans.PackSequencesNode(budget, shards,
        graft.plans.PackSequencesNode.freshPackAttrs(),
        p.queryExecution.analyzed))
  }
}
