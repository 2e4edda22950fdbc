package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — matching dirty strings back
  * to a clean dimension by edit distance. The scalable shape is the
  * classic BLOCKED similarity join: candidates are generated only
  * within a blocking key (here: first character + a length band
  * implied by the distance cap), never as an all-pairs cross — the
  * same never-quadratic posture as the MinHash/SimHash dedup family.
  */
object Linkage {

  /** Resolve each dirty record to its best dimension match by
    * Levenshtein distance (codegen'd built-in), searching only the
    * dirty record's block: same first character, |length delta| ≤
    * `maxDist` (an edit-distance lower bound, so the band never drops
    * a true match; callers whose dirt can touch char 1 should block
    * on a dirt-invariant key instead). Best = min distance, ties to
    * the lexicographically smallest candidate. Unmatched dirty rows
    * (no candidate within `maxDist`) are dropped — the caller
    * anti-joins for the residue if it wants a manual-review queue.
    *
    * The dimension's distinct name table is vocabulary-sized and
    * BROADCAST; the per-record windows are partitioned by the dirty
    * id, so no single-task sort exists anywhere. At 100 TB the block
    * key widens (more prefix chars) to keep per-block candidate
    * lists bounded — the blocking column is a parameter for exactly
    * that reason. */
  def fuzzyResolve(dirty: DataFrame, idCol: String, nameCol: String,
                   dim: DataFrame, dimNameCol: String,
                   maxDist: Int = 2,
                   blockOf: Column => Column = substring(_, 1, 1))
      : DataFrame = {
    val cands = dim.select(col(dimNameCol).as("matched_name")).distinct()
      .withColumn("__blk", blockOf(col("matched_name")))
    val scored = dirty
      .select(col(idCol), col(nameCol).as("dirty_name"),
        blockOf(col(nameCol)).as("__blk"))
      .join(broadcast(cands), Seq("__blk"))
      .where(abs(length(col("dirty_name")) - length(col("matched_name")))
        <= maxDist)
      // thresholded kernel: banded O(n·maxDist) DP, −1 above the cap
      .withColumn("dist",
        levenshtein(col("dirty_name"), col("matched_name"), maxDist))
      .where(col("dist") >= 0)
    val perId = Window.partitionBy(col(idCol))
    scored
      .withColumn("n_candidates",
        count(lit(1)).over(perId).cast("int"))
      .withColumn("__rk", row_number().over(
        perId.orderBy(col("dist").asc, col("matched_name").asc)))
      .where(col("__rk") === 1)
      .select(col(idCol), col("dirty_name"), col("matched_name"),
        col("dist"), col("n_candidates"))
  }

  /** Dimension-free entity resolution: cluster the records THEMSELVES
    * (no clean reference table) — blocked pairwise edit-distance
    * edges, then transitive closure, so "Acme Corp" ~ "Acme Crp" ~
    * "Acme Cor" land in one entity even when the two dirty variants
    * are farther than `maxDist` from each other. The master-data
    * question ("how many real entities are in this feed?") answered
    * as a graph problem.
    *
    * Scale shape — three independent bounds, each load-bearing:
    * (1) IDENTICAL spellings collapse first (the ER analog of
    * dictionary encoding): fuzzy matching runs on the DISTINCT-name
    * table, vocabulary-sized, never on records — a feed where one
    * spelling repeats a million times contributes ONE node, not 10¹²
    * pairs (records reconnect through their name representative, so
    * the transitive closure over records is provably unchanged).
    * (2) The block key is (blockOf(name), length-bucket) — buckets of
    * width maxDist+1, probe side exploded to the 3 adjacent buckets,
    * so every |Δlen| ≤ maxDist name pair meets in exactly one bucket
    * (complete and duplicate-free). (3) Spark's THRESHOLDED
    * levenshtein kernel — banded O(n·maxDist) DP with early exit,
    * not the full O(n·m) table. The record-level first-char-only
    * formulation measured 90 s at sf0.1 (13M record pairs, CC over
    * all of them); this shape is ~6 s with byte-identical clusters.
    * Clustering reuses [[Graph.connectedComponents]] — node-keyed
    * shuffles, O(diameter) rounds. Every record gets an entity id:
    * singletons label themselves via the left join back.
    *
    * @return (idCol, entity_id, n_members); entity_id = min record
    *         id of the cluster, ids must be numeric. */
  def erClusters(recs: DataFrame, idCol: String, nameCol: String,
                 maxDist: Int = 2,
                 blockOf: Column => Column = substring(_, 1, 1))
      : DataFrame = {
    val w = maxDist + 1
    val base = recs.select(col(idCol).as("__id"), col(nameCol).as("__name"))
    // referenced THREE times below (probe side, build side, identity
    // edges) and each reference re-derived the caller's name
    // expression plus this groupBy's shuffle — persist for the call;
    // released after connectedComponents has materialized every edge
    // into its own checkpoints (name-keyed rows: node-sized)
    val names = base.groupBy(col("__name"))
      .agg(min(col("__id")).as("__rep"))
      .withColumn("__blk", blockOf(col("__name")))
      .withColumn("__lb", floor(length(col("__name")) / w).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe = names.withColumn("__pb",
      explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)))
    val namePairs = probe.as("a").join(names.as("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.__pb") === col("b.__lb"))
      .where(col("a.__rep") < col("b.__rep"))
      .where(abs(length(col("a.__name")) - length(col("b.__name")))
        <= maxDist)
      .where(levenshtein(col("a.__name"), col("b.__name"), maxDist)
        >= 0)
      .select(col("a.__rep").as("id_a"), col("b.__rep").as("id_b"))
    // identity edges: every record hangs off its name representative
    // (self-loops dropped — CC ignores them anyway)
    val identity = base
      .join(names.select(col("__name"), col("__rep")), "__name")
      .where(col("__id") =!= col("__rep"))
      .select(col("__id").as("id_a"), col("__rep").as("id_b"))
    val comps = Graph.connectedComponents(
      namePairs.unionByName(identity), "id_a", "id_b")
    // comps is checkpointed — the edge plans (and names) are spent
    names.unpersist(blocking = false)
    val labeled = recs.select(col(idCol))
      .join(comps.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).as("entity_id"))
    labeled.withColumn("n_members",
      count(lit(1)).over(Window.partitionBy(col("entity_id"))))
  }
}
