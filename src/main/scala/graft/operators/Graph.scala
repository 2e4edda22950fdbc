package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns
  * pairwise near-duplicate hits into DUP CLUSTERS so one survivor can
  * be chosen per group (transitive closure: a~b, b~c ⇒ {a,b,c}).
  *
  * Iterative min-label propagation: every node starts as its own
  * component; each round a node adopts the minimum label among itself
  * and its neighbors; converges in O(graph diameter) rounds. Each
  * round is one join + one aggregation — all shuffles on the node key
  * — and `localCheckpoint` truncates the growing lineage so round N
  * does not replay rounds 1..N-1. This is the standard DataFrame-only
  * CC formulation that scales to billions of edges (diameter of
  * near-dup graphs is tiny).
  */
object Graph {

  /** @return (node, comp) for every node appearing in `edges`;
    *         comp = minimum node id of the component. */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 20): DataFrame = {
    // pre-partitioned ON THE PROBE KEY before caching: every round
    // joins sym on `b`, and an InMemoryRelation exposes its child's
    // partitioning, so the per-round join reuses THIS one exchange —
    // the cached-unpartitioned formulation re-shuffled the full edge
    // set on `b` every round (edge-sized, the dominant per-round
    // bytes at scale; guide §2.4 "share one exchange")
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .repartition(col("b"))
      .cache()
    // NOTE: the per-round jobs on a small graph are scheduler-bound;
    // narrowing them via a session-wide shuffle-partition flip was
    // measured (~no gain) and rejected — a global conf mutation would
    // silently clobber concurrent queries on the same session.
    try {
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
    // FRONTIER propagation: only labels that changed last round feed
    // the next round's neighbor-min. Exact, not approximate — labels
    // only ever decrease, and a neighbor u that did NOT change in
    // round k already contributed comp(u) in the round after it last
    // changed (round 0 starts with every node in the frontier), so
    // comp(v) ≤ comp(u) holds already and u's re-contribution is a
    // no-op. Per-round changed counts — and therefore round count and
    // result — are IDENTICAL to full propagation
    // (GraphPropertySpec pins equality against the full recompute);
    // what changes is the work: the near-dup graphs converge through
    // a long thin tail (measured sf0.1: changed = 4158, 4310, 4127,
    // 3057, 429, 47, 11, 4, 2, 0 — six of ten rounds touch <1% of
    // nodes), and each tail round now joins a frontier AQE broadcasts
    // instead of re-scanning every label against every edge.
    var frontier = labels
    // round N-1's checkpoint blocks release as soon as round N has
    // materialized — otherwise every round pins a node-sized block
    // set for the session's lifetime (the r10 bench heap ramp); at
    // most TWO rounds' blocks are live at any instant, and only the
    // final labels' blocks survive the call (they ARE the result)
    var prevCkpt: DataFrame = null
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.join(frontier, sym("b") === frontier("node"))
        .groupBy(sym("a").as("nbr_node"))
        .agg(min(col("comp")).as("nbr_comp"))
      // ONE job per round: the convergence count rides the checkpoint
      // job as an observed metric — prev label stays in the projection
      // so no second join-and-count pass over the new labels is needed
      val obs = org.apache.spark.sql.Observation()
      // NOTE: pointer-jumping through the previous round's labels
      // (comp := least(comp, label(comp))) was measured here: it cuts
      // rounds ~10 → 6 on the sf0.1 near-dup graph but the extra
      // label-sized join per round costs exactly what the saved rounds
      // buy (bench-neutral to slightly worse) — rejected. Plain
      // propagation keeps one join+agg per round.
      // NOTE (r17): pointer jumping RESTRICTED TO THE FRONTIER
      // (comp := least(comp, frontier-lookup(comp)) after the
      // propagation) was measured here too: rounds 10 → 7 on the
      // sf0.1 near-dup graph, but wall was bit-for-bit neutral
      // (3.12 s both ways, OpProfile warm p2) — the per-round jump
      // join costs exactly what the saved tail rounds buy, the same
      // verdict as the r16 full-label-table variant. Rejected again;
      // plain frontier propagation keeps the round body minimal.
      val next = labels.join(nbrMin, labels("node") === nbrMin("nbr_node"), "left")
        .select(col("node"), col("comp").as("__prev"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .withColumn("__chg", col("comp") =!= col("__prev"))
        .observe(obs, count(when(col("__chg"), 1)).as("changed"))
        .localCheckpoint()
      changed = obs.get("changed").asInstanceOf[Long]
      if (prevCkpt != null)
        org.apache.spark.sql.GraftCheckpointBridge
          .unpersistCheckpoint(prevCkpt)
      prevCkpt = next
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $i changed=$changed")
      labels = next.select(col("node"), col("comp"))
      // the filter is a narrow scan of the round's checkpointed
      // blocks — no extra job materializes it
      frontier = next.where(col("__chg")).select(col("node"), col("comp"))
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing) — raise maxIter (needs " +
          "O(component diameter) rounds)")
    labels
    } finally sym.unpersist()
  }

  /** INCREMENTAL connected components — the daily-load path: given a
    * correct labeling `labels` = (node, comp) of the standing graph
    * (comp = min node id of the component, [[connectedComponents]]'s
    * convention) and a batch of NEW edges, return the labeling of the
    * UNION graph without ever touching the standing edge set.
    *
    * Technique: CONTRACTION. Each existing component acts as one
    * super-node (its comp id); a new edge's endpoints map through
    * their old labels (endpoints unseen by `labels` map to
    * themselves), self-loops drop, and full CC runs on the contracted
    * edge list — which is DELTA-sized, not corpus-sized. Final labels:
    * every old node relabels through its component's super-node (one
    * join on `comp`); brand-new nodes take their own super-node's
    * label. Components untouched by the delta keep their label
    * byte-for-byte.
    *
    * The min-id convention survives contraction exactly: a super-node
    * id is either an old component's min node id or a new node's id,
    * so the min super-node id of a merged super-component IS the min
    * node id over all constituent nodes — the result is IDENTICAL to
    * re-running CC over (standing ∪ new) edges (GraphPropertySpec
    * pins this against the full run on random graphs).
    *
    * Scale shape at 100 TB: the standing corpus participates only
    * through its node-sized label table (one shuffle join on comp);
    * the O(diameter) iterative work runs on the contracted delta
    * graph alone. A year of daily loads costs 365 delta-CCs, not 365
    * full-graph CCs. */
  def connectedComponentsIncremental(labels: DataFrame, newEdges: DataFrame,
                                     src: String, dst: String,
                                     maxIter: Int = 20): DataFrame = {
    val sym = newEdges.select(col(src).as("a"), col(dst).as("b"))
      .union(newEdges.select(col(dst).as("a"), col(src).as("b")))
      .where(col("a") =!= col("b")).distinct()
    val lab = labels.select(col("node"), col("comp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // contract: endpoint -> old label; unseen endpoints stay
      // themselves (ids never collide: comps are old node ids)
      val mapped = sym
        .join(lab.select(col("node").as("a"), col("comp").as("__ca")),
          Seq("a"), "left")
        .join(lab.select(col("node").as("b"), col("comp").as("__cb")),
          Seq("b"), "left")
        .select(coalesce(col("__ca"), col("a")).as("sa"),
          coalesce(col("__cb"), col("b")).as("sb"))
        .where(col("sa") =!= col("sb"))
      // CC on the contracted DELTA graph: (super, comp)
      val merged = connectedComponents(mapped, "sa", "sb", maxIter)
        .select(col("node").as("__super"), col("comp").as("__new_comp"))
      // old nodes relabel through their component's super-node;
      // untouched components miss the join and keep their label
      val updatedOld = lab
        .join(merged, lab("comp") === merged("__super"), "left")
        .select(col("node"),
          coalesce(col("__new_comp"), col("comp")).as("comp"))
      // brand-new nodes are their own super-node
      val newNodes = sym.select(col("a").as("node")).distinct()
        .join(lab.select("node"), Seq("node"), "left_anti")
      val updatedNew = newNodes
        .join(merged, newNodes("node") === merged("__super"), "left")
        .select(col("node"),
          coalesce(col("__new_comp"), col("node")).as("comp"))
      // materialize before releasing the label cache (the result must
      // not depend on unpersisted blocks); inner CC's intermediates
      // released inside connectedComponents, its final checkpoint is
      // subsumed by this one
      val out = updatedOld.unionByName(updatedNew).localCheckpoint()
      org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(merged)
      out
    } finally lab.unpersist(blocking = false)
  }

  /** Dup-cluster resolution: pairwise duplicate hits → one surviving
    * id per transitive cluster. Returns (node, survivor). */
  def dupSurvivors(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    dupSurvivorsFromComps(connectedComponents(pairs, aCol, bCol))

  /** `dupSurvivors` from precomputed component labels (node, comp) —
    * lets one CC run feed the whole survivors family when several
    * reports share the same pair table. */
  def dupSurvivorsFromComps(comps: DataFrame): DataFrame =
    comps.withColumnRenamed("comp", "survivor")

  /** Dup-cluster size distribution — (cluster_size, n_clusters) — the
    * one-line report a dedup run publishes ("12 pairs collapsed into 4
    * clusters of 3..."). Two tiny aggregations over the component
    * labels; singleton docs (in no pair) are by definition absent. */
  def clusterSizeStats(pairs: DataFrame, aCol: String,
                       bCol: String): DataFrame =
    clusterSizeStatsFromComps(connectedComponents(pairs, aCol, bCol))

  /** `clusterSizeStats` from precomputed component labels. */
  def clusterSizeStatsFromComps(comps: DataFrame): DataFrame =
    comps
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Quality-aware dup-cluster resolution: keep the BEST-scoring doc
    * of each transitive cluster instead of the minimum id — real
    * curation keeps the highest-quality copy, not the numerically
    * smallest one. Ties break on min id so the pick is deterministic.
    * `scores` maps `idCol` → `scoreCol`; nodes missing from it rank
    * below every scored node. Returns (node, survivor).
    *
    * Cost over `dupSurvivors`: one join on the node key plus one
    * aggregation + join keyed by CLUSTER id — cluster cardinality is
    * far below node cardinality, so both extra shuffles move only
    * (node, comp, score) triples, never document payloads. */
  def dupSurvivorsBy(pairs: DataFrame, aCol: String, bCol: String,
                     scores: DataFrame, idCol: String,
                     scoreCol: String): DataFrame =
    dupSurvivorsByFromComps(connectedComponents(pairs, aCol, bCol),
      scores, idCol, scoreCol)

  /** Fixed-iteration PageRank in INTEGER micro-units — centrality
    * over an edge list (e.g. the procurement graph, or a near-dup
    * graph when picking the authoritative survivor per cluster).
    * Damping 0.85 in micro-arithmetic: s₀ = 1e6 per node;
    * sₖ₊₁(v) = 150000 + (850000 · Σ_{u→v} (sₖ(u) div deg(u))) div 1e6
    * — every operation is integer division/sum, so the result is
    * bit-identical in any engine and independent of aggregation
    * order (what makes it hash-checkable cross-engine, unlike a
    * float PageRank whose sum order drifts).
    *
    * Callers pass DIRECTED edges (send each edge twice for an
    * undirected graph — which also removes dangling nodes, since
    * every node then has out-degree ≥ 1). Scale shape: the
    * degree-annotated edge list persists once and each iteration is
    * one join keyed on src + one aggregate keyed on dst — k shuffle
    * rounds for k iterations, the standard distributed PageRank
    * layout; hot destinations partial-aggregate map-side.
    * Returns (node, degree, rank_micro). */
  /** `edgesDistinct = true` skips the defensive `distinct()` when the
    * CALLER proves the edge list is already duplicate-free (e.g. a
    * distinct pair table unioned with its disjoint reversal) — the
    * dedup pass is one full edge-sized exchange + aggregate, pure
    * waste on pre-deduped input; degrees and ranks are identical by
    * precondition. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank iters must be >= 1: $iters")
    // the iteration inputs persist once (every round re-reads them),
    // and each round's scores localCheckpoint — without the lineage
    // cut, iteration k's plan embeds k full copies of the
    // edge/degree subtree and the unrolled DAG grows multiplicatively
    // (the same truncation connectedComponents uses)
    // the caller's edge expression materializes ONCE: it appears in
    // deg, ed, and (via union'd build patterns) often contains joins
    // whose recompute through the unrolled lineage dominated the
    // whole operator (measured ~6x the useful work on the
    // procurement graph before the cut)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (edgesDistinct) e0 else e0.distinct())
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ed = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var scores = deg.select(col("src").as("node"),
      lit(1000000L).as("sc")).localCheckpoint()
    for (_ <- 1 to iters) {
      val inc = ed
        .join(scores.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("sc div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      val nextScores = deg.select(col("src").as("node"))
        .join(inc.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr(
            "(850000 * coalesce(inc, 0)) div 1000000")).as("sc"))
        .localCheckpoint()
      // round N-1's blocks release once round N is materialized (same
      // bounded-state discipline as connectedComponents)
      org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(scores)
      scores = nextScores
    }
    // node-sized result; materialized so EVERY intermediate releases:
    // the persisted edge/degree tables, the edge checkpoint, and the
    // final round's score checkpoint — only `out`'s blocks survive
    val out = scores
      .join(deg.select(col("src").as("node"), col("deg").as("degree")),
        "node")
      .select(col("node"), col("degree"), col("sc").as("rank_micro"))
      .localCheckpoint()
    ed.unpersist()
    deg.unpersist()
    org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(scores)
    org.apache.spark.sql.GraftCheckpointBridge.unpersistCheckpoint(e)
    out
  }

  /** `dupSurvivorsBy` from precomputed component labels. */
  def dupSurvivorsByFromComps(comps: DataFrame,
                              scores: DataFrame, idCol: String,
                              scoreCol: String): DataFrame = {
    val scored = comps.join(
      scores.select(col(idCol).as("node"), col(scoreCol).as("__score")),
      Seq("node"), "left")
    // winner = min over (score DESC, node ASC), i.e. struct ordering
    // on (-score, node) — one map-side-combining aggregate per cluster
    val best = scored.groupBy(col("comp"))
      .agg(min_by(col("node"),
        struct(
          negate(coalesce(col("__score"), lit(Double.NegativeInfinity))),
          col("node"))).as("survivor"))
    comps.join(best, Seq("comp")).select(col("node"), col("survivor"))
  }

  /** Exact per-node triangle counts over an undirected edge list —
    * the clustering-structure primitive (co-occurrence cliques,
    * community density, link-spam detection on a web corpus).
    *
    * Degree-oriented ADJACENCY INTERSECTION: orient every edge from
    * its lower-(degree, id) endpoint to the higher (an acyclic total
    * order), build each node's out-neighbor list, and for every
    * oriented edge (a, b) intersect N⁺(a) ∩ N⁺(b) — each triangle
    * {a≺b≺c} appears exactly once, as c in the intersection at edge
    * (a, b). Orientation bounds |N⁺| by O(√m), so a degree-10⁶ hub
    * at 100 TB carries a √m-sized list, never a deg²-sized wedge
    * set; total intersection work is O(m^1.5) — and, unlike the
    * wedge-join formulation, it happens INSIDE a projection: nothing
    * wedge-sized is ever shuffled. (The wedge self-join + closing
    * shuffle measured 3.4× the CPU at sf1 purely in shuffle
    * machinery once the edge list outgrew a broadcast — this shape
    * shuffles only edges and node-sized adjacency, at any scale.)
    * Per-node attribution without materializing triples: |S| credits
    * each of a and b, and S explodes only |triangles| rows for the
    * c-side — one union + one node-keyed count, map-side combined.
    *
    * @return (node, n_triangles) for every node on ≥ 1 triangle;
    *         node ids must be numeric (the orientation tiebreak
    *         compares them). */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    // canonical undirected edge set: (u, v) with u < v, deduped
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("deg", "dv"), "v")
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("src"), col("v").as("dst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst")))
        .as("o"))
      .select(col("o.src").as("src"), col("o.dst").as("dst"))
      // reused by the adjacency build and the edge probe; without
      // the cut the canon+degree subtree replays twice
      .localCheckpoint()
    // sorted adjacency feeds the allocation-free native merge kernel
    val adj0 = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    // the adjacency table is NODE-sized (Σ|N⁺| = m longs); joining it
    // onto edges by shuffle would re-shuffle 2·m array-laden rows —
    // measured ~12 GB through the second exchange at sf1, and ~2.7×
    // the broadcast path's CPU on the same graph (the r11 sf1 sweep:
    // 11.96M edges = 287 MB estimated tripped a 256 MB gate into the
    // fallback and the query ran 27× its sf0.1 CPU instead of the
    // graph's true 10×). Broadcast for both probes while it fits: the
    // edge scan then streams through two in-memory probes and nothing
    // array-sized is ever shuffled. The gate is on estimated BYTES,
    // not row count — Σ|N⁺| = m longs plus per-row struct overhead,
    // ~24 B/edge unrolled. The REAL heap footprint is larger: the
    // probes are two SEPARATE broadcast relations (no exchange
    // reuse), each with hash-table overhead — budget ~4× the
    // estimate. Default cap 512 MB of estimated bytes ≈ ~2 GB heap
    // worst case: comfortably inside this image's driver, and still
    // ~20M edges of headroom; tune per deployment via
    // spark.graft.triangles.broadcastMaxBytes (size suffixes ok:
    // "256m", "1g"). Past the threshold the shuffle join is the
    // honest distributed fallback (measured ~2.7× the CPU — prefer
    // raising the cap on a big driver). The count is free — the
    // checkpoint above already materialized the edges. broadcast()
    // wraps the PROJECTED frames directly (not a parent the join
    // resolves through a Project), so the hint can't be lost to plan
    // rewrites.
    val maxBytes = edges.sparkSession.conf
      .getOption("spark.graft.triangles.broadcastMaxBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(512L << 20)
    val adjBytesEst = oriented.count() * 24L
    val useBroadcast = adjBytesEst <= maxBytes
    def probe(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df
    // sinks (no out-edges) have empty intersections — inner joins
    // drop exactly the edges that cannot close a triangle.
    // FUSED contribution pass (r18): the former two-branch union
    // (endpoint counts ∪ closer explode) referenced the probe+
    // intersect subtree TWICE — the broadcast relations were reused
    // but every oriented edge re-probed both adjacency maps and
    // re-ran the merge pass per branch, doubling the O(m^1.5)
    // intersection CPU. One packed kernel emits [a, b, closers...]
    // per triangle-closing edge (empty otherwise — posexplode drops
    // it), and POSITION decodes the weight: the two endpoints each
    // credit |closers| = size-2 triangles, every closer credits 1.
    // Identical contributions, half the probe/merge work, and the
    // intersection array is materialized only on closing edges.
    def ex(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.expression(c)
    val packed = oriented
      .join(probe(adj0.select(col("src"), col("nbrs").as("na"))), "src")
      .join(probe(adj0.select(col("src").as("dst"), col("nbrs").as("nb"))),
        "dst")
      .select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.SortedLongIntersectPacked(
          ex(col("src")), ex(col("dst")),
          ex(col("na")), ex(col("nb")))).as("arr"))
    packed
      .select(size(col("arr")).as("sz"),
        posexplode(col("arr")).as(Seq("pos", "node")))
      .select(col("node"),
        when(col("pos") <= 1, col("sz") - 2).otherwise(lit(1))
          .cast("long").as("w"))
      .groupBy("node").agg(sum(col("w")).as("n_triangles"))
  }
}
