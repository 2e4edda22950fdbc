package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: bench runs at local[32]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // belt for anything the explicit between-queries release misses:
      // ContextCleaner triggers a periodic GC so weakly-referenced
      // RDD/broadcast/shuffle state actually drains in a long session
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shuffle accounting: how many bytes each query moves is the
    // number that predicts 100 TB behavior better than local seconds
    val shufWrite = new AtomicLong(); val shufRead = new AtomicLong()
    // executor CPU seconds per query: contention-INVARIANT where wall
    // seconds are not — when the driver host is busy, wall time
    // inflates but the CPU a query actually burns does not (BENCH_r06/
    // r07 were 1.8x the same-code evidence runs on unchanged plans;
    // this field lets any reader separate host noise from regressions)
    val cpuNanos = new AtomicLong()
    // GC + memory evidence (r9 verdict: the q_dsir_select CPU anomaly
    // needs per-query GC time and peak execution memory to separate
    // "heap-pressure tax" from "plan regression"): task-summed JVM GC
    // millis and the max single-task peak execution memory
    val gcMillis = new AtomicLong()
    val peakTaskMem = new AtomicLong()
    // retry evidence (r11 verdict: mid-run CPU inflation up to 16× a
    // query's steady state could not be adjudicated as recompute vs
    // plan cost after the fact): non-Success task ends and stage
    // re-attempts, snapshotted per query like the CPU counter — a
    // recompute-driven tax now shows as nonzero retries in the same
    // row as the inflated cpu_sec
    val taskFails = new AtomicLong()
    val stageRetries = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        // genuine FAILURES only: TaskKilled (speculation duplicates,
        // job cancellation) is a benign non-Success end and would
        // fire the recompute-evidence signal spuriously
        if (t.reason.isInstanceOf[org.apache.spark.TaskFailedReason] &&
            !t.reason.isInstanceOf[org.apache.spark.TaskKilled])
          taskFails.incrementAndGet(): Unit
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          cpuNanos.addAndGet(m.executorCpuTime)
          gcMillis.addAndGet(m.jvmGCTime)
          peakTaskMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (s.stageInfo.attemptNumber() > 0) stageRetries.incrementAndGet()
    })

    // host evidence: 1-min load and the iowait/steal shares of
    // /proc/stat across each query's timed window
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // (total, iowait, steal) jiffies from the aggregate cpu line
    def cpuStat(): (Long, Long, Long) =
      try {
        val p = scala.io.Source.fromFile("/proc/stat").getLines()
          .next().trim.split("\\s+").drop(1).map(_.toLong)
        (p.sum, p(4), if (p.length > 7) p(7) else 0L)
      } catch { case _: Throwable => (-1L, 0L, 0L) }

    // a drain timeout only mis-attributes a few tasks' bytes to the
    // next query — never abort the bench over bookkeeping
    def drain(): Unit =
      try org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      catch { case _: Throwable => }

    // flush dirty page cache BETWEEN queries (outside every timed
    // window): checkpoint/snapshot-heavy queries otherwise leave
    // async writeback that the kernel flushes DURING the next few
    // queries' windows — BENCH_r06 showed exactly that signature
    // (contiguous slow bursts right after the IO-heavy queries, see
    // docs/bench/r06_outliers.md). Timing starts clean instead.
    def syncFs(): Unit =
      try { val p = new ProcessBuilder("sync").start(); p.waitFor() }
      catch { case _: Throwable => }

    // release pinned storage BETWEEN queries (outside every timed
    // window): localCheckpoint/cache blocks are only freed when their
    // RDD is GC'd, and each query's RESULT keeps its chain alive — in
    // the r10 driver gate the pinned floor ramped 16→66 GB across 32
    // queries, starving execution memory and taxing everything in the
    // window 2-22× until a full GC finally snapped it back. A 100 TB
    // long-lived session hits the same wall, so the engine-side fix
    // (iterative ops release round N-1, operators/Graph.scala) is
    // primary; this is the bench-session twin. Skipped under
    // SPARK_GRAFT_SHARED_INTERMEDIATES: the survivors family's
    // memoized component labels are exactly the kind of cross-query
    // state the flag asks to keep.
    val keepShared =
      sys.env.get("SPARK_GRAFT_SHARED_INTERMEDIATES").contains("1")
    def releasePinned(): Unit = {
      if (!keepShared)
        org.apache.spark.sql.GraftCheckpointBridge.releaseAllPersisted(spark)
      // the two block classes getPersistentRDDs can never see (the
      // r11 driver-gate residue, 24 queries taxed >2x inside one
      // position window): broadcast-join relations — freed only when
      // ContextCleaner GCs the Broadcast handle, so 175 queries'
      // worth accumulate between periodic GCs — and streaming
      // state-store providers, which outlive their (stopped) queries
      // until a maintenance unload. Both releases are quiescent-point
      // safe ONLY when no cross-query state survives: under the
      // shared-intermediates posture a kept persisted frame's lost
      // partition could recompute through a freed broadcast, so the
      // broadcast release obeys keepShared exactly like the RDD one.
      if (!keepShared)
        org.apache.spark.GraftSessionHygiene.releaseBroadcasts(
          spark.sparkContext): Unit
      org.apache.spark.sql.GraftCheckpointBridge.unloadStreamingState()
      // adaptive full GC: only when the live floor is already high —
      // unpersist drops the references, but the blocks' on-heap bytes
      // return only at the next collection, and waiting for one to
      // happen naturally is how r10 taxed 32 queries. Threshold is
      // min(maxMemory/2, 8 GB): heap-relative so it is live on the
      // pinned 8 g policy heap (r11: an absolute 16 GB trigger was
      // dead code there), CAPPED at half the policy heap so it stays
      // live even if the JVM lands off-policy anyway (r12: on the
      // driver's 95 g gate JVM, maxMemory/2 = 47 g never fired and
      // heap floors ramped to 19 GB). Keeps the clean-run cost at
      // zero (no per-query forced GC when the floor stays low).
      val rt = Runtime.getRuntime
      val gcAt = math.min(rt.maxMemory / 2, 8L << 30)
      if (rt.totalMemory - rt.freeMemory > gcAt) System.gc()
    }

    // untimed warmup: JIT, codegen, parquet reader init — otherwise
    // whichever query runs first absorbs ~10s of one-time cost.
    // q_agg_pricing warms the join/agg kernels; q_tfidf warms the
    // text pipeline (regex tokenize, explode, window, broadcast) —
    // measured ~2-3s of JIT that otherwise lands on the first text
    // query in map order
    // q_stream_window_agg warms the streaming stack (micro-batch
    // planner, state store, memory sink) — its own kernel family,
    // untouched by the batch warmups
    //
    // r17 (optimization round): the original 3-query warmup left most
    // kernel families to absorb their own C2 compilation inside the
    // first ~25 timed windows — measured at sf0.1, those queries ran
    // a median 1.7× their steady state (q_dedup_delta alone burned
    // 133 CPU-s cold vs 27 warm: 32 cores re-interpreting the same
    // generated code while C2 catches up). One representative per
    // remaining family, still at sf0.001 (the warmup measures
    // nothing; it only compiles): LSH/minhash+CC (q_dedup_survivors),
    // the lake signature-table delta path (q_dedup_delta), iterative
    // pagerank (q_pagerank), file-stream+foreachBatch+history
    // (q_stream_bloom_dedup), the curation funnel (q_stream_curation),
    // the snapshot commit/manifest layer (q_snapshot_count), image
    // decode (q_image_phash), banded levenshtein (q_fuzzy_join), and
    // the embedding/ANN kernels (q_embed_ivf_ann).
    Seq("q_agg_pricing", "q_tfidf", "q_stream_window_agg",
        "q_dedup_survivors", "q_dedup_delta", "q_pagerank",
        "q_stream_bloom_dedup", "q_stream_curation", "q_snapshot_count",
        "q_image_phash", "q_fuzzy_join", "q_embed_ivf_ann").foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // the warmup leaves pinned blocks/broadcasts behind like any
    // query would — release them so the first timed window starts
    // from the same clean session state as every later one
    drain(); releasePinned(); syncFs()


    val failed = scala.collection.mutable.ListBuffer[String]()
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val cpuSec = scala.collection.mutable.LinkedHashMap[String, Double]()
    val hostLoad1 = scala.collection.mutable.LinkedHashMap[String, Double]()
    val hostIowaitPct = scala.collection.mutable.LinkedHashMap[String, Double]()
    val hostStealPct = scala.collection.mutable.LinkedHashMap[String, Double]()
    val gcSec = scala.collection.mutable.LinkedHashMap[String, Double]()
    val peakMemMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val heapUsedMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val taskFailN = scala.collection.mutable.LinkedHashMap[String, Double]()
    val stageRetryN = scala.collection.mutable.LinkedHashMap[String, Double]()
    def runOne(label: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (String, Double) = {
      drain()
      syncFs()
      val w0 = shufWrite.get(); val r0 = shufRead.get()
      val c0 = cpuNanos.get(); val g0 = gcMillis.get()
      val f0 = taskFails.get(); val s0 = stageRetries.get()
      peakTaskMem.set(0L) // per-query max, reset outside the window
      val (jt0, jw0, js0) = cpuStat()
      hostLoad1(label) = load1()
      val t0 = System.nanoTime()
      // noop sink: forces FULL evaluation of every output column —
      // count() would let Catalyst prune the projections away and
      // under-report narrow transforms
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += label
        System.err.println(s"[bench] $label failed: ${e.getMessage}")
      }
      // a failed query reports -1 so a crash can never read as a speedup
      val dt = if (failed.contains(label)) -1.0
               else (System.nanoTime() - t0) / 1e9
      drain()
      releasePinned()
      val wMb = (shufWrite.get() - w0) / 1e6
      val rMb = (shufRead.get() - r0) / 1e6
      shuffleMb(label) =
        (math.round(wMb * 100) / 100.0, math.round(rMb * 100) / 100.0)
      cpuSec(label) = math.round((cpuNanos.get() - c0) / 1e9 * 100) / 100.0
      gcSec(label) = math.round((gcMillis.get() - g0) / 1e3 * 100) / 100.0
      peakMemMb(label) = math.round(peakTaskMem.get() / 1e6 * 10) / 10.0
      taskFailN(label) = (taskFails.get() - f0).toDouble
      stageRetryN(label) = (stageRetries.get() - s0).toDouble
      // live heap AFTER the query (no explicit GC — just the floor the
      // JVM is sitting on): a climbing floor across the run is the
      // heap-pressure signature that taxes later queries with GC
      val rt = Runtime.getRuntime
      heapUsedMb(label) =
        math.round((rt.totalMemory - rt.freeMemory) / 1e6 * 10) / 10.0
      val (jt1, jw1, js1) = cpuStat()
      val jd = (jt1 - jt0).toDouble
      hostIowaitPct(label) =
        if (jt0 < 0 || jd <= 0) -1.0 else math.round((jw1 - jw0) / jd * 10000) / 100.0
      hostStealPct(label) =
        if (jt0 < 0 || jd <= 0) -1.0 else math.round((js1 - js0) / jd * 10000) / 100.0
      System.err.println(
        f"[bench] $label%-24s $dt%8.2f s  cpu ${cpuSec(label)}%8.2f s  gc ${gcSec(label)}%6.2f s  shuffle w $wMb%8.2f / r $rMb%8.2f MB  load1 ${hostLoad1(label)}%5.1f  heap ${heapUsedMb(label)}%8.1f MB")
      label -> dt
    }
    // dev loop: SPARK_GRAFT_ONLY=q_a,q_b times a subset (the driver
    // never sets it, so the contract run is always the full map).
    // SPARK_GRAFT_PASSES=2 / SPARK_GRAFT_REVERSE=1 are further
    // dev-only knobs (repeat the whole set in one JVM / reverse the
    // order) for JIT/GC-state A-B experiments — pass ≥2 labels get a
    // "__p<n>" suffix so the contract keys stay untouched.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt
    val ordered0 = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    val ordered = if (sys.env.get("SPARK_GRAFT_REVERSE").contains("1"))
      ordered0.reverse else ordered0
    val results = (1 to passes).flatMap { p =>
      ordered.map { case (name, fn) =>
        runOne(if (p == 1) name else s"${name}__p$p", fn) }
    }

    // large-state posture: the stateful streaming queries once more
    // with the RocksDB state store + changelog checkpointing — the
    // configuration a 100 TB/day deployment would run. Reported as a
    // separate dict so `queries`/`value` stay the stable contract.
    graft.streaming.Speed.useRocksDBStateStore(spark)
    val rocksResults = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("q_stream_"))
      .filter(n => only.forall(_.contains(n)))
      .map(n => runOne(n + "__rocksdb", SparkEntry.queries(n)))

    // MEASURE (don't paste) the survivors family's standalone-honesty
    // premium: with sharing OFF, q_dedup_survivors /
    // q_dedup_survivors_quality / q_dup_cluster_stats /
    // q_split_leakage_free each rebuild the SAME LSH pair table +
    // component labels — 3 avoidable rebuilds per full run
    // (gate_policy.md). One untimed materialization of that shared
    // build per run prices it on THIS host under THIS heap, so the
    // field moves when the family moves instead of going stale.
    // Emitted only when the premium is actually being paid: a full-map
    // run with sharing off (a subset run may exclude the family; a
    // shared run pays nothing).
    val sharedOffPremium: Double =
      if (only.nonEmpty || keepShared) 0.0
      else {
        drain(); syncFs()
        val t0 = System.nanoTime()
        val b =
          try {
            SparkEntry.sharedCCProbe(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch {
            // NonFatal only: an OOM here must crash the run, not be
            // laundered into a "healthy" contract line with -1
            case scala.util.control.NonFatal(_) => -1.0
          }
        drain(); releasePinned()
        if (b < 0) -1.0 else math.round(3 * b * 100) / 100.0
      }

    def json(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val shw = shuffleMb.map { case (k, (w, _)) => k -> w }
    val shr = shuffleMb.map { case (k, (_, r)) => k -> r }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val totalCpu = math.round(results.collect {
      case (k, v) if v >= 0 => cpuSec.getOrElse(k, 0.0) }.sum * 100) / 100.0

    // Full detail (per-query full precision, RocksDB variants, shuffle
    // bytes, host evidence) goes to STDERR — the harness only keeps a
    // bounded tail of stdout, so the stdout contract line must stay
    // small.
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","cpu_sec_total":$totalCpu,"max_heap_mb":${math.round(Runtime.getRuntime.maxMemory / 1e6)},"shared_off_premium_sec":$sharedOffPremium,"queries":${json(results)},"cpu_sec":${json(cpuSec)},"gc_sec":${json(gcSec)},"peak_task_mem_mb":${json(peakMemMb)},"heap_used_mb":${json(heapUsedMb)},"task_fail":${json(taskFailN)},"stage_retry":${json(stageRetryN)},"rocksdb_queries":${json(rocksResults)},"shuffle_write_mb":${json(shw)},"shuffle_read_mb":${json(shr)},"load1":${json(hostLoad1)},"iowait_pct":${json(hostIowaitPct)},"steal_pct":${json(hostStealPct)},"failed":$failedJson,"sf":"$sfDir","ts":"${java.time.Instant.now()}"}"""
    System.err.println(s"[bench-full] $fullJson")
    // ... and to a file, so every bench run (driver's included) leaves
    // per-query cpu/load evidence on disk regardless of log truncation
    try {
      val p = java.nio.file.Paths.get("docs/bench/last_run_full.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (fullJson + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => }

    // STDOUT contract line: ONE compact JSON object. The harness
    // inspects only the last ~2000 chars of stdout (and sbt appends a
    // "[success] Total time: …" line after us), so we hard-cap the
    // line length: values rounded, and if the per-query dict still
    // doesn't fit, the FASTEST queries fold into an "others" bucket
    // (slowest queries are the informative ones; nothing is dropped
    // from "value", which always sums every successful query).
    def fmt(v: Double): String = {
      val s = f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    val budget = 1600 // chars for the whole line; leaves ample tail room
    val bySlow = results.toSeq.sortBy { case (_, v) => -v }
    // run-level host summary: enough to tell a contended run from a
    // clean one even if only the stdout line survives. cpu_sec_total
    // is the contention-invariant twin of "value" (wall): when wall
    // inflates against the committed evidence run but cpu does not,
    // the gap is host-side, not a plan regression.
    val loadVals = hostLoad1.values.filter(_ >= 0)
    // heap_max_mb = the highest post-release floor any query left
    // behind (flat ≈ healthy; a ramp = pinned-block leak) and
    // gc_sec_total = task-attributed GC across the run — the two
    // fields that would have made r10's 16→66 GB bubble visible from
    // the driver tail alone
    val heapVals = heapUsedMb.values
    val totalGc = math.round(results.collect {
      case (k, v) if v >= 0 => gcSec.getOrElse(k, 0.0) }.sum * 100) / 100.0
    // max_heap_mb = -Xmx as the JVM sees it (gate policy pins 8 g;
    // visible here so a builder run and a driver run are provably the
    // same experiment) plus "off_policy_heap":true when this JVM's
    // heap strays from the pinned 8 g — build.sbt no longer honors
    // SPARK_DRIVER_MEM, so this fires only if the harness bypasses
    // the sbt fork entirely; either way an off-policy run convicts
    // itself on its own contract line instead of needing the r12
    // adjudication archaeology. task_fail/stage_retry totals =
    // recompute evidence (0/0 on a healthy run; nonzero turns "16x
    // cpu, why?" into "recompute", adjudicable from the stdout tail
    // alone), and shared_off_premium_sec = the MEASURED
    // standalone-honesty premium of the LSH family re-deriving its
    // shared pair table per query (3 avoidable rebuilds, priced by
    // one probe materialization this run — gate_policy.md) —
    // subtract it to compare against a
    // SPARK_GRAFT_SHARED_INTERMEDIATES=1 deployment posture.
    val offPolicyHeap = {
      val mb = Runtime.getRuntime.maxMemory / 1e6
      mb < 7200 || mb > 9500
    }
    val hostPart = s""","cpu_sec_total":${fmt(totalCpu)},"gc_sec_total":${fmt(totalGc)},"heap_max_mb":${fmt(if (heapVals.isEmpty) -1 else heapVals.max)},"max_heap_mb":${math.round(Runtime.getRuntime.maxMemory / 1e6)}${if (offPolicyHeap) ""","off_policy_heap":true""" else ""},"task_fail_total":${fmt(taskFailN.values.sum)},"stage_retry_total":${fmt(stageRetryN.values.sum)},"shared_off_premium_sec":${fmt(sharedOffPremium)},"load1_max":${fmt(if (loadVals.isEmpty) -1 else loadVals.max)},"iowait_pct_max":${fmt(hostIowaitPct.values.filter(_ >= 0).foldLeft(0.0)(math.max))},"steal_pct_max":${fmt(hostStealPct.values.filter(_ >= 0).foldLeft(0.0)(math.max))}"""
    def line(kept: Seq[(String, Double)], omitted: Seq[(String, Double)]): String = {
      val qs = kept.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",")
      val extra =
        if (omitted.isEmpty) ""
        else s""","omitted_queries":${omitted.size},"omitted_sec":${fmt(omitted.map(_._2).sum)}"""
      val failedPart = if (failed.isEmpty) "" else s""","failed":$failedJson"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$hostPart,"queries":{$qs}$extra$failedPart,"sf":"$sfDir"}"""
    }
    var keep = bySlow.size
    while (keep > 1 && line(bySlow.take(keep), bySlow.drop(keep)).length > budget) keep -= 1
    println(line(bySlow.take(keep), bySlow.drop(keep)))
    spark.stop()
  }
}
