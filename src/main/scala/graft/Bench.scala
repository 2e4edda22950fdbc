package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shuffle accounting: how many bytes each query moves is the
    // number that predicts 100 TB behavior better than local seconds
    val shufWrite = new AtomicLong(); val shufRead = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    // untimed warmup: JIT, codegen, parquet reader init — otherwise
    // whichever query runs first absorbs ~10s of one-time cost.
    // q_agg_pricing warms the join/agg kernels; q_tfidf warms the
    // text pipeline (regex tokenize, explode, window, broadcast) —
    // measured ~2-3s of JIT that otherwise lands on the first text
    // query in map order
    // q_stream_window_agg warms the streaming stack (micro-batch
    // planner, state store, memory sink) — its own kernel family,
    // untouched by the batch warmups
    Seq("q_agg_pricing", "q_tfidf", "q_stream_window_agg").foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

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

    val failed = scala.collection.mutable.ListBuffer[String]()
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    def runOne(label: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (String, Double) = {
      drain()
      syncFs()
      val w0 = shufWrite.get(); val r0 = shufRead.get()
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
      val wMb = (shufWrite.get() - w0) / 1e6
      val rMb = (shufRead.get() - r0) / 1e6
      shuffleMb(label) =
        (math.round(wMb * 100) / 100.0, math.round(rMb * 100) / 100.0)
      System.err.println(
        f"[bench] $label%-24s $dt%8.2f s  shuffle w $wMb%8.2f / r $rMb%8.2f MB")
      label -> dt
    }
    // dev loop: SPARK_GRAFT_ONLY=q_a,q_b times a subset (the driver
    // never sets it, so the contract run is always the full map)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) => runOne(name, fn) }

    // large-state posture: the stateful streaming queries once more
    // with the RocksDB state store + changelog checkpointing — the
    // configuration a 100 TB/day deployment would run. Reported as a
    // separate dict so `queries`/`value` stay the stable contract.
    graft.streaming.Speed.useRocksDBStateStore(spark)
    val rocksResults = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("q_stream_"))
      .filter(n => only.forall(_.contains(n)))
      .map(n => runOne(n + "__rocksdb", SparkEntry.queries(n)))

    def json(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val shw = shuffleMb.map { case (k, (w, _)) => k -> w }
    val shr = shuffleMb.map { case (k, (_, r)) => k -> r }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum

    // Full detail (per-query full precision, RocksDB variants, shuffle
    // bytes) goes to STDERR — the harness only keeps a bounded tail of
    // stdout, so the stdout contract line below must stay small.
    System.err.println(s"""[bench-full] {"metric":"total","value":$total,"unit":"sec","queries":${json(results)},"rocksdb_queries":${json(rocksResults)},"shuffle_write_mb":${json(shw)},"shuffle_read_mb":${json(shr)},"failed":$failedJson,"sf":"$sfDir"}""")

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
    def line(kept: Seq[(String, Double)], omitted: Seq[(String, Double)]): String = {
      val qs = kept.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",")
      val extra =
        if (omitted.isEmpty) ""
        else s""","omitted_queries":${omitted.size},"omitted_sec":${fmt(omitted.map(_._2).sum)}"""
      val failedPart = if (failed.isEmpty) "" else s""","failed":$failedJson"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{$qs}$extra$failedPart,"sf":"$sfDir"}"""
    }
    var keep = bySlow.size
    while (keep > 1 && line(bySlow.take(keep), bySlow.drop(keep)).length > budget) keep -= 1
    println(line(bySlow.take(keep), bySlow.drop(keep)))
    spark.stop()
  }
}
