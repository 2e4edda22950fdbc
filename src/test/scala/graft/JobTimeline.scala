package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap

/** Wall-time dissection probe (test scope only, not shipped): run one
  * SparkEntry query under the bench's session shape and print a
  * job-level timeline — per-job duration + description and, more
  * importantly, the GAPS between jobs (driver-side planning, manifest
  * IO, fs listing, stream trigger latency) that per-query wall totals
  * hide. `sbt "Test/runMain graft.JobTimeline q_mv_refresh"`.
  * SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1). */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobTimeline <query names...>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("job-timeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class J(id: Int, submit: Long, var end: Long = -1,
                 var desc: String = "", var nTasks: Int = 0,
                 var nStages: Int = 0)
    val jobs = new ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    // per-stage-callsite aggregation: which LINE of code burns the CPU
    case class St(var n: Int = 0, var tasks: Int = 0, var runMs: Long = 0,
                  var cpuMs: Long = 0, var shw: Long = 0, var shr: Long = 0)
    val stages = new ConcurrentHashMap[String, St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .filter(_.nonEmpty)
          // AQE stage jobs carry no callsite property; pull the first
          // graft frame from the stage details instead
          .orElse(e.stageInfos.headOption.flatMap(_.details.split('\n')
            .find(l => l.contains("graft.") && !l.contains("JobTimeline"))
            .map(_.trim.stripPrefix("at ").take(100))))
          .getOrElse("")
        j.nStages = e.stageInfos.size
        j.nTasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(e.jobId, j); order.add(e.jobId): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        // AQE materializes every shuffle stage from a CompletableFuture
        // thread, so si.name is useless; pull the first graft/operator
        // frame from the long callsite instead
        val key =
          if (!si.name.contains("CompletableFuture")) si.name
          else si.details.split('\n')
            .find(l => l.contains("graft.") && !l.contains("JobTimeline"))
            .map(_.trim.stripPrefix("at ").take(110))
            .getOrElse(si.name)
        val st = stages.computeIfAbsent(key, _ => St())
        st.synchronized {
          st.n += 1; st.tasks += si.numTasks
          val m = si.taskMetrics
          if (m != null) {
            st.runMs += m.executorRunTime
            st.cpuMs += m.executorCpuTime / 1000000L
            st.shw += m.shuffleWriteMetrics.bytesWritten
            st.shr += m.shuffleReadMetrics.totalBytesRead
          }
        }
      }
    })

    // one warmup pass over a tiny sf to absorb JIT/codegen (same as
    // Bench's warmup posture) so the timeline shows steady-state cost
    for (q <- args.toSeq) {
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    for (q <- args.toSeq) {
      jobs.clear(); order.clear(); stages.clear()
      val t0 = System.currentTimeMillis()
      SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      println(s"== $q total ${(t1 - t0) / 1000.0}s, ${order.size} jobs ==")
      var prevEnd = t0
      var jobSum = 0L; var gapSum = 0L
      import scala.jdk.CollectionConverters._
      for (id <- order.asScala.toSeq.sorted) {
        val j = jobs.get(id)
        val gap = j.submit - prevEnd
        val dur = (if (j.end > 0) j.end else j.submit) - j.submit
        jobSum += dur; gapSum += math.max(gap, 0)
        println(f"  job $id%4d  +${(j.submit - t0) / 1000.0}%7.2fs  gap ${gap / 1000.0}%6.2fs  run ${dur / 1000.0}%6.2fs  stages ${j.nStages}%2d tasks ${j.nTasks}%4d  ${j.desc.take(90)}")
        prevEnd = math.max(prevEnd, if (j.end > 0) j.end else j.submit)
      }
      val tail = t1 - prevEnd
      println(f"  [sum] jobs ${jobSum / 1000.0}%6.2fs  gaps ${gapSum / 1000.0}%6.2fs  tail ${tail / 1000.0}%6.2fs  wall ${(t1 - t0) / 1000.0}%6.2fs")
      println("  -- stages by cpu --")
      for ((name, st) <- stages.asScala.toSeq.sortBy(-_._2.cpuMs).take(25))
        println(f"  ${st.cpuMs / 1000.0}%7.2f cpu-s  run ${st.runMs / 1000.0}%7.2f  x${st.n}%-3d tasks ${st.tasks}%5d  shw ${st.shw / 1e6}%8.1fMB  $name%.100s")
    }
    spark.stop()
  }
}
