package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.{LakeWriter, Tables}
import graft.streaming.Speed

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Skew.saltedAgg is exact vs the plain aggregation") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), $"l_quantity",
      saltFrom = $"l_orderkey", salts = 8)
      .select($"l_returnflag", round($"total", 2).as("total"), $"n")
    val plain = li.groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 2).as("total"), count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("Skew.saltedJoin returns exactly the plain join's rows") {
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val c = Tables.load(spark, TestSpark.sfDir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val salted = Skew.saltedJoin(o, c, "o_custkey",
      saltFrom = $"o_orderkey", salts = 8)
    val plain = o.join(c, Seq("o_custkey"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty)
  }

  test("bucketed tables join without a shuffle on either side") {
    // a previous JVM's managed-table dirs survive the in-memory catalog
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get("/tmp/graft_warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    LakeWriter.bucketedTable(o, "b_orders", Seq("o_orderkey"), 4,
      Seq("o_orderkey"))
    LakeWriter.bucketedTable(li, "b_lineitem", Seq("l_orderkey"), 4,
      Seq("l_orderkey"))
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      $"l_orderkey" === $"o_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        li.join(o, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stream-stream interval join: purchases within 1h of a click") {
    val ev = Speed.eventStream(spark, TestSpark.sfDir)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"))
      .withColumnRenamed("p_user", "user_id")
    val joined = Speed.intervalJoin(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", withinMillis = 3600000L)
    val out = Speed.runToBatch(spark, joined, "t_interval",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchEv = Tables.load(spark, TestSpark.sfDir, "events")
    val bc = batchEv.where($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
    val bp = batchEv.where($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"))
    val batch = bc.join(bp, Seq("user_id"))
      .where($"purchase_ts" > $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 3600 SECONDS"))
    // stream result must be a subset of the batch join (watermark can
    // hold back tail rows) and substantially cover it
    assert(out.count() > 0)
    assert(out.select("user_id", "click_ts", "purchase_ts")
      .except(batch.select("user_id", "click_ts", "purchase_ts")).isEmpty)
    assert(out.count() >= batch.count() / 2)
  }
}
