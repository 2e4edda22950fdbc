package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeTri {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      val li = sources.Tables.load(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"), "l_orderkey")
        .where(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      val e = edges.select(least(col("u"),col("v")).as("u"), greatest(col("u"),col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()
      val deg = e.select(explode(array(col("u"), col("v"))).as("node")).groupBy("node").agg(count(lit(1)).as("deg"))
      val m = e.count()
      val stats = deg.agg(max("deg"), avg("deg"), count(lit(1))).head()
      // wedge volume = sum over oriented out-degrees choose 2; approximate via orientation
      println(s"[probe] $d edges=$m maxdeg=${stats.get(0)} avgdeg=${stats.get(1)} nodes=${stats.get(2)}")
    }
    s.stop()
  }
}
