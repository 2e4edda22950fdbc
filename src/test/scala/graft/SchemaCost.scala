package graft
import org.apache.spark.sql.SparkSession
object SchemaCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (t <- Seq("documents","orders","lineitem")) {
      // warm
      spark.read.parquet(s"$d/$t.parquet").schema
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { spark.read.parquet(s"$d/$t.parquet").schema; i += 1 }
      println(f"$t: ${(System.nanoTime()-t0)/20/1e6}%.1f ms per inference")
      val sch = spark.read.parquet(s"$d/$t.parquet").schema
      val t1 = System.nanoTime()
      i = 0
      while (i < 20) { spark.read.schema(sch).parquet(s"$d/$t.parquet").schema; i += 1 }
      println(f"$t: ${(System.nanoTime()-t1)/20/1e6}%.1f ms with explicit schema")
    }
    spark.stop()
  }
}
