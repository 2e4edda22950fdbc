package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Scratch scale diagnostic (test scope only, not shipped): bucket
  * population and candidate-pair volume of the LSH dedup paths at a
  * given SF dir — the evidence for adjudicating super-linear CPU in
  * the sf10 stress (pair space is the cost driver; this prints it
  * directly instead of inferring from shuffle bytes).
  * `SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "Test/runMain graft.ScaleProbe"` */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, d, "documents")

    def bucketStats(name: String,
        sigs: org.apache.spark.sql.DataFrame): Unit = {
      val bands = 16; val rows = 64 / bands
      val banded = sigs.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rows) + 1, lit(rows)))))
        .as(Seq("band", "band_hash")))
      val sizes = banded.groupBy("band", "band_hash").count()
      val st = sizes.agg(
        count(lit(1)).as("buckets"),
        max(col("count")).as("max_sz"),
        expr("approx_percentile(count, 0.999)").as("p999"),
        sum(col("count") * (col("count") - 1) / 2).as("pair_space"),
        sum(when(col("count") <= 1000,
          col("count") * (col("count") - 1) / 2).otherwise(0))
          .as("pair_space_capped"),
        sum(when(col("count") > 1000, 1).otherwise(0)).as("over_cap"))
        .collect()(0)
      println(s"[probe] $name buckets=${st.get(0)} max=${st.get(1)} " +
        s"p999=${st.get(2)} pairSpace=${st.get(3)} " +
        s"cappedPairSpace=${st.get(4)} bucketsOverCap=${st.get(5)}")
    }

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label took ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val mh = Dedup.minhashSignatures(docs, "text", "doc_id")
      .persist()
    timed("minhash sigs")(mh.count())
    bucketStats("minhash", mh)
    timed("minhash pairs")(println("[probe] minhash pairs=" +
      Dedup.minhashPairsFromSigs(mh, "doc_id").count()))
    mh.unpersist(false)
    val oph = Dedup.minhashSignaturesOPH(docs, "text", "doc_id")
      .persist()
    timed("oph sigs")(oph.count())
    bucketStats("oph", oph)
    timed("oph cand+estimate t=0.2")(println("[probe] oph pairs=" +
      Dedup.minhashPairsFromSigs(oph, "doc_id", threshold = 0.2).count()))
    timed("oph FULL GATE + noop (the bench call)") {
      SparkEntry.queries("q_dedup_oph")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    oph.unpersist(false)
    // hyperplane-bucket skew (the q_dedup_embed watch item): real
    // embeddings are not uniform, so the top bucket can outgrow the
    // constant EXPECTED population
    val e = Tables.load(spark, d, "embeddings")
    val n = e.count()
    val bits = graft.operators.Similarity.adaptiveBits(n)
    val skew = graft.operators.Similarity
      .bucketCandidatePairs(e, "vec_id", "embedding", bits, 64)
      .groupBy("doc_a").count().agg(max("count")).collect()(0)
    println(s"[probe] embed n=$n bits=$bits maxPairsPerProbe=${skew.get(0)}")
    spark.stop()
  }
}
