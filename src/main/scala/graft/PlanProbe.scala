package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch profiling main (not part of the library surface) */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    Tables.load(spark, sfDir, "nation").count()
    val st = time("store.build")(graft.store.GraphAdapter.store(spark, sfDir))
    time("current.count")(st.current.count())
    time("wordIndex.count")(st.valueWordIndex.count())
    time("links.count")(st.links.count())
    time("nodes.count")(st.nodes.count())
    // a02 phases
    time("a02 full#1")(graft.graph.Analytics.connectedComponentsStore(st)
      .groupBy(col("component")).agg(count(lit(1)).as("n")).count())
    time("a02 full#2")(graft.graph.Analytics.connectedComponentsStore(st)
      .groupBy(col("component")).agg(count(lit(1)).as("n")).count())
    time("a01 khop#1")(graft.graph.Analytics.kHop(st, Seq(graft.store.GraphAdapter.BNation + 3), 2)
      .groupBy(col("hops")).agg(count(lit(1)).as("n")).count())
    time("a01 khop#2")(graft.graph.Analytics.kHop(st, Seq(graft.store.GraphAdapter.BNation + 3), 2)
      .groupBy(col("hops")).agg(count(lit(1)).as("n")).count())
    for (i <- 1 to 2)
      time(s"a03 pr#$i")(graft.graph.Analytics.pageRankDF(st, 5)
        .orderBy(round(col("pagerank"), 6).desc, col("id").asc).limit(20).count())
    val docs = Tables.load(spark, sfDir, "documents")
    val warmDocs = spark.range(20000).select(
      col("id").as("doc_id"),
      concat(lit("Warm Up  Sample text for jit "), col("id").cast("string"),
        lit(" more words go here to shingle and hash")).as("text"))
    operators.Dedup.shingleSet(warmDocs, "doc_id", "text", 3).agg(count(col("sh"))).collect()
    for (i <- 1 to 2) {
      time(s"d02 jaccard#$i")(operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 1000).count())
      time(s"d03 lsh#$i")(operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8).count())
      time(s"d04 simhash#$i")(operators.Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
      time(s"d05 clusters#$i")(operators.Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.8, 1000).count())
    }
    spark.stop()
  }
}
