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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val st = graft.store.GraphAdapter.store(spark, sfDir)
    st.current.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    time("pagerank-5it")(graft.graph.Analytics.pageRankDF(st, 5).count())
    time("pagerank-again")(graft.graph.Analytics.pageRankDF(st, 5).count())
    // breakdown: cedges build vs per-iteration
    val edges = st.links.filter(col("right").isNotNull)
      .select(col("left").as("src"), col("right").as("dst"))
    val cedges = edges.join(edges.groupBy("src").agg(count(lit(1)).as("od")), "src").cache()
    time("cedges-materialize")(cedges.count())
    var ranks = st.nodes.select(col("id")).withColumn("pagerank", lit(1.0))
    for (i <- 1 to 5) {
      ranks = time(s"iter-$i") {
        val contrib = cedges.join(broadcast(ranks.withColumnRenamed("id", "src")), "src")
          .groupBy("dst").agg(sum(col("pagerank") / col("od")).as("in_sum"))
        val next = st.nodes.select(col("id")).join(contrib, col("id") === col("dst"), "left_outer")
          .select(col("id"), (lit(0.15) + lit(0.85) * coalesce(col("in_sum"), lit(0.0))).as("pagerank"))
          .localCheckpoint()
        next.count(); next
      }
    }
    time("khop")(graft.graph.Analytics.kHop(st, Seq(graft.store.GraphAdapter.BNation + 3), 2).count())
    time("khop-again")(graft.graph.Analytics.kHop(st, Seq(graft.store.GraphAdapter.BNation + 3), 2).count())
    spark.stop()
  }
}
