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
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val d = (for { a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime } yield a - b).getOrElse(0L)
        if (d > 300) println(s"[stage] ${d}ms tasks=${sc.stageInfo.numTasks} ${sc.stageInfo.details.split("\n")(0).take(80)}")
      }
    })
    Tables.load(spark, sfDir, "nation").count()
    val docs = Tables.load(spark, sfDir, "documents")
    val warmDocs = spark.range(20000).select(
      col("id").as("doc_id"),
      concat(lit("Warm Up  Sample text for jit "), col("id").cast("string"),
        lit(" more words go here to shingle and hash")).as("text"))
    operators.Dedup.shingleSet(warmDocs, "doc_id", "text", 3).agg(count(col("sh"))).collect()
    time("d02")(operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 1000).count())
    time("d05")(operators.Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.8, 1000).count())
    spark.stop()
  }
}
