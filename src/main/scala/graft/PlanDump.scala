package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for every declared query to a
  * directory (one file per query) so plan-shape claims in
  * OPTIMIZATION_*.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [only,csv]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/plans/r12")
    val suffix = args.lift(2).getOrElse("before")
    val only = args.lift(3).map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
        try w.println(plan) finally w.close()
        // PrintWriter swallows IOExceptions: a truncated evidence file
        // must not report success
        if (w.checkError())
          throw new java.io.IOException(s"write failed: ${name}_$suffix.txt")
        val nEx = "Exchange".r.findAllIn(plan).length
        System.err.println(f"[plandump] $name%-28s exchanges=$nEx")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
