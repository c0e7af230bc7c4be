package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the physical plan of gate queries so
  * shuffle/broadcast/pushdown regressions are visible at review time.
  *
  *   sbt "runMain graft.PlanAudit q01_scan_filter g03_gql_exists"
  *
  * Expectations (checked manually per round): scans show PushedFilters
  * + pruned ReadSchema; dimension joins broadcast; aggregates have
  * partial (map-side) phases; no Scala UDF nodes on hot paths.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter", "q03_join_agg", "q16_word_match",
        "g03_gql_exists", "t01_token_count")
    for (q <- names) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
