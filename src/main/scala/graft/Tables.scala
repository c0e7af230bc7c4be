package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the parquet tables below. Reads are plain `spark.read.parquet` so
  * Catalyst pushes filters/column pruning into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Convenience bundle of all tables for one scale factor. */
  final case class T(spark: SparkSession, sfDir: String) {
    def region: DataFrame     = load(spark, sfDir, "region")
    def nation: DataFrame     = load(spark, sfDir, "nation")
    def customer: DataFrame   = load(spark, sfDir, "customer")
    def supplier: DataFrame   = load(spark, sfDir, "supplier")
    def part: DataFrame       = load(spark, sfDir, "part")
    def orders: DataFrame     = load(spark, sfDir, "orders")
    def lineitem: DataFrame   = load(spark, sfDir, "lineitem")
    def events: DataFrame     = load(spark, sfDir, "events")
    def documents: DataFrame  = load(spark, sfDir, "documents")
    def embeddings: DataFrame = load(spark, sfDir, "embeddings")
  }
}
