package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the PARTITIONED-Bloom regime of incremental dedup
  * (dev tool, like PlanProbe): runs the p13 gate's exact query on a
  * given SF dir under (a) the default single-filter regime and (b) a
  * forced bucketed-sketch regime (tiny `graft.bloom.maxSingleBits` +
  * small `graft.bloom.bucketBits` so several buckets engage), checks
  * the two outputs are IDENTICAL row sets, and prints steady-state
  * timings (min of N reps after an untimed warmup). Feeds SCALING.md's
  * p13-partitioned decade row — the r11 sf10 row ran 500k fingerprints,
  * under the single-filter gate, so the partitioned regime had only a
  * unit test at scale.
  */
object P13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def query() = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val batch = docs.filter(pmod(col("doc_id"), lit(10L)) === 0)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10L)) === 5)
          .select((col("doc_id") + 950000L).as("doc_id"),
            concat(col("text"), lit(" fresh novel tail")).as("text")))
      graft.operators.Dedup.incrementalNew(batch, docs, "doc_id", "text")
    }
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def checksum() = query()
      .agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("fp"))))
      .head()

    def regime(label: String): (Double, org.apache.spark.sql.Row) = {
      checksum() // untimed warmup (builds the sketch + memo)
      var best = Double.MaxValue
      var sum: org.apache.spark.sql.Row = null
      for (_ <- 1 to reps) {
        val (secs, r) = time(checksum())
        if (secs < best) best = secs
        sum = r
      }
      println(f"[p13] $label%-12s best $best%7.2f s  checksum $sum")
      (best, sum)
    }

    // warm shared one-time costs (JIT, parquet footers, count memo)
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val (_, single) = regime("single")
    val before = graft.operators.Dedup.partitionedBloomBuilds.get()
    // sized so BOTH sf1 (50k fps ~ 479k bits) and sf10 (500k ~ 4.8M
    // bits) cross the forced gate, with multiple buckets engaging
    // (sf1 -> 4 buckets, sf10 -> 64)
    System.setProperty("graft.bloom.maxSingleBits", (1L << 18).toString)
    System.setProperty("graft.bloom.bucketBits", (1L << 17).toString)
    try {
      val (_, part) = regime("partitioned")
      val builds =
        graft.operators.Dedup.partitionedBloomBuilds.get() - before
      println(s"[p13] partitionedBloomBuilds delta = $builds")
      require(builds > 0, "partitioned regime never engaged")
      require(single == part,
        s"REGIME OUTPUTS DIFFER: single=$single partitioned=$part")
      println("[p13] outputs identical across regimes")
    } finally {
      System.clearProperty("graft.bloom.maxSingleBits")
      System.clearProperty("graft.bloom.bucketBits")
    }
    spark.stop()
  }
}
