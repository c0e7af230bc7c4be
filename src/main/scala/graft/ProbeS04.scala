package graft

// throwaway profiling probe — deleted after use
object ProbeS04 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.Tables.load(s, dir, "nation").count()
    for (pass <- 1 to 3) {
      println(s"=== pass $pass ===")
      val emb = graft.Tables.T(s, dir).embeddings
      val cents = t("centroids (2 rounds)")(
        graft.operators.Similarity.ivfCentroids(emb, "vec_id", "embedding",
          nlist = 16, iters = 2, sampleN = 1024))
      val res = t("probe join + topk")(
        graft.operators.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
          k = 5, nlist = 16, nprobe = 4, iters = 2, sampleN = 1024).count())
      println(s"rows=$res cents=${cents.length}")
    }
    s.stop()
  }
}
