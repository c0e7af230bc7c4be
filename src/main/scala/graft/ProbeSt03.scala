package graft.queries

// throwaway profiling probe — not part of the library (deleted after use)
object ProbeSt03 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
      import graft.store.GraphStore
      val key = java.lang.Integer.toHexString(dir.hashCode)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_probe_merge_$key"
      val feedDir = s"$base/feed"
      val storeDir = s"$base/store"
      val ckptDir = s"$base/ckpt"
      val docs = s.read.parquet(s"$dir/documents.parquet")
      def asBatch(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("doc:"), col("doc_id").cast("string")).as("name"),
        col("text").as("value"))
      if (!new java.io.File(feedDir).exists())
        t("write feed")(asBatch(docs).coalesce(8).write.mode("overwrite").parquet(feedDir))
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      t("delete dirs") {
        fs.delete(new org.apache.hadoop.fs.Path(storeDir), true)
        fs.delete(new org.apache.hadoop.fs.Path(ckptDir), true)
      }
      val seed = t("docPrimitives")(WriteQueries.docPrimitives(
        docs.filter(col("doc_id") % 2 === 0)))
      t("seed save")(GraphStore.fromDf(s, seed).save(storeDir))
      val incoming = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", 3)
        .parquet(feedDir)
      t("stream total") {
        val q = graft.streaming.Replica.mergeStream(incoming, Seq("name"), storeDir, ckptDir)
        q.awaitTermination()
      }
      t("final read") {
        GraphStore.load(s, storeDir).current
          .select(col("name").as("k"), col("value").as("v")).count()
      }
    }

    // non-streaming replica of the 3 merge batches: isolates BulkMerge
    // cost from streaming infra
    {
      import graft.store.GraphStore
      val key = java.lang.Integer.toHexString(dir.hashCode)
      val base2 = s"${System.getProperty("java.io.tmpdir")}/graft_probe_direct_$key"
      val storeDir = s"$base2/store"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      for (pass <- 1 to 3) {
        println(s"=== direct pass $pass ===")
        fs.delete(new org.apache.hadoop.fs.Path(storeDir), true)
        val seed = WriteQueries.docPrimitives(
          docs.filter(col("doc_id") % 2 === 0))
        t("seed save")(GraphStore.fromDf(s, seed).save(storeDir))
        val batches = (0 until 3).map(i =>
          docs.filter(col("doc_id") % 3 === i).select(
            concat(lit("doc:"), col("doc_id").cast("string")).as("name"),
            col("text").as("value")))
        for ((b, i) <- batches.zipWithIndex) {
          val st = t(s"load $i")(GraphStore.load(s, storeDir, useWordIndex = false))
          val r = t(s"merge $i")(
            graft.write.BulkMerge.mergeKeyed(st, b, Seq("name")))
          t(s"append $i")(r.appended
            .withColumn("id_part", shiftright(col("id"),
              GraphStore.PartShift).cast("int"))
            .write.mode("append").partitionBy("id_part").parquet(storeDir))
        }
      }
    }
    s.stop()
  }
}
