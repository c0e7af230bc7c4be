package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: run declared queries N times in one JVM with a
  * per-run listener reporting wall, task CPU, shuffle bytes/records and
  * per-stage breakdowns — the measurement harness guide §1 asks for,
  * host-noise-robust via the deterministic shuffle totals.
  *
  * Usage: runMain graft.OpProbe <sfDir> <reps> <query1,query2,...> [stages]
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("a03_pagerank"))
    val showStages = args.lift(3).contains("stages")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-opprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the same shared warmup the bench runs
    Tables.load(spark, sfDir, "nation").count()
    val st = graft.store.GraphAdapter.store(spark, sfDir)
    st.current.count()
    st.valueWordIndex.count()

    for (name <- names; rep <- 1 to reps) {
      val fn = SparkEntry.queries(name)
      val stages = new java.util.concurrent.ConcurrentHashMap[
        Int, (String, Long, Long, Long, Long, Long)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages.put(si.stageId, (
            si.name.take(60),
            m.executorRunTime,
            m.executorCpuTime / 1000000L,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.setJobDescription(s"$name rep$rep")
      val t0 = System.nanoTime()
      val failed =
        try { fn(spark, sfDir).count(); false }
        catch { case e: Throwable =>
          System.err.println(s"[opprobe] $name FAILED: ${e.getMessage}")
          true
        }
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener bus BEFORE removing the listener: a fixed
      // sleep is racy under load — late stage-completed events arriving
      // after removal silently undercount the cpu/shuffle totals, the
      // exact metrics this tool advertises as host-noise-robust.
      // waitUntilEmpty THROWS on timeout; a clogged bus must degrade to
      // one undercounted rep (tagged via stderr), not abort the probe.
      try org.apache.spark.sql.graft.bridge
        .drainListenerBus(spark.sparkContext, 10000L)
      catch { case _: java.util.concurrent.TimeoutException =>
        System.err.println(s"[opprobe] $name rep$rep listener bus not " +
          "drained in 10s; stage totals may undercount")
      }
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(_._1)
      val cpu = ss.map(_._2._3).sum / 1e3
      val sread = ss.map(_._2._4).sum / 1e6
      val swrite = ss.map(_._2._5).sum / 1e6
      val srec = ss.map(_._2._6).sum
      // a failed rep's partial metrics must never read as a speedup:
      // the FAILED marker goes to stderr, so the stdout line carries it
      val tag = if (failed) " FAILED" else ""
      println(f"[opprobe] $name rep$rep$tag wall=$wall%6.2f s cpu=$cpu%7.2f s " +
        f"stages=${ss.size}%3d shufR=$sread%8.2f MB shufW=$swrite%8.2f MB recs=$srec")
      if (showStages)
        for ((id, (nm, run, c, sr, sw, rec)) <- ss)
          println(f"  stage$id%4d run=${run / 1e3}%7.2f cpu=${c / 1e3}%7.2f " +
            f"sR=${sr / 1e6}%7.1f sW=${sw / 1e6}%7.1f rec=$rec%9d  $nm")
    }
    spark.stop()
  }
}
