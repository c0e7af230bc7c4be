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
    // a02 dispatch probe: forest size after the first DSU contraction
    // vs the star threshold, and both paths timed on the same input
    locally {
      val edges = st.links.filter(col("right").isNotNull)
        .select(col("left").as("a"), col("right").as("b"))
      println(s"[probe] edges = ${edges.count()}")
      if (sys.env.get("PROBE_FOREST_ONLY").contains("1")) {
        // forest-row count after the first DSU contraction: the value
        // the starRows dispatch compares against its threshold
        val fc = graft.graph.Analytics.firstContractionCount(
          st.links.filter(col("right").isNotNull)
            .select(col("left"), col("right")))
        println(s"[probe] forest rows = $fc")
        spark.stop(); return
      }
      // warm analytics closures once
      graft.graph.Analytics.connectedComponentsDSU(
        spark.range(100).toDF("id"),
        spark.range(100).select((col("id") % 7).as("left"), (col("id") % 13).as("right")))
        .count()
      def runA02(label: String, starRows: Long): Unit = {
        // finally-clear: a throwing timed run must not leak the global
        // dispatch override into everything after it in this JVM
        System.setProperty("graft.cc.starRows", starRows.toString)
        try {
          val before = graft.graph.Analytics.starPathRuns.get()
          for (i <- 1 to 2) {
            // wall time on a noisy host swings 2-4x within one JVM, so
            // ALSO report host-robust totals per run: task CPU time and
            // shuffle volume (the quantities an exchange trim actually
            // changes) via a per-run listener
            val listener = new org.apache.spark.scheduler.SparkListener {
              val cpuNs = new java.util.concurrent.atomic.AtomicLong
              val runMs = new java.util.concurrent.atomic.AtomicLong
              val shufW = new java.util.concurrent.atomic.AtomicLong
              val shufRec = new java.util.concurrent.atomic.AtomicLong
              override def onTaskEnd(
                  te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
                val m = te.taskMetrics
                if (m != null) {
                  cpuNs.addAndGet(m.executorCpuTime)
                  runMs.addAndGet(m.executorRunTime)
                  shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
                  shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
                }
              }
            }
            spark.sparkContext.addSparkListener(listener)
            time(s"a02 $label#$i")(graft.graph.Analytics.connectedComponentsStore(st)
              .groupBy(col("component")).agg(count(lit(1)).as("n")).count())
            Thread.sleep(2000) // let the async listener bus drain
            spark.sparkContext.removeSparkListener(listener)
            println(f"[probe] $label#$i cpu=${listener.cpuNs.get / 1e9}%.1fs " +
              f"taskTime=${listener.runMs.get / 1e3}%.1fs " +
              f"shufWrite=${listener.shufW.get / 1e6}%.1fMB " +
              f"shufRecords=${listener.shufRec.get / 1e6}%.2fM")
          }
          println(s"[probe] $label starPathRuns delta = " +
            s"${graft.graph.Analytics.starPathRuns.get() - before}")
        } finally System.clearProperty("graft.cc.starRows")
      }
      if (sys.env.get("PROBE_STAR_ONLY").contains("1"))
        runA02("star-forced", 1L) // A/B harness: star path alone
      else {
        runA02("default-64M", 64L << 20) // the shipped starRowsThreshold
        runA02("dsu-forced", Long.MaxValue)
        runA02("star-forced", 1L)
      }
    }
    spark.stop()
  }
}
