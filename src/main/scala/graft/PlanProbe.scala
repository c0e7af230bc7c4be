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
    // job/stage anatomy of one point query
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stageTimes = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        val d = for {
          a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime
        } yield a - b
        stageTimes.add(s"stage(tasks=${sc.stageInfo.numTasks}, ${d.getOrElse(-1L)}ms, ${sc.stageInfo.name.take(40)})")
      }
    })
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def q2(i: Int) = s"""read (type="customer" value~="${1 + i % 997}" result=((guid value)))"""
    graft.plan.ReadPlanner.plan(st, q2(500)).collect()
    Thread.sleep(500); jobs.set(0); stages.set(0); tasks.set(0); stageTimes.clear()
    val tq = System.nanoTime()
    graft.plan.ReadPlanner.plan(st, q2(501)).collect()
    val wall = (System.nanoTime()-tq)/1e6
    Thread.sleep(500)
    println(f"[probe] ONE point query: $wall%6.1f ms, jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    stageTimes.forEach(t => println(s"[probe]   $t"))
    spark.stop()
  }
}

/** qps sweep: simple-read throughput vs client-thread count */
object QpsProbe {
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
    st.current.count(); st.valueWordIndex.count()
    def q(i: Int) = s"""read (type="customer" value~="${1 + i % 997}" result=((guid value)))"""
    graft.plan.ReadPlanner.plan(st, q(0)).collect()
    // single-threaded latency
    val t0 = System.nanoTime()
    (1 to 10).foreach(i => graft.plan.ReadPlanner.plan(st, q(i)).collect())
    println(f"[qps] 1-thread latency ${(System.nanoTime()-t0)/1e7/10}%6.1f ms/query")
    sys.props.put("graft.fixedMax", args.lift(1).getOrElse("4096"))
    println("[qps] fixedMax=" + sys.props("graft.fixedMax"))
    val t1 = System.nanoTime()
    (1 to 10).foreach(i => graft.plan.ReadPlanner.plan(st, q(i)).collect())
    println(f"[qps] 1-thread latency ${(System.nanoTime()-t1)/1e7/10}%6.1f ms/query (after fixedMax)")
    val t2 = System.nanoTime()
    (1 to 10).foreach(i => graft.plan.ReadPlanner.plan(st, q(2000 + i)).collect())
    println(f"[qps] 1-thread latency ${(System.nanoTime()-t2)/1e7/10}%6.1f ms/query (FRESH literals)")
    val t3 = System.nanoTime()
    (1 to 10).foreach(i => graft.plan.ReadPlanner.plan(st, q(2000 + i)).collect())
    println(f"[qps] 1-thread latency ${(System.nanoTime()-t3)/1e7/10}%6.1f ms/query (repeat of fresh)")
    for (n <- Seq(2, 4, 8, 16, 32)) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val per = 8
      val t = System.nanoTime()
      val fs = (0 until n).map(c => pool.submit(new Runnable {
        def run(): Unit = (0 until per).foreach(i =>
          graft.plan.ReadPlanner.plan(st, q(c * per + i)).collect())
      }))
      fs.foreach(_.get()); pool.shutdown()
      println(f"[qps] $n%2d clients: ${(n * per) / ((System.nanoTime()-t)/1e9)}%7.1f q/s")
    }
    spark.stop()
  }
}
