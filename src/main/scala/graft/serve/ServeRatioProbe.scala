package graft.serve

import org.apache.spark.sql.SparkSession

/** Noise-robust sharded/single throughput ratio on ONE corpus: the
  * routed and unrouted paths run INTERLEAVED inside the same
  * wall-clock window (the ServeScaleCompare methodology applied to
  * the SERVING.md target "32-thread unsorted sharded/single"), so the
  * per-round ratio samples the same host-contention regime on both
  * sides and the median over rounds is stable where absolute
  * cross-window figures swing 3-10x.
  *
  * Run: `sbt "runMain graft.serve.ServeRatioProbe [sfDir] [rounds] [shards]"`.
  */
object ServeRatioProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(7)
    val nShards = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve-ratio-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val st = graft.store.GraphAdapter.store(spark, dir)
    st.current.count(); st.valueWordIndex.count()
    val ix = PointServer.build(st)
    val sh = ShardRouter.build(st, nShards)

    val simpleQ = (i: Int) =>
      s"""read (type="customer" value~="${1 + i % 997}" result=((guid value)))"""
    val sortedQ = (i: Int) =>
      s"""read (type="customer" value~="${1 + i % 997}" sort=value pagesize=10 result=((guid value)))"""
    val nClients = 32
    def drive(n: Int, f: Int => Unit): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nClients)
      val t0 = System.nanoTime()
      val futs = (0 until nClients).map { c =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until n).foreach(i => f(c * n + i))
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      (nClients.toLong * n) / ((System.nanoTime() - t0) / 1e9)
    }
    // warm both paths
    drive(512, i => PointServer.serve(ix, simpleQ(i)))
    drive(512, i => ShardRouter.serve(sh, simpleQ(i)))
    drive(512, i => PointServer.serve(ix, sortedQ(i)))
    drive(512, i => ShardRouter.serve(sh, sortedQ(i)))
    System.gc()

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val rs = scala.collection.mutable.ListBuffer.empty[Double]
    val rsSorted = scala.collection.mutable.ListBuffer.empty[Double]
    println(f"${"round"}%5s ${"single q/s"}%12s ${"sharded q/s"}%12s ${"ratio"}%6s" +
      f" ${"sgl-sort"}%12s ${"shd-sort"}%12s ${"ratio"}%6s")
    for (r <- 1 to rounds) {
      val single = drive(2048, i => PointServer.serve(ix, simpleQ(i)))
      val sharded = drive(2048, i => ShardRouter.serve(sh, simpleQ(i)))
      val singleS = drive(1024, i => PointServer.serve(ix, sortedQ(i)))
      val shardedS = drive(1024, i => ShardRouter.serve(sh, sortedQ(i)))
      rs += sharded / single
      rsSorted += shardedS / singleS
      println(f"$r%5d $single%12.0f $sharded%12.0f ${sharded / single}%6.2f" +
        f" $singleS%12.0f $shardedS%12.0f ${shardedS / singleS}%6.2f")
    }
    println(f"median unsorted sharded/single = ${med(rs.toSeq)}%.2f" +
      f"   median sorted = ${med(rsSorted.toSeq)}%.2f")
    spark.stop()
  }
}
