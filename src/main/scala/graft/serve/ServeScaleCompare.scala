package graft.serve

import org.apache.spark.sql.SparkSession

/** Size-independence A/B for the serving tier: measures the SAME
  * serving figures against two corpus scales INTERLEAVED in the same
  * wall-clock window, so the within-round ratio is robust to the
  * host's co-tenant noise (which SCALING.md shows swings absolute
  * figures 3–10× between windows, but is near-stationary inside one).
  * This is the measurement behind SERVING.md's "thin-read cost tracks
  * result size, not corpus size" claim when the host refuses to give
  * a quiet absolute window.
  *
  * Run: `sbt "runMain graft.serve.ServeScaleCompare <dirA> <dirB> [rounds]"`.
  */
object ServeScaleCompare {
  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirB = args.lift(1).getOrElse("/root/repo/scaledata/sf1")
    val rounds = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve-scale-compare")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def setup(dir: String): (PointServer.Index, ShardRouter.Shards) = {
      val st = graft.store.GraphAdapter.store(spark, dir)
      st.current.count()
      st.valueWordIndex.count()
      (PointServer.build(st), ShardRouter.build(st, 3))
    }
    System.err.println(s"[compare] building $dirA ...")
    val (ixA, shA) = setup(dirA)
    System.err.println(s"[compare] building $dirB ...")
    val (ixB, shB) = setup(dirB)

    val simpleQ = (i: Int) =>
      s"""read (type="customer" value~="${1 + i % 997}" result=((guid value)))"""
    val sortedQ = (i: Int) =>
      s"""read (type="customer" value~="${1 + i % 997}" sort=value pagesize=10 result=((guid value)))"""
    // CONSTANT-RESULT control: a guid point read returns exactly one
    // row at every scale — if serving cost tracked CORPUS size this
    // figure would degrade with it; if it tracks RESULT size it stays
    // flat while the word probes (whose result is k× at scale k,
    // ScaleGen replicates customer values unsalted) scale with their
    // row count.
    val pointQ = (i: Int) =>
      s"""read (guid=${10000000 + 1 + i % 997} result=((guid value)))"""
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
    def figures(ix: PointServer.Index, sh: ShardRouter.Shards)
        : Seq[(String, () => Double)] = Seq(
      "point" -> (() => drive(2048, i => PointServer.serve(ix, pointQ(i)))),
      "pointsh" -> (() => drive(1024, i => ShardRouter.serve(sh, pointQ(i)))),
      "simple" -> (() => drive(2048, i => PointServer.serve(ix, simpleQ(i)))),
      "sharded" -> (() => drive(1024, i => ShardRouter.serve(sh, simpleQ(i)))),
      "sorted" -> (() => drive(1024, i => PointServer.serve(ix, sortedQ(i)))),
      "sortshard" -> (() => drive(1024, i => ShardRouter.serve(sh, sortedQ(i)))))

    // JIT + cache warm on BOTH sides before any timed round
    figures(ixA, shA).foreach(_._2())
    figures(ixB, shB).foreach(_._2())
    System.gc()

    val figsA = figures(ixA, shA); val figsB = figures(ixB, shB)
    val names = figsA.map(_._1)
    println(f"${"round"}%5s ${"figure"}%9s ${"A q/s"}%12s ${"B q/s"}%12s ${"B/A"}%6s")
    val ratios = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to rounds; k <- names.indices) {
      // tight A/B interleave per figure: both sides sample the same
      // contention regime
      val a = figsA(k)._2(); val b = figsB(k)._2()
      ratios(names(k)) ::= b / a
      println(f"$r%5d ${names(k)}%9s $a%12.0f $b%12.0f ${b / a}%6.2f")
    }
    println("--- median B/A per figure ---")
    names.foreach { n =>
      val s = ratios(n).sorted
      println(f"$n%9s ${s(s.length / 2)}%6.2f")
    }
    spark.stop()
  }
}
