package graft.serve

import org.apache.spark.sql.SparkSession

import graft.gql.Parser

/** Per-stage profiler for the point-serving path — the measurement
  * behind SERVING.md's scatter-tax model. Single-threaded nanoTime
  * buckets over the same query class the qps figures drive:
  * parse | single-snapshot probe | per-shard probes | full router call.
  * Run: `sbt "runMain graft.serve.ServeProfile [sfDir] [iters]"`.
  */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val st = graft.store.GraphAdapter.store(spark, sfDir)
    st.current.count()
    st.valueWordIndex.count()
    val ix = PointServer.build(st)
    val sh = ShardRouter.build(st, 3)
    val simpleQ = (i: Int) =>
      s"""read (type="customer" value~="${1 + i % 997}" result=((guid value)))"""
    val sortedQ = (i: Int) =>
      s"""read (type="customer" value~="${1 + i % 997}" sort=value pagesize=10 result=((guid value)))"""

    def profile(tag: String, q: Int => String, iters: Int = iters): Unit = {
      // warm every path (JIT)
      (0 until math.min(5000, iters)).foreach { i =>
        val c = Parser.parseRead(q(i))
        PointServer.serve(ix, c)
        ShardRouter.serve(sh, c)
      }
      var tParse = 0L; var tSingle = 0L; var tRouter = 0L
      var tShards = 0L; var tVet = 0L
      var tCSingle = 0L; var tCRouter = 0L
      var rowsSingle = 0L; var rowsRouted = 0L
      var i = 0
      while (i < iters) {
        val s = q(i)
        val t0 = System.nanoTime()
        val c = Parser.parseRead(s)
        val t1 = System.nanoTime()
        rowsSingle += PointServer.serve(ix, c).map(_.rows.length).getOrElse(-1)
        val t2 = System.nanoTime()
        rowsRouted += ShardRouter.serve(sh, c).map(_.rows.length).getOrElse(-1)
        val t3 = System.nanoTime()
        // the scatter's own two stages, isolated: vetting + 3 probes
        val prefix = c.pagesize.map(ps => c.start.getOrElse(0L) + ps)
        val shardC = c.copy(start = None, pagesize = prefix)
        val flat = PointServer.flatFor(shardC).get
        val t4 = System.nanoTime()
        sh.shards.foreach(s0 =>
          PointServer.serveVetted(s0, shardC, flat, emitSortKeys = true))
        val t5 = System.nanoTime()
        // the statement-cached text entries — what the qps loops drive
        PointServer.serve(ix, s)
        val t6 = System.nanoTime()
        ShardRouter.serve(sh, s)
        val t7 = System.nanoTime()
        tParse += t1 - t0; tSingle += t2 - t1; tRouter += t3 - t2
        tVet += t4 - t3; tShards += t5 - t4
        tCSingle += t6 - t5; tCRouter += t7 - t6
        i += 1
      }
      def us(t: Long): String = f"${t / 1e3 / iters}%8.2f"
      println(f"[$tag%7s] parse=${us(tParse)}  single=${us(tSingle)}  " +
        f"router=${us(tRouter)}  vet=${us(tVet)}  3xprobe=${us(tShards)}  " +
        f"cached_single=${us(tCSingle)}  cached_router=${us(tCRouter)}  " +
        f"(us/query; rows single=${rowsSingle / iters} " +
        f"routed=${rowsRouted / iters})")
    }
    // FAT variants: every customer value contains the word "customer",
    // so the probe's data-proportional share (accept checks, sort-key
    // materialization, per-shard sort) dominates the fixed scatter tax
    // — the regime where the router's split pays for itself
    val fatQ = (_: Int) =>
      """read (type="customer" value~="customer" pagesize=100 result=((guid value)))"""
    val fatSortedQ = (_: Int) =>
      """read (type="customer" value~="customer" sort=value pagesize=100 result=((guid value)))"""
    profile("simple", simpleQ)
    profile("sorted", sortedQ)
    profile("simple", simpleQ) // second pass: steady-state check
    profile("sorted", sortedQ)
    profile("fat", fatQ, iters / 10)
    profile("fatsort", fatSortedQ, iters / 10)
    spark.stop()
  }
}
