package graft

/** Bulk probe: attempts to replay EVERY reference test/unit session and
  * prints PASS / FAIL-with-first-diff / ERROR per session. Not a test —
  * run with `sbt "Test/runMain graft.SessionProbe [name...]"` to find
  * which sessions are ready to promote into SessionReplaySpec and what
  * the top failure modes are.
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val refDir = new java.io.File("/root/reference/test/unit")
    def slurp(p: java.io.File): String = {
      val src = scala.io.Source.fromFile(p)(scala.io.Codec.ISO8859)
      try src.mkString finally src.close()
    }
    // smallest scripts first: fast feedback, and the heavyweight
    // stress sessions (100x100, random*) land at the tail
    val all = refDir.listFiles().filter(_.getName.endsWith(".sh"))
      .sortBy(_.length).map(_.getName.stripSuffix(".sh"))
    val names = if (args.nonEmpty) args.toSeq else all.toSeq
    val budgetMs = sys.env.getOrElse("PROBE_BUDGET_MS", "60000").toLong
    var exec = java.util.concurrent.Executors.newSingleThreadExecutor()
    var pass, fail, err = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      val sh = new java.io.File(refDir, s"$name.sh")
      val expF = new java.io.File(refDir, s"$name.out.exp")
      if (!sh.exists() || !expF.exists()) ()
      else {
        System.err.println(s"[probe] $name")
        try {
          val cmds = SessionHarness.parseScript(
            slurp(sh).replace("$B", name))
          val exp = slurp(expF).linesIterator.filter(_.nonEmpty).toSeq
          val fut = exec.submit(new java.util.concurrent.Callable[SessionHarness.Replayed] {
            def call() = {
              // job group so a timeout can cancel the Spark jobs too —
              // otherwise the abandoned job keeps the local executor
              // busy and every later session times out behind it
              spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
              try SessionHarness.replay(spark, cmds)
              finally spark.sparkContext.clearJobGroup()
            }
          })
          val rep =
            try fut.get(budgetMs, java.util.concurrent.TimeUnit.MILLISECONDS)
            catch { case _: java.util.concurrent.TimeoutException =>
              fut.cancel(true)
              spark.sparkContext.cancelJobGroup(name)
              // give the worker thread a moment to unwind; if it's
              // still wedged, replace the executor entirely
              if (!exec.awaitTermination(0, java.util.concurrent.TimeUnit.MILLISECONDS)) ()
              val probeDone = new java.util.concurrent.CountDownLatch(1)
              exec.submit(new Runnable { def run() = probeDone.countDown() })
              if (!probeDone.await(5000, java.util.concurrent.TimeUnit.MILLISECONDS)) {
                exec.shutdownNow()
                exec = java.util.concurrent.Executors.newSingleThreadExecutor()
              }
              throw new RuntimeException("TIMEOUT")
            }
          if (rep.lines.length != exp.length) {
            fail += 1
            failures += f"$name%-16s LEN ${rep.lines.length} vs ${exp.length}"
          } else {
            val bad = rep.lines.lazyZip(exp).lazyZip(rep.sortedRead).zipWithIndex
              .collectFirst {
                case ((a, e, s), i) if !SessionHarness.linesMatch(e, a, s) => (i, e, a)
              }
            bad match {
              case None => pass += 1; println(f"PASS $name")
              case Some((i, e, a)) =>
                fail += 1
                failures += f"$name%-16s L${i + 1} exp=${e.take(sys.env.getOrElse("PROBE_WIDTH", "120").toInt)}\n${" " * 20}act=${a.take(sys.env.getOrElse("PROBE_WIDTH", "120").toInt)}"
            }
          }
        } catch {
          case e: Throwable =>
            err += 1
            failures += f"$name%-16s ERR ${String.valueOf(e.getMessage).take(140)}"
        }
        // every replay caches/localCheckpoints per-store RDDs that are
        // never reused across sessions; without draining them a long
        // sweep degrades until everything times out
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    println(s"\n== $pass pass / $fail fail / $err error ==")
    failures.foreach(f => println("FAIL " + f))
    exec.shutdownNow()
    spark.stop()
    sys.exit(0)
  }
}
