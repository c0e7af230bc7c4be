package graft.plan

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-request cost budgets and cost reporting — the Spark rendition of
  * the reference's `timeout=` / `cost="tu=N ..."` request modifiers
  * (doc/gr-protocol.txt:182-260, graphd/graphd-cost.c): a request that
  * exceeds its budget is KILLED (its Spark jobs cancelled), never the
  * server, and every request can report what it actually cost.
  *
  * The reference checkpoints a cost structure inside its iterators; a
  * Spark job's unit of cancellation is the job group, so the guard maps
  * the budget to `cancelJobGroup` from a daemon timer, and the cost
  * report aggregates task metrics for exactly the jobs the request ran
  * (keyed by job group through a listener). Reported keys use the
  * reference's vocabulary (graphd_cost_limit_to_string order):
  * tr = wall millis, tu = executor CPU millis, ts = JVM GC millis (the
  * "system time" analog), dr = records read.
  */
object CostGuard {

  /** runtime-addressable cost keys (graphd-cost.c
    * graphd_cost_to_address): anything else rejects the whole string,
    * exactly like the reference (cost1.sh: fm/mm/ft/mt are
    * config-file-only and fail a `set (cost=...)`)
    */
  val Keys = Seq("tr", "ts", "tu", "te", "pr", "pf", "va",
    "dr", "dw", "iw", "ir", "in")

  final case class CostLimitExceeded(budgetMillis: Long)
      extends RuntimeException(
        s"COST: request exceeded its ${budgetMillis}ms budget")

  /** Parse a cost-limit string into (key -> bound). Left = the
    * reference's SEMANTICS message on any unknown key or malformed
    * value (graphd_cost_from_string).
    */
  def parseCostLimit(s: String): Either[String, Map[String, Long]] = {
    val out = scala.collection.mutable.Map.empty[String, Long]
    val toks = s.split("""\s+""").filter(_.nonEmpty)
    val bad = toks.exists { tok =>
      tok.split("=", 2) match {
        case Array(k, v) if Keys.contains(k.toLowerCase) &&
            v.matches("""\d+""") =>
          out(k.toLowerCase) = v.toLong; false
        case _ => true
      }
    }
    if (bad) Left(s"""cannot parse cost string \"$s\"""")
    else Right(out.toMap)
  }

  /** canonical rendering, in graphd_cost_limit_to_string member order */
  def renderCost(m: Map[String, Long]): String =
    Keys.collect { case k if m.contains(k) => s"$k=${m(k)}" }.mkString(" ")

  /** the wall-clock budget a parsed cost limit implies: the tightest
    * of tr (wall) and te (end-to-end). tu is a CPU budget — on a
    * 32-thread executor a request burns 32 CPU-seconds per wall
    * second, so mapping tu to a wall timer would overrun the declared
    * CPU budget by the core count; [[run]] enforces tu separately by
    * polling measured executor CPU.
    */
  def budgetMillis(limit: Map[String, Long]): Option[Long] =
    Seq("tr", "te").flatMap(limit.get).minOption

  /** the CPU budget (tu, millis) a parsed cost limit carries, if any */
  def cpuBudgetMillis(limit: Map[String, Long]): Option[Long] =
    limit.get("tu")

  private val timer = Executors.newSingleThreadScheduledExecutor(
    new ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-cost-guard"); t.setDaemon(true); t
      }
    })

  /** Run `action`'s Spark jobs under an optional wall-clock budget
    * (`budget`, from tr/te/timeout) and an optional CPU budget
    * (`cpuBudget`, from tu) and measure their cost. Returns (result,
    * cost-report string). On expiry of either the job group is
    * cancelled (tasks interrupted) and CostLimitExceeded is thrown —
    * partial results are dropped, the session survives.
    *
    * The CPU budget polls the listener-accumulated executor CPU of the
    * request's own tasks; metrics land at task END, so enforcement is
    * task-granular (the reference's is iterator-step-granular — same
    * idea, coarser tick).
    */
  def run[T](spark: SparkSession, budget: Option[Long],
      cpuBudget: Option[Long] = None)(action: => T): (T, String) = {
    val sc = spark.sparkContext
    val group = "graft-cost-" + java.util.UUID.randomUUID().toString
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val cpuNanos = new AtomicLong
    val gcMillis = new AtomicLong
    val recordsRead = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          js.stageIds.foreach(stages.add(_))
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (stages.contains(te.stageId) && te.taskMetrics != null) {
          cpuNanos.addAndGet(te.taskMetrics.executorCpuTime)
          gcMillis.addAndGet(te.taskMetrics.jvmGCTime)
          recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
        }
    }
    sc.addSparkListener(listener)
    @volatile var expired = false
    val kill = budget.map(ms => timer.schedule(new Runnable {
      // AndFutureJobs: the budget may expire while the request is still
      // in planning/codegen — a plain cancelJobGroup would miss the job
      // it submits a moment later and the request would run to
      // completion anyway
      def run(): Unit = { expired = true; sc.cancelJobGroupAndFutureJobs(group) }
    }, ms, TimeUnit.MILLISECONDS))
    // tu: poll the request's accumulated executor CPU and kill when it
    // crosses the budget — never a wall mapping (32 threads would
    // overrun a wall-mapped CPU budget 32-fold)
    val cpuKill = cpuBudget.map(tu => timer.scheduleWithFixedDelay(
      new Runnable {
        def run(): Unit =
          if (cpuNanos.get / 1000000L > tu) {
            expired = true
            sc.cancelJobGroupAndFutureJobs(group)
          }
      }, 100L, 100L, TimeUnit.MILLISECONDS))
    val t0 = System.nanoTime()
    // The action runs on ITS OWN interruptible thread, not the caller's.
    // Job-group cancellation alone is not a termination guarantee: an
    // AQE query whose group is cancelled between stage materializations
    // can block forever in its internal stage-event loop (the cancelled
    // stage job never posts a completion event), which would wedge the
    // calling thread even though every Spark job is already dead. The
    // guard's contract is "the request dies, the session survives", so
    // after the group cancel it interrupts the action thread as a
    // backstop — the blocking queue take unwinds with an interrupt and
    // the worker's finally clears its thread-local job group.
    val fut = pool.submit(new java.util.concurrent.Callable[T] {
      def call(): T = {
        sc.setJobGroup(group, "graft cost-guarded request",
          interruptOnCancel = true)
        try action finally sc.clearJobGroup()
      }
    })
    def await(): T =
      budget match {
        case None if cpuBudget.isEmpty => fut.get()
        case None =>
          // CPU-budget-only request: no wall deadline, but the same
          // AQE-hang backstop must apply once the CPU kill fires
          var out: Option[T] = None
          while (out.isEmpty) {
            try out = Some(fut.get(250L, TimeUnit.MILLISECONDS))
            catch {
              case _: java.util.concurrent.TimeoutException if expired =>
                try out = Some(fut.get(GraceMillis, TimeUnit.MILLISECONDS))
                catch {
                  case _: java.util.concurrent.TimeoutException =>
                    fut.cancel(true)
                    throw CostLimitExceeded(cpuBudget.getOrElse(0L))
                }
              case _: java.util.concurrent.TimeoutException => ()
            }
          }
          out.get
        case Some(ms) =>
          try fut.get(ms + GraceMillis, TimeUnit.MILLISECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              // budget fired but the action thread is still stuck —
              // cancel again (idempotent), then interrupt it
              sc.cancelJobGroupAndFutureJobs(group)
              try fut.get(GraceMillis, TimeUnit.MILLISECONDS)
              catch {
                case _: java.util.concurrent.TimeoutException =>
                  fut.cancel(true)
                  throw CostLimitExceeded(ms)
              }
          }
      }
    try {
      val r =
        try await()
        catch {
          case e: CostLimitExceeded => throw e
          case e: Throwable if expired =>
            throw CostLimitExceeded(budget.orElse(cpuBudget).getOrElse(0L))
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      if (expired) throw CostLimitExceeded(budget.orElse(cpuBudget).getOrElse(0L))
      val wall = (System.nanoTime() - t0) / 1000000L
      // listener events drain asynchronously; give the bus a moment so
      // the report covers the request's own tasks
      org.apache.spark.sql.graft.bridge.drainListenerBus(sc, 2000L)
      val report = renderCost(Map(
        "tr" -> wall,
        "tu" -> cpuNanos.get / 1000000L,
        "ts" -> gcMillis.get,
        "dr" -> recordsRead.get))
      (r, report)
    } finally {
      kill.foreach(_.cancel(false))
      cpuKill.foreach(_.cancel(false))
      sc.removeSparkListener(listener)
    }
  }

  /** how long after a budget kill the guard waits for the action thread
    * to unwind on its own before interrupting it
    */
  private val GraceMillis = 2000L

  private val pool = Executors.newCachedThreadPool(new ThreadFactory {
    private val n = new AtomicLong
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-cost-request-" + n.incrementAndGet())
      t.setDaemon(true); t
    }
  })
}
