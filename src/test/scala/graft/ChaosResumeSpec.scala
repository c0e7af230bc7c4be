package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plan.{CostGuard, ReadPlanner}

/** Sabotage-style chaos gate for cursor resume — the Spark analog of
  * the reference's GRAPHD_SABOTAGE kill points (graphd/graphd-sabotage.c:
  * every iterator checks a countdown and aborts mid-operation; the test
  * rig then proves freeze/resume reproduces the exact pages).
  *
  * Here the kill is CostGuard's job-group cancellation: each page of a
  * paged read is first attempted under a tiny wall budget that usually
  * cancels it mid-planning/mid-stage, then retried uninterrupted. The
  * gate asserts the sabotaged run produces BYTE-EQUAL pages and cursor
  * tokens to an uninterrupted ground-truth run — a failed attempt must
  * leave no state behind that shifts the resume point, and the minted
  * token must survive its own request being killed and re-run.
  */
class ChaosResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val store = graft.store.GraphAdapter.store(spark, "/root/testdata/sf0.001")

  /** one query per frozen-iterator family (the cursor wire forms of
    * Cursor.decode): all, gmap (typed), hmap/fixed (word match),
    * without (anti sub), and the sort keyset cursor
    */
  private val families: Seq[(String, Option[String] => String)] = Seq(
    "all iterator" -> (tok =>
      s"""read (any pagesize=40 result=(cursor (guid value))${curs(tok)})"""),
    "gmap (typed read)" -> (tok =>
      s"""read (type="customer" pagesize=5 result=(cursor (guid value))${curs(tok)})"""),
    "word match (hmap/fixed)" -> (tok =>
      s"""read (any value~="customer" pagesize=20 result=(cursor (guid value))${curs(tok)})"""),
    "without (anti sub)" -> (tok =>
      s"""read (type="supplier" pagesize=2 result=(cursor (guid value)) (<-scope count=0)${curs(tok)})"""),
    "sort cursor" -> (tok =>
      s"""read (type="customer" sort=(value guid) pagesize=5 result=(cursor (guid value))${curs(tok)})"""))

  private def curs(tok: Option[String]): String =
    tok.fold("")(t => s""" cursor="$t"""")

  /** page to exhaustion; each page rendered to a byte-comparable form
    * (every column incl. the minted cursor token)
    */
  private def drive(mk: Option[String] => String,
      sabotageBudgets: Iterator[Long]): Seq[String] = {
    val out = Vector.newBuilder[String]
    var tok: Option[String] = None
    var done = false
    var pages = 0
    while (!done && pages < 30) {
      val q = mk(tok)
      if (sabotageBudgets.hasNext) {
        // the sabotage attempt: usually dies mid-request; if the page
        // happens to finish inside the budget that is fine too — the
        // point is that a KILLED attempt changes nothing
        try CostGuard.run(spark, Some(sabotageBudgets.next())) {
          ReadPlanner.plan(store, q).collect()
        } catch { case _: CostGuard.CostLimitExceeded => () }
      }
      val rows = ReadPlanner.plan(store, q).collect()
      out += rows.map(_.toSeq.map(String.valueOf).mkString("|"))
        .mkString("\n")
      tok = rows.headOption.map(_.getAs[String]("cursor"))
      done = tok.forall(_ == "null:") || rows.isEmpty
      pages += 1
    }
    assert(pages >= 2, s"query paged only $pages time(s) — not a resume test")
    out.result()
  }

  for ((name, mk) <- families)
    test(s"$name: pages survive mid-request kills byte-for-byte") {
      val truth = drive(mk, Iterator.empty)
      // deterministic scatter of kill points: immediate cancels and
      // a few budgets that land inside planning/execution
      val sabotaged = drive(mk, Iterator.continually(Seq(0L, 3L, 9L, 17L))
        .flatten)
      assert(sabotaged == truth)
    }
}
