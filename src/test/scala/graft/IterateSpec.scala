package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `iterate` self-test verb (graphd-iterate.c): find/next/resume
  * trials against a constraint's candidate iterator. Every trial must
  * pass on a healthy store — any failure is an engine bug.
  */
class IterateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("iterate trials pass over a persisted typed read") {
    val st = graft.store.GraphAdapter.store(spark, "/root/testdata/sf0.001")
    val rep = graft.plan.ReadPlanner.iterate(st,
      """read (type="customer" result=((guid)))""").collect()
    assert(rep.nonEmpty)
    val failed = rep.filterNot(_.getBoolean(2))
    assert(failed.isEmpty, failed.map(r =>
      s"${r.getString(0)} ${r.getString(1)}").mkString("; "))
    assert(rep.count(_.getString(0) == "find") >= 4)
    assert(rep.count(_.getString(0) == "resume-suffix") >= 4)
  }

  test("pagesize=0 mints a start-positioned cursor without crashing") {
    import graft.model.Primitive.node
    val st = graft.store.GraphStore.fromSeq(spark,
      (1L to 9L).map(i => node(i, value = Some(s"v$i"))))
    // engine path (no replay-harness hook): previously ids(-1) AIOOBE
    val rows = graft.plan.ReadPlanner.plan(st,
      """read (any result=(cursor) pagesize=0)""").collect()
    val tok = graft.plan.ReadPlanner.lastRootCursorTok
    assert(tok.isDefined && tok.get != "null:")
    // the minted token resumes from the START of the set
    val dec = graft.plan.Cursor.decode(tok.get)
    assert(dec.lastId == -1L && dec.offset == 0L)
    // sorted flavor of the same shape
    graft.plan.ReadPlanner.plan(st,
      """read (any sort=value result=(cursor) pagesize=0)""").collect()
    assert(graft.plan.ReadPlanner.lastRootCursorTok.exists(_ != "null:"))
  }

  test("iterate trials pass over an in-memory filtered store") {
    import graft.model.Primitive.node
    val st = graft.store.GraphStore.fromSeq(spark,
      (1L to 40L).map(i => node(i, value = Some(s"v${i % 7}"))))
    val rep = graft.plan.ReadPlanner.iterate(st,
      """read (value~="v3" result=((guid)))""", samples = 4).collect()
    val failed = rep.filterNot(_.getBoolean(2))
    assert(failed.isEmpty, failed.mkString("; "))
  }
}
