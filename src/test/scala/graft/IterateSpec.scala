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
