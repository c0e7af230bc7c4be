package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gql.Parser
import graft.model.Primitive.{link, node}
import graft.plan.ReadPlanner
import graft.store.GraphStore

/** `||` disjunction, pick, countlimit, estimate-count — mirroring the
  * reference's or/or2/stror/varor and estimate-count test families.
  */
class OrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val fx = GraphStore.fromSeq(spark, Seq(
    node(1, name = Some("n1"), value = Some("a")),
    node(2, name = Some("n2"), value = Some("b")),
    node(3, name = Some("n3"), value = Some("c")),
    node(4, name = Some("n4"), value = Some("a"))))

  test("or: union of value alternatives, deduplicated") {
    val rows = ReadPlanner.plan(fx,
      """read (value="a" || value="b" sort=(value name) result=((name value)))""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("n1", "a"), ("n4", "a"), ("n2", "b")))
  }

  test("or: three branches with shared shaping") {
    val n = ReadPlanner.plan(fx,
      """read (value="a" || value="b" || value="c" result=count)""")
      .head.getLong(0)
    assert(n == 4L)
  }

  test("or parses into branch structure") {
    val c = Parser.parseRead("""(value="a" name="x" || value="b")""")
    assert(c.orBranches.length == 1)
    assert(c.value.nonEmpty && c.name.nonEmpty)
    assert(c.orBranches.head.value.nonEmpty && c.orBranches.head.name.isEmpty)
  }

  test("countlimit stops counting past the allowance") {
    val n = ReadPlanner.plan(fx, "read (countlimit=2 result=count)")
      .head.getLong(0)
    assert(n == 3L) // countlimit+1 signals TOOMANY overflow
  }

  test("estimate-count returns optimizer statistics without execution") {
    val est = ReadPlanner.plan(fx, "read (result=estimate-count)")
      .head.getLong(0)
    assert(est > 0L)
  }
}
