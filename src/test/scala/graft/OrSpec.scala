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
      .head().getLong(0)
    assert(n == 4L)
  }

  test("or parses into branch structure") {
    val c = Parser.parseRead("""(value="a" name="x" || value="b")""")
    assert(c.orBranches.length == 1)
    assert(c.value.nonEmpty && c.name.nonEmpty)
    assert(c.orBranches.head.value.nonEmpty && c.orBranches.head.name.isEmpty)
  }

  test("or4 session: first matching branch wins, {} matches everything") {
    // test/unit/or4.sh: green node with orange + red fan-in links
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("green")),
      link(2, left = 1, right = None, value = Some("orange")),
      link(3, left = 1, right = None, value = Some("red"))))
    // branch 1 binds $a from the orange child; {} catches the rest
    val r1 = ReadPlanner.plan(st,
      """read (result=(($a)) (<-left value="orange" $a=value) || {})""")
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(r1.count(_.contains("orange")) == 1 && r1.count(_.isEmpty) == 2,
      s"got $r1")
    // {} first: it matches every candidate, so $a is never bound
    val r2 = ReadPlanner.plan(st,
      """read (result=(($a)) {} || (<-left value="orange" $a=value))""")
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(r2.length == 3 && r2.forall(_.isEmpty), s"got $r2")
  }

  test("varor session: per-branch literal variable bindings") {
    // test/unit/varor.sh: $fruit bound to a different literal per branch
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("c")), node(2, value = Some("b")),
      node(3, value = Some("a"))))
    val rows = ReadPlanner.plan(st,
      """read (
        |   { value="a" $fruit=literal="apple" }
        ||| { value="b" $fruit=literal="banana" }
        ||| { value="c" }
        |result=(($fruit)))""".stripMargin)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(rows == Set(Some("apple"), Some("banana"), None), s"got $rows")
  }

  test("or2 session: braced or inside a scope child, vars bubble to root") {
    // test/unit/or2.sh first session, ids as the reference allocates:
    // A(0) gets +1 offset here since our ids start at 1
    val A = 1L; val T = 2L; val TY1 = 3L; val RN1 = 4L; val LT = 5L
    val S = 6L; val TY2 = 7L; val RN2 = 8L; val LS = 9L; val R = 10L
    val st = GraphStore.fromSeq(spark, Seq(
      node(A, name = Some("result's left")),
      node(T), node(TY1, name = Some("the type")),
      node(RN1, name = Some("the right")),
      link(LT, left = T, right = Some(RN1), typeguid = Some(TY1)),
      node(S).copy(scope = Some(T)),
      node(TY2, name = Some("the type")),
      node(RN2, name = Some("the right")),
      link(LS, left = S, right = Some(RN2), typeguid = Some(TY2)),
      link(R, left = A, right = None).copy(scope = Some(S))))
    val q = """read (
      |  left->(name="result's left")
      |  scope->(
      |    { (<-left typeguid->(name="the type") right->(name="the right"))
      |      $foo=guid }
      |    || { scope->((<-left typeguid->(name="the type")
      |           right->(name="the right")) $bar=guid) }
      |  )
      |  result=(($foo $bar))
      |)""".stripMargin
    val rows = ReadPlanner.plan(st, q).collect()
    assert(rows.length == 1)
    // first branch matches (S has the direct fan-in link): $foo = S's
    // guid, $bar stays null — (($foo $bar)) = ((S null))
    assert(rows.head.getLong(0) == S && rows.head.isNullAt(1), s"got ${rows.head}")
  }

  test("countlimit stops counting past the allowance") {
    val n = ReadPlanner.plan(fx, "read (countlimit=2 result=count)")
      .head().getLong(0)
    assert(n == 3L) // countlimit+1 signals TOOMANY overflow
  }

  test("estimate-count returns optimizer statistics without execution") {
    val est = ReadPlanner.plan(fx, "read (result=estimate-count)")
      .head().getLong(0)
    assert(est > 0L)
  }
}
