package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Primitive.node
import graft.plan.ReadPlanner
import graft.store.GraphStore
import graft.write.Writer

/** Golden-vector sessions transcribed from the reference's unit tests
  * (expected BEHAVIOR from the .out.exp files — set membership and
  * upsert outcomes; unsorted production order is not asserted, it is
  * an iterator artifact in the reference).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** test/unit/compare.sh — default-comparator ranges and equality */
  lazy val compareFixture = GraphStore.fromSeq(spark,
    Seq("5", "50", "500", "5/blue", "50/blue", "green/5", "green/50",
      "6", "60", "42.5", "42.5000", "42.500000000000001", "4.251")
      .zipWithIndex.map { case (v, i) => node(i + 1L, value = Some(v)) })

  private def values(q: String): Set[String] =
    ReadPlanner.plan(compareFixture, q).collect().map(_.getString(0)).toSet

  test("compare: value<\"6\"") {
    assert(values("""read (any value<"6" result=((value)))""") ==
      Set("4.251", "5", "5/blue"))
  }

  test("compare: value<\"50\" and value<=\"50\"") {
    assert(values("""read (any value<"50" result=((value)))""") ==
      Set("4.251", "42.5", "42.5000", "42.500000000000001", "5", "5/blue", "6"))
    assert(values("""read (any value<="50" result=((value)))""") ==
      Set("4.251", "42.5", "42.5000", "42.500000000000001", "5", "50", "5/blue", "6"))
  }

  test("compare: value<\"green/50\" boundary") {
    assert(values("""read (any value<"green/50" result=((value)))""") ==
      Set("4.251", "42.5", "42.5000", "42.500000000000001", "5", "50",
        "5/blue", "500", "50/blue", "6", "60", "green/5"))
  }

  test("compare: value>=\"50\" and value>\"50\"") {
    assert(values("""read (any value>="50" result=((value)))""") ==
      Set("50", "500", "50/blue", "60", "green/5", "green/50"))
    assert(values("""read (any value>"50" result=((value)))""") ==
      Set("500", "50/blue", "60", "green/5", "green/50"))
  }

  test("compare: decimal equality normalizes trailing zeros") {
    assert(values("""read (any value>="42.5" value<="42.5" result=((value)))""") ==
      Set("42.5", "42.5000"))
    assert(values("""read (any value="42.5" result=((value)))""") ==
      Set("42.5", "42.5000"))
    assert(values("""read (any value="42.5000" result=((value)))""") ==
      Set("42.5", "42.5000"))
    // octet comparator (locale-prefixed name): exact bytes only
    assert(values("""read (any value="42.5" comparator="i;octet" result=((value)))""") ==
      Set("42.5"))
  }

  /** test/unit/spacematch.sh — whitespace normalization */
  test("spacematch: equality collapses spaces; key= upserts are no-ops") {
    val st0 = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("AB")),
      node(2, value = Some("A B")),
      node(3, value = Some("A  B"))))
    val got = ReadPlanner.plan(st0, """read (value="A B" result=((guid value)))""")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L)) // "AB" does not match

    val (st1, id1, s1) = Writer.writeKeyed(st0,
      Writer.Spec(value = Some("A B")), Seq("value"))
    assert(s1 == "unchanged")
    val (_, id2, s2) = Writer.writeKeyed(st1,
      Writer.Spec(value = Some("A   B")), Seq("value"))
    assert(s2 == "unchanged" && id2 == id1)
  }

  /** test/unit/numbermatch.sh — ~= with wildcards and leading zeros */
  test("numbermatch: ~= normalizes numbers and spans wildcards") {
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("1 2 3")),
      node(2, value = Some("04 005 0006"))))
    def m(pat: String): Set[String] =
      ReadPlanner.plan(st, s"""read (value~="$pat" result=((value)))""")
        .collect().map(_.getString(0)).toSet
    assert(m("1 * 3") == Set("1 2 3"))
    assert(m("01 * 03") == Set("1 2 3"))
    assert(m("001 * 003") == Set("1 2 3"))
    assert(m("4 * 6") == Set("04 005 0006"))
    assert(m("04 * 06") == Set("04 005 0006"))
    assert(m("004 * 006") == Set("04 005 0006"))
  }

  /** test/unit/or.sh — single-pipe disjunction and EMPTY responses */
  test("or session: value lists, pipe disjunction, EMPTY error") {
    val empty = GraphStore.fromSeq(spark, Seq(node(1, name = Some("seed"))))
    // no matches → protocol error, not an empty list
    val r0 = ReadPlanner.plan(empty,
      """read (value=("foo" "bar") result=((value)))""")
    assert(graft.plan.SExpr.response(r0) == """error EMPTY "not found"""")

    val st = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("foo")), node(2, value = Some("bar")),
      node(3, value = Some("baz"))))
    def vals(q: String): Set[String] =
      ReadPlanner.plan(st, q).collect().map(_.getString(0)).toSet
    assert(vals("""read (value=("foo" "bar") result=((value)))""") ==
      Set("foo", "bar"))
    assert(vals("""read (value="foo"|value="bar" result=((value)))""") ==
      Set("foo", "bar"))
  }

  /** test/unit/keyburn.sh — keyed subconstraint under an unkeyed
    * parent: re-writing must not grow the database (pointed reuse).
    */
  test("keyburn: keyed child + unkeyed parent burns no ids on rewrite") {
    val st0 = GraphStore.fromSeq(spark, Seq(
      node(1, name = Some("data_source_t")),
      node(2, value = Some("registry"))))
    val q = """write (node (-> type="data_source_t" value="data-source"
              |  key=(typeguid value right) right=2))""".stripMargin
    val (st1, ids1) = Writer.write(st0, q)
    assert(ids1.length == 2)
    val n1 = st1.all.count()
    // parent node + link created
    val link = st1.current.filter(col("value") === "data-source").head()
    assert(link.getAs[Long]("right") == 2L)
    assert(link.getAs[Long]("left") == ids1.head)

    // identical rewrite: everything reused, nothing written
    val (st2, ids2) = Writer.write(st1, q)
    assert(ids2 == ids1)
    assert(st2.all.count() == n1)

    // changed value under the same key → version-the-diff, parent kept
    val q2 = q.replace("data-source\"", "data-source\" name=\"renamed\"")
    val (st3, ids3) = Writer.write(st2, q2)
    assert(ids3.head == ids1.head) // parent still reused
    assert(ids3(1) != ids1(1))     // link versioned
    val cur = st3.current.filter(col("value") === "data-source").collect()
    assert(cur.length == 1 && cur.head.getAs[String]("name") == "renamed")
  }

  /** test/unit/unique cluster shape (FIXTURES.md namespace fixture) */
  test("unique cluster: second member with same (value,right) errors EXISTS") {
    val st0 = GraphStore.fromSeq(spark, Seq(node(1, value = Some("ns-head"))))
    val q = """write (value="member" (-> value="alice" unique=(value right) right=1))"""
    val (st1, _) = Writer.write(st0, q)
    val e = intercept[Writer.WriteError](Writer.write(st1, q))
    assert(e.code == "EXISTS")
    // a different name under the same namespace is fine
    val q2 = q.replace("alice", "bob")
    val (st2, _) = Writer.write(st1, q2)
    assert(st2.current.filter(col("value") === "bob").count() == 1)
  }

  /** anchor in a template: subtree must match exactly one existing
    * primitive and both its id AND its endpoint are reused as-is.
    */
  test("anchor child resolves the existing link and its endpoint") {
    val st0 = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("hub"))))
    val (st1, ids1) = Writer.write(st0,
      """write (value="spoke" (-> right=1 value="tag"))""")
    val n1 = st1.all.count()
    // anchoring the same subtree reuses the link AND its left endpoint
    // (pointed reuse) — nothing is written at all
    val (st2, ids2) = Writer.write(st1,
      """write ((-> anchor right=1 value="tag"))""")
    assert(ids2 == ids1)
    assert(st2.all.count() == n1)
    // anchoring a non-existent subtree errors EMPTY (anchor.sh)
    val e = intercept[Writer.WriteError](Writer.write(st2,
      """write ((-> anchor right=1 value="no-such-tag"))"""))
    assert(e.code == "EMPTY")
  }

  /** test/unit/guid.sh — guid lists and multi-lineage guid~= */
  test("guid session: id lists and lineage resolution") {
    val st0 = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("wallaby")), node(2, value = Some("kangaroo")),
      node(3, value = Some("iguana")), node(4, value = Some("banana"))))
    // version banana → pineapple via the query language
    val (st1, _) = Writer.write(st0, """write (guid~=4 value="pineapple")""")

    val lst = ReadPlanner.plan(st1, """read (guid=(1 2) result=((value)))""")
      .collect().map(_.getString(0)).toSet
    assert(lst == Set("wallaby", "kangaroo"))

    // guid~= over a list: newest of each lineage
    val lin = ReadPlanner.plan(st1, """read (guid~=(1 4) result=((value)))""")
      .collect().map(_.getString(0)).toSet
    assert(lin == Set("wallaby", "pineapple"))

    // exclusion list
    val excl = ReadPlanner.plan(st1, """read (guid!=(1 2) node result=((value)))""")
      .collect().map(_.getString(0)).toSet
    assert(excl == Set("iguana", "pineapple"))
  }

  /** test/unit/cursor1.sh — cursor in the result pattern: page, resume
    * via cursor=, empty "null:" cursor on the final page, EMPTY past it.
    */
  test("cursor session: result cursor pages and resumes through GQL") {
    val st = GraphStore.fromSeq(spark,
      (1 to 26).map(i => node(i.toLong, value = Some(i.toString))))
    val p1 = ReadPlanner.plan(st,
      """read (result=(cursor (value)) pagesize=1)""").collect()
    assert(p1.length == 1 && p1.head.getString(0) == "1")
    val tok1 = p1.head.getString(1)
    assert(tok1 != "null:")

    val p2 = ReadPlanner.plan(st,
      s"""read (result=(cursor (value)) cursor="$tok1" pagesize=1)""").collect()
    assert(p2.head.getString(0) == "2")

    // jump near the end: a short page carries the empty cursor
    var tok = Option(tok1)
    var last = "1"
    var guard = 0
    while (tok.isDefined && tok.get != "null:" && guard < 30) {
      val p = ReadPlanner.plan(st,
        s"""read (result=(cursor (value)) cursor="${tok.get}" pagesize=24)""").collect()
      last = p.last.getString(0)
      tok = Option(p.head.getString(1))
      guard += 1
    }
    assert(last == "26" && tok.contains("null:"))

    // reading past the end: EMPTY
    val beyond = ReadPlanner.plan(st,
      s"""read (result=(cursor (value)) cursor="${graft.plan.Cursor.encode(
        graft.plan.Cursor.Token(26L, Long.MaxValue))}" pagesize=24)""")
    assert(graft.plan.SExpr.response(beyond) == """error EMPTY "not found"""")
  }

  /** test/unit/optional.sh — link children with nested endpoint nodes,
    * variables bubbling two levels, optional combinations.
    */
  test("optional session: nested link-endpoint children and variables") {
    var st = GraphStore.fromSeq(spark, Seq(node(1, name = Some("seed"))))
    st = Writer.write(st,
      """write ("A" value="B C" (<- ("B" value="b1")) (<- ("C" value="c1")))""")._1
    st = Writer.write(st, """write ("A" value="B" (<- ("B" value="b2")))""")._1
    st = Writer.write(st, """write ("A" value="C" (<- ("C" value="c3")))""")._1
    st = Writer.write(st, """write ("A" value="nil")""")._1

    def rows(q: String): Set[Seq[String]] =
      ReadPlanner.plan(st, q).collect()
        .map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) null else r.getString(i)).toSeq).toSet

    assert(rows("""read ("A" result=((value $b)) (<- ("B" $b=value)))""") ==
      Set(Seq("B C", "b1"), Seq("B", "b2")))

    assert(rows("""read ("A" result=((value $b $c))
                  |  (<- ("B" $b=value)) (<- optional ("C" $c=value)))""".stripMargin) ==
      Set(Seq("B C", "b1", "c1"), Seq("B", "b2", null)))

    assert(rows("""read ("A" result=((value $c)) (<- ("C" $c=value)))""") ==
      Set(Seq("B C", "c1"), Seq("C", "c3")))

    assert(rows("""read ("A" result=((value)))""") ==
      Set(Seq("B C"), Seq("B"), Seq("C"), Seq("nil")))

    assert(rows("""read ("A" result=((value $c $b))
                  |  (<- optional ("C" $c=value))
                  |  (<- optional ("B" $b=value)))""".stripMargin) ==
      Set(Seq("B C", "c1", "b1"), Seq("B", null, "b2"),
        Seq("C", "c3", null), Seq("nil", null, null)))
  }

  /** test/unit/nodenode.sh — four-level reply chain written as one
    * template, read back with deep nested constraints.
    */
  test("nodenode session: deep reply chain writes and reads") {
    val st0 = GraphStore.fromSeq(spark, Seq(node(1, name = Some("seed"))))
    val (st, ids) = Writer.write(st0,
      """write ("article" value="a1"
        |  (<-"is-reply-to" ("article" value="a2"
        |    (<- "is-reply-to" ("article" value="a3"
        |      (<- "is-reply-to" ("article" value="a4")))))))""".stripMargin)
    // 7 primitives: 4 article nodes + 3 reply links (+ 2 type nodes)
    assert(ids.length == 7)

    // the full 3-hop pattern matches exactly once
    val deep = ReadPlanner.plan(st,
      """read ("article" value="a1" result=count
        |  (<-"is-reply-to" ("article" value="a2"
        |    (<- "is-reply-to" ("article" value="a3"
        |      (<- "is-reply-to" ("article" value="a4")))))))""".stripMargin)
      .head().getLong(0)
    assert(deep == 1L)

    // a broken innermost value kills the whole chain
    val broken = ReadPlanner.plan(st,
      """read ("article" value="a1" result=count
        |  (<-"is-reply-to" ("article" value="a2"
        |    (<- "is-reply-to" ("article" value="a3"
        |      (<- "is-reply-to" ("article" value="WRONG")))))))""".stripMargin)
      .head().getLong(0)
    assert(broken == 0L)

    // replies are walkable hop by hop: the replier is the link's LEFT
    val repliers = ReadPlanner.plan(st,
      """read ("article" result=((value))
        |  (<-left "is-reply-to" right->(value="a1")))""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(repliers == Seq("a2"))
  }

  /** test/unit/intrange.sh — numeric ranges under the default comparator */
  test("intrange session: numeric range selection") {
    val st = GraphStore.fromSeq(spark,
      Seq("1", "2", "88", "99", "100", "95", "101").zipWithIndex
        .map { case (v, i) => node(i + 1L, value = Some(v)) })
    def vals(q: String): Set[String] =
      ReadPlanner.plan(st, q).collect().map(_.getString(0)).toSet
    assert(vals("""read (value>="99" value<="100" result=((value)))""") ==
      Set("99", "100"))
    assert(vals("""read (value<="100" result=((value)))""") ==
      Set("1", "2", "88", "95", "99", "100"))
    assert(vals("""read (value>="99" result=((value)))""") ==
      Set("99", "100", "101"))
  }

  /** test/unit/stror.sh — ~= with a pattern list is an OR of matches */
  test("stror session: pattern-list match") {
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("one")), node(2, value = Some("two")),
      node(3, value = Some("one three")), node(4, value = Some("three two")),
      node(5, value = Some("three"))))
    val got = ReadPlanner.plan(st,
      """read (value~=("one two" "three") result=((guid value)))""")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 4L, 5L))
  }

  /** test/unit/varsort.sh — sorting the parent by a child variable */
  test("varsort session: cross-level variable sort") {
    var st = GraphStore.fromSeq(spark, Seq(node(1, name = Some("seed"))))
    st = Writer.write(st, """write (value="c" (<-left value="3"))""")._1
    st = Writer.write(st, """write (value="b" (<-left value="2"))""")._1
    st = Writer.write(st, """write (value="a" (<-left value="1"))""")._1
    val rows = ReadPlanner.plan(st,
      """read (sort=$sub result=(($sub value)) (<-left $sub=value))""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("1", "a"), ("2", "b"), ("3", "c")))
  }

  /** test/unit/datetime.sh — datetime comparator: negative years,
    * time-only forms, specificity ordering, mixed-comparator sorts.
    */
  lazy val datetimeFixture = GraphStore.fromSeq(spark,
    Seq("2000-01-01", "-2000", "T12:44", "T17:55", "1999", "2038-05-10",
      "9999-01-01", "-9998-05-05", "1979-05-05", "2008", "1981-11-05",
      "-0100", "-0004-11-25", "-0574-10-01", "-0574-05-10", "-1234",
      "-8123", "2008-05-03", "2008-04-30", "2008-01-01")
      .zipWithIndex.map { case (v, i) => node(i + 1L, value = Some(v)) })

  private def dtSet(q: String): Set[String] =
    ReadPlanner.plan(datetimeFixture, q).collect().map(_.getString(0)).toSet
  private def dtSeq(q: String): Seq[String] =
    ReadPlanner.plan(datetimeFixture, q).collect().map(_.getString(0)).toSeq

  test("datetime session: ranges over mixed eras and specificities") {
    // r1: equality is per-specificity — "2008" does not match 2008-01-01
    assert(dtSet("""read (value-comparator="datetime" value="2008" result=((value)))""") ==
      Set("2008"))
    // r2: time-only forms sort after all dates
    assert(dtSet("""read (value-comparator="datetime" value>"9999" result=((value)))""") ==
      Set("9999-01-01", "T12:44", "T17:55"))
    // r3/r4: negative years, bigger magnitude earlier
    assert(dtSet("""read (value-comparator="datetime" value<"0000" result=((value)))""") ==
      Set("-9998-05-05", "-8123", "-2000", "-1234", "-0100",
        "-0004-11-25", "-0574-10-01", "-0574-05-10"))
    assert(dtSet("""read (value-comparator="datetime" value<"-5000" result=((value)))""") ==
      Set("-9998-05-05", "-8123"))
    // r5: nothing at or before -9999-05-05
    assert(dtSet("""read (value-comparator="datetime" value<="-9999-05-05" result=((value)))""").isEmpty)
    // r7: a bare year is before its own Jan 1
    assert(dtSet("""read (value-comparator="datetime" value>"2000" result=((value)))""") ==
      Set("2000-01-01", "2008", "2008-05-03", "2008-04-30", "2008-01-01",
        "2038-05-10", "9999-01-01", "T12:44", "T17:55"))
    // r9
    assert(dtSet("""read (value-comparator="datetime" value>"1981-11-06" value<"1999-01-01" result=((value)))""") ==
      Set("1999"))
    // r17-r19: time-only ranges
    assert(dtSet("""read (value-comparator="datetime" value>"T15" value<"T16" result=((value)))""").isEmpty)
    assert(dtSet("""read (value-comparator="datetime" value>"T12" value<"T13" result=((value)))""") ==
      Set("T12:44"))
  }

  test("datetime session: sorted pages across eras") {
    // r10/r11
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=3 sort=value result=((value)))""") ==
      Seq("-9998-05-05", "-8123", "-2000"))
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=3 sort=-value result=((value)))""") ==
      Seq("T17:55", "T12:44", "9999-01-01"))
    // r12: within a negative year, later month sorts earlier
    assert(dtSeq("""read (sort-comparator="datetime" value-comparator="datetime" value<"0000" result=((value)) sort=value)""") ==
      Seq("-9998-05-05", "-8123", "-2000", "-1234", "-0574-10-01",
        "-0574-05-10", "-0100", "-0004-11-25"))
    // r13: descending across both eras; 9999-01-01 > bare 9999 excluded
    assert(dtSeq("""read (sort-comparator="datetime" value-comparator="datetime" value<="9999" result=((value)) sort=-value)""") ==
      Seq("2038-05-10", "2008-05-03", "2008-04-30", "2008-01-01", "2008",
        "2000-01-01", "1999", "1981-11-05", "1979-05-05", "-0004-11-25",
        "-0100", "-0574-05-10", "-0574-10-01", "-1234", "-2000", "-8123",
        "-9998-05-05"))
    // r14/r15/r16
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=2 value-comparator="datetime" value>"-0574" result=((value)) sort=value)""") ==
      Seq("-0100", "-0004-11-25"))
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=2 value-comparator="datetime" value<"-0574" result=((value)) sort=-value)""") ==
      Seq("-0574-05-10", "-0574-10-01"))
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=1 value-comparator="datetime" value>"2008" result=((value)) sort=value)""") ==
      Seq("2008-01-01"))
    // r20-r22: DEFAULT value comparator range (signed numbers exclude
    // the negative-year strings), datetime sort order
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=1 value>"2008" sort=value result=((value)))""") ==
      Seq("2008-01-01"))
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=2 value>"2008" sort=value result=((value)))""") ==
      Seq("2008-01-01", "2008-04-30"))
    assert(dtSeq("""read (sort-comparator="datetime" pagesize=4 value>"2008" sort=value result=((value)))""") ==
      Seq("2008-01-01", "2008-04-30", "2008-05-03", "2038-05-10"))
  }

  /** test/unit/substring.sh — `~=` word/glob/punctuation semantics */
  lazy val substringFixture = GraphStore.fromSeq(spark, Seq(
    "abcdabcdef" -> "1", "fOO BaR baZ" -> "2", "fOOnitzbaZ" -> "3",
    "fOO/baZ" -> "4", "foobar" -> "5",
    "arbitrary ,-=(\")[]@~ punctuation " -> "6", "foot" -> "7",
    "pfoo" -> "8", "pfoot" -> "9", "yes: (-:*" -> "10", "no: (--:*" -> "11")
    .zipWithIndex.map { case ((v, nm), i) =>
      node(i + 1L, name = Some(nm), value = Some(v)) })

  /** `wire` is the exact byte form the reference server would receive
    * (the GQL lexer consumes one backslash level, like gdp-lexer)
    */
  private def subNames(wire: String): Set[String] =
    ReadPlanner.plan(substringFixture,
      s"""read (value ~= "$wire" result=((name)))""")
      .collect().map(_.getString(0)).toSet

  test("substring session: word match, anchors, globs, punctuation join") {
    assert(subNames("bAr") == Set("2"))
    // punctuation-joined pattern matches split AND joined value forms
    assert(subNames("foo-bar") == Set("2", "5"))
    assert(subNames("^bar") == Set())
    assert(subNames("^FOO") == Set("2", "4"))
    assert(subNames("bar") == Set("2"))
    assert(subNames("bar$") == Set())
    assert(subNames("baz$") == Set("2", "4"))
    assert(subNames("arbitrary punctuation") == Set("6"))
    assert(subNames("foo") == Set("2", "4"))
    assert(subNames("foo*") == Set("2", "3", "4", "5", "7"))
    assert(subNames("*foo") == Set("2", "4", "8"))
    assert(subNames("*foo*") == Set("2", "3", "4", "5", "7", "8", "9"))
    assert(subNames("foo * baz") == Set("2"))
    assert(subNames("foo*baz") == Set("3"))
    // single-backslash escapes are consumed by the lexer: the matcher
    // sees bare punctuation + glob, which elides to match-all
    // (substring.sh wire form `\(\-\:\*` via its unquoted heredoc)
    assert(subNames("\\(\\-\\:\\*") ==
      Set("1", "2", "3", "4", "5", "6", "7", "8", "9", "10", "11"))
    // doubled backslashes survive the lexer: escaped punctuation is a
    // LITERAL adjacency constraint (substring2.sh wire form
    // `\\(\\-\\:\\*` matches only the value containing "(-:*")
    assert(subNames("\\\\(\\\\-\\\\:\\\\*") == Set("10"))
  }

  /** test/unit/sortcursor.sh — resumable cursors over SORTED pages */
  test("sortcursor session: sorted pages resume through the token") {
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, name = Some("d"), value = Some("4")),
      node(2, name = Some("b"), value = Some("2")),
      node(3, name = Some("a"), value = Some("1")),
      node(4, name = Some("c"), value = Some("3"))))
    val q = """read (any pagesize=2 sort=(value name)
              |  result=(cursor (value)))""".stripMargin
    val p1 = ReadPlanner.plan(st, q).collect()
    assert(p1.map(_.getAs[String]("value")).toSeq == Seq("1", "2"))
    val tok = p1.head.getAs[String]("cursor")
    assert(tok != "null:")
    val p2 = ReadPlanner.plan(st,
      s"""read (any pagesize=2 sort=(value name)
         |  result=(cursor (value)) cursor="$tok")""".stripMargin).collect()
    assert(p2.map(_.getAs[String]("value")).toSeq == Seq("3", "4"))
    // final page is full but nothing trails it: the reference answers
    // the empty cursor (graphd-sort.c:1480; sortcursor.sh golden
    // `ok ("null:" ("3") ("4"))`)
    assert(p2.head.getAs[String]("cursor") == "null:")
  }

  /** test/unit/numberequal.sh — number comparator: zero forms,
    * scientific notation, non-number exclusion from ranges.
    * (The reference's whitespace-led bin quirks — " 0" excluded from
    * equality yet inside >= ranges — are bin-scan internals we do not
    * reproduce; those rows are left out of the fixture.)
    */
  lazy val numberEqFixture = GraphStore.fromSeq(spark,
    Seq(".", "0", ".0", "0.", "0.0", "0e10", ".e10", "0.e10", ".0e10",
      "1", ".1e1", "1.e0", "10e-1", "2.2", "2", "-.", "-0", "-.0", "-0.e2")
      .zipWithIndex.map { case (v, i) => node(i + 1L, value = Some(v)) })

  private def numSet(q: String): Set[String] =
    ReadPlanner.plan(numberEqFixture, q).collect().map(_.getString(0)).toSet

  test("numberequal session: zero forms, e-notation, junk exclusion") {
    // r4: every spelling of zero is number-equal (including -0 forms)
    assert(numSet("""read (value="0" result=((value)) comparator="number")""") ==
      Set("0", ".0", "0.", "0.0", "0e10", "0.e10", ".0e10", "-0", "-.0", "-0.e2"))
    // r10: e-notation spellings of one
    assert(numSet("""read (value="1" result=((value)) comparator="number")""") ==
      Set("1", ".1e1", "1.e0", "10e-1"))
    // r9: strictly above one
    assert(numSet("""read (value>"1" result=((value)) comparator="number")""") ==
      Set("2", "2.2"))
    // r5/r6: non-numbers ("." "-." ".e10") are OUTSIDE number ranges
    assert(numSet("""read (value<="0" result=((value)) comparator="number")""") ==
      Set("0", ".0", "0.", "0.0", "0e10", "0.e10", ".0e10", "-0", "-.0", "-0.e2"))
    assert(numSet("""read (value>="0" result=((value)) comparator="number")""") ==
      Set("0", ".0", "0.", "0.0", "0e10", "0.e10", ".0e10", "-0", "-.0", "-0.e2",
        "1", ".1e1", "1.e0", "10e-1", "2", "2.2"))
    // r17/r18
    assert(numSet("""read (value>"2" result=((value)) comparator="number")""") ==
      Set("2.2"))
    assert(numSet("""read (value>="2" result=((value)) comparator="number")""") ==
      Set("2", "2.2"))
  }

  /** test/unit/substring3.sh — escaped vs elided punctuation adjacency */
  test("substring3 session: escaped colon demands adjacency") {
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, name = Some("1"), value = Some("User: foo")),
      node(2, name = Some("2"), value = Some("User:foo")),
      node(3, name = Some("3"), value = Some("not User: foo")),
      node(4, name = Some("4"), value = Some("User : foo"))))
    def q(wire: String): Set[String] =
      ReadPlanner.plan(st, s"""read (value ~= "$wire" result=((name)))""")
        .collect().map(_.getString(0)).toSet
    // unescaped colon is an elided separator: space before it is fine
    assert(q("^User:") == Set("1", "2", "4"))
    // \\: survives the lexer as \: — the colon must sit RIGHT after
    // the word, so "User : foo" drops out
    assert(q("^User\\\\:*") == Set("1", "2"))
  }
}
