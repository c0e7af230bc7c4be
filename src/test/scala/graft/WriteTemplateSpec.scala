package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Primitive.node
import graft.plan.{ReadPlanner, SExpr}
import graft.store.GraphStore
import graft.write.Writer

/** write-template round trip: GQL write → store → GQL read, plus
  * s-expression golden rendering (the reference's session shape:
  * write a subgraph, read it back, diff the output).
  */
class WriteTemplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("write template creates a linked subgraph, readable back") {
    val st0 = GraphStore.fromSeq(spark, Seq(node(1, name = Some("height"))))
    // the Arnold session: a person with a height property
    val (st1, ids) = Writer.write(st0,
      """write (value="Arnold Schwarzenegger"
        |  (<-left type="height" value="1.88" datatype=float))""".stripMargin)
    assert(ids.length == 2)
    val rows = ReadPlanner.plan(st1,
      """read (value~="arnold" result=((value contents))
        |  (<-left type="height" result=((value))))""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getString(0)) == Seq("1.88"))
  }

  test("parent-points-to-child linkage wires right-> through the template") {
    val st0 = GraphStore.fromSeq(spark, Seq(node(1, name = Some("member_of"))))
    val (st1, ids) = Writer.write(st0,
      """write (value="band" right->(value="musician"))""")
    assert(ids.length == 2)
    val band = st1.current.filter(col("value") === "band").head()
    val musician = st1.current.filter(col("value") === "musician").head()
    assert(band.getAs[Long]("right") == musician.getAs[Long]("id"))
  }

  test("write template creates missing type nodes implicitly") {
    // the reference mints type primitives on first use (version1.sh)
    val st0 = GraphStore.fromSeq(spark, Seq(node(1)))
    val (st1, _) = Writer.write(st0, """write (value="x" (<-left type="fresh_type"))""")
    val typeNode = st1.current
      .filter(col("name") === "fresh_type" && col("left").isNull).collect()
    assert(typeNode.length == 1)
    // the link's typeguid points at the minted node
    val lnk = st1.current.filter(col("left").isNotNull).head()
    assert(lnk.getAs[Long]("typeguid") == typeNode.head.getAs[Long]("id"))
    // and a read through the type name finds it
    val n = ReadPlanner.plan(st1,
      """read (value="x" result=count (<-left type="fresh_type"))""")
      .head().getLong(0)
    assert(n == 1L)
  }

  test("version1 session: bare-string type sugar and guid~= versioning") {
    val st0 = GraphStore.fromSeq(spark, Seq(node(1, name = Some("seed"))))
    val (st1, ids1) = Writer.write(st0,
      """write ("Hello, World!" name="x" value="1234")""")
    val root = ids1.head
    // guid~=root versions the head; repeated twice walks the lineage
    val (st2, ids2) = Writer.write(st1,
      s"""write (guid~=$root "Hello, Moon!" name="x")""")
    val (st3, _) = Writer.write(st2,
      s"""write (guid~=$root "Hello, Venus!" name="x")""")
    // current read shows only the newest version
    val cur = ReadPlanner.plan(st3, """read (name="x" result=((guid)))""")
      .collect().map(_.getLong(0)).toSeq
    assert(cur.length == 1 && cur.head != root && cur.head != ids2.head)
    // all three versions share the lineage
    val all = ReadPlanner.plan(st3,
      s"""read (guid~=$root newest>=0 result=count)""").head().getLong(0)
    assert(all == 3L)
    // newest=1 is the middle version
    val mid = ReadPlanner.plan(st3,
      """read (newest=1 name="x" result=((guid)))""")
      .collect().map(_.getLong(0)).toSeq
    assert(mid == Seq(ids2.head))
  }

  test("previous session: prev pointers across generations") {
    // test/unit/previous.sh: version a primitive three times via
    // guid~=, then read `previous` at each generation selector
    val st0 = GraphStore.fromSeq(spark, Nil)
    val (st1, ids1) = Writer.write(st0,
      """write (name="Hello, World!" value="1234")""")
    val g0 = ids1.head
    def prevNewest(st: GraphStore): Option[Long] = {
      val r = ReadPlanner.plan(st,
        s"""read (guid~=$g0 result=((previous)))""").head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    assert(prevNewest(st1).isEmpty)
    val (st2, ids2) = Writer.write(st1, s"""write (guid~=$g0 name="Hello, Moon!")""")
    assert(prevNewest(st2).contains(g0))
    val (st3, ids3) = Writer.write(st2, s"""write (guid~=$g0 name="Hello, Venus!")""")
    assert(prevNewest(st3).contains(ids2.head))
    val (st4, _) = Writer.write(st3, s"""write (guid~=$g0 name="Hello, Mars!")""")
    assert(prevNewest(st4).contains(ids3.head))

    def onePrev(q: String): Option[Long] = {
      val r = ReadPlanner.plan(st4, q).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    // oldest=0: the original — no previous
    assert(onePrev("read (oldest=0 newest>=0 result=((previous)))").isEmpty)
    // oldest=1: second generation points at the original
    assert(onePrev("read (oldest=1 newest>=0 result=((previous)))").contains(g0))
    // newest=1: one before the head
    assert(onePrev("read (newest=1 result=((previous)))").contains(ids2.head))
    // newest=0 (default head)
    assert(onePrev("read (newest=0 result=((previous)))").contains(ids3.head))
    // final shape: (name previous)
    val last = ReadPlanner.plan(st4,
      s"""read (guid~=$g0 result=((name previous)))""").head()
    assert(last.getString(0) == "Hello, Mars!" && last.getLong(1) == ids3.head)
  }

  test("timesort session: timestamp sorts and cross-level -\\$ts") {
    // test/unit/timesort.sh: four head->tail writes, tails sorted by
    // timestamp both directions, heads sorted by the tail's timestamp
    var st = GraphStore.fromSeq(spark, Nil)
    (1 to 4).foreach { i =>
      st = Writer.write(st, s"""write ("head" (-> ("tail" value="$i")))""")._1
    }
    val desc = ReadPlanner.plan(st,
      """read ("tail" sort=-timestamp result=((value timestamp)))""")
      .collect()
    assert(desc.map(_.getString(0)).toSeq == Seq("4", "3", "2", "1"))
    val ts = desc.map(_.getLong(1)).toSeq
    assert(ts == ts.sorted.reverse && ts.distinct.length == 4,
      s"timestamps must be unique monotone: $ts")
    val asc = ReadPlanner.plan(st,
      """read ("tail" sort=timestamp result=((value)))""")
      .collect().map(_.getString(0)).toSeq
    assert(asc == Seq("1", "2", "3", "4"))
    // cross-level: heads ordered by their tail's timestamp, descending
    val heads = ReadPlanner.plan(st,
      """read ("head" sort=-$ts result=(($ts)) (-> ("tail" $ts=timestamp)))""")
      .collect().map(_.getLong(0)).toSeq
    assert(heads == ts)
  }

  test("asof session: dateline/odometer/timestamp horizons and OUTDATED") {
    // test/unit/asof.sh: four writes at timestamps .0000-.0003, asof
    // reads in each form, then tombstone + version + pessimistic error
    var st = GraphStore.fromSeq(spark, Nil)
    val names = Seq("john", "paul", "ringo", "george")
    val ids = names.zipWithIndex.map { case (nm, i) =>
      val (st2, got) = Writer.append(st,
        Seq(Writer.Spec(name = Some(nm))), timestamp = Some(i * 100L))
      st = st2; got.head
    }
    def guids(q: String): Seq[Long] =
      ReadPlanner.plan(st, q).collect().map(_.getLong(0)).toSeq.sorted
    val g1hex = graft.model.Guid.render(ids(1))
    // guid form is EXCLUSIVE: state before id(1) existed = only id(0)
    assert(guids(s"""read (asof=$g1hex any result=((guid)))""") == Seq(ids(0)))
    // odometer db.count form, same exclusivity
    assert(guids(s"""read (asof="123456.2" any result=((guid)))""") ==
      Seq(ids(0), ids(1)))
    // timestamp form: written at or before the instant
    assert(guids("""read (asof=1970-01-01T00:00:00.0000 any result=((guid)))""") ==
      Seq(ids(0)))
    assert(guids("""read (asof=1970-01-01T00:00:00.0002 any result=((guid)))""") ==
      Seq(ids(0), ids(1), ids(2)))
    assert(guids("""read (asof=1970-01-01T01:01:01.0004 any result=((guid)))""") ==
      ids)

    // tombstone john (pessimistic guid= on the head: allowed)
    st = Writer.write(st, s"""write (guid=${ids(0)} live=false)""")._1
    // version ringo opportunistically
    val (st5, realRingo) = Writer.write(st,
      s"""write (guid~=${ids(2)} name="the real ringo")""")
    st = st5
    // pessimistic write against the versioned id must fail OUTDATED
    val err = intercept[Writer.WriteError] {
      Writer.write(st, s"""write (guid=${ids(2)} name="ringo")""")
    }
    assert(err.code == "OUTDATED")
    // snapshot before the tombstone/version still shows the four
    val g4hex = graft.model.Guid.render(ids(3) + 1)
    val snap = ReadPlanner.plan(st,
      s"""read (asof=$g4hex any result=((guid name)))""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(snap == ids.zip(names).toMap)
    // the present: john tombstoned, ringo replaced
    val cur = ReadPlanner.plan(st, """read (any result=((name)))""")
      .collect().map(_.getString(0)).toSet
    assert(cur == Set("paul", "george", "the real ringo"))
  }

  test("s-expression rendering matches the golden shape") {
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, name = Some("b"), value = Some("2")),
      node(2, name = Some("a"), value = Some("1"))))
    val df = ReadPlanner.plan(st, "read (node sort=(value) result=((name value)))")
    assert(SExpr.ok(df) == """ok (("a" "1") ("b" "2"))""")
    // guid rendering in wire form
    val df2 = ReadPlanner.plan(st, "read (node sort=(value) result=((guid)))")
    val out = SExpr.ok(df2, guidCols = Set(0))
    assert(out == s"ok ((${graft.model.Guid.render(2)}) (${graft.model.Guid.render(1)}))")
  }

  test("word-index candidate pruning returns the same matches") {
    val prims = (1 to 50).map(i =>
      node(i.toLong, value = Some(if (i % 7 == 0) s"seven mark $i" else s"plain row $i")))
    val noIdx = GraphStore.fromSeq(spark, prims)
    val withIdx = noIdx.copy(useWordIndex = true)
    val q = """read (value~="seven" result=((guid)))"""
    val a = ReadPlanner.plan(noIdx, q).collect().map(_.getLong(0)).toSet
    val b = ReadPlanner.plan(withIdx, q).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }
}
