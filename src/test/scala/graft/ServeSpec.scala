package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Primitive.{link, node}
import graft.plan.ReadPlanner
import graft.serve.PointServer
import graft.store.GraphStore

/** Serving-tier equivalence gate: every query PointServer claims to
  * serve must answer EXACTLY like the Catalyst plan (same rows, same
  * order when sorted). The snapshot and the plan share comparator /
  * match code, but candidate generation, bounds probes, and projection
  * are independent implementations — this spec is what makes the fast
  * path safe to put in front of the engine.
  */
class ServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // people/books/authorship: the reference's benchmark query class
  // ("all people who are authors whose names contain 'herman'")
  lazy val store: GraphStore = {
    val prims =
      Seq(node(1, name = Some("person")), node(2, name = Some("book")),
        node(3, name = Some("wrote"))) ++
        Seq("Herman Melville", "Herman Hesse", "Toni Morrison",
          "Ursula K. Le Guin", "James Baldwin", "herman miller").zipWithIndex
          .map { case (nm, i) => node(10 + i, typeguid = Some(1L), value = Some(nm)) } ++
        Seq("Moby-Dick", "Steppenwolf", "Beloved", "The Dispossessed")
          .zipWithIndex
          .map { case (t, i) => node(20 + i, typeguid = Some(2L), value = Some(t)) } ++
        Seq( // authorship links: left=author right=book
          link(30, 10, Some(20), typeguid = Some(3L)),
          link(31, 11, Some(21), typeguid = Some(3L)),
          link(32, 12, Some(22), typeguid = Some(3L)),
          link(33, 13, Some(23), typeguid = Some(3L)),
          // values with numbers/punctuation for comparator coverage
          link(34, 10, Some(21), typeguid = Some(3L), value = Some("co-wrote v2"))) ++
        Seq(node(40, value = Some("42.5")), node(41, value = Some("42.5000")),
          node(42, value = Some("x9")), node(43, value = Some("x10")),
          node(44, value = Some("2008-01-02")), node(45, value = Some("2007")),
          // fractional decimals whose word sets share nothing with the
          // normalized-equal query literal (".5" / "\n.5")
          node(46, value = Some("0.50")), node(47, value = Some(" .50")),
          // scope-linked primitives (PDB_LINKAGE_SCOPE coverage)
          node(51, value = Some("note-a")).copy(scope = Some(10L)),
          node(52, value = Some("note-b")).copy(scope = Some(10L)))
    GraphStore.fromSeq(spark, prims).copy(versioned = false)
  }
  lazy val ix: PointServer.Index = PointServer.build(store)

  /** both paths, compared as value matrices (order-sensitive when the
    * query sorts, multiset otherwise)
    */
  private def check(q: String, expectServable: Boolean = true): Unit =
    checkC(graft.gql.Parser.parseRead(q), q, expectServable)

  private def checkC(c: graft.gql.Constraint, q: String,
      expectServable: Boolean = true): Unit = {
    val served = PointServer.serve(ix, c)
    if (!expectServable) { assert(served.isEmpty, s"unexpectedly served: $q"); return }
    assert(served.isDefined, s"not served: $q")
    val sRows = served.get.rows.map(_.toSeq.map(norm))
    val df = ReadPlanner.plan(store, c)
    assert(served.get.columns == df.columns.toSeq, s"columns differ: $q")
    val dRows = df.collect().toSeq.map(_.toSeq.map(norm))
    if (c.sort.nonEmpty) assert(sRows == dRows, s"sorted rows differ: $q")
    else assert(sRows.groupBy(identity).view.mapValues(_.size).toMap ==
      dRows.groupBy(identity).view.mapValues(_.size).toMap, s"rows differ: $q")
  }

  private def norm(v: Any): Any = v match {
    case b: Byte => b.toLong
    case i: Int => i.toLong
    case other => other
  }

  test("value word match with type filter") {
    check("""read (type="person" value~="herman" result=((guid value)))""")
  }

  test("prefix match") {
    check("""read (type="person" value~="her*" result=((guid value)))""")
  }

  test("anchored and multi-word match") {
    check("""read (type="person" value~="^herman" result=((guid value)))""")
    check("""read (value~="herman melville" result=((guid value)))""")
  }

  test("existence child: authors (people who wrote something)") {
    check("""read (type="person" result=((guid value)) (<-left typeguid=3))""")
  }

  test("absence child: people who wrote nothing") {
    check("""read (type="person" result=((guid value)) (<-left typeguid=3 count=0))""")
  }

  test("two-hop: authors of a book matching 'moby'") {
    check("""read (type="person" result=((guid value))
      (<-left typeguid=3 right->(value~="moby")))""")
  }

  test("existence + word match combined (baseline simple-query class)") {
    check("""read (type="person" value~="herman" result=((guid value))
      (<-left typeguid=3))""")
  }

  test("value equality is comparator-normalized") {
    check("""read (any value="42.5" result=((guid value)))""")
    check("""read (any value="42.5000" result=((guid value)))""")
  }

  test("ranges under comparators") {
    check("""read (any value-comparator="number" value>"42" value<"43" result=((value)))""")
    check("""read (any value>="x10" result=((value)) sort=(value))""")
  }

  test("sorted page with start/pagesize") {
    check("""read (type="person" sort=(value) pagesize=3 result=((guid value)))""")
    check("""read (type="person" sort=(-value) start=1 pagesize=2 result=((guid value)))""")
  }

  test("and-cursor leapfrog equals the eager sorted intersection") {
    // the pull-based intersect behind unsorted paged reads must yield
    // EXACTLY the eager intersection, in ascending order, for any
    // producer mix (empty lists, single producer, skewed sizes)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(4)
      val producers = Array.fill(n) {
        val size = rnd.nextInt(60)
        val max = 1 + rnd.nextInt(120)
        Array.fill(size)(rnd.nextInt(max)).distinct.sorted
      }
      val expect = producers.map(_.toSet).reduce(_ intersect _).toSeq.sorted
      val cur = new PointServer.AndCursor(producers)
      val got = Iterator.continually(cur.next()).takeWhile(_ >= 0).toList
      assert(got == expect,
        producers.map(_.mkString("[", ",", "]")).mkString(" "))
    }
  }

  test("unsorted page early-termination returns the eager prefix; counts stay full") {
    // the paged accept loop stops at start+pagesize accepted rows — the
    // result must be exactly the eager (filter-everything) prefix, and
    // a count result must NOT be clipped by a page bound
    def serve(q: String) =
      PointServer.serve(ix, graft.gql.Parser.parseRead(q)).get
    val all = serve("""read (type="person" result=((guid value)))""")
    val paged = serve("""read (type="person" pagesize=2 result=((guid value)))""")
    assert(paged.rows.map(_.toSeq) == all.rows.take(2).map(_.toSeq))
    val started =
      serve("""read (type="person" start=1 pagesize=2 result=((guid value)))""")
    assert(started.rows.map(_.toSeq) == all.rows.slice(1, 3).map(_.toSeq))
    val counted = serve("""read (type="person" pagesize=2 result=count)""")
    assert(counted.rows.head(0) == all.rows.length.toLong)
  }

  test("count result") {
    check("""read (type="person" result=count)""")
    check("""read (typeguid=3 result=count)""")
  }

  test("guid point lookup") {
    check("""read (guid=10 result=((guid value type)))""")
  }

  test("linkage endpoint candidates") {
    check("""read (left=10 result=((guid right value)))""")
    check("""read (right=21 result=((guid left)))""")
  }

  test("meta and datatype filters") {
    check("""read (node value~="herman" result=((guid value meta)))""")
  }

  test("pick and literal patterns") {
    check("""read (guid=10 result=((guid literal="x" name)))""")
  }

  test("unsupported shapes fall back to Spark") {
    check("""read (type="person" result=((guid contents)) (<-left))""",
      expectServable = false)
    check("""read (any newest>=1 result=((guid)))""", expectServable = false)
    check("""read (any live=dontcare result=((guid)))""", expectServable = false)
    check("""read (value="a" || value="b")""", expectServable = false)
  }

  test("timestamp range") {
    check("""read (any timestamp>1970-01-01T00:00:00.0000Z result=count)""")
  }

  test("scope postings: candidates and scope-linked child") {
    check("""read (scope=10 result=((guid value)))""")
    check("""read (type="person" result=((guid value)) (<-scope))""")
    check("""read (type="person" result=((guid value)) (<-scope count=0))""")
  }

  test("mixed null+id endpoint pred is not used as a producer") {
    // matches every node (null left) plus links with left=10; a
    // postings-only producer would drop all the null-left rows
    check("""read (left=(null 10) result=((guid value)))""")
    check("""read (right=(null 21) result=((guid value)))""")
  }

  test("fractional-decimal equality bypasses the word-index producer") {
    // sortKey(".5") == sortKey("0.50") == sortKey(" .50") under the
    // default comparator, but words(".5")=["5"] shares nothing with
    // words("0.50")=["0","50"] — an unguarded eq-producer returns 0 rows
    check("""read (any value=".5" result=((guid value)))""")
    // newline before the fractional digit: a non-DOTALL `.*\.\d.*`
    // guard misses this form and the producer drops comparator-equal rows
    val c = graft.gql.Parser.parseRead("""read (any value="x" result=((guid value)))""")
    checkC(c.copy(value = Seq(graft.gql.StrPred(graft.gql.OpEq, Seq(Some("\n.5"))))),
      """read (any value="\n.5" ...)""")
  }

  test("descending sorts keep nulls LAST, like the Spark path") {
    // nodes 1-3 and links carry null values; under sort=(-value) the
    // old negated comparator floated them to the front of the page
    check("""read (any sort=(-value) pagesize=4 result=((guid value)))""")
    check("""read (any sort=(-value) result=((guid value)))""")
  }

  test("number-comparator sorts drop null/non-decoding keys from the set") {
    // "x9"/"x10"/names don't decode as numbers; the planner filters
    // them from the sorted set and the snapshot must match
    check("""read (any sort=(value) comparator="number" result=((guid value)))""")
    check("""read (any sort=(-value) comparator="number" pagesize=3 result=((guid value)))""")
  }

  test("a null alternative in ~= admits null-valued rows") {
    // value~=null matches the unvalued nodes; the word-index producer
    // must stand down (no posting contains a null-valued row)
    val base = graft.gql.Parser.parseRead("""read (any result=((guid value)))""")
    checkC(base.copy(value = Seq(graft.gql.StrPred(graft.gql.OpMatch,
      Seq(None)))), "read (any value~=null ...)")
    checkC(base.copy(value = Seq(graft.gql.StrPred(graft.gql.OpMatch,
      Seq(None, Some("herman"))))), "read (any value~=(null \"herman\") ...)")
  }

  test("dateline horizons and version-chain result fields fall back") {
    check("""read (any dateline>"12" result=((guid)))""",
      expectServable = false)
    check("""read (any result=((guid archival)))""", expectServable = false)
    check("""read (any result=((guid previous)))""", expectServable = false)
  }
}
