package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Datatype, Primitive}
import graft.plan.{Cursor, ReadPlanner}
import graft.store.{DumpRestore, GraphStore}
import graft.write.Writer
import graft.write.Writer.{Spec, WriteError}

/** Write path (unique/key/anchor upserts, versioning, tombstones),
  * dump/restore round-trip, and cursor pagination — mirroring the
  * reference's unique/keyburn/anchor/dump/cursor test families.
  */
class WriteSpec extends AnyFunSuite {
  import Primitive.node

  lazy val spark = TestSpark.spark

  def freshStore: GraphStore = GraphStore.fromSeq(spark, Seq(
    node(1, name = Some("color")),
    node(2, value = Some("red")),
    node(3, value = Some("blue"))))

  test("append mints dense ids and frames the batch") {
    val (st, ids) = Writer.append(freshStore, Seq(
      Spec(value = Some("green")), Spec(value = Some("yellow"))))
    assert(ids == Seq(4L, 5L))
    val rows = st.primitives.filter(col("id") >= 4).orderBy("id").collect()
    assert(rows.head.getAs[Boolean]("txstart")) // first of txn
    assert(!rows.last.getAs[Boolean]("txstart"))
    assert(st.current.count() == 5)
  }

  test("versioning: pessimistic guid=G rejects stale heads") {
    val (st1, v2) = Writer.versionOf(freshStore, 2L, Spec(value = Some("crimson")))
    // current shows crimson, not red
    val cur = st1.current.filter(col("lineage") === 2L).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("value") == "crimson")
    // versioning the stale id 2 again must fail (OUTDATED)
    val e = intercept[WriteError](
      Writer.versionOf(st1, 2L, Spec(value = Some("pink"))))
    assert(e.code == "OUTDATED")
    // ...but opportunistic guid~=2 versions the current head
    val (st2, _) = Writer.versionOf(st1, 2L, Spec(value = Some("pink")),
      opportunistic = true)
    assert(st2.current.filter(col("lineage") === 2L)
      .head().getAs[String]("value") == "pink")
    assert(st2.all.filter(col("lineage") === 2L).count() == 3)
  }

  test("tombstone hides from reads, remains in history") {
    val (st, _) = Writer.tombstone(freshStore, 3L)
    assert(st.current.filter(col("lineage") === 3L).count() == 0)
    assert(st.all.filter(col("lineage") === 3L).count() == 2)
    // live=dontcare still sees the tombstone via the engine
    val n = ReadPlanner.plan(st, "read (live=false result=count)")
      .head().getLong(0)
    assert(n == 1L)
  }

  test("unique: second identical write errors EXISTS") {
    val spec = Spec(value = Some("red"), typeguid = Some(1L))
    val (st1, _) = Writer.writeUnique(freshStore, spec, Seq("value", "typeguid"))
    val e = intercept[WriteError](
      Writer.writeUnique(st1, spec, Seq("value", "typeguid")))
    assert(e.code == "EXISTS")
  }

  test("key: insert, no-op, version-the-diff (keyburn)") {
    val k = Seq("name", "typeguid")
    val (st1, id1, s1) = Writer.writeKeyed(freshStore,
      Spec(name = Some("size"), typeguid = Some(1L), value = Some("5")), k)
    assert(s1 == "inserted")
    val (st2, id2, s2) = Writer.writeKeyed(st1,
      Spec(name = Some("size"), typeguid = Some(1L), value = Some("5")), k)
    assert(s2 == "unchanged" && id2 == id1)
    val (st3, id3, s3) = Writer.writeKeyed(st2,
      Spec(name = Some("size"), typeguid = Some(1L), value = Some("6")), k)
    assert(s3 == "versioned" && id3 != id1)
    val cur = st3.current.filter(col("name") === "size").collect()
    assert(cur.length == 1 && cur.head.getAs[String]("value") == "6")
    // burn it again — still exactly one current row (keyburn invariant)
    val (st4, _, _) = Writer.writeKeyed(st3,
      Spec(name = Some("size"), typeguid = Some(1L), value = Some("7")), k)
    assert(st4.current.filter(col("name") === "size").count() == 1)
  }

  test("anchor: exactly-one matching semantics") {
    assert(Writer.anchor(freshStore, Spec(value = Some("red")), Seq("value")) == 2L)
    // zero and ambiguous matches both answer EMPTY, as the reference
    // does (test/unit/anchor.sh: id="toomany" gets error EMPTY)
    assert(intercept[WriteError](
      Writer.anchor(freshStore, Spec(value = Some("nope")), Seq("value")))
      .code == "EMPTY")
    val (st, _) = Writer.append(freshStore, Seq(Spec(value = Some("red"))))
    assert(intercept[WriteError](
      Writer.anchor(st, Spec(value = Some("red")), Seq("value")))
      .code == "EMPTY")
  }

  test("dump/restore round-trips exactly, including escapes") {
    val (st, _) = Writer.append(freshStore, Seq(
      Spec(value = Some("tab\tand%percent"), name = Some("tricky"))))
    val dumped = DumpRestore.dump(st)
    assert(dumped.count() == 4)
    val restored = DumpRestore.restoreStore(spark, dumped)
    val a = st.primitives.orderBy("id").collect().toSeq
    val b = restored.primitives.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("cursor pagination walks the full set exactly once") {
    val (st, _) = Writer.append(freshStore,
      (1 to 20).map(i => Spec(value = Some(s"v$i"))))
    var cursor: Option[String] = None
    var seen = Vector.empty[Long]
    var pages = 0
    var done = false
    while (!done && pages < 20) {
      val p = Cursor.page(st, cursor, 7)
      val ids = p.collect().map(_.getAs[Long]("id"))
      seen ++= ids
      cursor = Cursor.next(st, p, cursor, 7)
      pages += 1
      done = cursor.isEmpty
    }
    assert(seen == seen.sorted && seen.distinct == seen)
    assert(seen.length == 23) // 3 fixture + 20 appended
  }
}
