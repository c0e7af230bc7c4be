package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Primitive.node
import graft.plan.ReadPlanner
import graft.store.GraphStore
import graft.write.Writer

/** Persisted-store behavior: save/load round trip, id-range partition
  * layout, and partition pruning under asof horizons — the scale
  * mechanics behind time travel (istore partitions,
  * libaddb/addb-istore.h:22-24).
  */
class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("save/load round-trips and asof prunes partition directories") {
    // ids straddling two storage partitions (PartShift=20 → 1M each)
    val prims = Seq(
      node(1, value = Some("old-a")), node(2, value = Some("old-b")),
      node((1L << 20) + 5, value = Some("new-a")),
      node((1L << 20) + 6, value = Some("new-b")))
    val st = GraphStore.fromSeq(spark, prims)
    val dir = Files.createTempDirectory("graft_store").toString + "/prims"
    st.save(dir)

    // two partition directories on disk
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("id_part=")).map(_.getName).sorted
    assert(parts.toSeq == Seq("id_part=0", "id_part=1"))

    val loaded = GraphStore.load(spark, dir)
    assert(loaded.current.count() == 4)

    // asof below the partition boundary: only partition 0 survives
    val asof = loaded.asOf(100)
    assert(asof.current.collect().map(_.getAs[String]("value")).toSet ==
      Set("old-a", "old-b"))
    val physical = asof.primitives.queryExecution.executedPlan.toString
    assert(physical.contains("id_part") || physical.contains("PartitionFilters"),
      s"expected partition pruning in plan:\n$physical")

    // engine reads work against the loaded store
    val n = ReadPlanner.plan(loaded, "read (node result=count)").head().getLong(0)
    assert(n == 4L)

    // appends on a loaded store work despite the extra partition column
    val (st2, ids) = Writer.append(loaded, Seq(Writer.Spec(value = Some("x"))))
    assert(ids.head == (1L << 20) + 7)
    assert(st2.current.count() == 5)

    // asOf AFTER an append must keep the appended rows (their id_part
    // is null from the allowMissingColumns union — the prune predicate
    // has to be null-tolerant)
    val horizon = ids.head
    assert(st2.asOf(horizon).current.count() == 5)
    assert(st2.asOf(horizon - 1).current.count() == 4)

    // Cursor.page over the appended store sees every row (page calls
    // asOf(dateline) internally)
    val page = graft.plan.Cursor.page(st2, None, 10)
    assert(page.count() == 5)
  }

  test("single-writer lock: a second concurrent save fails cleanly") {
    val prims = Seq(node(1, value = Some("a")), node(2, value = Some("b")))
    val st = GraphStore.fromSeq(spark, prims)
    val dir = Files.createTempDirectory("graft_lock").toString + "/prims"
    // writer A holds the lock; writer B's save must fail fast with the
    // path in the error, NOT race last-writer-wins into the directory
    val release = graft.store.StoreLock.acquire(spark, dir)
    val err = intercept[IllegalStateException] { st.save(dir) }
    assert(err.getMessage.contains(dir))
    assert(!new java.io.File(dir).exists()) // B wrote nothing
    release()
    st.save(dir) // after release the same writer succeeds
    assert(GraphStore.load(spark, dir).primitives.count() == 2)
    // the lock is released after a successful save: an immediate
    // re-save (the steady-state snapshot loop) needs no cleanup
    st.save(dir)
    // a crashed writer's ABANDONED lock self-expires: plant a stale one
    val lockFile = new java.io.File(dir + ".lock")
    assert(lockFile.createNewFile())
    assert(lockFile.setLastModified(
      System.currentTimeMillis() - 31L * 60 * 1000))
    st.save(dir) // reclaims and proceeds
    assert(!lockFile.exists())
  }

  test("single-writer lock: a reclaimed writer's late release never deletes the reclaimer's lock") {
    val dir = Files.createTempDirectory("graft_lock2").toString + "/prims"
    val lockFile = new java.io.File(dir + ".lock")
    // writer A acquires, then stalls past the stale horizon (simulated
    // by aging its lock file); contender B reclaims the abandoned lock
    val releaseA = graft.store.StoreLock.acquire(spark, dir)
    assert(lockFile.setLastModified(
      System.currentTimeMillis() - 31L * 60 * 1000))
    val releaseB = graft.store.StoreLock.acquire(spark, dir)
    assert(lockFile.exists())
    // reclaim leaves no grave marker behind
    assert(!Option(lockFile.getParentFile.listFiles()).get
      .exists(_.getName.contains(".reclaim.")))
    // A's LATE release must be a no-op — the lock now carries B's
    // token; an unconditional delete here would let a third writer in
    // while B is still mid-overwrite
    releaseA()
    assert(lockFile.exists(), "A's stale release deleted B's live lock")
    // and a third contender still fails fast against B's live lock
    intercept[IllegalStateException] {
      graft.store.StoreLock.acquire(spark, dir)
    }
    releaseB()
    assert(!lockFile.exists())
  }

  test("compact materializes the current view: no versions, no window") {
    import graft.write.Writer
    // v1 → v2 of one doc, a tombstoned node, a plain survivor
    var st = GraphStore.fromSeq(spark, Seq(
      node(1, name = Some("a"), value = Some("v1")),
      node(2, name = Some("b"), value = Some("keep")),
      node(3, name = Some("c"), value = Some("dead"))))
    val (st1, _) = Writer.versionOf(st, 1,
      Writer.Spec(name = Some("a"), value = Some("v2")))
    val (st2, _) = Writer.tombstone(st1, 3)
    val dir = Files.createTempDirectory("graft_compact").toString + "/c"
    val cp = st2.compact(dir)
    assert(!cp.versioned)
    // same visible state, nothing else on disk
    val rows = cp.current.select("name", "value").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("a" -> "v2", "b" -> "keep"))
    assert(cp.all.count() == 2) // history and tombstones gone
    assert(cp.verifyConsistency().count() == 0)
    // a compacted store keeps versioning correctly from here
    val (cp2, _) = Writer.versionOf(cp,
      cp.current.filter(org.apache.spark.sql.functions.col("name") === "a")
        .select("id").head().getLong(0),
      Writer.Spec(name = Some("a"), value = Some("v3")))
    val after = cp2.current.filter(
      org.apache.spark.sql.functions.col("name") === "a")
      .select("value").collect().map(_.getString(0)).toSeq
    assert(after == Seq("v3"))
  }

  test("dateline constraint reads only primitives after the horizon") {
    val st = GraphStore.fromSeq(spark,
      (1L to 6L).map(i => node(i, value = Some(s"v$i"))))
    // bare-id horizon
    val after = ReadPlanner.plan(st,
      """read (dateline > "4" result=((value)))""").collect()
    assert(after.map(_.getString(0)).toSet == Set("v5", "v6"))
    // odometer db:count form uses the count part
    val after2 = ReadPlanner.plan(st,
      """read (dateline > "9a8f7e6d:5" result=((value)))""").collect()
    assert(after2.map(_.getString(0)).toSet == Set("v6"))
  }

  test("dateline-1 session: incremental reads after an odometer") {
    // test/unit/dateline-1.sh: seven named writes, dateline>db.N reads
    val names = Seq("pear", "tomato", "potato", "pepper", "apple", "onion", "corn")
    val st = GraphStore.fromSeq(spark,
      names.zipWithIndex.map { case (nm, i) => node(i + 1L, name = Some(nm)) })
    def q(tok: String): Seq[String] =
      ReadPlanner.plan(st, s"""read (dateline>$tok result=((name)))""")
        .collect().map(_.getString(0)).toSeq.sortBy(names.indexOf)
    assert(q("123456.3") == Seq("pepper", "apple", "onion", "corn"))
    assert(q("123456.0") == names)
    assert(q("123456.6") == Seq("corn"))
    assert(q("123456.7").isEmpty)
    // an unparseable dateline is a syntax error
    intercept[graft.gql.Parser.ParseError] {
      ReadPlanner.plan(st,
        """read (dateline>"This is not a syntactically correct dateline!")""")
    }
  }

  test("status reports store-level counters in one pass") {
    val st = GraphStore.fromSeq(spark, Seq(
      node(1, value = Some("a")), node(2, value = Some("b")),
      node(3, live = false),
      graft.model.Primitive.link(4, left = 1, right = Some(2), typeguid = Some(1))))
    val row = st.status().head()
    assert(row.getAs[Long]("n_primitives") == 4L)
    assert(row.getAs[Long]("n_nodes") == 3L)
    assert(row.getAs[Long]("n_links") == 1L)
    assert(row.getAs[Long]("n_tombstones") == 1L)
    assert(row.getAs[Long]("dateline") == 4L)
  }

  test("query-language cursor pins the append-time snapshot") {
    val st = GraphStore.fromSeq(spark,
      (1L to 6L).map(i => node(i, value = Some(s"v$i"))))
    val p1 = ReadPlanner.plan(st, "read (result=(cursor (guid value)) pagesize=2)")
      .collect()
    val tok = p1.head.getAs[String]("cursor")
    assert(tok != "null:")
    // the token's horizon is the store's dateline, not MaxValue: rows
    // appended after page 1 stay invisible to page 2
    val (st2, _) = Writer.append(st, Seq(Writer.Spec(value = Some("late"))))
    val p2 = ReadPlanner.plan(st2,
      s"""read (result=(cursor (guid value)) pagesize=99 cursor="$tok")""")
      .collect()
    assert(p2.map(_.getAs[String]("value")).toSet == Set("v3", "v4", "v5", "v6"))
  }

  test("cursor resume ignores start=: the token already encodes position") {
    val st = GraphStore.fromSeq(spark,
      (1L to 8L).map(i => node(i, value = Some(s"v$i"))))
    // page 1: skip 1, take 2 → v2 v3
    val p1 = ReadPlanner.plan(st,
      "read (result=(cursor (value)) start=1 pagesize=2)").collect()
    assert(p1.map(_.getAs[String]("value")).toSeq == Seq("v2", "v3"))
    val tok = p1.head.getAs[String]("cursor")
    // page 2 carries the same start=1 (clients resend the query
    // verbatim with cursor=): must resume at v4, not skip again
    val p2 = ReadPlanner.plan(st,
      s"""read (result=(cursor (value)) start=1 pagesize=2 cursor="$tok")""")
      .collect()
    assert(p2.map(_.getAs[String]("value")).toSeq == Seq("v4", "v5"))
  }

  test("bucketed save: equi-join on the bucket key plans with no exchange") {
    import graft.model.Primitive.link
    val prims = (1L to 8L).map(i => node(i, value = Some(s"n$i"))) ++
      (1L to 16L).map(i => link(100 + i, left = 1 + (i % 8), right = Some(1 + ((i + 3) % 8))))
    val st = GraphStore.fromSeq(spark, prims)
    val base = Files.createTempDirectory("graft_bucketed").toString
    st.saveBucketed("prims_by_left", s"$base/by_left", key = "left", buckets = 4)

    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val wasBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the sort-merge path: broadcast would win on this toy size,
    // but the property under test is the cluster-scale join shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t1 = spark.table("prims_by_left").select(col("left"), col("id"))
      val t2 = spark.table("prims_by_left")
        .select(col("left"), col("id").as("id2"))
      val joined = t1.join(t2, "left")
      // both sides bucketed+sorted on the key: sort-merge join with
      // neither an Exchange nor a per-query Sort on either side
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 16 * 2) // each left appears twice per side
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", wasBcast)
      spark.sql("DROP TABLE IF EXISTS prims_by_left")
    }
  }

  test("fixed-signature cursor thaw: linkage detection stays inside the signature") {
    import graft.plan.Cursor
    // spelled-out linkage IN the source signature → unthawable (EMPTY),
    // per the reference's colors3 last read
    val bad = "fixed:(fixed-isa:608-620:left<-(vip:630-642:r+00->620))/3/"
    val e = intercept[IllegalArgumentException](Cursor.decode(bad))
    assert(e.getMessage.startsWith("EMPTY"))
    // single-letter linkage thaws positionally even when the @resource
    // cache tail happens to CONTAIN a linkage-looking substring — the
    // detection must not scan past the parenthesized signature
    val ok = "fixed:(fixed-isa:608-620:l<-(vip:630-642:r+00->620)[hint:0])" +
      "/3/[cache:@ab1-2:left<-x]"
    assert(Cursor.decode(ok).skip == 3)
  }
}
