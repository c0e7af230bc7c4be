package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serve.{PointServer, ShardRouter}

/** Shard-router equivalence gate: every query the router answers must
  * match the single-snapshot answer (itself gated against Catalyst by
  * ServeSpec) for every shard count — including the home-dedup
  * contract (no duplicated rows from link co-location) and global
  * paging over the merged stream.
  */
class ShardRouterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val store = graft.store.GraphAdapter.store(spark, "/root/testdata/sf0.001")
  lazy val single: PointServer.Index = PointServer.build(store)

  private val queries = Seq(
    """read (type="customer" value~="42" result=((guid value)))""",
    """read (type="customer" result=count)""",
    """read (type="part" value~="gea*" result=((guid value)))""",
    """read (any value~="special" result=((guid value)) pagesize=7)""",
    """read (type="supplier" result=((guid value)) start=3 pagesize=5)""")

  /** sorted reads: the k-way comparator-key merge must reproduce the
    * single snapshot's global order AND page — router answers these
    * since round 8
    */
  private val sortedQueries = Seq(
    """read (type="customer" sort=value pagesize=3 result=((value)))""",
    """read (type="supplier" sort=-value result=((guid value)))""",
    """read (type="part" sort=(value guid) start=2 pagesize=6 result=((guid value)))""",
    """read (type="customer" sort-comparator=number sort=value result=((guid value)))""",
    """read (any value~="special" sort=-guid pagesize=5 result=((guid value)))""")

  for (n <- Seq(1, 3, 5)) {
    lazy val sharded = ShardRouter.build(store, n)
    test(s"router answers match the single snapshot at n=$n") {
      queries.foreach { q =>
        val one = PointServer.serve(single, q)
        val many = ShardRouter.serve(sharded, q)
        assert(one.isDefined, s"single snapshot declined: $q")
        assert(many.isDefined, s"router declined: $q")
        assert(many.get.columns == one.get.columns, q)
        assert(many.get.rows.map(_.toSeq) == one.get.rows.map(_.toSeq),
          s"rows differ at n=$n: $q")
        // home-dedup: merged ids strictly increasing (no duplicates)
        val ids = many.get.rowIds
        assert(ids.lazyZip(ids.drop(1)).forall(_ < _), s"dup/unsorted ids: $q")
      }
    }
    test(s"router sorted reads match the single snapshot at n=$n") {
      sortedQueries.foreach { q =>
        val one = PointServer.serve(single, q)
        val many = ShardRouter.serve(sharded, q)
        assert(one.isDefined, s"single snapshot declined: $q")
        assert(many.isDefined, s"router declined: $q")
        assert(many.get.columns == one.get.columns, q)
        assert(many.get.rows.map(_.toSeq) == one.get.rows.map(_.toSeq),
          s"rows differ at n=$n: $q")
        // order comes from the merge keys; ids must still be unique
        val ids = many.get.rowIds
        assert(ids.distinct.size == ids.size, s"dup ids: $q")
      }
    }
  }

  test("router declines what shard locality cannot answer") {
    val sharded = ShardRouter.build(store, 3)
    // left/right fan-in children ARE co-located: routed
    assert(ShardRouter.serve(sharded,
      """read (type="customer" result=((guid)) (<-right count>=1))""").isDefined)
    // typeguid fan-ins count postings a shard holds only a fraction
    // of (links co-locate by their own endpoints, not by typeguid)
    assert(ShardRouter.serve(sharded,
      """read (type="customer" result=((guid)) (<-typeguid count>=1))""").isEmpty)
    // parent->child endpoint reads can leave the shard
    assert(ShardRouter.serve(sharded,
      """read (type="placed_by" result=((guid)) (left-> count>=1))""").isEmpty)
  }

  test("each shard's snapshot is bounded, not the whole corpus") {
    // null link endpoints must not default into shard 0: with the
    // coalesce-to-0 bug shard 0 held every NODE (~the full corpus);
    // the contract is ~1/n owned rows plus co-located links
    val n = 3
    val sharded = ShardRouter.build(store, n)
    val total = single.size.toDouble
    sharded.shards.zipWithIndex.foreach { case (ix, s) =>
      assert(ix.size < total * 0.75,
        s"shard $s holds ${ix.size} of ${total.toInt} rows — not bounded")
      // and every owned id actually hashes home
      assert(ix.ids.filter(ix.home).forall(id => id % n == s))
    }
  }

  test("chaos: a shard failing mid-scatter fails the whole request, never a partial merge") {
    // failure contract (documented on serveRouted): the scatter is
    // all-or-nothing. A shard that dies mid-request must surface as a
    // request-level failure the caller can retry — a partial merge
    // would return a silently incomplete page, which is worse than an
    // error. The fault is injected through the home predicate (called
    // on the accept path of every shard probe), first as an always-
    // throw, then as a flaky once-throw to prove a retry on healthy
    // shards returns the byte-exact answer.
    val sharded = ShardRouter.build(store, 3)
    // unpaged read: the eager path filters EVERY candidate through the
    // home predicate, so the injected fault fires on any shard that
    // holds candidates at all (a lazily-paged read can stop before
    // reaching the poisoned shard's first candidate)
    val q = """read (type="customer" result=((guid value)))"""
    val healthy = ShardRouter.serve(sharded, q).get
    val boom = new RuntimeException("shard 1 died mid-scatter")
    val dead = sharded.shards(1).withHome(_ => throw boom)
    val broken = sharded.copy(shards = sharded.shards.updated(1, dead))
    val err = intercept[RuntimeException](ShardRouter.serve(broken, q))
    assert(err eq boom)
    // flaky shard: throws exactly once, healthy on retry
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val real = sharded.shards(1)
    val flakyIx = real.withHome { id =>
      if (failures.getAndDecrement() > 0)
        throw new RuntimeException("transient shard fault")
      id % 3 == 1
    }
    val flaky = sharded.copy(shards = sharded.shards.updated(1, flakyIx))
    intercept[RuntimeException](ShardRouter.serve(flaky, q))
    val retried = ShardRouter.serve(flaky, q).get
    assert(retried.columns == healthy.columns)
    assert(retried.rows.map(_.toSeq) == healthy.rows.map(_.toSeq))
    assert(retried.rowIds == healthy.rowIds)
  }
}
