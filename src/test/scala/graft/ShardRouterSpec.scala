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
}
