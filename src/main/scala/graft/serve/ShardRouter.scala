package graft.serve

import org.apache.spark.sql.functions._

import graft.gql.{ChildPointsToParent, Constraint, CountBounds, Parser}
import graft.store.GraphStore

/** Shard router over [[PointServer]] snapshots — the serving tier's
  * scale-out story. One snapshot holds one shard's hot set (the
  * reference itself caps a database at 16G primitives,
  * libaddb/addb-istore.h:22); past that the corpus hash-partitions by
  * id across serving nodes and a router scatter-gathers.
  *
  * Locality contract: shard `s` OWNS primitives with `id % n == s` and
  * additionally HOLDS every link whose left/right endpoint it owns
  * (the VIP co-location move: a posting lives with the node it points
  * at), so the servable query class — root predicates plus bounds-only
  * 1-hop children — never needs another shard to check a candidate.
  * Each shard answers only rows it owns (`Index.home`), the router
  * merges by ascending id and applies start/pagesize globally. The
  * type-name vocabulary (tiny, global) is resolved once and broadcast
  * into every shard.
  *
  * Routed queries: the unsorted point-read class (the qps benchmark
  * class — "names containing herman"). Sorted reads need a global
  * merge by comparator key and fall back to the Catalyst plan, like
  * every other non-servable shape.
  */
object ShardRouter {

  final case class Shards(shards: Vector[PointServer.Index], n: Int)

  /** Build `n` shard snapshots from the store. Each shard's collect is
    * ~1/n of the corpus (plus owned-endpoint link duplicates) — the
    * per-serving-node memory bound that makes the tier horizontal. On
    * a cluster each build runs against the shard's partition of the
    * table; the predicates below push into the scan.
    */
  def build(store: GraphStore, n: Int): Shards = {
    require(n >= 1)
    val globalTypes = PointServer.build(store).typeIdsByName
    // shard the globally-resolved CURRENT view: version currency is a
    // per-lineage property and lineage members hash to different
    // shards, so newest/live resolution must happen before the split
    val currentView = store.copy(
      primitives = store.current,
      versioned = false,
      localRows = store.currentLocal)
    val shards = (0 until n).map { s =>
      // null endpoints must NOT default into shard 0 (a coalesce-to-0
      // here would hand shard 0 every NODE in the corpus and break the
      // 1/n per-shard memory bound); only real link endpoints co-locate
      val owned = pmod(col("id"), lit(n)) === s ||
        (col("left").isNotNull && pmod(col("left"), lit(n)) === s) ||
        (col("right").isNotNull && pmod(col("right"), lit(n)) === s)
      val shardStore = currentView.copy(
        primitives = currentView.primitives.filter(owned),
        localRows = currentView.localRows.map(_.filter(p =>
          p.id % n == s || p.left.exists(_ % n == s) ||
            p.right.exists(_ % n == s))))
      PointServer.build(shardStore)
        .withTypes(globalTypes)
        .withHome(id => id % n == s)
    }.toVector
    Shards(shards, n)
  }

  def serve(sh: Shards, query: String): Option[PointServer.Served] =
    serve(sh, Parser.parseRead(query))

  def serve(sh: Shards, c: Constraint): Option[PointServer.Served] = {
    // global ordering across shards is by id for unsorted reads; a
    // comparator sort would need a keyed merge — Catalyst's job
    if (c.sort.nonEmpty) return None
    // shard locality covers root predicates + left/right fan-in
    // children ONLY: a shard holds every link whose left/right
    // endpoint it owns, so those postings are complete. Everything
    // else is non-local and falls back to the full plan:
    //  - `left->(...)` children read the node AT an endpoint —
    //    possibly foreign — as do linkage-less children (the point
    //    server infers a parent->child direction for them);
    //  - `<-typeguid` / `<-scope` fan-ins count postings co-located
    //    by their OWN endpoints, not by typeguid/scope, so a shard
    //    sees only a fraction of them;
    //  - 2-hop children chain further.
    // Root count BOUNDS are a global property; the router only
    // answers bounds-free roots (count RESULTS aggregate fine).
    if (c.effectiveCount != CountBounds()) return None
    def shardLocal(sub: Constraint): Boolean = sub.effectiveLinkage match {
      case Some(ChildPointsToParent(f)) => f == "left" || f == "right"
      case _ => false
    }
    if (c.subs.exists(sub => sub.subs.nonEmpty || !shardLocal(sub)))
      return None
    // shards answer unpaged; the router pages the merged stream
    val unpaged = c.copy(pagesize = None, start = None)
    val per = sh.shards.map(ix => PointServer.serve(ix, unpaged))
    if (per.exists(_.isEmpty)) return None
    val answers = per.flatten
    if (answers.headOption.exists(_.columns == Seq("count"))) {
      val total = answers.map(_.rows.head(0).asInstanceOf[Long]).sum
      return Some(PointServer.Served(Seq("count"), Seq(Array[Any](total))))
    }
    // merge by ascending id (each shard already ascending), then page
    var merged = answers.flatMap(a => a.rowIds.zip(a.rows))
      .sortBy(_._1)
    c.start.foreach(s0 => merged = merged.drop(s0.toInt))
    c.pagesize.foreach(ps => merged = merged.take(ps.toInt))
    Some(PointServer.Served(answers.head.columns,
      merged.map(_._2), merged.map(_._1)))
  }
}
