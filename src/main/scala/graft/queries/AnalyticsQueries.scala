package graft.queries

import org.apache.spark.sql.functions._

import graft.graph.Analytics
import graft.plan.Cursor
import graft.store.GraphAdapter
import graft.streaming.Replica

/** Graph analytics, streaming maintenance, and cursor pagination wired
  * into the oracle gate over the deterministic adapter graph.
  */
object AnalyticsQueries extends QueryPack {

  def defs: Seq[QueryDef] = Seq(

    // 2-hop neighborhood expansion around the NATION_3 node: hop 1 =
    // its customers + suppliers + region; hop 2 = those customers'
    // orders + sibling nations of the region.
    QueryDef("a01_khop",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        Analytics.kHop(st, Seq(GraphAdapter.BNation + 3), 2)
          .groupBy(col("hops")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 0 AS hops, 1 AS n
             |UNION ALL
             |SELECT 1,
             |  (SELECT count(*) FROM customer WHERE c_nationkey = 3)
             |  + (SELECT count(*) FROM supplier WHERE s_nationkey = 3)
             |  + 1
             |UNION ALL
             |SELECT 2,
             |  (SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey
             |   WHERE c_nationkey = 3)
             |  + (SELECT count(*) FROM nation
             |     WHERE n_regionkey = (SELECT n_regionkey FROM nation
             |                          WHERE n_nationkey = 3)
             |       AND n_nationkey <> 3)""".stripMargin)),

    // connected components: lineitem contains-links make parts bridge
    // all region trees into one giant component; singletons are the
    // unlinked type nodes and any never-ordered part.
    QueryDef("a02_connected_components",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        Analytics.connectedComponentsStore(st)
          .groupBy(col("component")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 1000000 AS component,
             |  (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
             |  + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
             |  + (SELECT count(*) FROM orders)
             |  + (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n
             |UNION ALL
             |SELECT 40000000 + p_partkey, 1 FROM part
             |  WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
             |UNION ALL
             |SELECT unnest([1,2,3,4,5,6,10,11,12,13,14]), 1""".stripMargin)),

    // PageRank over the link structure — DataFrame-iterative static
    // formulation; the oracle unrolls the same 5 iterations as chained
    // CTEs over the adapter's edge relation.
    QueryDef("a03_pagerank",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        Analytics.pageRankDF(st, iters = 5)
          .orderBy(round(col("pagerank"), 6).desc, col("id").asc).limit(20)
          .select(col("id"), round(col("pagerank"), 6).as("pagerank"))
      },
      Some(pageRankSql(iters = 5))),

    // triangle count over the part co-occurrence graph (parts sharing
    // an order): degree-ordered orientation — two equi-join shuffles,
    // hub fan-out bounded by O(sqrt(E)) out-degree, no adjacency
    // collection. The oracle counts the same triangles with the
    // straightforward a<b<c three-way join.
    QueryDef("a04_triangles",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        // every-10th-order slice: the co-occurrence graph over ALL
        // orders is near-complete on the small part catalog (its wedge
        // count grows ~cubically with scale factor), which benchmarks
        // graph density, not the operator; the slice keeps the gate
        // exercising the full orient-wedge-close path at every SF
        // (BOrders ≡ 0 mod 10, so left%10 == orderkey%10)
        val contains = st.links
          .filter(col("typeguid") === GraphAdapter.TContains &&
            pmod(col("left"), lit(10L)) === 0)
          .select(col("left").as("k"), col("right").as("m"))
        Analytics.triangleCount(
          Analytics.cooccurrenceEdges(contains, "k", "m"))
      },
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
             |  WHERE l_orderkey % 10 = 0),
             |e AS (
             |  SELECT DISTINCT i1.p AS a, i2.p AS b
             |  FROM items i1 JOIN items i2 ON i1.o = i2.o AND i1.p < i2.p)
             |SELECT CAST(count(*) AS BIGINT) AS triangles
             |FROM e ab
             |JOIN e ac ON ac.a = ab.a AND ac.b > ab.b
             |JOIN e bc ON bc.a = ab.b AND bc.b = ac.b""".stripMargin)),

    // ADVERSARIAL SKEW GATE: one synthetic hub key holds EVERY part
    // (2000 members at sf0.01 — 8x past the 256 cap), the degenerate
    // key whose uncapped pair fan-out (C(2000,2) ≈ 2M pairs from ONE
    // key) dwarfs the real workload. cooccurrenceEdges' per-key cap
    // must drop the hub in its entirety — whole-bucket drop is the
    // deterministic contract, reproduced exactly by the oracle's
    // HAVING count(*) <= cap — while every ordinary order (<= 7 items)
    // keeps contributing its pairs.
    QueryDef("a05_cooccur_hotkey",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        val contains = st.links
          .filter(col("typeguid") === GraphAdapter.TContains &&
            pmod(col("left"), lit(10L)) === 0)
          .select(col("left").as("k"), col("right").as("m"))
        val hub = graft.Tables.T(s, dir).part.select(lit(0L).as("k"),
          (col("p_partkey") + GraphAdapter.BPart).as("m"))
        Analytics.cooccurrenceEdges(contains.unionByName(hub), "k", "m",
          maxPerKey = 256)
      },
      Some(s"""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS k,
             |    l_partkey + ${GraphAdapter.BPart} AS m
             |  FROM lineitem WHERE l_orderkey % 10 = 0
             |  UNION
             |  SELECT -1, p_partkey + ${GraphAdapter.BPart} FROM part),
             |ok AS (SELECT k FROM items GROUP BY k
             |       HAVING count(*) <= 256),
             |kept AS (SELECT i.* FROM items i JOIN ok USING (k))
             |SELECT DISTINCT a.m AS a, b.m AS b
             |FROM kept a JOIN kept b ON a.k = b.k AND a.m < b.m""".stripMargin)),

    // islink-style incremental materialization: stream the primitives
    // log (written once per sf) through foreachBatch merge, then read
    // the maintained per-type aggregate.
    QueryDef("st01_stream_type_counts",
      (s, dir) => {
        // keyed on the ORDERS fingerprint: this feed derives from the
        // TPC-H tables, not documents
        val key = Util.dataKey(s, dir, table = "orders")
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_v3_$key"
        val logDir = s"$base/log"
        val stateDir = s"$base/state"
        // write the log once per (session, sf); few large files so the
        // incremental merge runs a handful of micro-batches, not dozens
        if (!new java.io.File(logDir).exists()) {
          GraphAdapter.build(s, dir).coalesce(8)
            .write.mode("overwrite").parquet(logDir)
        }
        new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(stateDir), true)
        // 8 files / 4 per trigger = 2 micro-batches → the merge path
        // actually increments at least once
        val q = Replica.materializeTypeCounts(
          Replica.stream(s, logDir, maxFilesPerTrigger = 4), stateDir)
        q.awaitTermination()
        s.read.parquet(stateDir)
          .filter(col("typeguid").isin(GraphAdapter.TPlacedBy,
            GraphAdapter.TInNation, GraphAdapter.TNationRegion,
            GraphAdapter.TSupplierNation, GraphAdapter.TContains))
      },
      Some("""SELECT 10 AS typeguid, count(*) AS n_links,
             |  100000000 + max(o_orderkey) AS dateline FROM orders
             |UNION ALL
             |SELECT 11, count(*), 200000000 + max(c_custkey) FROM customer
             |UNION ALL
             |SELECT 12, count(*), 300000000 + max(n_nationkey) FROM nation
             |UNION ALL
             |SELECT 13, count(*), 400000000 + max(s_suppkey) FROM supplier
             |UNION ALL
             |SELECT 14, count(*),
             |  500000000 + max(l_orderkey * 8 + l_linenumber) FROM lineitem""".stripMargin)),

    // watermark + tumbling-window aggregation over the events table
    // through the streaming-shaped operator (batch execution of the
    // same plan; the StreamingSpec drives it as a real stream)
    QueryDef("st02_windowed_events",
      (s, dir) => {
        val ev = Util.eventsNanos(graft.Tables.T(s, dir).events)
          .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
        Replica.windowedEventCounts(ev, "1 hour", "2 hours")
          .select(
            unix_timestamp(col("window.start")).as("bucket"),
            col("event_type"), col("n"),
            round(col("sum_value"), 2).as("sum_value"))
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // streaming keyed ingestion (CDC apply): a document feed merges
    // micro-batch by micro-batch into a persisted store — half the
    // corpus is pre-seeded (re-classifies unchanged), the other half
    // streams in as inserts; the result is the post-stream current view
    QueryDef("st03_stream_upsert",
      (s, dir) => {
        import graft.store.GraphStore
        import graft.model.Datatype
        val key = Util.dataKey(s, dir)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_merge_$key"
        val feedDir = s"$base/feed"
        val storeDir = s"$base/store"
        val ckptDir = s"$base/ckpt"
        val docs = s.read.parquet(s"$dir/documents.parquet")
        def asBatch(df: org.apache.spark.sql.DataFrame) = df.select(
          concat(lit("doc:"), col("doc_id").cast("string")).as("name"),
          col("text").as("value"))
        if (!new java.io.File(feedDir).exists())
          asBatch(docs).coalesce(8).write.mode("overwrite").parquet(feedDir)
        val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(storeDir), true)
        fs.delete(new org.apache.hadoop.fs.Path(ckptDir), true)
        // seed: the even half of the corpus, already in its final state
        val seed = WriteQueries.docPrimitives(
          docs.filter(col("doc_id") % 2 === 0))
        GraphStore.fromDf(s, seed).save(storeDir)
        val incoming = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("name",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", 3)
          .parquet(feedDir)
        val q = Replica.mergeStream(incoming, Seq("name"), storeDir, ckptDir)
        q.awaitTermination()
        GraphStore.load(s, storeDir).current
          .select(col("name").as("k"), col("value").as("v"))
      },
      Some("""SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS k, text AS v
             |FROM documents""".stripMargin)),

    // the curation filter pass run AS A STREAM: the same pure-column
    // filterPipeline the batch gate (t08) uses, applied per
    // micro-batch with a complete-mode per-reason aggregation — the
    // batch ≡ streaming composition a monitoring pass relies on
    QueryDef("st04_stream_filter",
      (s, dir) => {
        val key = Util.dataKey(s, dir)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_filter_$key"
        val feedDir = s"$base/feed"
        if (!new java.io.File(feedDir).exists())
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("source"), col("text"))
            .coalesce(6).write.mode("overwrite").parquet(feedDir)
        val incoming = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("source",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
        val name = "st04_sink_" + key
        val q = graft.operators.Curation.filterPipeline(
            incoming, "doc_id", "text", carryCols = Seq("source"))
          .groupBy(col("source"),
            coalesce(col("drop_reason"), lit("kept")).as("reason"))
          .agg(count(lit(1)).as("n"))
          .writeStream.outputMode("complete").format("memory")
          .queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
      },
      Some(s"""WITH r AS (SELECT
             |  CASE
             |    WHEN len(${PipelineQueries.sqlToksPub}) < 5 THEN 'too_short'
             |    WHEN ${PipelineQueries.r4(s"""1.0 - len(list_distinct(${PipelineQueries.sqlToksLowerPub})) * 1.0
             |        / len(${PipelineQueries.sqlToksLowerPub})""")} > 0.8 THEN 'repetition'
             |    WHEN ${PipelineQueries.r4(s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             |        * 1.0 / length(text)""")} < 0.2 THEN 'non_text'
             |    ELSE 'kept' END AS reason, source
             |  FROM documents)
             |SELECT source, reason, count(*) AS n FROM r
             |GROUP BY source, reason""".stripMargin)),

    // streaming dedup-ingest: the incremental batch-vs-history dedup
    // (p13's Bloom-pruned split) run AS A STREAM — each micro-batch
    // accepts only never-seen-fingerprint rows against seed corpus +
    // prior acceptances and appends them to a persisted (id, fp)
    // table. The feed mixes re-keyed copies of seed docs (every one
    // must be rejected, in whatever batch it lands) with uniquely-
    // marked fresh docs (every one must be accepted) — the outcome is
    // batch-boundary-independent, so the oracle states it closed-form.
    QueryDef("st05_stream_dedup",
      (s, dir) => {
        val key = Util.dataKey(s, dir)
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_dedup_$key"
        val feedDir = s"$base/feed"
        val acceptedDir = s"$base/accepted"
        val ckptDir = s"$base/ckpt"
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        if (!new java.io.File(feedDir).exists()) {
          val copies = docs
            .filter(pmod(col("doc_id"), lit(10L)) === 0)
            .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
          val fresh = docs
            .filter(pmod(col("doc_id"), lit(2L)) === 1 && col("text").isNotNull)
            .select(col("doc_id"),
              concat(col("text"), lit(" #u"),
                col("doc_id").cast("string")).as("text"))
          copies.unionByName(fresh)
            .coalesce(6).write.mode("overwrite").parquet(feedDir)
        }
        // resolve the filesystem FROM the path (FileSystem.get returns
        // fs.defaultFS, which need not be the tmpdir's local FS)
        val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(acceptedDir), true)
        fs.delete(new org.apache.hadoop.fs.Path(ckptDir), true)
        val seed = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
        val incoming = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", 2)
          .parquet(feedDir)
        Replica.dedupStream(incoming, "doc_id", "text", seed,
          acceptedDir, ckptDir).awaitTermination()
        s.read.parquet(acceptedDir).select(col("doc_id"), col("fp"))
      },
      Some(s"""WITH feed AS (
             |  SELECT doc_id, text || ' #u' || CAST(doc_id AS VARCHAR) AS text
             |  FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL)
             |SELECT doc_id, ${PipelineQueries.sqlFpPub} AS fp FROM feed""".stripMargin)),

    // time travel: an asOf snapshot at the pre-orders horizon sees
    // exactly the region/nation/customer prefix of the id-ordered
    // build — the id predicate prunes partitions AND parquet row
    // groups (doc/gr-protocol.txt:203-221 asof semantics)
    QueryDef("q23_asof",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        st.asOf(GraphAdapter.BOrders - 1).current
          .filter(col("id") >= GraphAdapter.BRegion)
          .groupBy(
            when(col("id") < GraphAdapter.BNation, "region")
              .when(col("id") < GraphAdapter.BCustomer, "nation")
              .otherwise("customer").as("kind"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 'region' AS kind, count(*) AS n FROM region
             |UNION ALL SELECT 'nation', count(*) FROM nation
             |UNION ALL SELECT 'customer', count(*) FROM customer""".stripMargin)),

    // cursor pagination: fetch page 1, mint the keyset token, resume —
    // returns page 2 (orders 51..100 of the graph in id order).
    QueryDef("c01_cursor_page2",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        val p1 = Cursor.page(st, None, 50)
        val tok = Cursor.next(st, p1, None, 50)
        Cursor.page(st, tok, 50).select(col("id"), col("value"))
      },
      Some("""WITH prims AS (
             |  SELECT 1 AS id, NULL AS value
             |  UNION ALL SELECT unnest([2,3,4,5,6,10,11,12,13,14]), NULL
             |  UNION ALL SELECT 1000000 + r_regionkey, r_name FROM region
             |  UNION ALL SELECT 2000000 + n_nationkey, n_name FROM nation
             |  UNION ALL SELECT 10000000 + c_custkey, c_name FROM customer
             |  UNION ALL SELECT 20000000 + o_orderkey, o_orderstatus FROM orders
             |  UNION ALL SELECT 30000000 + s_suppkey, s_name FROM supplier
             |  UNION ALL SELECT 40000000 + p_partkey, p_name FROM part)
             |SELECT id, value FROM prims ORDER BY id
             |LIMIT 50 OFFSET 50""".stripMargin)),

    // dump → 13-field text tuples → restore round trip
    // (graphd-dump.c / graphd-restore.c, wire form
    // doc/gr-protocol.txt:1213-1296), aggregated into a checksum the
    // oracle recomputes from the base tables: field survival, guid
    // render/parse, and %-escaping all have to hold for this to match.
    QueryDef("dr01_dump_restore",
      (s, dir) => {
        val st = GraphAdapter.store(s, dir)
        val restored = graft.store.DumpRestore.restore(
          s, graft.store.DumpRestore.dump(st))
        restored.agg(
          count(lit(1)).as("n"),
          count(col("left")).as("n_links"),
          max(col("id")).as("max_id"),
          sum(when(col("typeguid").isin(1L, 2L, 3L, 4L, 5L, 6L),
            length(col("value")))).as("value_len"))
      },
      Some("""SELECT
             |  CAST(11
             |    + (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
             |    + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
             |    + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
             |    + (SELECT count(*) FROM orders) + (SELECT count(*) FROM customer)
             |    + (SELECT count(*) FROM nation) + (SELECT count(*) FROM supplier)
             |    + (SELECT count(*) FROM lineitem) AS BIGINT) AS n,
             |  CAST((SELECT count(*) FROM orders) + (SELECT count(*) FROM customer)
             |    + (SELECT count(*) FROM nation) + (SELECT count(*) FROM supplier)
             |    + (SELECT count(*) FROM lineitem) AS BIGINT) AS n_links,
             |  CAST(500000000
             |    + (SELECT max(l_orderkey * 8 + l_linenumber) FROM lineitem)
             |    AS BIGINT) AS max_id,
             |  CAST((SELECT sum(length(r_name)) FROM region)
             |    + (SELECT sum(length(n_name)) FROM nation)
             |    + (SELECT sum(length(c_name)) FROM customer)
             |    + (SELECT sum(length(s_name)) FROM supplier)
             |    + (SELECT sum(length(p_name)) FROM part)
             |    + (SELECT sum(length(o_orderstatus)) FROM orders)
             |    AS BIGINT) AS value_len""".stripMargin))
  )

  /** DuckDB rendition of Analytics.pageRankDF over the adapter graph:
    * the same edge relation (one row per fk link), same init/update,
    * unrolled `iters` times as chained CTEs.
    */
  private def pageRankSql(iters: Int, reset: Double = 0.15): String = {
    val base = s"""WITH edges AS (
      |  SELECT 20000000 + o_orderkey AS src, 10000000 + o_custkey AS dst FROM orders
      |  UNION ALL
      |  SELECT 10000000 + c_custkey, 2000000 + c_nationkey FROM customer
      |  UNION ALL
      |  SELECT 2000000 + n_nationkey, 1000000 + n_regionkey FROM nation
      |  UNION ALL
      |  SELECT 30000000 + s_suppkey, 2000000 + s_nationkey FROM supplier
      |  UNION ALL
      |  SELECT 20000000 + l_orderkey, 40000000 + l_partkey FROM lineitem),
      |outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
      |verts AS (
      |  SELECT unnest([1,2,3,4,5,6,10,11,12,13,14]) AS id
      |  UNION ALL SELECT 1000000 + r_regionkey FROM region
      |  UNION ALL SELECT 2000000 + n_nationkey FROM nation
      |  UNION ALL SELECT 10000000 + c_custkey FROM customer
      |  UNION ALL SELECT 20000000 + o_orderkey FROM orders
      |  UNION ALL SELECT 30000000 + s_suppkey FROM supplier
      |  UNION ALL SELECT 40000000 + p_partkey FROM part),
      |r0 AS (SELECT id, 1.0::DOUBLE AS pr FROM verts)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT v.id,
         |    $reset + ${1 - reset} * coalesce(sum(r.pr / o.od), 0) AS pr
         |  FROM verts v
         |  LEFT JOIN edges e ON e.dst = v.id
         |  LEFT JOIN r${k - 1} r ON r.id = e.src
         |  LEFT JOIN outd o ON o.src = e.src
         |  GROUP BY v.id)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"""
         |SELECT id, round(pr, 6) AS pagerank FROM r$iters
         |ORDER BY round(pr, 6) DESC, id ASC LIMIT 20""".stripMargin
  }
}
