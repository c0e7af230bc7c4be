package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.Datatype

/** Deterministic relational→graph adapter (FIXTURES.md §3): entity rows
  * become nodes, foreign keys become links — giving graphd-style data
  * at every scale factor from the driver's TPC-H-ish corpus, so GQL
  * reads can be cross-checked against ANSI-SQL oracles over the base
  * tables.
  *
  * Id scheme (stable across engines and runs):
  *   type nodes:  1..19 (fixed)
  *   entity node: BASE(table) + key
  *   fk link:     BASE(fk) + child key
  */
object GraphAdapter {

  // type-node ids
  val TCustomer = 1L; val TOrders = 2L; val TNation = 3L
  val TRegion = 4L; val TSupplier = 5L; val TPart = 6L
  val TPlacedBy = 10L   // order -> customer
  val TInNation = 11L   // customer -> nation
  val TNationRegion = 12L // nation -> region
  val TSupplierNation = 13L // supplier -> nation
  val TContains = 14L   // order -> part (one link per lineitem row)

  // entity-id bases
  val BRegion = 1000000L
  val BNation = 2000000L
  val BCustomer = 10000000L
  val BOrders = 20000000L
  val BSupplier = 30000000L
  val BPart = 40000000L
  // link-id bases
  val BPlacedBy = 100000000L
  val BInNation = 200000000L
  val BNationRegion = 300000000L
  val BSupplierNation = 400000000L
  val BContains = 500000000L // + orderkey * 8 + linenumber

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, GraphStore]

  /** Build (or fetch cached) GraphStore for one scale-factor dir. */
  def store(spark: SparkSession, sfDir: String): GraphStore =
    cache.getOrElseUpdate(sfDir + "@" + spark.hashCode,
      // coalesced, then materialized via localCheckpoint: the 12-way
      // unionByName otherwise leaves ~60 input splits (point reads
      // schedule ~60 tiny tasks), and — just as important — every
      // query built over the union re-analyzes a ~50-node logical tree
      // with 12 file scans. The checkpoint truncates that to a single
      // leaf, which cuts per-query planning time on the serving path.
      // A persisted deployment gets the same effect from reading the
      // materialized primitives table (GraphStore.save/load) instead
      // of the adapter view.
      GraphStore.fromDf(spark, build(spark, sfDir).coalesce(8).localCheckpoint(),
        versioned = false, useWordIndex = true))

  def build(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.T(spark, sfDir)

    def nodes(df: DataFrame, base: Long, key: String, typ: Long,
        value: org.apache.spark.sql.Column): DataFrame =
      df.select(
        (lit(base) + col(key).cast("long")).as("id"),
        lit(typ).as("typeguid"),
        lit(null).cast("string").as("name"),
        lit(Datatype.String).cast("byte").as("datatype"),
        value.cast("string").as("value"),
        lit(null).cast("long").as("scope"),
        lit(true).as("live"),
        lit(true).as("archival"),
        lit(false).as("txstart"),
        lit(0L).as("timestamp"),
        lit(null).cast("long").as("left"),
        lit(null).cast("long").as("right"),
        lit(null).cast("long").as("prev"),
        (lit(base) + col(key).cast("long")).as("lineage"))

    def links(df: DataFrame, base: Long, key: String, typ: Long,
        leftBase: Long, leftKey: String, rightBase: Long, rightKey: String,
        value: org.apache.spark.sql.Column): DataFrame =
      df.select(
        (lit(base) + col(key).cast("long")).as("id"),
        lit(typ).as("typeguid"),
        lit(null).cast("string").as("name"),
        lit(Datatype.String).cast("byte").as("datatype"),
        value.cast("string").as("value"),
        lit(null).cast("long").as("scope"),
        lit(true).as("live"),
        lit(true).as("archival"),
        lit(false).as("txstart"),
        lit(0L).as("timestamp"),
        (lit(leftBase) + col(leftKey).cast("long")).as("left"),
        (lit(rightBase) + col(rightKey).cast("long")).as("right"),
        lit(null).cast("long").as("prev"),
        (lit(base) + col(key).cast("long")).as("lineage"))

    // fixed type nodes, built from a tiny local relation
    val typeRows = Seq(
      (TCustomer, "customer"), (TOrders, "orders"), (TNation, "nation"),
      (TRegion, "region"), (TSupplier, "supplier"), (TPart, "part"),
      (TPlacedBy, "placed_by"), (TInNation, "in_nation"),
      (TNationRegion, "nation_region"), (TSupplierNation, "supplier_nation"),
      (TContains, "contains"))
    import spark.implicits._
    val typeNodes = typeRows.toDF("id", "name").select(
      col("id"),
      lit(null).cast("long").as("typeguid"),
      col("name"),
      lit(Datatype.String).cast("byte").as("datatype"),
      lit(null).cast("string").as("value"),
      lit(null).cast("long").as("scope"),
      lit(true).as("live"),
      lit(true).as("archival"),
      lit(false).as("txstart"),
      lit(0L).as("timestamp"),
      lit(null).cast("long").as("left"),
      lit(null).cast("long").as("right"),
      lit(null).cast("long").as("prev"),
      col("id").as("lineage"))
    // typeguid column position differs for type nodes (null) — align by name
    val typeNodesAligned = typeNodes.select(
      "id", "typeguid", "name", "datatype", "value", "scope", "live",
      "archival", "txstart", "timestamp", "left", "right", "prev", "lineage")

    val parts = Seq(
      typeNodesAligned,
      nodes(t.region, BRegion, "r_regionkey", TRegion, col("r_name")),
      nodes(t.nation, BNation, "n_nationkey", TNation, col("n_name")),
      nodes(t.customer, BCustomer, "c_custkey", TCustomer, col("c_name")),
      nodes(t.supplier, BSupplier, "s_suppkey", TSupplier, col("s_name")),
      nodes(t.part, BPart, "p_partkey", TPart, col("p_name")),
      nodes(t.orders, BOrders, "o_orderkey", TOrders, col("o_orderstatus")),
      links(t.orders, BPlacedBy, "o_orderkey", TPlacedBy,
        BOrders, "o_orderkey", BCustomer, "o_custkey",
        col("o_totalprice")),
      links(t.customer, BInNation, "c_custkey", TInNation,
        BCustomer, "c_custkey", BNation, "c_nationkey",
        lit(null)),
      links(t.nation, BNationRegion, "n_nationkey", TNationRegion,
        BNation, "n_nationkey", BRegion, "n_regionkey",
        lit(null)),
      links(t.supplier, BSupplierNation, "s_suppkey", TSupplierNation,
        BSupplier, "s_suppkey", BNation, "s_nationkey",
        lit(null)),
      // lineitem: the bulk of the graph — one contains-link per row
      // (order → part, value = quantity); id packs (orderkey, lineno)
      links(t.lineitem.withColumn("__lid",
          col("l_orderkey") * 8 + col("l_linenumber")),
        BContains, "__lid", TContains,
        BOrders, "l_orderkey", BPart, "l_partkey",
        col("l_quantity")))

    parts.reduce(_ unionByName _)
  }
}
