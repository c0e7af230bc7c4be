package graft.queries

import org.apache.spark.sql.functions._

import graft.plan.ReadPlanner
import graft.store.GraphAdapter

/** End-to-end GQL queries: text → Parser → constraint tree →
  * ReadPlanner → DataFrame, over the deterministic GraphAdapter graph —
  * verified against ANSI-SQL oracles on the base tables. This is the
  * engine's answer to the reference's golden-session tests (SURVEY.md
  * §5): same query language, same semantics, DuckDB as the referee.
  */
object GraphQueries extends QueryPack {

  private def gql(q: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, dir) => ReadPlanner.plan(GraphAdapter.store(s, dir), q)

  def defs: Seq[QueryDef] = Seq(

    // type="customer" scan + set-level count
    // (graphd fast count, graphd-read-set-count.c:21)
    QueryDef("g01_gql_count",
      gql("""read (type="customer" result=count)"""),
      Some("SELECT count(*) AS count FROM customer")),

    // intrinsic value filter + sort + paging on node values
    QueryDef("g02_gql_sorted_page",
      gql("""read (type="nation" sort=(value) pagesize=10 start=5
            |  result=((value)))""".stripMargin),
      // engine's default comparator orders embedded numbers numerically
      // ("NATION_2" < "NATION_10"), which is nationkey order here
      Some("""SELECT n_name AS value FROM nation
             |ORDER BY n_nationkey LIMIT 10 OFFSET 5""".stripMargin)),

    // semi-join: customers with >=1 'F'-status order, via the
    // placed_by link and an isa hop to the order node
    QueryDef("g03_gql_exists",
      gql("""read (type="customer" result=((guid value))
            |  (<-right type="placed_by" left->(value="F")))""".stripMargin),
      Some("""SELECT (10000000 + c_custkey) AS guid, c_name AS value
             |FROM customer WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin)),

    // anti-join: customers with NO orders at all (count=0 child —
    // the reference's without-iterator)
    QueryDef("g04_gql_not_exists",
      gql("""read (type="customer" result=((value))
            |  (<-right type="placed_by" count=0))""".stripMargin),
      Some("""SELECT c_name AS value FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey)""".stripMargin)),

    // two-hop: customers in a named nation (linkage join + isa hop)
    QueryDef("g05_gql_two_hop",
      gql("""read (type="customer" result=((value))
            |  (<-left type="in_nation" right->(value="NATION_3")))""".stripMargin),
      Some("""SELECT c_name AS value FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE n_name = 'NATION_3'""".stripMargin)),

    // fan-in cardinality: customers with >= 15 orders
    QueryDef("g06_gql_count_bound",
      gql("""read (type="customer" result=((value))
            |  (<-right type="placed_by" count>=15))""".stripMargin),
      Some("""SELECT c_name AS value FROM customer
             |WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 15""".stripMargin)),

    // ~= word match on part names through the engine's match expression
    QueryDef("g07_gql_match",
      gql("""read (type="part" value~="gear" result=((guid value)))"""),
      Some("""SELECT (40000000 + p_partkey) AS guid, p_name AS value
             |FROM part WHERE regexp_matches(lower(p_name), '\b(gear)\b')""".stripMargin)),

    // fan-in over the bulk contains-links (one per lineitem row):
    // parts appearing in many orders — the classic hot-key path the
    // reference serves with its VIP index (libpdb/pdb-vip.c)
    QueryDef("g09_gql_fanin",
      gql("""read (type="part" result=((guid value))
            |  (<-right type="contains" count>=45))""".stripMargin),
      Some("""SELECT (40000000 + p_partkey) AS guid, p_name AS value
             |FROM part
             |WHERE (SELECT count(*) FROM lineitem
             |       WHERE l_partkey = p_partkey) >= 45""".stripMargin)),

    // number-comparator range over order totalprice carried on links
    QueryDef("g08_gql_vrange",
      gql("""read (type="placed_by" comparator="number"
            |  value>="450000" result=((guid value)))""".stripMargin),
      Some("""SELECT (100000000 + o_orderkey) AS guid,
             |  CAST(o_totalprice AS VARCHAR) AS value
             |FROM orders WHERE o_totalprice >= 450000""".stripMargin)),

    // prefix glob `~="gea*"`: the word/prefix index candidate path
    // (graphd-iterator-prefix.c:22, PDB_HASH_PREFIX) + exact glob check
    QueryDef("g10_gql_prefix",
      gql("""read (type="part" value~="gea*" result=((guid value)))"""),
      Some("""SELECT (40000000 + p_partkey) AS guid, p_name AS value
             |FROM part WHERE regexp_matches(lower(p_name), '\bgea')""".stripMargin)),

    // multi-value string equality value=("a" "b" ...) — the or-shaped
    // string constraint (graphd-string-constraint.c, guid-set analog)
    QueryDef("g11_gql_value_list",
      gql("""read (type="nation" value=("NATION_1" "NATION_5" "NATION_9")
            |  result=((guid value)))""".stripMargin),
      Some("""SELECT (2000000 + n_nationkey) AS guid, n_name AS value
             |FROM nation
             |WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9')""".stripMargin)),

    // case-insensitive comparator equality (graphd-comparator-case.c)
    QueryDef("g12_gql_case_eq",
      gql("""read (type="customer" comparator="case-insensitive"
            |  value="cUsToMeR#000000042" result=((guid value)))""".stripMargin),
      Some("""SELECT (10000000 + c_custkey) AS guid, c_name AS value
             |FROM customer
             |WHERE lower(c_name) = lower('cUsToMeR#000000042')""".stripMargin))
  )
}
