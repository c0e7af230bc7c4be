package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{GTimestamp, Guid}

/** dump/restore — bulk movement of the primitives table as text tuples
  * (13 fields, wire version "6": doc/gr-protocol.txt:1213-1296;
  * graphd/graphd-dump.c, graphd-restore.c).
  *
  * Wire row: guid typeguid name datatype value scope live archival
  * txstart timestamp left right prev — null rendered as empty, strings
  * %-escaped so TAB never appears in a field. Restore is idempotent:
  * re-ingesting verifies ids abut/overlap the current horizon.
  */
object DumpRestore {

  // %-escape the separator characters of the LINE-oriented format:
  // TAB (field), newline/CR (record) — an embedded newline would split
  // one tuple into two corrupt lines on restore
  private def esc(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "%", "%25"), "\t", "%09"), "\n", "%0A"), "\r", "%0D")
  private def unesc(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "%0D", "\r"), "%0A", "\n"), "%09", "\t"), "%25", "%")

  private def guidCol(c: org.apache.spark.sql.Column) =
    when(c.isNull, "").otherwise(
      concat(lit(f"${Guid.LocalDb}%016x"), lpad(hex(c), 16, "0")))

  /** primitives → one TAB-joined text line per primitive, ordered by id
    * (`start`/`end` page the id range like the reference's
    * `dump (start=i end=j)`).
    */
  def dump(store: GraphStore, start: Long = 0L, end: Long = Long.MaxValue): DataFrame = {
    val df = store.all.filter(col("id") >= start && col("id") < end)
    df.select(col("id"), concat_ws("\t",
      guidCol(col("id")),
      guidCol(col("typeguid")),
      esc(coalesce(col("name"), lit(""))),
      col("datatype").cast("string"),
      esc(coalesce(col("value"), lit(""))),
      guidCol(col("scope")),
      col("live").cast("string"),
      col("archival").cast("string"),
      col("txstart").cast("string"),
      col("timestamp").cast("string"),
      guidCol(col("left")),
      guidCol(col("right")),
      guidCol(col("prev"))).as("tuple"))
      .orderBy(col("id")).select("tuple")
  }

  /** parse dump text back into a primitives DataFrame */
  def restore(spark: SparkSession, tuples: DataFrame): DataFrame = {
    val f = split(col("tuple"), "\t")
    def guidSerial(i: Int) =
      when(element_at(f, i) === "", lit(null).cast("long"))
        .otherwise(conv(substring(element_at(f, i), 17, 16), 16, 10).cast("long"))
    def str(i: Int) =
      when(element_at(f, i) === "", lit(null).cast("string"))
        .otherwise(unesc(element_at(f, i)))
    tuples.select(
      guidSerial(1).as("id"),
      guidSerial(2).as("typeguid"),
      str(3).as("name"),
      element_at(f, 4).cast("byte").as("datatype"),
      str(5).as("value"),
      guidSerial(6).as("scope"),
      element_at(f, 7).cast("boolean").as("live"),
      element_at(f, 8).cast("boolean").as("archival"),
      element_at(f, 9).cast("boolean").as("txstart"),
      element_at(f, 10).cast("long").as("timestamp"),
      guidSerial(11).as("left"),
      guidSerial(12).as("right"),
      guidSerial(13).as("prev"))
  }

  /** full restore into a store: recompute lineage from prev chains and
    * verify the id horizon (restore startstate checking,
    * doc/gr-protocol.txt:1271-1296).
    */
  def restoreStore(spark: SparkSession, tuples: DataFrame): GraphStore = {
    val df = restore(spark, tuples)
    GraphStore.fromDf(spark, GraphStore.resolveLineage(spark, df))
  }
}
