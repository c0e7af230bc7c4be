package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

object Util {
  /** Normalize the events table's `ts` to a `ts_ns` Long (epoch nanos),
    * regardless of whether the session read the parquet column as Long
    * nanos (spark.sql.legacy.parquet.nanosAsLong=true), Timestamp, or —
    * for micros with isAdjustedToUTC=false under Spark's NTZ inference —
    * TimestampNTZ. Sessions run with timeZone=UTC, so the NTZ→TZ cast
    * reinterprets the naive wall-clock as UTC, matching how the DuckDB
    * oracle reads the same column. Long arithmetic keeps bucket math
    * exact (no double rounding at 1e18 magnitudes).
    */
  def eventsNanos(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case LongType         => events.withColumn("ts_ns", col("ts"))
      case TimestampType    => events.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        events.withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(s"unexpected ts type: $other")
    }

  /** Working-directory key for gates that stage a feed/store under
    * java.io.tmpdir: the source-dir path FOLDED WITH the fed table's
    * (length, mtime). Keying on the path alone poisons re-runs when the
    * data at that path is regenerated — the stale feed replays old
    * rows (the same immutable-input trap the operator memos guard
    * against with planKey). Distinct data ⇒ distinct working dirs.
    */
  def dataKey(spark: org.apache.spark.sql.SparkSession, dir: String,
      table: String = "documents"): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        s"$dir|${st.getLen}|${st.getModificationTime}").toLong & 0xffffffffL)
  }
}
