package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively — composed from
  * built-in operators so Catalyst keeps optimizing them (SURVEY §7.3
  * decision table: compose before custom plans).
  */
object Temporal {

  /** AS-OF join (backward): for each left row, the single most recent
    * right row with the same key and `right.time <= left.time`; left
    * rows with no predecessor keep nulls (LEFT semantics). Ties at
    * equal time admit the right row (>=).
    *
    * Shape: ONE shuffle. Both sides union-tag into a single stream
    * partitioned by key and ordered by (time, tag) — rights sort
    * before the left rows they serve — and a running `last(ignoreNulls)`
    * window forwards each right payload to the lefts that follow.
    * No join node at all, so there is no row explosion on hot keys and
    * skew degrades linearly; at 100 TB this is one range-partitioned
    * sort per side, the same cost as the sort-merge join Spark would
    * pick for an equi-join, but with the inequality resolved for free.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__r", lit(0))
    val r = right.withColumn("__r", lit(1))
    // rights first at equal (key, time): __r descending
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(merged)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
    filled.filter(col("__r") === 0)
      .drop("__r")
  }

  /** Interval-point range join, binned: counts `points` falling inside
    * each interval `[loCol, hiCol]` without a cartesian/BNL plan.
    * Intervals explode into the fixed-width bins they cover, points
    * map to their single bin, and the match becomes an EQUI-join on
    * the bin followed by the exact range predicate — the standard
    * bucketized range-join decomposition. Cost scales with
    * (intervals × bins-per-interval + points), not
    * intervals × points; `binWidth` trades duplication against
    * post-filter selectivity (match it to the typical interval width).
    *
    * `binOf` maps the ordering column to a Long bin ordinal (e.g.
    * epoch-day / width for dates).
    */
  def rangeCount(intervals: DataFrame, points: DataFrame,
      idCols: Seq[String], loCol: String, hiCol: String, ptCol: String,
      binOf: Column => Column): DataFrame = {
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    val pt = points.select(binOf(col(ptCol)).as("__bin"), col(ptCol))
    iv.join(pt,
        iv("__bin") === pt("__bin") &&
          pt(ptCol) >= iv(loCol) && pt(ptCol) <= iv(hiCol),
        "left_outer")
      .groupBy(idCols.map(iv(_)): _*)
      .agg(count(pt(ptCol)).as("n_points"))
  }

  /** Ordered funnel analysis: how many keys reached stage i of an
    * event-type sequence IN ORDER (stage i counts only after stage
    * i-1 was already seen for that key). Returns one row of stage
    * counts, column `n_<stage>`.
    *
    * Shape: the classic per-key sequential scan expressed as CHAINED
    * cumulative-max windows over ONE partitioning — stage i's running
    * flag conditions on stage i-1's — so the whole funnel costs a
    * single shuffle on the key plus an in-partition sort, no
    * self-joins and no per-key event-list collection (a hot key
    * degrades linearly, never quadratically). Ties order by
    * (time, tieCol), making stage progression deterministic.
    */
  def funnel(events: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    var prev: Column = lit(1)
    stages.zipWithIndex.foreach { case (st, i) =>
      df = df.withColumn(s"__s$i",
        max(when(col(typeCol) === st && prev === 1, 1).otherwise(0)).over(w))
      prev = col(s"__s$i")
    }
    val perKey = df.groupBy(col(keyCol))
      .agg(max(col("__s0")).as("r0"),
        stages.indices.drop(1).map(i => max(col(s"__s$i")).as(s"r$i")): _*)
    perKey.agg(
      sum(col("r0")).cast("long").as(s"n_${stages.head}"),
      stages.zipWithIndex.drop(1).map { case (st, i) =>
        sum(col(s"r$i")).cast("long").as(s"n_$st")
      }: _*)
  }
}
