package graft.plan

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.Guid

/** S-expression result rendering — the reference's response value model
  * (graphd/graphd.h:1666-1678: string, atom, number, guid, list,
  * sequence, timestamp, boolean, null; serialized by
  * graphd/graphd-request-output.c). A shaped DataFrame row becomes one
  * parenthesized tuple; nested contents arrays become nested lists; the
  * whole result set is one outer sequence, as in `ok ((...) (...))`.
  *
  * This is a terminal formatter (drives a collect) — use it on shaped,
  * paginated results, exactly where the reference serialized.
  */
object SExpr {

  def atom(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => if (b) "true" else "false"
    case r: Row => r.toSeq.map(atom).mkString("(", " ", ")")
    case seq: scala.collection.Seq[_] => seq.map(atom).mkString("(", " ", ")")
    case other => other.toString
  }

  /** render row tuples; `guidCols` are rendered in 32-hex wire form */
  def renderRows(rows: Seq[Row], guidCols: Set[Int] = Set.empty): String =
    rows.map { r =>
      r.toSeq.zipWithIndex.map {
        case (v: Long, i) if guidCols(i) => Guid.render(v)
        case (v, _) => atom(v)
      }.mkString("(", " ", ")")
    }.mkString("(", " ", ")")

  /** full response line: `ok ((...) (...))` */
  def ok(df: DataFrame, guidCols: Set[Int] = Set.empty): String =
    "ok " + renderRows(df.collect().toSeq, guidCols)

  /** protocol-faithful response: an empty result set is an error, not
    * an empty list (`error EMPTY "not found"` — test/unit/or.out.exp).
    */
  def response(df: DataFrame, guidCols: Set[Int] = Set.empty): String = {
    val rows = df.collect().toSeq
    if (rows.isEmpty) "error EMPTY \"not found\""
    else "ok " + renderRows(rows, guidCols)
  }
}
