package graft.plan

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.GraphStore

/** Resumable pagination — the Spark rendition of the reference's opaque
  * `cursor="..."` tokens (graphd/graphd-read-set-cursor.c:22-61).
  *
  * The reference freezes live iterator state into the token
  * (graphd-iterator-and-freeze.c); a declarative engine doesn't need
  * that — a keyset cursor (last id + snapshot horizon) resumes exactly
  * and is O(1) to apply: `id > lastId AND id <= horizon` is a pure
  * partition-prunable range predicate, stable under concurrent appends
  * because the horizon pins the snapshot.
  */
object Cursor {

  /** a sort-key value frozen into a token: type tag ('s' string,
    * 'l' long, 'd' double, 'b' boolean) + rendered value — typed so the
    * resume predicate compares with the original column type (a string
    * compare would misorder numeric keys)
    */
  final case class SortKeyVal(tag: Char, v: String)

  /** `keys` non-empty = a SORT cursor (reference "sort:..." tokens,
    * graphd-read-set-cursor.c): resume = lexicographic keyset predicate
    * over the frozen last-row sort keys, id as final tiebreak.
    */
  final case class Token(lastId: Long, horizon: Long,
      keys: Seq[Option[SortKeyVal]] = Nil)

  private def b64(s: String): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getUrlDecoder.decode(s), StandardCharsets.UTF_8)

  def encode(t: Token): String = {
    val keyPart = t.keys.map {
      case None => "-"
      case Some(SortKeyVal(tag, v)) => s"$tag${b64(v)}"
    }.mkString(",")
    b64(s"graft:${t.lastId}:${t.horizon}:$keyPart")
  }

  def decode(s: String): Token =
    unb64(s) match {
      case t if t.startsWith("graft:") =>
        val parts = t.split(":", -1)
        val keys =
          if (parts.length < 4 || parts(3).isEmpty) Nil
          else parts(3).split(",", -1).toSeq.map {
            case "-" => None
            case k => Some(SortKeyVal(k.charAt(0), unb64(k.substring(1))))
          }
        Token(parts(1).toLong, parts(2).toLong, keys)
      case other => throw new IllegalArgumentException(s"bad cursor $other")
    }

  /** freeze a row's sort-key value with its runtime type */
  def keyValOf(v: Any): Option[SortKeyVal] = v match {
    case null => None
    case x: Long => Some(SortKeyVal('l', x.toString))
    case x: Int => Some(SortKeyVal('l', x.toString))
    case x: Double => Some(SortKeyVal('d', x.toString))
    case x: Boolean => Some(SortKeyVal('b', x.toString))
    case x => Some(SortKeyVal('s', x.toString))
  }

  /** one page in id order, resuming after `cursor` (None = first page) */
  def page(store: GraphStore, cursor: Option[String], pagesize: Int): DataFrame = {
    val horizon = cursor.map(decode(_).horizon)
      .getOrElse(graft.streaming.Replica.dateline(store.primitives))
    val after = cursor.map(decode(_).lastId).getOrElse(Long.MinValue)
    store.asOf(horizon).current
      .filter(col("id") > after)
      .orderBy(col("id").asc)
      .limit(pagesize)
  }

  /** token resuming after the given page (None when the page was short:
    * end of results — the reference's empty final cursor)
    */
  def next(store: GraphStore, pageDf: DataFrame, cursor: Option[String],
      pagesize: Int): Option[String] = {
    val ids = pageDf.select(max(col("id")), count(lit(1))).head
    if (ids.isNullAt(0) || ids.getLong(1) < pagesize) None
    else {
      val horizon = cursor.map(decode(_).horizon)
        .getOrElse(graft.streaming.Replica.dateline(store.primitives))
      Some(encode(Token(ids.getLong(0), horizon)))
    }
  }
}
