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

  final case class Token(lastId: Long, horizon: Long)

  def encode(t: Token): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(
      s"graft:${t.lastId}:${t.horizon}".getBytes(StandardCharsets.UTF_8))

  def decode(s: String): Token =
    new String(Base64.getUrlDecoder.decode(s), StandardCharsets.UTF_8) match {
      case t if t.startsWith("graft:") =>
        val parts = t.split(":")
        Token(parts(1).toLong, parts(2).toLong)
      case other => throw new IllegalArgumentException(s"bad cursor $other")
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
