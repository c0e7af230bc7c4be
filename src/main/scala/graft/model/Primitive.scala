package graft.model

import org.apache.spark.sql.types._

/** The universal record type of the engine — the Spark rendition of the
  * reference's "primitive" (doc/gr-model.txt:10-17,
  * doc/gr-protocol.txt:1255-1269; field accessors libpdb/pdb-primitive.h).
  *
  * Design departures for Spark scale (SURVEY.md §1.4):
  *  - GUIDs are (databaseId, serial) pairs; the serial IS the dense
  *    local id, so every linkage column (`left`, `right`, `typeguid`,
  *    `scope`, `prev`) is a nullable Long and all joins run on
  *    LongType, not 32-char strings. `Guid` renders/parses the wire
  *    form (doc/gr-model.txt:23-51).
  *  - `lineage` is materialized at write time as the id of the first
  *    version in this primitive's `prev`-chain; "newest version"
  *    becomes max(id) per lineage — no recursive chain-walk at read
  *    time (doc/a-brief-tour-of-graphd.md:53-66, libpdb/pdb-generation.c).
  *
  * A primitive with non-null `left` is a link; without, a node
  * (doc/a-brief-tour-of-graphd.md:84-101).
  */
final case class Primitive(
    id: Long,
    typeguid: Option[Long],
    name: Option[String],
    datatype: Byte,
    value: Option[String],
    scope: Option[Long],
    live: Boolean,
    archival: Boolean,
    txstart: Boolean,
    timestamp: Long,
    left: Option[Long],
    right: Option[Long],
    prev: Option[Long],
    lineage: Long)

object Primitive {
  /** Canonical column order — mirrors dump/restore wire order
    * (doc/gr-protocol.txt:1255-1269) plus the two engine columns.
    */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("typeguid", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("datatype", ByteType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("scope", LongType, nullable = true),
    StructField("live", BooleanType, nullable = false),
    StructField("archival", BooleanType, nullable = false),
    StructField("txstart", BooleanType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("left", LongType, nullable = true),
    StructField("right", LongType, nullable = true),
    StructField("prev", LongType, nullable = true),
    StructField("lineage", LongType, nullable = false)))

  def node(id: Long, name: Option[String] = None, value: Option[String] = None,
      datatype: Byte = Datatype.String, typeguid: Option[Long] = None,
      timestamp: Long = 0L, live: Boolean = true): Primitive =
    Primitive(id, typeguid, name, datatype, value, None, live,
      archival = true, txstart = false, timestamp, None, None, None, id)

  def link(id: Long, left: Long, right: Option[Long],
      typeguid: Option[Long] = None, value: Option[String] = None,
      name: Option[String] = None, datatype: Byte = Datatype.String,
      timestamp: Long = 0L, live: Boolean = true): Primitive =
    Primitive(id, typeguid, name, datatype, value, None, live,
      archival = true, txstart = false, timestamp, Some(left), right, None, id)
}

/** Value-type tags (doc/gr-model.txt:91-110, doc/gr-protocol.txt:505-528).
  * Stored, never interpreted by the engine — exactly like the reference.
  */
object Datatype {
  val Null: Byte = 1
  val String: Byte = 2
  val Integer: Byte = 3
  val Float: Byte = 4
  val Guid: Byte = 5
  val Timestamp: Byte = 6
  val Url: Byte = 7
  val Bytestring: Byte = 8
  val Boolean: Byte = 9

  private val names = Map[Byte, String](
    Null -> "null", String -> "string", Integer -> "integer",
    Float -> "float", Guid -> "guid", Timestamp -> "timestamp",
    Url -> "url", Bytestring -> "bytestring", Boolean -> "boolean")
  private val codes = names.map(_.swap)

  def name(b: Byte): String = names.getOrElse(b, (b & 0xFF).toString)
  /** numeric datatypes beyond the named nine are user-defined and
    * legal up to 255 (valuetype.sh writes datatype=10 and 200)
    */
  def code(s: String): Option[Byte] =
    codes.get(s.toLowerCase).orElse(
      s.toIntOption.filter(v => v >= 1 && v <= 255).map(v => (v & 0xFF).toByte))
}

/** GUID wire codec (doc/gr-model.txt:23-51, libgraph/graph-guid.c
  * semantics re-expressed): 32 hex chars = 16-byte value, high 8 bytes
  * database id, low 8 bytes serial. Serial doubles as the dense local
  * id of the engine.
  */
object Guid {
  val LocalDb: Long = 0x9a8f7e6dL // arbitrary fixed database id for this store

  def render(dbId: Long, serial: Long): String = f"$dbId%016x$serial%016x"
  def render(serial: Long): String = render(LocalDb, serial)

  def parse(s: String): Option[(Long, Long)] = {
    val t = s.trim.toLowerCase
    // ASCII hex ONLY — Character.isDigit admits Unicode decimal digits
    // (Arabic-Indic etc.), which parseUnsignedLong would then happily
    // decode, accepting malformed "guids"
    if (t.length == 32 &&
        t.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
      Some((java.lang.Long.parseUnsignedLong(t.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(t.substring(16), 16)))
    else None
  }

  /** Parse to local serial; accepts full 32-hex form or a bare decimal
    * serial (convenience for tests/queries).
    *
    * Deliberately serial-space only — the DATABASE half is not checked
    * against LocalDb here: the session-replay harness parses
    * reference-form guids (the reference server's own db id) before
    * translating serials into engine id space, so the parser must
    * extract serials from any db. A deployment serving multiple
    * databases would check `parse(s).exists(_._1 == LocalDb)` at its
    * boundary.
    */
  def serialOf(s: String): Option[Long] =
    parse(s).map(_._2).orElse(scala.util.Try(s.trim.toLong).toOption)
}

/** Timestamp codec — reference wire form `YYYY-MM-DDTHH:MM:SS.nnnnZ`
  * with partial forms filled with minimums (doc/gr-protocol.txt:566-579,
  * graphd/graphd-timestamp.c). Encoded as micros since epoch.
  */
object GTimestamp {
  private val partRe =
    raw"(\d{4})(?:-(\d{1,2}))?(?:-(\d{1,2}))?(?:[tT](\d{1,2}))?(?::(\d{1,2}))?(?::(\d{1,2}))?(?:\.(\d{1,6}))?[zZ]?".r

  def parse(s: String): Option[Long] = s.trim match {
    case partRe(y, mo, d, h, mi, se, frac) =>
      try {
        val ldt = java.time.LocalDateTime.of(
          y.toInt,
          Option(mo).map(_.toInt).getOrElse(1),
          Option(d).map(_.toInt).getOrElse(1),
          Option(h).map(_.toInt).getOrElse(0),
          Option(mi).map(_.toInt).getOrElse(0),
          Option(se).map(_.toInt).getOrElse(0))
        val micros = Option(frac)
          .map(f => (f + "0" * (6 - f.length)).toLong).getOrElse(0L)
        Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + micros)
      } catch { case _: java.time.DateTimeException => None }
    case _ => None
  }

  def render(micros: Long): String = {
    val i = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    val ldt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
    f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f"T${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d" +
      (if (ldt.getNano % 100000 == 0) f".${ldt.getNano / 100000}%04dZ" // reference .nnnn wire form
       else f".${ldt.getNano / 1000}%06dZ") // sub-100µs precision: 6 digits so render∘parse is lossless
  }
}
