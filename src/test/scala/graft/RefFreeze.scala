package graft

/** Byte-exact emission of the reference's COMPOSITE iterator freeze
  * strings for the states this engine carries — the `and:` / `or:` /
  * masqueraded `fixed:(...)` cursor families minted by
  * graphd-iterator-and-freeze.c:658-770, graphd-iterator-or.c:1553-1599
  * (with the linksto masquerade of graphd-iterator-linksto.c:3610), and
  * graphd-iterator-fixed.c:545-560 (with the isa masquerade of
  * graphd-iterator-isa.c:724-760). Validated byte-for-byte against the
  * slip / isa / colors3 golden sessions.
  *
  * Everything here is in REFERENCE SERIAL space (engine id - 1).
  * Bounds follow the reference's idarray clamp: an index iterator spans
  * [first posting, last posting + 1).
  *
  * The one composite family NOT emitted is the `isa:` iterator, whose
  * freeze embeds sampled cost statistics (`[st:n:cc:nc]`, the
  * `:34:16:4091:` budget ledger — graphd-iterator-isa.c:3600-3700):
  * that is the hand-rolled adaptive cost model this engine deliberately
  * does not carry (AQE replaces it, SURVEY §4), so isa cursors resume
  * exactly but re-freeze in engine form.
  */
object RefFreeze {

  /** graphd's predictable-mode resource stamps
    * (graphd-iterator-resource.c:198-205): pid 0x0123 + clock
    * 0x456789AB + a counter starting at 1. Ids dedup by STORABLE
    * content (graphd_iterator_resource_storable_lookup hashes the
    * object and reuses the existing stamp on equality) — a
    * position-independent cache re-freezes under its old id, a
    * position-bearing state allocates fresh.
    */
  final class Resources {
    private val ids = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    private var next = 1L
    def idFor(content: String): Long =
      ids.getOrElseUpdate(content, { val v = next; next += 1; v })
    def stamp(content: String): String = "0123456789ab" + idFor(content)
  }

  /** pdb_case_insensitive_hash (libpdb/pdb-hash.c:54-71): h*33+tolower,
    * masked to 34 bits — the hash printed inside hmap freezes.
    */
  def hmapHash(key: String): Long = {
    var h = 0L
    key.foreach { c0 =>
      val c = if (c0 < 128) Character.toLowerCase(c0) else c0
      h = h * 33 + c
    }
    h & ((1L << 34) - 1)
  }

  /** SET-freeze of the simple iterators that appear as subiterators of
    * the composite freezes. `lo`/`hi` are the iterator's natural
    * posting bounds; composites re-render subs under narrowed bounds.
    */
  sealed trait It {
    def lo: Long
    def hi: Long
    def set(lo: Long, hi: Long): String
    final def set: String = set(lo, hi)
  }

  /** gmap:LOW-HIGH:L->SOURCE (pdb-iterator-gmap.c:349-360) */
  final case class Gmap(lo: Long, hi: Long, linkChar: Char, source: Long)
      extends It {
    def set(l: Long, h: Long): String = s"gmap:$l-$h:$linkChar->$source"
  }

  /** hmap:LOW-HIGH:MAP:TYPE:HASH:KEY (pdb-iterator-hmap.c:153-172) */
  final case class Hmap(lo: Long, hi: Long, map: String, typ: String,
      key: String) extends It {
    def set(l: Long, h: Long): String =
      s"hmap:$l-$h:$map:$typ:${hmapHash(key)}:$key"
  }

  /** prefix:LOW-HIGH:PREFIX (graphd-iterator-prefix.c:739-752) */
  final case class Prefix(lo: Long, hi: Long, prefix: String) extends It {
    def set(l: Long, h: Long): String = s"prefix:$l-$h:$prefix"
  }

  /** The or-masqueraded linksto (graphd-iterator-linksto.c:3610-3654):
    * `or:(or-linksto:+LOW-HIGH:L->(SUB))` — the OR's skeleton is
    * regenerated from the linksto recipe on thaw.
    */
  final case class OrLinksto(lo: Long, hi: Long, linkChar: Char, sub: It)
      extends It {
    def set(l: Long, h: Long): String =
      s"or:(or-linksto:+$l-$h:$linkChar->(${sub.set}))"
  }

  /** vip:LOW-HIGH:L+TYPEGUID->SOURCE (graphd-iterator-vip.c:228-241) */
  final case class Vip(lo: Long, hi: Long, linkChar: Char, typeHex: String,
      source: Long) extends It {
    def set(l: Long, h: Long): String =
      s"vip:$l-$h:$linkChar+$typeHex->$source"
  }

  /** The isa-masqueraded fixed set (graphd-iterator-isa.c:657-720 via
    * isa_set_fixed_masquerade): `fixed-isa:LOW-HIGH:L<-(SUB)[hint:N]`.
    * `[hint:0]` is printed because the collapsed iterator's hint (0,
    * none) differs from GRAPHD_ITERATOR_ISA_HINT_DEFAULT.
    */
  final case class FixedIsa(lo: Long, hi: Long, linkChar: Char, sub: It) {
    def masquerade: String = s"fixed-isa:$lo-$hi:$linkChar<-(${sub.set})[hint:0]"
  }

  /** Top-level `and:` freeze (graphd-iterator-and-freeze.c:658-770):
    * `and:#LOW-HIGH:N:[psz:P][ov:0](SUB1)(SUB2)[pro:0]/POS[pp:PP]/@RES`.
    * Direction is '#' (unordered, graphd_iterator_direction_to_char),
    * bounds are the intersection of the subiterators', subs re-render
    * inside those bounds, [psz:] appears only on a fresh freeze (the
    * context pagesize isn't revalidated after a thaw), [ov:0] is the
    * first freeze of this original, [pro:0] marks the settled producer,
    * and [pp:] carries the producer's own position when the producer
    * iterator type tracks one (the gmap offset).
    */
  def andToken(subs: Seq[It], pagesize: Option[Long], pos: Long,
      producerPos: Option[Long], res: String): String = {
    val lo = subs.map(_.lo).max
    val hi = subs.map(_.hi).min
    val body = new StringBuilder
    body.append(s"and:#$lo-$hi:${subs.length}:")
    pagesize.foreach(p => body.append(s"[psz:$p]"))
    body.append("[ov:0]")
    subs.foreach(s => body.append("(").append(s.set(math.max(s.lo, lo),
      math.min(s.hi, hi))).append(")"))
    body.append("[pro:0]")
    body.append(s"/$pos")
    producerPos.foreach(pp => body.append(s"[pp:$pp]"))
    body.append(s"/@$res")
    body.toString
  }

  /** Top-level `or:` freeze (graphd-iterator-or.c:1553-1599 with the
    * linksto masquerade): `or:(...)/POS/@RES`.
    */
  def orToken(or: OrLinksto, pos: Long, res: String): String =
    s"${or.set}/$pos/@$res"

  /** Top-level masqueraded `fixed:` freeze
    * (graphd-iterator-fixed.c:545-609): `fixed:(MASQ)/I/[cache:@RES]` —
    * position is the INDEX into the fixed array (fix_i), and the
    * expanded id list lives server-side as the cache resource.
    */
  def fixedIsaToken(fi: FixedIsa, consumed: Long, res: String): String =
    s"fixed:(${fi.masquerade})/$consumed/[cache:@$res]"
}
