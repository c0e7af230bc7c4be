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
  * The `isa:` family is emitted too (isaToken below): its sampled cost
  * ledger (`:34:16:4091:` — graphd-iterator-isa.c:3600-3700) is the
  * hand-rolled adaptive cost model this engine deliberately does not
  * carry at EXECUTION time (AQE replaces it, SURVEY §4), but the freeze
  * bytes are reproducible — first mints derive the sample from the
  * reference's own formulas (isa_statistics_complete), and resumes pass
  * the incoming token's ledger through opaquely, exactly as the
  * reference thaws it from the wire.
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

  // ---- isa: freeze (graphd-iterator-isa.c:3589-3710) ----------------

  /** pdb cost constants (libpdb/pdb.h:362-370) */
  val CostGmapElement = 2L
  val CostGmapArray = 10L
  val CostHmapElement = 3L
  val CostHmapArray = 11L
  val CostFunctionCall = 1L
  val CostPrimitive = CostHmapArray + 1 // 12

  private def bits(x0: Long): Int = {
    var x = x0; var b = 0
    while (x != 0) { x >>= 1; b += 1 }
    b
  }

  /** Prefix-iterator sampled statistics, frozen as `[st:n:nc:fc]`
    * (graphd-iterator-prefix.c:771-779). The prefix expands to an OR
    * of word-hmap branches — one per distinct 5-char word class among
    * the matching words (pdb packs 5 chars x 5 bits into the word
    * hash, libpdb/pdb-word.c:440-452) — and the or-statistics total
    * exactly (graphd-iterator-or.c:558-585): n = sum of branch posting
    * counts, nc = total_nc/total_n with every hmap branch's nc =
    * FUNCTION_CALL + HMAP_ELEMENT (pdb-iterator-hmap.c:913), fc = sum
    * of branch bsearch costs 1 + HMAP_ARRAY + HMAP_ELEMENT*bits(n_b)
    * (pdb-iterator.c:147-157). Validated byte-for-byte against isa.sh:
    * classes 31, n 4092, nc 4, fc 1116.
    */
  final case class PrefixStats(n: Long, nc: Long, fc: Long) {
    def st: String = s"[st:$n:$nc:$fc]"
    /** prefix check cost: PDB_COST_PRIMITIVE + 10
      * (graphd-iterator-prefix.c:591)
      */
    def cc: Long = CostPrimitive + 10
  }

  def prefixStats(classCounts: Seq[Long]): PrefixStats = {
    val n = classCounts.sum
    val totalNc = classCounts.map(_ * (CostFunctionCall + CostHmapElement)).sum
    val nc = if (n == 0) totalNc else totalNc / n
    val fc = classCounts.map(c =>
      CostFunctionCall + CostHmapArray + CostHmapElement * bits(c)).sum
    PrefixStats(n, nc, fc)
  }

  /** isa-iterator sampled statistics (isa_statistics_complete,
    * graphd-iterator-isa.c:2280-2372), frozen as `CC:NC:N`
    * (pdb_iterator_freeze_statistics, libpdb/pdb-iterator.c:889-905):
    *  - n: the sub's n scaled by the shared id spread, divided by the
    *    sampled loss (trials per accepted result over the first 5);
    *  - nc: cost of producing+reading all sub values amortized per
    *    result;
    *  - cc: GMAP_ARRAY + GMAP_ELEMENT + the sub's check cost.
    */
  final case class IsaStats(cc: Long, nc: Long, n: Long) {
    def frozen: String = s"$cc:$nc:$n"
  }

  def isaStats(isaLo: Long, isaHi: Long, subLo: Long, subHi: Long,
      sub: PrefixStats, trials: Long, accepted: Long): IsaStats = {
    val maxLow = math.max(isaLo, subLo)
    val subSpread = math.max(subHi - maxLow, 1L)
    val isaSpread = math.max(isaHi - maxLow, 1L)
    val sharedSpread = math.min(subSpread, isaSpread)
    val cookedSubN =
      math.min(math.min(sub.n, subSpread) * sharedSpread / subSpread,
        sharedSpread)
    val loss = if (accepted == 0) 1.0 else trials.toDouble / accepted
    val n = math.max(
      if (cookedSubN >= loss) (cookedSubN / loss).toLong else 1L, 5L)
    val nc = math.min(sub.n, subSpread) * (sub.nc + CostPrimitive) / n +
      n / 8000
    IsaStats(CostGmapArray + CostGmapElement + sub.cc, nc, n)
  }

  /** Top-level `isa:` freeze: SET/POSITION/STATE
    * (graphd-iterator-isa.c:3589-3710) —
    * `isa:LO-HI:L<-(SUB)/LAST:~-[sp:SP]/0:(-/[st:..])-:CC:NC:N:-:[sd:(SUB/SDPOS/[st:..])@RES]`.
    * Position: last returned endpoint, `~` = sub holds no position,
    * `-` = no sub source. State: call state 0, the frozen sub
    * (position -, its [st:..] stats), no fanin, the isa stats, no
    * next-tmp, and the storable duplicate-check sub (the statistics
    * clone, parked at the sub id the 5-sample trial stopped at) under
    * its resource stamp.
    */
  def isaToken(isaLo: Long, isaHi: Long, linkChar: Char, sub: It,
      subSt: PrefixStats, lastSerial: Long, sp: Long, stats: IsaStats,
      sdPos: Long, res: String): String =
    s"isa:$isaLo-$isaHi:$linkChar<-(${sub.set})" +
      s"/$lastSerial:~-[sp:$sp]" +
      s"/0:(-/${subSt.st})-:${stats.frozen}:-:" +
      s"[sd:(${sub.set}/$sdPos/${subSt.st})@$res]"
}
