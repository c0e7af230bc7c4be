package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala semantics of the reference's comparator vtable
  * (graphd/graphd.h:859-996) — sort keys, word segmentation and `~=`
  * matching. Kept free of Spark types so it can be property-tested
  * directly; the Catalyst wrappers live in Expressions.scala.
  *
  * Semantics re-expressed from:
  *  - default comparator: case-insensitive, word-aware, embedded-number
  *    normalization ("x9" < "x10"), punctuation elision for matching
  *    (graphd/graphd-comparator-default.c:57-88)
  *  - word segmentation: alnum runs, numbers normalized
  *    (libpdb/pdb-word.c:20-60)
  *  - number comparator: sign/int/fraction-aware decimal-string compare
  *    (graphd/graphd-comparator-number.c:547)
  *  - datetime comparator (graphd/graphd-comparator-datetime.c:856)
  *  - octet = raw byte compare, case = folded compare
  *    (graphd-comparator-octet.c:551, -case.c:433)
  */
object GraphdText {

  // ---------- word segmentation ----------

  /** Split into lowercase words: runs of letters or runs of digits.
    * Punctuation and whitespace separate words and are dropped —
    * "foo-bar" tokenizes like "foo bar" (libpdb/pdb-word.c).
    */
  def words(s: String): Seq[String] = {
    if (s == null) return Nil
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isDigit(c)) {
        val j = i
        while (i < n && Character.isDigit(s.charAt(i))) i += 1
        out += normNumber(s.substring(j, i))
      } else if (Character.isLetter(c)) {
        val j = i
        while (i < n && Character.isLetter(s.charAt(i))) i += 1
        out += s.substring(j, i).toLowerCase
      } else i += 1
    }
    out.toSeq
  }

  /** strip leading zeros so "007" and "7" are the same word */
  private def normNumber(d: String): String = {
    val t = d.dropWhile(_ == '0')
    if (t.isEmpty) "0" else t
  }

  /** does a NONZERO decimal fraction follow the digit run at `j`?
    * ("-0.5" keeps its sign; "-0.0" and "-0" are zero)
    */
  private def fractionFollows(s: String, j: Int): Boolean = {
    var i = j
    val n = s.length
    while (i < n && Character.isDigit(s.charAt(i))) i += 1
    if (i >= n || s.charAt(i) != '.') return false
    i += 1
    var nonzero = false
    var any = false
    while (i < n && Character.isDigit(s.charAt(i))) {
      any = true
      if (s.charAt(i) != '0') nonzero = true
      i += 1
    }
    any && nonzero
  }

  // ---------- sort keys ----------

  /** Default-comparator collation key: lowercase; whitespace runs
    * collapse to one space ("A  B" equals "A B" but not "AB" --
    * test/unit/spacematch golden); each embedded integer run becomes
    * (marker, zero-padded length, digits) so numeric order is
    * lexicographic ("x9" < "x10"); a digit run directly after
    * `<digits>.` is a decimal FRACTION -- trailing zeros stripped,
    * digits compared positionally -- so "42.5" equals "42.5000" and
    * sorts below "42.500000000000001" (test/unit/compare golden).
    */
  def defaultSortKey(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    val n = s.length
    var prevIntRun = false // last emitted token was an integer run
    while (i < n) {
      val c = s.charAt(i)
      // '-' directly before digits, not itself preceded by an
      // alphanumeric, signs the number: "-9998" < "2008", while the
      // '-' inside "2008-05-03" stays plain punctuation (reference
      // datetime.sh r20: default-comparator value>"2008" excludes
      // negative-year strings). '+' in the same position is an
      // ignorable sign ("+0" = "0"), and "-0" is zero, not negative
      // (test/unit/value.sh zero grouping).
      val atSign = isSignCh(c) && i + 1 < n && Character.isDigit(s.charAt(i + 1)) &&
        (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)))
      val signedNeg = atSign && c == '-' &&
        // negative zero is zero unless a nonzero fraction follows
        !(s.substring(i + 1).takeWhile(Character.isDigit).forall(_ == '0') &&
          !fractionFollows(s, i + 1))
      if (atSign || Character.isDigit(c)) {
        if (atSign) i += 1
        val j = i
        while (i < n && Character.isDigit(s.charAt(i))) i += 1
        val digits = s.substring(j, i)
        val isFraction = !signedNeg && prevIntRun && j >= 1 && s.charAt(j - 1) == '.'
        if (isFraction) {
          // fraction digits: strip trailing zeros, positional compare
          sb.append(digits.reverse.dropWhile(_ == '0').reverse)
          prevIntRun = false
        } else {
          val d = normNumber(digits)
          if (signedNeg) {
            // 0x00 marker sorts negatives before positives; length and
            // digits nines-complemented so bigger magnitude = earlier
            sb.append('\u0000').append(f"${0xffff - d.length}%04x")
              .append(d.map(ch => ('9' - ch + '0').toChar))
            prevIntRun = false // negative decimals: fraction rule n/a
          } else {
            // 0x01 marker sorts digit runs before letters; 4-hex length
            // prefix makes longer (= larger) numbers sort after shorter.
            sb.append('\u0001').append(f"${d.length}%04x").append(d)
            prevIntRun = true
          }
        }
      } else if (Character.isWhitespace(c)) {
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        sb.append(' ')
        prevIntRun = false
      } else if (c == '.' && !prevIntRun && i + 1 < n &&
          Character.isDigit(s.charAt(i + 1)) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)))) {
        // fraction-only decimal at a word boundary: ".5" is the number
        // 0.5 (the word scanner's number rule), and ".0" IS "0" —
        // value.sh golden: value>="foo .0" includes "foo +0"/"foo -0"
        val allZero = s.substring(i + 1).takeWhile(Character.isDigit).forall(_ == '0')
        sb.append('\u0001').append(f"${1}%04x").append('0')
        if (allZero) {
          i += 1
          while (i < n && Character.isDigit(s.charAt(i))) i += 1
          prevIntRun = false
        } else {
          // leave '.' for the regular decimal-point path
          prevIntRun = true
        }
      } else {
        // '.' between an int run and digits is the decimal point: keep
        // prevIntRun so the next run reads as a fraction
        if (!(c == '.' && prevIntRun && i + 1 < n &&
            Character.isDigit(s.charAt(i + 1)))) prevIntRun = false
        sb.append(Character.toLowerCase(c))
        i += 1
      }
    }
    sb.toString
  }

  /** Number-comparator key: decimal strings ordered numerically.
    * Layout: sign section ('1' for >=0, '0' for <0) + 4-hex
    * integer-digit-count prefix (more digits = larger magnitude, so the
    * count field orders before digit compare — handles exponents up to
    * 0xffff digits) + integer digits + '.' + fraction
    * (count and digits complemented for negatives so bigger magnitude
    * sorts earlier). Non-numeric strings get a '~' prefix (sort after
    * all numbers) and fall back to raw.
    */
  def numberSortKey(s: String): String = {
    if (s == null) return null
    val m = NumberRe.findPrefixMatchOf(s)
    m match {
      case Some(mm) if mm.matched.length == s.length &&
          (Option(mm.group(2)).exists(_.nonEmpty) ||
            Option(mm.group(3)).exists(_.nonEmpty)) =>
        val intRaw = Option(mm.group(2)).getOrElse("")
        val fracRaw = Option(mm.group(3)).getOrElse("")
        // exponents can be astronomically long ("2e-123123123123…",
        // david_10) — clamp: beyond ±20000 the digit-count field
        // saturates anyway and materializing the zeros would be O(exp)
        val exp = Option(mm.group(4))
          .map(e => BigInt(e).max(-20000).min(20000).toInt).getOrElse(0)
        // shift the decimal point by the exponent over the raw digit
        // string — ".1e1", "1.e0", "10e-1" all land on the digits of 1
        // (numberequal golden)
        val digits = intRaw + fracRaw
        val point = intRaw.length + exp
        val intDigits =
          if (point <= 0) "0"
          else if (point >= digits.length) digits + "0" * (point - digits.length)
          else digits.take(point)
        val fracDigits0 =
          if (point >= digits.length) ""
          else if (point <= 0) "0" * (-point) + digits
          else digits.drop(point)
        val intPart = {
          val t = intDigits.dropWhile(_ == '0')
          if (t.isEmpty) "0" else t
        }
        // strip trailing zeros: "50.0" must key equal to "50"
        val frac = fracDigits0.reverse.dropWhile(_ == '0').reverse
        // negative zero IS zero ("-0", "-.0", "-0.e2" all equal "0")
        val neg = mm.group(1) == "-" && !(intPart == "0" && frac.isEmpty)
        // zero keys as count 0 so 0 < any positive with >=1 int digits
        val intLen = if (intPart == "0" && frac.isEmpty) 0
          else if (intPart == "0") 1 else intPart.length
        val body = intPart + "." + frac
        if (!neg) "1" + f"$intLen%04x" + body
        // complement the count and nines-complement digits; trailing
        // high sentinel makes a shorter fraction sort AFTER a longer
        // one (-1 > -1.5)
        else "0" + f"${0xffff - intLen}%04x" +
          body.map(ch => if (ch.isDigit) ('9' - ch + '0').toChar else ch) + "~"
      case _ => "~" + s
    }
  }
  private val NumberRe = raw"([+-]?)(\d*)(?:\.(\d*))?(?:[eE]([+-]?\d+))?".r

  /** Datetime-comparator key (graphd-comparator-datetime.c semantics,
    * golden: test/unit/datetime.sh): purely lexical — no epoch math, so
    * years -9999..9999 all work.
    *  - negative years order by timeline: bigger magnitude = earlier,
    *    and month/day/time complement within a negative year
    *    ("-0574-10-01" sorts before "-0574-05-10")
    *  - a less specific form sorts immediately BEFORE its minimum
    *    completion ("2008" < "2008-01-01"), which also makes equality
    *    exact per field count (value="2008" does not match
    *    "2008-01-01" — reference r1/r16 behavior)
    *  - time-only forms ("T12:44") sort after ALL dates
    *  - anything else sorts after times ('~' bucket)
    */
  def datetimeSortKey(s: String): String = {
    if (s == null) return null
    val t = s.trim
    // hand-rolled scan (this key sorts hot paths; a regex here costs
    // ~2x on a 150k-row sort)
    val n = t.length
    var i = 0
    def digits(max: Int): Int = {
      // parses 1..max digits at i; -1 if none
      var v = 0; var k = 0
      while (i < n && k < max && Character.isDigit(t.charAt(i))) {
        v = v * 10 + (t.charAt(i) - '0'); i += 1; k += 1
      }
      if (k == 0) -1 else v
    }
    def eat(c: Char): Boolean =
      if (i < n && t.charAt(i) == c) { i += 1; true } else false
    def fracDigits(): String = {
      val j = i
      while (i < n && Character.isDigit(t.charAt(i)) && i - j < 6) i += 1
      t.substring(j, i)
    }
    def atEnd: Boolean = { if (i < n && (t.charAt(i) == 'z' || t.charAt(i) == 'Z')) i += 1; i == n }

    def timeFields(neg: Boolean, sb: StringBuilder): Boolean = {
      // [Thh[:mm[:ss[.ffffff]]]] — appends encoded h/mi/se/frac
      var h = -1; var mi = -1; var se = -1; var fr = ""
      if (i < n && (t.charAt(i) == 't' || t.charAt(i) == 'T')) {
        i += 1
        h = digits(2); if (h < 0) return false
        if (eat(':')) { mi = digits(2); if (mi < 0) return false
          if (eat(':')) { se = digits(2); if (se < 0) return false
            if (eat('.')) { fr = fracDigits(); if (fr.isEmpty) return false }
          }
        }
      }
      def app(v: Int): Unit = {
        val enc = if (v < 0) 0 else v + 1
        val e = if (neg) 99 - enc else enc
        sb.append((e / 10 + '0').toChar).append((e % 10 + '0').toChar)
      }
      app(h); app(mi); app(se)
      val frac = fr + "0" * (6 - fr.length)
      sb.append(if (neg) frac.map(c => ('9' - c + '0').toChar) else frac)
      true
    }

    // time-only form
    if (i < n && (t.charAt(i) == 't' || t.charAt(i) == 'T')) {
      val sb = new StringBuilder("d2")
      // reuse timeFields for the h/mi/se/frac block (h required)
      if (timeFields(neg = false, sb) && sb.length > 2 && atEnd &&
          sb.substring(2, 4) != "00") return sb.toString
      return "~" + t
    }
    val neg = eat('-')
    val y = digits(4)
    if (y < 0) return "~" + t
    val sb = new StringBuilder("d1")
    val yy = if (neg) 10000 - y else y + 10000
    sb.append(f"$yy%05d")
    var mo = -1; var d = -1
    if (eat('-')) { mo = digits(2); if (mo < 0) return "~" + t
      if (eat('-')) { d = digits(2); if (d < 0) return "~" + t }
    }
    def app(v: Int): Unit = {
      val enc = if (v < 0) 0 else v + 1
      val e = if (neg) 99 - enc else enc
      sb.append((e / 10 + '0').toChar).append((e % 10 + '0').toChar)
    }
    app(mo); app(d)
    if (!timeFields(neg, sb)) return "~" + t
    if (!atEnd) return "~" + t
    sb.toString
  }


  /** optional field encoding: absent=00 (sorts before any present
    * value), present = v+1; complemented for negative years so larger
    * fields sort earlier (and absent sorts after any present value).
    */
  private def fld(v: String, neg: Boolean): String = {
    val enc = if (v == null) 0 else v.toInt + 1
    f"${if (neg) 99 - enc else enc}%02d"
  }

  private val DateTimeRe =
    raw"(-?)(\d{1,4})(?:-(\d{1,2}))?(?:-(\d{1,2}))?(?:[tT](\d{1,2})(?::(\d{1,2}))?(?::(\d{1,2}))?(?:\.(\d{1,6}))?)?[zZ]?".r
  private val TimeOnlyRe =
    raw"[tT](\d{1,2})(?::(\d{1,2}))?(?::(\d{1,2}))?(?:\.(\d{1,6}))?[zZ]?".r

  def caseSortKey(s: String): String = if (s == null) null else s.toLowerCase

  def sortKey(comparator: String, s: String): String = comparator match {
    case "number" => numberSortKey(s)
    case "datetime" => datetimeSortKey(s)
    case "octet" => s
    case "case-insensitive" | "case" => caseSortKey(s)
    case _ => defaultSortKey(s)
  }

  // ---------- ~= matching ----------
  // Faithful rebuild of the reference's default-comparator glob engine
  // (graphd/graphd-comparator-default.c:87-560 glob_match / glob_step /
  // number_match, over libpdb/pdb-word.c:625 word fragments):
  // case-insensitive whole-word matching over the RAW value text with
  // `*` wildcards, `^`/`$` anchors, `\x` literal-adjacency escapes,
  // punctuation elision, and number-aware words — a numeric pattern
  // word matches a value number as written or after normalization
  // ("7" matches "007" and "7.0" but not "7x" or "0.7"; ".0" matches
  // only a literal ".0" — test/unit/value.sh golden).

  private def isWordCh(c: Char): Boolean = c >= 0x80 || Character.isLetterOrDigit(c)
  private def isSpaceCh(c: Char): Boolean =
    c < 0x80 && (c == ' ' || (c >= '\t' && c <= '\r'))
  // the comparator's punctuation class: any ASCII non-word non-space
  private def isCmpPunct(c: Char): Boolean =
    c < 0x80 && !Character.isLetterOrDigit(c) && !isSpaceCh(c)
  // the word scanner's (printable) punctuation class
  private def isPdbPunct(c: Char): Boolean =
    c > ' ' && c < 0x7f && !Character.isLetterOrDigit(c)
  private def isDigitCh(c: Char): Boolean = c < 0x80 && Character.isDigit(c)
  private def isSignCh(c: Char): Boolean = c == '+' || c == '-'
  private def isNumWordCh(c: Char): Boolean = isWordCh(c) || c == '.' || isSignCh(c)
  private def isBreakCh(c: Char): Boolean =
    isSpaceCh(c) || (isPdbPunct(c) && c != '-' && c != '+')
  private def chEq(a: Char, b: Char): Boolean =
    (if (a < 0x80) Character.toLowerCase(a) else a) ==
      (if (b < 0x80) Character.toLowerCase(b) else b)

  private[graft] final val FragNumber = 0
  private[graft] final val FragAtom = 1
  private[graft] final val FragSpace = 2
  private[graft] final val FragPunct = 3

  /** next word fragment of `s` at `from`: (start, end, kind). A number
    * is [sign] digits [. digits] bounded by non-word characters; a
    * sign counts only at the start of text or after a break, and
    * dotted hierarchies (1.2.3) split one segment at a time
    * (libpdb/pdb-word.c:625 pdb_word_fragment_next).
    */
  private[graft] def fragmentNext(s: String, from: Int): Option[(Int, Int, Int)] = {
    val e = s.length
    if (from >= e) return None
    var r = from
    if (isSignCh(s.charAt(r)) && (r == 0 || isBreakCh(s.charAt(r - 1)))) r += 1
    val preS = r
    while (r < e && isDigitCh(s.charAt(r))) r += 1
    val preE = r
    if ((preS == 0 || s.charAt(preS - 1) != '.') &&
        (preS < preE || r == 0 || !isDigitCh(s.charAt(r - 1))) &&
        r < e && s.charAt(r) == '.') {
      r += 1
      val postS = r
      while (r < e && isDigitCh(s.charAt(r))) r += 1
      val postE = r
      if ((r >= e || !isWordCh(s.charAt(r))) && (postE > postS || preE > preS)) {
        if (r >= e || s.charAt(r) != '.') return Some((from, r, FragNumber))
        if (preS < preE) return Some((from, preE, FragNumber))
        return Some((from, postS, FragPunct))
      }
    }
    if (preS < preE && (preE == e || !isWordCh(s.charAt(preE))))
      return Some((from, preE, FragNumber))
    r = from
    if (isWordCh(s.charAt(r))) {
      r += 1
      while (r < e && isWordCh(s.charAt(r))) r += 1
      Some((from, r, FragAtom))
    } else if (isSpaceCh(s.charAt(r))) {
      r += 1
      while (r < e && isSpaceCh(s.charAt(r))) r += 1
      Some((from, r, FragSpace))
    } else {
      r += 1
      while (r < e && isPdbPunct(s.charAt(r)) &&
          !(isSignCh(s.charAt(r)) && isBreakCh(s.charAt(r - 1)))) r += 1
      Some((from, r, FragPunct))
    }
  }

  /** number normalization (libpdb/pdb-word.c:782): drop '+', -0 is 0,
    * strip leading integer zeros and trailing fraction zeros, drop a
    * bare trailing point, ".15" becomes "0.15"
    */
  private[graft] def normalizeNumber(t: String): String = {
    var i = 0
    var sign = ""
    if (i < t.length && isSignCh(t.charAt(i))) {
      if (t.charAt(i) == '-') sign = "-"
      i += 1
    }
    val dot = t.indexOf('.', i)
    var intP = if (dot >= 0) t.substring(i, dot) else t.substring(i)
    var frac = if (dot >= 0) t.substring(dot + 1) else ""
    frac = frac.reverse.dropWhile(_ == '0').reverse
    intP = { val x = intP.dropWhile(_ == '0'); if (x.isEmpty) "0" else x }
    if (intP == "0" && frac.isEmpty) sign = ""
    if (frac.isEmpty) sign + intP else sign + intP + "." + frac
  }

  private def onlyZerosStars(p: String, s: Int, e: Int): Boolean = {
    var i = s
    while (i < e) {
      if (p.charAt(i) != '0' && p.charAt(i) != '*') return false
      i += 1
    }
    true
  }

  private def allStars(p: String, s: Int, e: Int): Boolean = {
    if (s >= e) return false
    var i = s
    while (i < e) { if (p.charAt(i) != '*') return false; i += 1 }
    true
  }

  /** match a numeric pattern word against one number's text
    * (graphd-comparator-default.c:187): a leading '+' demands a
    * non-negative number, pattern leading zeros are ignored, '*' skips
    * sign/digit runs without crossing the decimal point, everything
    * else compares case-insensitively; a trailing ".000"/".0*" in the
    * pattern may match a fraction-less number.
    */
  private def numberMatch(pat: String, ps0: Int, pe: Int,
      txt: String, ts: Int, r0: Int, e: Int): Boolean = {
    var ps = ps0
    var r = r0
    var inWord = false
    if (ps < pe && pat.charAt(ps) == '+') {
      if (r < e && txt.charAt(r) == '-') return false
      if (r < e && txt.charAt(r) == '+') r += 1
      ps += 1
    }
    while (pe - ps >= 2 && pat.charAt(ps) == '0' && isDigitCh(pat.charAt(ps + 1))) ps += 1
    while (true) {
      if (ps >= pe || isSpaceCh(pat.charAt(ps))) {
        if (inWord) {
          if (r < e && isNumWordCh(txt.charAt(r))) return false
          inWord = false
        }
        if (ps >= pe) return true
        ps += 1
      } else if (pat.charAt(ps) == '$' && ps + 1 == pe) {
        while (r < e && !isNumWordCh(txt.charAt(r))) r += 1
        return r >= e
      } else if (pat.charAt(ps) == '*') {
        while (ps < pe && pat.charAt(ps) == '*') ps += 1
        if (!inWord) {
          while (r < e && !isNumWordCh(txt.charAt(r))) r += 1
          if (r >= e) return false
          inWord = true
        }
        if (ps >= pe || (pat.charAt(ps) != '\\' && !isNumWordCh(pat.charAt(ps)))) {
          while (r < e && isNumWordCh(txt.charAt(r)) && txt.charAt(r) != '.') r += 1
          inWord = false
        } else {
          var ch = 'a'
          if (pe - ps >= 2 && pat.charAt(ps) == '\\') ch = pat.charAt(ps + 1)
          var hit = false
          while (!hit && r < e && (txt.charAt(r) == ch ||
              (isNumWordCh(txt.charAt(r)) && txt.charAt(r) != '.'))) {
            if (numberMatch(pat, ps, pe, txt, ts, r, e)) hit = true else r += 1
          }
          if (hit) return true
          // no split matched: fall through with the pattern parked
          // after the asterisks and r at the stop position
        }
      } else if (ps + 1 < pe && pat.charAt(ps) == '\\') {
        ps += 1
        if (!inWord) {
          while (r < e && !isNumWordCh(txt.charAt(r)) && txt.charAt(r) != pat.charAt(ps)) r += 1
          inWord = true
        }
        if (r < e && txt.charAt(r) == pat.charAt(ps)) { ps += 1; r += 1 }
        else return false
      } else if (isCmpPunct(pat.charAt(ps)) && !isNumWordCh(pat.charAt(ps))) {
        if (inWord && (r >= e || !isWordCh(txt.charAt(r)))) inWord = false
        ps += 1
      } else {
        if (!inWord) {
          while (r < e && !isNumWordCh(txt.charAt(r)) && txt.charAt(r) != pat.charAt(ps)) r += 1
          inWord = true
        }
        var run = true
        while (run && ps < pe && isNumWordCh(pat.charAt(ps))) {
          if (r >= e && pat.charAt(ps) == '.' &&
              onlyZerosStars(pat, ps + 1, pe) && {
                val di = txt.indexOf('.', ts); di < 0 || di >= e
              }) return true
          if (r >= e || !chEq(txt.charAt(r), pat.charAt(ps))) return false
          ps += 1
          r += 1
          run = ps < pe && isNumWordCh(pat.charAt(ps))
        }
      }
    }
    false
  }

  /** one alignment attempt of the full pattern from (pr0, r0)
    * (graphd-comparator-default.c:327 glob_step)
    */
  private def globStep(shadow: String, pat: String, pr0: Int,
      txt: String, r0: Int): Boolean = {
    val pe = pat.length
    val e = txt.length
    var pr = pr0
    var r = r0
    var inWord = false
    while (true) {
      if (pr >= pe || isSpaceCh(pat.charAt(pr))) {
        if (inWord) {
          if (r < e && isWordCh(txt.charAt(r))) return false
          inWord = false
        }
        if (pr >= pe) return true
        pr += 1
      } else if (pat.charAt(pr) == '$' && pr + 1 == pe) {
        while (r < e && !isWordCh(txt.charAt(r))) r += 1
        return r >= e
      } else {
        // a numeric pattern word decides against the next value number
        // (raw, then normalized); anything else falls through
        val numVerdict: Int = fragmentNext(shadow, pr) match {
          case Some((pwS, pwE, FragNumber)) =>
            var myR = r
            if (!inWord) while (myR < e && !isNumWordCh(txt.charAt(myR))) myR += 1
            fragmentNext(txt, myR) match {
              case Some((twS, twE, FragNumber)) =>
                val ok = allStars(pat, pwS, pwE) ||
                  numberMatch(pat, pwS, pwE, txt, twS, twS, twE) || {
                    val nrm = normalizeNumber(txt.substring(twS, twE))
                    numberMatch(pat, pwS, pwE, nrm, 0, 0, nrm.length)
                  }
                if (ok) { pr = pwE; r = twE; 1 } else 0
              case _ => -1
            }
          case _ => -1
        }
        if (numVerdict == 0) return false
        else if (numVerdict < 0) {
          if (pat.charAt(pr) == '*') {
            var ch = 'a'
            while (pr < pe && pat.charAt(pr) == '*') pr += 1
            if (pe - pr >= 2 && pat.charAt(pr) == '\\') ch = pat.charAt(pr + 1)
            if (!inWord) {
              while (r < e && !isWordCh(txt.charAt(r)) && txt.charAt(r) != ch) r += 1
              if (r >= e) return false
              inWord = true
            }
            if (pr >= pe || (pat.charAt(pr) != '\\' && !isWordCh(pat.charAt(pr)))) {
              // '*' alone: skip one word
              while (r < e && isWordCh(txt.charAt(r))) r += 1
              inWord = false
            } else {
              // '*' as a word fragment: try every split point
              val rw = r
              while (r < e && ((r == rw && txt.charAt(r) == ch) || isWordCh(txt.charAt(r)))) {
                if (globStep(shadow, pat, pr, txt, r)) return true
                r += 1
              }
              return false
            }
          } else if (pr + 1 < pe && pat.charAt(pr) == '\\') {
            // escaped character: literal, adjacent, case-sensitive
            pr += 1
            if (!inWord) {
              while (r < e && !isWordCh(txt.charAt(r)) && txt.charAt(r) != pat.charAt(pr)) r += 1
              inWord = true
            }
            if (r < e && txt.charAt(r) == pat.charAt(pr)) { pr += 1; r += 1 }
            else return false
          } else if (isCmpPunct(pat.charAt(pr))) {
            // unescaped punctuation: elided word separator
            if (inWord && (r >= e || !isWordCh(txt.charAt(r)))) inWord = false
            pr += 1
          } else {
            // literal word characters
            if (!inWord) {
              while (r < e && !isWordCh(txt.charAt(r)) && txt.charAt(r) != pat.charAt(pr)) r += 1
              inWord = true
            }
            while (pr < pe && isWordCh(pat.charAt(pr))) {
              if (r >= e || !chEq(txt.charAt(r), pat.charAt(pr))) return false
              pr += 1
              r += 1
            }
          }
        }
      }
    }
    false
  }

  /** `value ~= pattern` (graphd-comparator-default.c:483 glob_match) */
  def matches(value: String, pattern: String): Boolean = {
    if (value == null || pattern == null) return false
    val e = value.length
    // the shadow pattern replaces escapes with 'x' and '*' with '0' so
    // the word scanner sees the pattern's fragment structure
    val shadow = {
      val sb = new StringBuilder(pattern.length)
      var i = 0
      var esc = false
      while (i < pattern.length) {
        val c = pattern.charAt(i)
        if (!esc) {
          if (c == '\\') { esc = true; sb.append('x') }
          else sb.append(if (c == '*') '0' else c)
        } else { sb.append('x'); esc = false }
        i += 1
      }
      sb.toString
    }
    if (pattern.nonEmpty && pattern.charAt(0) == '^')
      return globStep(shadow, pattern, 1, value, 0)

    var patPot = 0
    while (patPot < pattern.length && pattern.charAt(patPot) == '*') patPot += 1
    var ch = 'a'
    var chPot = 'a'
    if (pattern.length >= 2 && pattern.charAt(0) == '\\') {
      ch = pattern.charAt(1); chPot = pattern.charAt(1)
    } else if (pattern.length - patPot >= 2 && pattern.charAt(patPot) == '\\')
      chPot = pattern.charAt(patPot + 1)
    val patIsNumber = fragmentNext(shadow, 0).exists(_._3 == FragNumber)

    var s = 0
    while (s < e) {
      // skip to the next plausible start
      while (s < e && value.charAt(s) != chPot &&
          (if (patIsNumber) !isNumWordCh(value.charAt(s)) else !isWordCh(value.charAt(s)))) s += 1
      if (globStep(shadow, pattern, 0, value, s)) return true
      if (patIsNumber) {
        fragmentNext(value, s) match {
          case Some((_, fe, _)) => s = fe
          case None =>
            s += 1
            while (s < e && isWordCh(value.charAt(s))) s += 1
        }
      } else {
        s += 1
        while (s < e && (value.charAt(s) == ch || isWordCh(value.charAt(s)))) s += 1
      }
    }
    // a pattern with no word characters and no escapes matches anything
    var p = 0
    while (p < pattern.length && pattern.charAt(p) != '\\' && !isWordCh(pattern.charAt(p))) p += 1
    p >= pattern.length
  }

  /** octet-comparator `~=`: the same word/glob walk but byte-exact —
    * case-sensitive, no punctuation elision beyond separators and no
    * number normalization (graphd-comparator-octet.c:56-180).
    */
  def matchesOctet(value: String, pattern: String): Boolean = {
    if (value == null || pattern == null) return false
    val e = value.length
    def step(pr0: Int, r0: Int): Boolean = {
      val pe = pattern.length
      var pr = pr0
      var r = r0
      var inWord = false
      while (true) {
        if (pr >= pe || isSpaceCh(pattern.charAt(pr))) {
          if (inWord) {
            if (r < e && isWordCh(value.charAt(r))) return false
            inWord = false
          }
          if (pr >= pe) return true
          pr += 1
        } else if (pattern.charAt(pr) == '$' && pr + 1 == pe) {
          while (r < e && !isWordCh(value.charAt(r))) r += 1
          return r >= e
        } else if (pattern.charAt(pr) == '*') {
          var ch = 'a'
          while (pr < pe && pattern.charAt(pr) == '*') pr += 1
          if (pe - pr >= 2 && pattern.charAt(pr) == '\\') ch = pattern.charAt(pr + 1)
          if (!inWord) {
            while (r < e && !isWordCh(value.charAt(r))) r += 1
            if (r >= e) return false
            inWord = true
          }
          if (pr >= pe || (pattern.charAt(pr) != '\\' && !isWordCh(pattern.charAt(pr)))) {
            while (r < e && isWordCh(value.charAt(r))) r += 1
            inWord = false
          } else {
            while (r < e && (value.charAt(r) == ch || isWordCh(value.charAt(r)))) {
              if (step(pr, r)) return true
              r += 1
            }
            return false
          }
        } else if (pr + 1 < pe && pattern.charAt(pr) == '\\') {
          pr += 1
          if (!inWord) {
            while (r < e && !isWordCh(value.charAt(r)) && value.charAt(r) != pattern.charAt(pr)) r += 1
            inWord = true
          }
          if (r < e && value.charAt(r) == pattern.charAt(pr)) { pr += 1; r += 1 }
          else return false
        } else if (isCmpPunct(pattern.charAt(pr))) {
          if (inWord && (r >= e || !isWordCh(value.charAt(r)))) inWord = false
          pr += 1
        } else {
          if (!inWord) {
            while (r < e && !isWordCh(value.charAt(r)) && value.charAt(r) != pattern.charAt(pr)) r += 1
            inWord = true
          }
          while (pr < pe && isWordCh(pattern.charAt(pr))) {
            if (r >= e || value.charAt(r) != pattern.charAt(pr)) return false
            pr += 1
            r += 1
          }
        }
      }
      false
    }
    if (pattern.nonEmpty && pattern.charAt(0) == '^') return step(1, 0)
    val ch = if (pattern.length >= 2 && pattern.charAt(0) == '\\') pattern.charAt(1) else 'a'
    var s = 0
    while (s < e) {
      while (s < e && value.charAt(s) != ch && !isWordCh(value.charAt(s))) s += 1
      if (step(0, s)) return true
      s += 1
      while (s < e && isWordCh(value.charAt(s))) s += 1
    }
    var p = 0
    while (p < pattern.length && pattern.charAt(p) != '\\' && !isWordCh(pattern.charAt(p))) p += 1
    p >= pattern.length
  }

  /** `~=` under a named comparator (cmp_glob vtable slot) */
  def matchesCmp(comparator: String, value: String, pattern: String): Boolean =
    comparator match {
      case "octet" => matchesOctet(value, pattern)
      case _ => matches(value, pattern)
    }

  /** first pattern word usable as an inverted-index key: a fully
    * literal word (no `*`) — the candidate-pruning entry point
    * (graphd/graphd-iterator-prefix.c word candidates).
    */
  /** '.' immediately followed by a digit anywhere in the string — a
    * char scan rather than a regex so embedded newlines can't slip past
    * a non-DOTALL `.`
    */
  def hasFractionalDigit(s: String): Boolean = {
    var i = s.indexOf('.')
    while (i >= 0) {
      if (i + 1 < s.length && s.charAt(i + 1) >= '0' && s.charAt(i + 1) <= '9')
        return true
      i = s.indexOf('.', i + 1)
    }
    false
  }

  def firstIndexWord(pattern: String): Option[String] = {
    if (pattern.indexOf('\\') >= 0) return None // literal-escape path
    // fractional number patterns match values under NORMALIZATION
    // ("0.5" matches ".50"), whose digit-run words (["50"]) need not
    // contain any pattern word — no sound index key exists
    if (hasFractionalDigit(pattern)) return None
    var p = pattern
    if (p.startsWith("^")) p = p.substring(1)
    if (p.endsWith("$") && !p.endsWith("\\$")) p = p.substring(0, p.length - 1)
    // pruning is only sound when no punctuation-joined group exists:
    // "foo-bar" can match a value word "foobar" that the index key
    // "foo" would never surface
    val groups = patternWordGroups(p)
    if (groups.exists(_.length > 1)) None
    else groups.flatten.find(w => !w.contains('*'))
  }

  /** first pattern word of the shape `lit*` (literal prefix, trailing
    * glob) — usable as a prefix-index scan key (PDB_HASH_PREFIX,
    * libpdb/pdb-prefix.c). Requires >=2 literal chars to be selective.
    */
  def firstIndexPrefix(pattern: String): Option[String] = {
    if (pattern.indexOf('\\') >= 0) return None // literal-escape path
    if (hasFractionalDigit(pattern)) return None // see firstIndexWord
    var p = pattern
    if (p.startsWith("^")) p = p.substring(1)
    if (p.endsWith("$") && !p.endsWith("\\$")) p = p.substring(0, p.length - 1)
    val groups = patternWordGroups(p)
    if (groups.exists(_.length > 1)) None
    else groups.flatten.collectFirst {
      case w if w.length >= 3 && w.endsWith("*") &&
        !w.substring(0, w.length - 1).contains('*') =>
        w.substring(0, w.length - 1)
    }
  }

  /** pattern words keep `*` but otherwise tokenize like values */
  def patternWords(p: String): Seq[String] = patternWordGroups(p).flatten

  /** pattern words grouped by separator kind: words inside one group
    * were separated only by punctuation (no whitespace) — "foo-bar" →
    * [[foo, bar]], "foo bar" → [[foo], [bar]]. Escapes (backslash) are
    * treated as punctuation and elided.
    */
  def patternWordGroups(p: String): Seq[Seq[String]] = {
    val out = ArrayBuffer.empty[Seq[String]]
    val cur = ArrayBuffer.empty[String]
    var i = 0
    val n = p.length
    def flush(): Unit = { if (cur.nonEmpty) { out += cur.toSeq; cur.clear() } }
    while (i < n) {
      val c = p.charAt(i)
      if (Character.isLetterOrDigit(c) || c == '*') {
        val j = i
        while (i < n && (Character.isLetterOrDigit(p.charAt(i)) || p.charAt(i) == '*')) i += 1
        val raw = p.substring(j, i)
        // non-glob mixed runs re-split like value words ("x9y" → x,9,y
        // in the same group); glob words keep the '*' intact
        if (raw.contains('*')) cur += raw.toLowerCase
        else cur ++= words(raw)
      } else if (Character.isWhitespace(c)) {
        flush(); i += 1
      } else i += 1 // punctuation: elided, keeps the group open
    }
    flush()
    out.toSeq
  }

  /** simple glob: `*` = any run (including empty) within a word */
  def globMatch(pat: String, s: String): Boolean = {
    val parts = pat.split("\\*", -1)
    if (parts.length == 1) return pat == s
    var pos = 0
    // first part must match at start
    if (parts.head.nonEmpty) {
      if (!s.startsWith(parts.head)) return false
      pos = parts.head.length
    }
    // middle parts in order
    for (k <- 1 until parts.length - 1) {
      val part = parts(k)
      if (part.nonEmpty) {
        val idx = s.indexOf(part, pos)
        if (idx < 0) return false
        pos = idx + part.length
      }
    }
    // last part must match at end
    val last = parts.last
    last.isEmpty || (s.endsWith(last) && s.length - last.length >= pos)
  }

  /** three-way compare under a named comparator */
  def compare(comparator: String, a: String, b: String): Int = {
    val (ka, kb) = (sortKey(comparator, a), sortKey(comparator, b))
    if (ka == null && kb == null) 0
    else if (ka == null) -1
    else if (kb == null) 1
    else ka.compareTo(kb)
  }
}
