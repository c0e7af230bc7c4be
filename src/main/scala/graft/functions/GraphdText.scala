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
      // negative-year strings).
      val signedNeg = c == '-' && i + 1 < n && Character.isDigit(s.charAt(i + 1)) &&
        (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)))
      if (signedNeg || Character.isDigit(c)) {
        if (signedNeg) i += 1
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
        val exp = Option(mm.group(4)).map(_.toInt).getOrElse(0)
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

  /** `value ~= pattern` (graphd/graphd-comparator-default.c:57-88):
    * case-insensitive word-sequence match with punctuation elision.
    *  - pattern words must appear as a contiguous word subsequence
    *  - `*` inside a word is an in-word wildcard
    *  - leading `^` anchors at the first word, trailing `$` at the last
    *  - numbers are normalized before comparison ("007" matches "7")
    */
  def matches(value: String, pattern: String): Boolean = {
    if (value == null || pattern == null) return false
    // a backslash surviving the lexer makes its punctuation a LITERAL
    // adjacency constraint instead of an elided separator: the wire
    // pattern ^User\\:* matches "User:foo" but not "User : foo"
    // (reference goldens substring2/substring3; the single-backslash
    // form is consumed by the lexer and stays on the elision path)
    if (pattern.length > 1 && pattern.indexOf('\\') >= 0 &&
        pattern.indexOf('\\') < pattern.length - 1)
      return escapedMatches(value, pattern)
    var pat = pattern
    val anchorStart = pat.startsWith("^")
    if (anchorStart) pat = pat.substring(1)
    val anchorEnd = pat.endsWith("$") && !pat.endsWith("\\$")
    if (anchorEnd) pat = pat.substring(0, pat.length - 1)

    val vw = words(value)
    val groups = patternWordGroups(pat)
    if (groups.flatten.isEmpty) return true

    // punctuation-joined pattern words match either split or joined:
    // "foo-bar" matches both "foo bar" and "foobar" (reference golden
    // test/unit/substring.sh: foo-bar hits fOO BaR baZ AND foobar),
    // while space-separated "foo bar" never matches "foobar".
    def variants: Seq[Seq[String]] = {
      val multi = groups.count(_.length > 1)
      if (multi == 0 || multi > 6) Seq(groups.flatten)
      else groups.foldLeft(Seq(Seq.empty[String])) { (acc, g) =>
        val choices: Seq[Seq[String]] =
          if (g.length > 1) Seq(g, Seq(g.mkString)) else Seq(g)
        for (a <- acc; c <- choices) yield a ++ c
      }
    }

    def wordMatch(pw: String, w: String): Boolean =
      if (pw.contains('*')) globMatch(pw, w) else pw == w

    def seqMatch(pw: Seq[String]): Boolean = {
      def matchAt(start: Int): Boolean =
        pw.indices.forall(k => start + k < vw.length && wordMatch(pw(k), vw(start + k)))
      val starts: Seq[Int] =
        if (anchorStart) Seq(0)
        else if (anchorEnd) Seq(vw.length - pw.length).filter(_ >= 0)
        else 0 to (vw.length - pw.length)
      starts.exists { st =>
        matchAt(st) &&
          (!anchorEnd || st + pw.length == vw.length) &&
          (!anchorStart || st == 0)
      }
    }

    variants.exists(seqMatch)
  }

  /** Escaped-punctuation matcher: compiles the pattern to a regex over
    * the RAW value. Word runs stay case-insensitive literals (numbers
    * normalized), unescaped punctuation is an optional separator,
    * whitespace a required one, `*` an in-word wildcard — but `\x`
    * demands the exact character adjacent, which the word-sequence
    * matcher cannot express.
    */
  private def escapedMatches(value: String, pattern0: String): Boolean = {
    var pat = pattern0
    val aStart = pat.startsWith("^")
    if (aStart) pat = pat.substring(1)
    val aEnd = pat.endsWith("$") && !pat.endsWith("\\$")
    if (aEnd) pat = pat.substring(0, pat.length - 1)
    val Sep = "[^\\p{L}\\p{N}]"
    val sb = new StringBuilder
    var i = 0
    val n = pat.length
    // token boundary class of the last literal run: word tokens split
    // at letter/digit transitions (words("foo7") = foo,7), so a letter
    // run is whole-word before a digit and vice versa
    var lastRun: Char = ' ' // 'L' letter, 'N' digit, other = none
    while (i < n) {
      val c = pat.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = pat.charAt(i + 1)
        sb.append(java.util.regex.Pattern.quote(e.toString))
        lastRun = if (Character.isLetter(e)) 'L'
          else if (Character.isDigit(e)) 'N' else ' '
        i += 2
      } else if (Character.isLetter(c)) {
        val j = i
        while (i < n && Character.isLetter(pat.charAt(i))) i += 1
        sb.append(java.util.regex.Pattern.quote(pat.substring(j, i)))
        lastRun = 'L'
      } else if (Character.isDigit(c)) {
        val j = i
        while (i < n && Character.isDigit(pat.charAt(i))) i += 1
        sb.append("0*").append(normNumber(pat.substring(j, i)))
        lastRun = 'N'
      } else if (c == '*') {
        sb.append("[\\p{L}\\p{N}]*"); lastRun = ' '; i += 1
      } else if (Character.isWhitespace(c)) {
        while (i < n && Character.isWhitespace(pat.charAt(i))) i += 1
        sb.append(Sep + "+"); lastRun = ' '
      } else {
        sb.append(Sep + "*"); lastRun = ' '; i += 1
      }
    }
    val prefix = if (aStart) "\\A" + Sep + "*" else "(?<![\\p{L}\\p{N}])"
    // unanchored patterns still end on a whole word: 'User\:foo' must
    // not match 'User:foobar' (trailing boundary mirrors the leading
    // lookbehind and the non-escaped matcher's whole-word equality)
    val suffix =
      if (aEnd) Sep + "*\\z"
      else lastRun match {
        case 'L' => "(?!\\p{L})"
        case 'N' => "(?!\\p{N})"
        case _ => ""
      }
    java.util.regex.Pattern
      .compile(prefix + sb + suffix,
        java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.UNICODE_CASE)
      .matcher(value).find()
  }

  /** first pattern word usable as an inverted-index key: a fully
    * literal word (no `*`) — the candidate-pruning entry point
    * (graphd/graphd-iterator-prefix.c word candidates).
    */
  def firstIndexWord(pattern: String): Option[String] = {
    if (pattern.indexOf('\\') >= 0) return None // literal-escape path
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
