package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.gql._
import graft.model.{Datatype, GTimestamp}
import graft.plan.ReadPlanner
import graft.store.GraphStore
import graft.write.Writer

/** Replays a reference golden session (test/unit sessions) against the
  * engine and renders responses in the reference's wire form: the same
  * guid database id, the same test-mode timestamps (0.0000Z + 100µs
  * per write), the reference's default read pattern
  * (graphd/graphd-pattern.c:38-59) and nested write results
  * (doc/gr-protocol.txt:881). Output lines byte-compare against the
  * session's .out.exp — except that responses to UNSORTED reads
  * compare as tuple multisets, because the reference's production
  * order there is an iterator artifact (value-index bin order), not a
  * semantic guarantee.
  */
object SessionHarness {

  // the reference test databases all carry this id (rungraphd -ty)
  private val RefDb = "0000001240003456"
  private val SerialBase = 0x8000000000000000L

  def refGuid(id: Long): String =
    RefDb + f"${SerialBase + id - 1}%016x"

  /** Marker commands parseScript emits for shell-level effects the
    * replay must reproduce: `echo` output lines and mid-script fresh
    * databases (`rm -rf $D` between rungraphd invocations).
    */
  val EchoMark = "#ECHO# "
  val ResetMark = "#RESET#"

  /** commands of one session: heredoc body lines (`<<-EOF`, `<< EOF`,
    * quoted or not) or a redirected `.in` file, parens-balanced.
    * An UNQUOTED heredoc marker gets the shell's backslash processing:
    * `\\` collapses to `\` (so the wire sees single escapes —
    * substring.sh); a quoted marker (<<-'EOF') passes text through
    * verbatim. Top-level `echo` lines become EchoMark commands (their
    * output interleaves with responses in the goldens); an `rm -rf $D`
    * between server invocations becomes a ResetMark (fresh db).
    */
  def parseScript(sh: String,
      dir: String = "/root/reference/test/unit"): Seq[String] = {
    val lines = sh.linesIterator.toSeq
    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = false
    var quoted = false
    var sawBlock = false
    var pendingReset = false
    val heredoc = """<<-?\s*'?EOF'?""".r
    val inRedir = """<\s*(\S+\.in)""".r
    def beginBlock(): Unit = {
      if (pendingReset && sawBlock) body += ResetMark
      pendingReset = false; sawBlock = true
    }
    for (l <- lines) {
      val t = l.trim
      if (in) {
        if (t == "EOF") in = false
        else body +=
          (if (quoted) t
           else t.replace("\\\\", "\u0000").replace("\\$", "$")
             .replace("\\`", "`").replace("\u0000", "\\"))
      } else if (l.contains("<<") && heredoc.findFirstIn(l).isDefined) {
        beginBlock()
        in = true; quoted = l.contains("'EOF'")
      } else if (t.matches("""rm\s+-rf?\s+.*\$\{?D\}?.*""")) {
        pendingReset = true
      } else if (t.contains("rungraphd") && inRedir.findFirstMatchIn(t).isDefined) {
        beginBlock()
        val f = inRedir.findFirstMatchIn(t).get.group(1)
        val file = new java.io.File(dir, f)
        if (file.exists()) {
          val src = scala.io.Source.fromFile(file)
          try body ++= src.getLines() finally src.close()
        }
      } else if (t.startsWith("echo ") && !t.contains(">")) {
        body += EchoMark + t.stripPrefix("echo ").trim
      }
    }
    // join continuation lines until parens balance outside strings;
    // `(:...:)` comments are elided from the balance (they may contain
    // parens and quotes — comments.sh)
    val cmds = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = new StringBuilder
    def balanced(s: String): Boolean = {
      var depth = 0; var inStr = false; var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' if inStr => i += 1
          case '"' => inStr = !inStr
          case '(' if !inStr && i + 1 < s.length && s.charAt(i + 1) == ':' =>
            val end = s.indexOf(":)", i + 2)
            i = if (end < 0) s.length else end + 1
          case '(' if !inStr => depth += 1
          case ')' if !inStr => depth -= 1
          case _ =>
        }
        i += 1
      }
      depth <= 0 && !inStr
    }
    for (l <- body if l.nonEmpty) {
      if (l.startsWith(EchoMark) || l == ResetMark) { // markers stand alone
        if (cur.nonEmpty) { cmds += cur.toString; cur = new StringBuilder }
        cmds += l
      } else {
        cur.append(if (cur.isEmpty) l else " " + l)
        if (balanced(cur.toString)) { cmds += cur.toString; cur = new StringBuilder }
      }
    }
    if (cur.nonEmpty) cmds += cur.toString
    cmds.toSeq
  }

  /** reference guid literals → this engine's decimal ids (through the
    * session's id translation when bootstrap writes shifted serials)
    */
  private def translateGuids(cmd: String, fromRef: Long => Long): String =
    "[0-9a-f]{32}".r.replaceAllIn(cmd, m => {
      val hex = m.matched
      if (hex.startsWith(RefDb))
        fromRef(java.lang.Long.parseUnsignedLong(hex.substring(16), 16) - SerialBase + 1).toString
      else hex
    })

  /** split `read id="a" asof="x" (...)` into (verb, echoed modifiers,
    * rewritten command with the remaining modifiers folded into the
    * constraint body). `id` and `dateline` are extracted (they echo in
    * the response rather than constrain); everything else stays.
    */
  private def splitModifiers(cmd0: String): (String, Seq[(String, String)], String) = {
    val cmd = cmd0.trim
    val verb = cmd.takeWhile(!_.isWhitespace)
    // first '(' outside quotes — modifier values may contain parens
    // (count2: read id="()" (...))
    val open = {
      var i = 0; var inStr = false; var found = -1
      while (found < 0 && i < cmd.length) {
        cmd.charAt(i) match {
          case '\\' if inStr => i += 1
          case '"' => inStr = !inStr
          case '(' if !inStr => found = i
          case _ =>
        }
        i += 1
      }
      found
    }
    val pre = cmd.substring(verb.length, if (open < 0) cmd.length else open)
    val mods = """([-\w]+)=("[^"]*"|\S+)""".r.findAllMatchIn(pre).toSeq
    val extracted = mods.collect {
      case m if m.group(1) == "id" || m.group(1) == "dateline" =>
        m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\"")
    }
    val keep = mods.filterNot(m => m.group(1) == "id" || m.group(1) == "dateline")
      .map(_.matched)
    val rest = if (open < 0) "()" else cmd.substring(open + 1)
    (verb, extracted, verb + " (" + keep.mkString(" ") + (if (keep.nonEmpty) " " else "") + rest)
  }

  /** dateline request-modifier validation (graph-dateline.c forms):
    * "" and guid/odometer forms are valid; a comma'd multi-instance
    * dateline naming an instance this server doesn't know is DATELINE;
    * anything else SYNTAX. Returns the error code, None = valid.
    */
  private def datelineError(v: String): Option[String] =
    if (v.isEmpty) None
    else if (v.matches("[0-9a-fA-F]{32}")) None
    else if (v.matches("""\d+\.\d+""")) None
    else if (v.contains(',')) Some("DATELINE")
    else Some("SYNTAX")

  /** the reference's default read pattern (graphd-pattern.c:38-59):
    * ((meta guid type name datatype value scope live archival timestamp
    *   right left contents)) — meta/right/left render for LINK rows
    * only, contents only when the constraint has subconstraints.
    * Injected recursively into every constraint that lacks result=.
    */
  private val RefDefaultFields = Seq(
    "meta", "guid", "type", "name", "datatype", "value", "scope",
    "live", "archival", "timestamp", "right", "left")

  /** tracks the ListPats this harness injected (identity — the drop
    * rule for meta/right/left applies only to the injected default,
    * never to an explicit result= that happens to spell the same
    * fields, which the reference renders unconditionally)
    */
  private final class Injected {
    val marks = new java.util.IdentityHashMap[Pattern, java.lang.Boolean]()
    def inject(c: Constraint): Constraint = {
      val subs2 = c.subs.map(inject)
      val res2 = c.result.orElse {
        val inner = ListPat(RefDefaultFields.map(FieldPat(_)) ++
          (if (subs2.nonEmpty) Seq(ContentsPat) else Nil))
        marks.put(inner, java.lang.Boolean.TRUE)
        Some(ListPat(Seq(inner)))
      }
      c.copy(result = res2, subs = subs2)
    }
    def isDefault(p: Pattern): Boolean = marks.containsKey(p)
  }

  /** reference value rendering: elements joined so that an element
    * rendering EMPTY (literal="", none) contributes neither itself nor
    * its separator, while a non-first non-empty element gets exactly
    * one leading space (emptylit golden: `( "a")`, `("a" "a")`).
    */
  private def joinElems(elems: Seq[String]): String =
    elems.zipWithIndex.map { case (e, i) =>
      if (e.isEmpty) "" else if (i == 0) e else " " + e
    }.mkString

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def genericValue(v: Any, g: Long => String): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => if (b) "true" else "false"
    case other => other.toString
  }

  /** Pattern-driven renderer. Leaves consume columns positionally in
    * ReadPlanner.resultFields order (flatten of the pattern; contents
    * expands to one column per contributing child; at root the cursor
    * column is excluded from its slot and appended last by shapeRoot).
    */
  private final class Renderer(inj: Injected, g: Long => String) {

    private def widthOf(p: Pattern, c: Constraint, root: Boolean): Int = p match {
      case ContentsPat => graft.plan.ReadPlanner.contributingSubs(c).length
      case CursorPat => if (root) 0 else 1
      case ListPat(items) => items.map(widthOf(_, c, root)).sum
      case _ => 1
    }

    private def fieldValue(f: String, row: Row, i: Int,
        tsOverride: Option[String]): String = {
      val v = if (row.isNullAt(i)) null else row.get(i)
      f match {
        case "guid" | "typeguid" | "left" | "right" | "scope" |
             "previous" | "prev" | "next" =>
          if (v == null) "null" else g(v.asInstanceOf[Long])
        case "datatype" | "valuetype" =>
          if (v == null) "null" else Datatype.name(v.asInstanceOf[Number].byteValue)
        case "timestamp" =>
          tsOverride.getOrElse(
            if (v == null) "null" else GTimestamp.render(v.asInstanceOf[Long]))
        case "meta" => if (v == null) "null" else v.toString // bare atom
        case _ => genericValue(v, g)
      }
    }

    /** render the leaves of `items` against one row starting at column
      * `off`; returns (rendered elements, columns consumed)
      */
    private def tupleElems(items: Seq[Pattern], c: Constraint, row: Row,
        off: Int, root: Boolean, injected: Boolean): (Seq[String], Int) = {
      // injected default: timestamp renders from the mapped reference
      // serial (test clock = serial×100µs); node rows drop meta/right/left
      val guidAt = items.indexWhere { case FieldPat("guid") => true; case _ => false }
      val tsOverride: Option[String] =
        if (guidAt < 0 || row.isNullAt(off + guidAt)) None
        else {
          val hex = g(row.getLong(off + guidAt))
          val serial =
            java.lang.Long.parseUnsignedLong(hex.substring(16), 16) - SerialBase
          Some(GTimestamp.render(serial * 100L))
        }
      val isNode = injected && {
        val r = items.indexWhere { case FieldPat("right") => true; case _ => false }
        val l = items.indexWhere { case FieldPat("left") => true; case _ => false }
        r >= 0 && l >= 0 && row.isNullAt(off + r) && row.isNullAt(off + l)
      }
      var i = off
      val elems = items.flatMap { p =>
        val w = widthOf(p, c, root)
        val out: Seq[String] = p match {
          case FieldPat(f) =>
            if (isNode && (f == "meta" || f == "right" || f == "left")) Nil
            else Seq(fieldValue(f, row, i, tsOverride))
          case LiteralPat(s, _) => Seq(s) // atom, unquoted; "" skips via join
          case NonePat => Seq("")
          case VarPat(_) | PickPat(_) =>
            Seq(genericValue(if (row.isNullAt(i)) null else row.get(i), g))
          case CountPat | EstimateCountPat =>
            Seq(if (row.isNullAt(i)) "null" else row.get(i).toString)
          case CursorPat =>
            if (root) { // appended by shapeRoot under the name "cursor"
              val ci = row.schema.fieldNames.indexOf("cursor")
              Seq(if (ci < 0 || row.isNullAt(ci)) "null" else quote(row.getString(ci)))
            } else Seq(genericValue(if (row.isNullAt(i)) null else row.get(i), g))
          case ContentsPat =>
            graft.plan.ReadPlanner.contributingSubs(c).zipWithIndex.map {
              case (subIdx, k) =>
                renderChild(c.subs(subIdx),
                  if (row.isNullAt(i + k)) null else row.get(i + k))
            }
          case ListPat(sub) => // nested list inside a tuple
            val (es, _) = tupleElems(sub, c, row, i, root, inj.isDefault(p))
            Seq("(" + joinElems(es) + ")")
          case other => Seq(genericValue(row.get(i), g))
        }
        i += w
        out
      }
      (elems, i - off)
    }

    /** a constraint's result value over its matched rows: the outer
      * list frame — inner ListPat items expand per-row, scalar items
      * evaluate set-level / on the first row (reference result frames,
      * graphd-pattern-frame.c)
      */
    def renderResult(c: Constraint, rows: Seq[Row], root: Boolean): String =
      c.result match {
        case Some(ListPat(items)) =>
          var off = 0
          val elems = items.flatMap { p =>
            val w = widthOf(p, c, root)
            val out: Seq[String] = p match {
              case lp @ ListPat(sub) => // per-row expansion
                rows.map { r =>
                  val (es, _) = tupleElems(sub, c, r, off, root, inj.isDefault(lp))
                  "(" + joinElems(es) + ")"
                }
              case other =>
                if (rows.isEmpty) Nil
                else tupleElems(Seq(other), c, rows.head, off, root,
                  injected = false)._1
            }
            off += w
            out
          }
          "(" + joinElems(elems) + ")"
        case Some(single) => // bare pattern: first row / set value, no parens
          if (rows.isEmpty) "()"
          else joinElems(tupleElems(Seq(single), c, rows.head, 0, root,
            injected = false)._1)
        case None => "()"
      }

    /** one child's spliced contents value: the child's own result frame
      * over its collected tuples (null/empty collect → empty frame)
      */
    private def renderChild(sub: Constraint, v: Any): String = v match {
      case null => sub.result match {
        case Some(ListPat(_)) => "()"
        case _ => "" // bare child pattern with nothing: skips entirely
      }
      case rows: scala.collection.Seq[_] =>
        renderResult(sub, rows.asInstanceOf[scala.collection.Seq[Row]].toSeq,
          root = false)
      case other => other.toString // result=count child: per-parent cardinality
    }
  }

  final case class Replayed(lines: Seq[String], sortedRead: Seq[Boolean])

  /** run every command against a fresh store; returns one response
    * line per command plus whether that response order is semantic
    * (sorted read / write) or an iterator artifact (unsorted read)
    */
  def replay(spark: org.apache.spark.sql.SparkSession, cmds: Seq[String]): Replayed = {
    var store = GraphStore.fromSeq(spark, Seq.empty)
    Writer.tickMicros = Some(new java.util.concurrent.atomic.AtomicLong(0L))
    // physical reference bootstrap: the Writer mints the reference's
    // own primitive layout (7 bootstrap primitives on the first typed
    // write, a node + has_key naming link per first-use type name —
    // graphd/graphd-type.c:899), so engine ids COINCIDE with reference
    // istore serials and guid literals translate 1:1.
    Writer.refBootstrap = true
    var lastId = 0L // highest allocated id == the reference's horizon
    def refOf(our: Long): String = refGuid(our)
    def freshDb(): Unit = {
      store = GraphStore.fromSeq(spark, Seq.empty)
      Writer.tickMicros.foreach(_.set(0L))
      lastId = 0L
    }
    try {
      val out = cmds.flatMap { raw =>
        if (raw == ResetMark) { freshDb(); None }
        else if (raw.startsWith(EchoMark))
          Some((raw.stripPrefix(EchoMark), true))
        else Some {
        val (verb, mods, cmd) = splitModifiers(translateGuids(raw, identity))
        val echo = mods.collectFirst { case ("id", v) => v }
        val dlMod = mods.collectFirst { case ("dateline", v) => v }
        // current dateline rendered the reference way: the horizon
        // serial in guid form (doc/gr-protocol.txt:228-244). Evaluated
        // at response time so writes echo their post-write horizon.
        def dlEcho =
          if (dlMod.isEmpty) ""
          else s"""dateline="$RefDb${f"${SerialBase + lastId}%016x"}" """
        val prefix = echo.map(i => s"""id="$i" """).getOrElse("")
        // NOT trimmed: a valued response keeps its separator space even
        // when the value renders empty (emptylit golden: `ok `)
        def okLine(payload: String) = s"ok $prefix$dlEcho$payload"
        // the reference echoes request modifiers AFTER the error code:
        // `error EMPTY id="n" "not found"` (value.sh golden)
        def errLine(code: String, msg: String) =
          s"""error $code $prefix"${msg.replace("\"", "\\\"")}""""
        try {
          dlMod.flatMap(datelineError).foreach(code =>
            throw Writer.WriteError(code, "invalid dateline value"))
          if (verb == "write") {
            val tmpl = Parser.parseRead(cmd)
            val (st2, ids) = Writer.write(store, cmd)
            store = st2
            lastId = Writer.nextId(store) - 1
            var k = -1
            def walk(c: Constraint): String = {
              k += 1
              val g = refOf(ids(k))
              (g +: c.subs.map(walk)).mkString("(", " ", ")")
            }
            (okLine(walk(tmpl)), true)
          } else if (verb == "read") {
            val c0 = Parser.parseRead(cmd)
            val inj = new Injected
            val c = inj.inject(c0)
            val df = ReadPlanner.plan(store, c)
            val rows = df.collect()
            // root count bounds assert on the MATCH count before
            // paging (count2: count=0 value="twin" errors EMPTY even
            // though the page is empty; count=0 on no matches is ok ())
            val b = c0.effectiveCount
            val total: Long =
              if (b.min == 1L && b.max.isEmpty)
                (if (rows.nonEmpty) 1L else 0L) // default bounds: page tells
              else ReadPlanner.plan(store,
                c.copy(pagesize = None, start = None)).count()
            val boundsOk = total >= b.min && b.max.forall(total <= _)
            if (!boundsOk) (errLine("EMPTY", "not found"), true)
            else if (rows.isEmpty) (okLine("()"), true)
            else {
              val r = new Renderer(inj, refOf)
              (okLine(r.renderResult(c, rows.toSeq, root = true)), c0.sort.nonEmpty)
            }
          } else (s"# unsupported verb $verb", true)
        } catch {
          case e: Writer.WriteError => (errLine(e.code, e.msg), true)
          case e: Parser.ParseError =>
            val m = e.getMessage
            if (m.startsWith("SYNTAX: "))
              (errLine("SYNTAX", m.stripPrefix("SYNTAX: ")), true)
            else if (m.startsWith("LEXICAL: "))
              (errLine("LEXICAL", m.stripPrefix("LEXICAL: ")), true)
            else (errLine("SEMANTICS", m), true)
          case e: Throwable => (errLine("SYSTEM", String.valueOf(e.getMessage)), true)
        }
        }
      }
      Replayed(out.map(_._1), out.map(_._2))
    } finally {
      Writer.tickMicros = None
      Writer.refBootstrap = false
    }
  }

  /** top-level tuples of an `ok (...)` line, for order-insensitive
    * comparison of unsorted reads
    */
  def topLevelTuples(line: String): Option[(String, Seq[String])] = {
    if (!line.startsWith("ok ")) return None
    val body = line.substring(3).trim
    if (!body.startsWith("(")) return None
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = -1
    var i = 1 // inside the outer paren
    while (i < body.length - 1) {
      body.charAt(i) match {
        case '\\' if inStr => i += 1
        case '"' => inStr = !inStr
        case '(' if !inStr => if (depth == 0) start = i; depth += 1
        case ')' if !inStr =>
          depth -= 1
          if (depth == 0) { items += body.substring(start, i + 1); start = -1 }
        case _ =>
      }
      i += 1
    }
    if (depth != 0 || start != -1) None else Some(("ok", items.toSeq))
  }

  /** compare a replayed line against the golden: byte-equal; or, for
    * unsorted reads, equal multisets of top-level tuples; error lines
    * match on the error code (reference messages are prose)
    */
  def linesMatch(expected: String, actual: String, sortedRead: Boolean): Boolean = {
    if (expected == actual) return true
    if (expected.startsWith("error ") && actual.startsWith("error "))
      return expected.split("\\s+").take(2).sameElements(actual.split("\\s+").take(2))
    if (!sortedRead)
      (topLevelTuples(expected), topLevelTuples(actual)) match {
        case (Some((_, a)), Some((_, b))) =>
          return a.groupBy(identity).view.mapValues(_.size).toMap ==
            b.groupBy(identity).view.mapValues(_.size).toMap
        case _ =>
      }
    false
  }
}
