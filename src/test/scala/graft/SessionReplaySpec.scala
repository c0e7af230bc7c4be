package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays reference golden sessions (test/unit sessions) end-to-end:
  * every write and read runs against a fresh engine store and the
  * responses compare against the shipped .out.exp — byte-for-byte for
  * writes, sorted reads and errors (code only), multiset-of-tuples for
  * unsorted reads whose production order is a reference iterator
  * artifact (SURVEY §5 golden-session strategy).
  */
class SessionReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val refDir = "/root/reference/test/unit"

  private def slurp(p: String): String = {
    val src = scala.io.Source.fromFile(p)(scala.io.Codec.ISO8859)
    try src.mkString finally src.close()
  }

  def replaySession(name: String): Unit = {
    val cmds = SessionHarness.parseScript(slurp(s"$refDir/$name.sh"))
    val exp = slurp(s"$refDir/$name.out.exp").linesIterator
      .filter(_.nonEmpty).toSeq
    val rep = SessionHarness.replay(spark, cmds)
    assert(rep.lines.length == exp.length,
      s"$name: ${rep.lines.length} responses vs ${exp.length} golden lines\n" +
        rep.lines.mkString("\n"))
    rep.lines.lazyZip(exp).lazyZip(rep.sortedRead).zipWithIndex.foreach {
      case ((actual, expected, sorted), i) =>
        assert(SessionHarness.linesMatch(expected, actual, sorted),
          s"$name line ${i + 1}:\n  expected: $expected\n  actual:   $actual\n" +
            s"  command:  ${cmds(i)}")
    }
  }

  Seq("sort1", "value", "intrange", "spacematch", "datatype", "substring",
    "numbermatch", "octet", "compare", "substring2",
    "substring3", "count1", "atleast", "optional",
    "count0", "count2", "or", "sort2", "sort4",
    "nodenode", "anchor", "unique1", "version1",
    // promoted by SessionProbe sweeps
    "bigkey", "bug5473", "byguid", "camera", "chris4", "colors",
    "david_3", "duck", "empty", "empty2", "guid", "id", "keyburn3",
    "keyburn4", "kurt6", "nullguid2", "numberequal2", "previous", "ques",
    "random3", "rollback", "search", "sort14", "sort6", "sortcomparators",
    "source", "start", "stror", "tab", "tiling", "timestamp-3",
    "timestamp-4", "triad", "twovars", "typo", "unique2", "vars",
    "version2", "will8", "link1").foreach { n =>
    test(s"replay reference session $n")(replaySession(n))
  }
}
