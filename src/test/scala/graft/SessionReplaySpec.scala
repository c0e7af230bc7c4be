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
    val cmds = SessionHarness.parseScript(
      slurp(s"$refDir/$name.sh").replace("$B", name))
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

  Seq(
    "033-1", "5230", "asof", "ben", "ben2", "ben5", "bendump", "benrestore",
    "big", "big1", "bootstrap", "chris7",
    "cost1", "cost2", "cvt", "datetime", "instance-id", "loglevel",
    "multibob", "sort7", "sort10", "sort11", "sort17", "sort18", "sort20",
    "status", "sync2", "timesort",
    "varerrs", "vars2",
    "default-results", "emptylit", "guidlist5", "linklink3", "ne", "nick6",
    "pol", "random7", "timestamp-2", "will1",
    "186", "3323", "anchor", "atleast", "badcompare", "badrestore",
    "bigkey", "brendan1", "brendan2", "bug5473", "byguid", "camera",
    "cannotmatch", "chris1", "chris2", "chris3", "chris4", "chris5",
    "colors", "comments", "compare", "count0", "count1", "count2",
    "cursor1", "cursor4", "datatype", "dateline-1", "dateline-2", "dateline-3",
    "dateline-4", "david_3", "duck", "dump", "dump2", "dumpnl",
    "empty", "empty-result", "empty2", "emptydump", "emptyrestore", "estimate-count",
    "false", "flags-1", "flags-2", "gpush", "group", "guid",
    "guidlist", "guidlist2", "guidlist3", "guidlist4", "id", "infcur",
    "intrange", "joburg", "keyburn", "keyburn3", "keyburn4", "keyburn5",
    "kurt1", "kurt2", "kurt3", "kurt4", "kurt5", "kurt6",
    "link1", "link2", "linklink1", "linklink2", "linklink4", "literal1",
    "localtype", "micro", "multirestore", "newline", "nick1", "nodenode",
    "now", "nullguid", "nullguid2", "nullvalue", "numberequal2", "numbermatch",
    "octet", "ok", "onedump", "onerestore", "optional", "or",
    "or4", "param-order", "previous", "ques", "random1", "random2",
    "random3", "random4", "random5", "random6", "rerestore2", "rest-over1",
    "rest-over2", "results", "rollback", "search", "sort1", "sort14",
    "sort15", "sort16", "sort19", "sort2", "sort4", "sort5",
    "sort6", "sortcomparators", "sortcursor", "source", "spacematch", "start",
    "stror", "substring", "substring2", "substring3", "syntaxerrs", "tab",
    "threedump", "threerestore", "tiling", "timestamp", "timestamp-3", "timestamp-4",
    "triad", "twovars", "typeandtypeguid", "typo", "unique1", "unique2", "unique3", "unique4", "unique6", "uniquecluster",
    "value", "valuetype", "vars", "version1", "version2", "version4",
    "version5", "will4", "will5", "will8", "wordnet1", "writeresult",
    "yesno", "zeroguid",
    "3816", "cursor3", "simple", "will3", "will6",
    "sort8", "sort12", "sort13", "varor", "varsort",
    "compare1", "compare2", "numberequal", "sortnumber", "david_9",
    "david_10", "datetime-2",
    "sort9", "nullcontent", "will2", "david_7", "countabunch", "pagesize",
    "start-unsorted", "3692", "colors2", "or2",
    "david_5", "david_6", "david_8",
    "guid2", "version3", "version7", "trailer", "trailer2", "anchor2",
    "anchor3", "anchor4", "keyburn2", "keyburn6",
    "dbname", "brendan3", "david_4", "cursor2", "cursor5",
    "100x100", "david_1",
    "sort3", "without", "brendan4", "cursor6", "iterator1",
    "rerestore", "nonsense", "chris6", "david_2",
    "slip", "isa", "colors3").foreach { n =>
    test(s"replay reference session $n")(replaySession(n))
  }
}
