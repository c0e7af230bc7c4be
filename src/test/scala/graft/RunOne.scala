package graft
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val name = args(0)
    val src = scala.io.Source.fromFile(s"/root/reference/test/unit/$name.sh")(scala.io.Codec.ISO8859)
    val sh = try src.mkString finally src.close()
    val cmds = SessionHarness.parseScript(sh)
    val rep = SessionHarness.replay(spark, cmds)
    val exp = {
      val s2 = scala.io.Source.fromFile(s"/root/reference/test/unit/$name.out.exp")(scala.io.Codec.ISO8859)
      try s2.mkString.linesIterator.filter(_.nonEmpty).toSeq finally s2.close()
    }
    rep.lines.zipAll(exp, "<missing>", "<missing>").zipWithIndex.foreach { case ((a, e), i) =>
      val ok = SessionHarness.linesMatch(e, a, rep.sortedRead.lift(i).getOrElse(true))
      if (!ok) println(s"LINE ${i+1} MISMATCH\n  exp: $e\n  act: $a")
    }
    println("DONE")
  }
}
