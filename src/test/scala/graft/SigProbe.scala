package graft
object SigProbe {
  def main(args: Array[String]): Unit = {
    def ref(id: Long): String = "00000012400034568" + f"${(id-1)}%015x"
    for (q <- Seq(
      """read (any sort=() pagesize=1 result=cursor)""",
      """read ("parent" pagesize=0 result=cursor)""",
      """read (value=null result=(cursor(value)) pagesize=1)""")) {
      val c = graft.plan.ReadPlanner.normalizeVars(graft.gql.Parser.parseRead(q))
      val s = CursorSig.signature(c.copy(cursorTok = None), ref)
      println(f"${CursorSig.checksum(s)}%04x  $s")
    }
  }
}
