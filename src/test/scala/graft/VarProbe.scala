package graft
object VarProbe {
  def main(args: Array[String]): Unit = {
    val q = """read (sort=$foo $foo=$bar $bar=value)"""
    val c = graft.gql.Parser.parseRead(q)
    println("sort=" + c.sort)
    println("assigns=" + c.assignments)
    println("subs=" + c.subs.length + " orB=" + c.orBranches.length)
    try {
      val n = graft.plan.ReadPlanner.normalizeVars(c)
      println("OK sort=" + n.sort + " assigns=" + n.assignments)
    } catch { case e: Throwable => println("ERR " + e.getMessage) }
  }
}
