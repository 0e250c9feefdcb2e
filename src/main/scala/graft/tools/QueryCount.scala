package graft.tools

/** Prints the graded-query count straight from the registry — the
  * number README.md cites, derivable with one command so the doc can
  * never silently drift from the code (round-12 verdict task 6):
  *
  * {{{ sbt "runMain graft.tools.QueryCount" }}}
  *
  * No Spark session: the registry is a map of plan-builder functions,
  * so its size is known without planning anything.
  */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val m = graft.Queries.queryMap
    val o = graft.SparkEntry.oracleSql
    println(s"queries=${m.size} oracled=${m.keySet.intersect(o.keySet).size}")
  }
}
