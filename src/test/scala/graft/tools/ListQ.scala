package graft.tools
object ListQ extends App {
  val q = graft.SparkEntry.queries.keySet
  val o = graft.SparkEntry.oracleSql.keySet
  println("queries=" + q.size + " oracled=" + (q intersect o).size + " rowsOnly=" + (q -- o).toList.sorted.mkString(","))
  println(q.toList.sorted.mkString(" "))
}
