package graft.tools
object DumpSql {
  def main(args: Array[String]): Unit =
    args.foreach(n => println(graft.SparkEntry.oracleSql(n)))
}
