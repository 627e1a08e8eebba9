package graft.tools
object DumpSql {
  def main(args: Array[String]): Unit = {
    // UTF-8 explicitly: the JVM's default stdout charset can be ASCII
    // under redirection, which silently turns accented regex ranges
    // into '?' in the dumped SQL
    val out = new java.io.PrintStream(System.out, true, "UTF-8")
    args.foreach(n => out.println(graft.SparkEntry.oracleSql(n)))
  }
}
