package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (spark_optimization_guide §1):
  * times individual queries with the same forced materialization the
  * bench uses (queryExecution.toRdd.count — every column of every row,
  * no sink cost), and/or dumps .explain("formatted") for plan-diff
  * evidence (plans/r13/). Not part of the driver contract; Bench.scala
  * remains the driver's timing surface.
  *
  * Usage: Meter <sfDir> <reps> <planDir|-> [q1,q2,...]
  *   reps = 0 with a planDir dumps plans only.
  */
object Meter {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val planDir = args(2)
    val only = if (args.length > 3)
      args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    def drop(): Unit = {
      graft.ops.StagePersists.release(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // empirical breakdown (guide §1.1): jobs/stages/tasks + task time +
    // shuffle bytes per query run, so scheduling floor (many jobs, tiny
    // task time) separates from real compute at a glance
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          val m = t.taskMetrics
          if (m != null) {
            taskMs.addAndGet(m.executorRunTime)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    def snap(): (Long, Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get, shufR.get, shufW.get)
    names.foreach { name =>
      if (planDir != "-") {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        new java.io.File(planDir).mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$planDir/$name.txt"),
          plan.getBytes("UTF-8"))
        drop()
      }
      var best = Double.MaxValue
      (1 to reps).foreach { r =>
        spark.sparkContext.setJobDescription(s"$name rep $r")
        val b0 = snap()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
          val s = (System.nanoTime() - t0) / 1e9
          val b1 = snap()
          println(f"[meter] $name rep$r $s%.2f s " +
            f"jobs=${b1._1 - b0._1} stages=${b1._2 - b0._2} " +
            f"tasks=${b1._3 - b0._3} taskSec=${(b1._4 - b0._4) / 1e3}%.1f " +
            f"shufMB=${(b1._5 - b0._5 + b1._6 - b0._6) / 1e6}%.1f")
          best = math.min(best, s)
        } catch { case t: Throwable =>
          println(s"[meter] $name rep$r FAILED: ${t.getClass.getSimpleName}: " +
            Option(t.getMessage).getOrElse("").takeWhile(_ != '\n').take(200))
        }
        drop()
      }
      if (reps > 0 && best < Double.MaxValue)
        println(f"[meter] $name BEST $best%.2f s")
    }
    spark.stop()
  }
}
