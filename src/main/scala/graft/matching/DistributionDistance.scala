package graft.matching

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Two-sample distribution distances between numeric columns
  * (SURVEY.md §2.8 F13; reference: method_2/pipleline_2.py:90-111 —
  * KS statistic + Wasserstein distance feed the column matcher's
  * distribution-similarity score).
  *
  * Exact at scale: the cumulative ECDF is a distributed prefix sum —
  * range-partition the distinct values, per-partition running sums in
  * parallel windows keyed by the physical partition id, then add each
  * partition's broadcast offset (the control-plane per-partition totals,
  * O(#partitions) rows, computed once and reused for the next-value
  * boundary handoff). No global single-partition sort anywhere.
  */
object DistributionDistance {

  /** Cumulative ECDF frame for two columns: one row per distinct value
    * with both sides' ECDFs and the gap to the next value. */
  def ecdfFrame(a: DataFrame, aCol: String, b: DataFrame, bCol: String): DataFrame = {
    val av = a.select(col(s"`$aCol`").cast(DoubleType).as("x"))
      .filter(col("x").isNotNull)
      .groupBy("x").agg(count(lit(1)).as("na"))
      .withColumn("nb", lit(0L))
    val bv = b.select(col(s"`$bCol`").cast(DoubleType).as("x"))
      .filter(col("x").isNotNull)
      .groupBy("x").agg(count(lit(1)).as("nb"))
      .withColumn("na", lit(0L))
    val merged = av.unionByName(bv)
      .groupBy("x").agg(sum("na").as("na"), sum("nb").as("nb"))

    // Range-partition by value: partition i holds values strictly below
    // partition i+1's. Persisted because three consumers follow (the
    // per-partition stats, the prefix windows, and the totals).
    val ranged = merged
      .repartitionByRange(col("x"))
      .sortWithinPartitions("x")
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Control plane: per-partition sums + first value, O(#partitions)
    // rows → cumulative offsets and the next partition's first value
    // (the boundary row's lead target) computed on the driver.
    val pidStats = ranged.groupBy("__pid")
      .agg(sum("na").as("pa"), sum("nb").as("pb"), min("x").as("firstx"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    var (offA, offB) = (0L, 0L)
    val offsetRows = pidStats.zipWithIndex.map { case ((pid, pa, pb, _), i) =>
      val row = (pid, offA, offB,
        if (i + 1 < pidStats.length) Some(pidStats(i + 1)._4) else None)
      offA += pa; offB += pb
      row
    }
    val ta = offA
    val tb = offB
    import a.sparkSession.implicits._
    val offsets = offsetRows.toSeq
      .toDF("__pid", "__offa", "__offb", "__nextfirst")

    // Data plane: per-partition prefix sums — each window partition is
    // ONE range partition, so every task sorts only its own slice.
    val pidWin = Window.partitionBy("__pid").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leadWin = Window.partitionBy("__pid").orderBy("x")
    ranged
      .withColumn("__ca", sum("na").over(pidWin))
      .withColumn("__cb", sum("nb").over(pidWin))
      .withColumn("__nx", lead("x", 1).over(leadWin))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("ca", col("__ca") + col("__offa"))
      .withColumn("cb", col("__cb") + col("__offb"))
      .withColumn("ta", lit(ta))
      .withColumn("tb", lit(tb))
      .withColumn("fa", col("ca").cast(DoubleType) / col("ta").cast(DoubleType))
      .withColumn("fb", col("cb").cast(DoubleType) / col("tb").cast(DoubleType))
      .withColumn("next_x", coalesce(col("__nx"), col("__nextfirst")))
      .drop("__pid", "__ca", "__cb", "__nx", "__offa", "__offb", "__nextfirst")
  }

  /** (ks, wasserstein) in one pass over the ECDF frame: KS = max
    * |Fa − Fb|; W1 = Σ |Fa − Fb| · (next_x − x) over sorted distinct
    * values. */
  def ksAndWasserstein(a: DataFrame, aCol: String, b: DataFrame, bCol: String): DataFrame =
    ecdfFrame(a, aCol, b, bCol).agg(
      max(abs(col("fa") - col("fb"))).as("ks"),
      sum(when(col("next_x").isNotNull,
        abs(col("fa") - col("fb")) * (col("next_x") - col("x"))).otherwise(0.0))
        .as("wasserstein"))
}
