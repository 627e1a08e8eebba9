package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale primitives the 100 TB deployment leans on (north-star
  * mandate): skew-safe aggregation via salting, and co-located joins
  * via bucketing. Both preserve exact semantics — specs assert
  * equality with the naive plans.
  */
object Scale {

  /** Two-phase salted count for skewed keys: phase 1 aggregates
    * (key, salt) — spreading one hot key over `salts` reducers —
    * phase 2 merges the partials per key. Identical result to
    * groupBy(key).count(); the second shuffle carries only
    * #keys × salts pre-aggregated rows.
    *
    * Spark's map-side partial aggregation already absorbs most skew
    * for algebraic aggregates; salting matters when the DISTINCT
    * combination space under one hot key is itself huge (e.g.
    * collect_set-like states) or when AQE skew handling is off. */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() +
        monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(s"`$keyCol`"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(s"`$keyCol`"))
      .agg(sum("__partial").as("cnt"))

  /** Write both sides of a repeated equi-join bucketed on the join key:
    * subsequent joins of the saved tables are exchange-free (each
    * bucket pair joins in place — the plan shows no ShuffleExchange on
    * either side). The standard co-location strategy for a join that
    * runs every day at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables saved by [[writeBucketed]] on their
    * bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
