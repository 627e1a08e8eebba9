package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for LLM training pipelines: quota
  * (stratified) selection per group — e.g. "at most N documents per
  * language" to rebalance a web crawl.
  *
  * The sample must be reproducible across engines and runs, so the
  * selection key is a PORTABLE uniform hash: md5 of the document id's
  * decimal string (identical in any engine), not a JVM-specific hash
  * or an RNG. Taking the `quota` smallest keys per group is then an
  * exact, seedless uniform sample.
  */
object Sampling {

  /** Portable per-row rank key. */
  def rankKey(id: Column): Column = md5(id.cast("string"))

  /** At most `quota` rows per `groupCol`, the ones with the smallest
    * md5(id), tie-broken by id. Two-phase top-k (the repo's salted
    * pattern): a single window per group would buffer a whole group in
    * one task — a hot group (one dominant language) becomes an
    * unsplittable straggler at scale. Phase 1 ranks within `salts`
    * hash buckets (parallel, each ~group/salts); the global smallest-k
    * is a subset of the per-bucket smallest-k, so phase 2's exact
    * window sees at most salts·quota rows per group. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
      quota: Int, salts: Int = 32): DataFrame = {
    val key = rankKey(col(s"`$idCol`"))
    val saltWin = Window.partitionBy(col(s"`$groupCol`"), col("__salt"))
      .orderBy(col("__key"), col(s"`$idCol`"))
    val win = Window.partitionBy(col(s"`$groupCol`"))
      .orderBy(col("__key"), col(s"`$idCol`"))
    df.withColumn("__key", key)
      .withColumn("__salt", pmod(xxhash64(col(s"`$idCol`")), lit(salts)))
      .withColumn("__prk", row_number().over(saltWin))
      .filter(col("__prk") <= quota)
      .withColumn("sample_rank", row_number().over(win))
      .filter(col("sample_rank") <= quota)
      .drop("__key", "__salt", "__prk")
  }
}
