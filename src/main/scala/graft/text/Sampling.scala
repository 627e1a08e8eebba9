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
    * md5(id), tie-broken by id — [[graft.ops.Scale.saltedTopK]] keeps
    * a hot group (one dominant language) from buffering in one task. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
      quota: Int, salts: Int = 32): DataFrame =
    graft.ops.Scale.saltedTopK(
        df.withColumn("__key", rankKey(col(s"`$idCol`"))),
        Seq(col(s"`$groupCol`")), Seq(col("__key"), col(s"`$idCol`")),
        quota, saltOn = col(s"`$idCol`"), rankCol = "sample_rank", salts = salts)
      .drop("__key")
}
