package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over embedding columns (north-star mandate).
  *
  * Brute-force is the exact baseline: a blocked self-join with the
  * small query side broadcast, scoring inside codegen'd array
  * expressions. The scale path is LSH bucketing (deterministic
  * random-hyperplane signs): candidates collide on bucket keys, so the
  * join is an equi-join on a short key instead of a cross product —
  * the standard recipe when the corpus no longer fits a broadcast.
  *
  * Scores are ROUNDED to `scale` decimals before ranking, with id
  * tie-breaks, so rankings are reproducible across engines and
  * partitionings (raw float sums differ in the last ulp).
  */
object Similarity {

  /** Sequential-order double dot product of two float array columns
    * (higher-order functions evaluate left-to-right — deterministic). */
  def dot(a: Column, b: Column): Column =
    expr(s"aggregate(zip_with(${a.toString}, ${b.toString}, " +
      "(x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)")

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def round4(c: Column, scale: Int): Column =
    round(c, scale)

  /** Exact top-k cosine neighbors for each query vector. `queries`
    * side is broadcast (it is the small side by contract). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, scale: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round4(cosine(col("qv"), col("cv")), scale).as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "score", "rk")
  }

  /** Deterministic random hyperplanes: `numPlanes` × `dim` weights in
    * [-1, 1) from a fixed-seed generator. Returned as plain Scala so
    * the oracle SQL can embed identical literals. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(math.rint((rng.nextDouble() * 2 - 1) * 1000) / 1000))
  }

  /** Sign-bucket id: bit p set when v · plane_p > 0. */
  def lshBucket(vecCol: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeArr = s"array(${p.mkString("D,")}D)"
      when(expr(s"aggregate(zip_with(${vecCol.toString}, $planeArr, " +
        "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)") > 0,
        lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the same LSH bucket.
    * Equi-join on bucket — no cross product; recall trades off with
    * `numPlanes` (more planes → smaller buckets). */
  def lshCosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, numPlanes: Int, dim: Int, scale: Int = 4): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bucketed = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("query_id"), col("v").as("qv"))
    val b = bucketed.select(col("bucket"), col("id").as("neighbor_id"), col("v").as("cv"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round4(cosine(col("qv"), col("cv")), scale).as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "score", "rk")
  }
}
