package graft

import graft.cluster.Clustering
import graft.profile.Profiler

/** Pins the assumption the c1 oracle's unrolled-Lloyd replay rests on:
  * the seeded fit converges well within the 20 unrolled rounds (rounds
  * after convergence are no-ops, so the oracle only needs convergence
  * ≤ depth), and the kmeans++ draw sequence is exactly one nextInt +
  * one nextDouble per extra center (the total==0 fallback never fires
  * on profile features). */
class KmeansUnrollSpec extends SparkSpec {

  private def pts = {
    val profRows = Profiler.profileManyAutoRows(
      Seq("customer", "supplier", "part", "orders", "nation")
        .map(t => t -> Tables.load(spark, sf, t)),
      features = Set("mode", "pattern"),
      columns = "table" +: "column" +: Clustering.defaultFeatures)
    Clustering.minMaxScaleLocal(profRows.map(r =>
      (r.getAs[String]("table") + "::" + r.getAs[String]("column")) ->
        Clustering.featureVectorLocal(r)))
  }

  test("the seeded Lloyd fit converges within the oracle's 20 unrolled rounds") {
    val p = pts
    val deep = Clustering.kmeansLocalPoints(p, k = 4, maxIter = 50)
    val unrollDepth = Clustering.kmeansLocalPoints(p, k = 4, maxIter = 20)
    assert(deep == unrollDepth)
    // and the point count matches the schema-fixed n the oracle's
    // embedded Random draws were computed against
    assert(p.size == 24, s"schema drift: ${p.size} profile points")
  }

  test("no D² total can be zero (the draw-sequence assumption)") {
    val p = pts.sortBy(_._1)
    // distinct feature vectors exist, so min-distance totals during
    // seeding are strictly positive and the nextInt fallback branch
    // never consumes an extra draw
    assert(p.map(_._2.toSeq).distinct.size > 1)
  }
}
