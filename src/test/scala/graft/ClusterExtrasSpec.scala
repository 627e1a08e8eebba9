package graft

import graft.cluster.{CharNgramEmbedder, Clustering, StrategyPredictor, TwoStage}
import graft.profile.{HeuristicTyper, Profiler, SemanticTyping}
import org.apache.spark.sql.functions._

/** Specs for NMI (M11), two-stage clustering (M5/M6), semantic typing
  * (M8/M9) and GBT strategy prediction (M10). */
class ClusterExtrasSpec extends SparkSpec {

  test("NMI: identical, permuted, and independent assignments") {
    import spark.implicits._
    val a = Seq(("x", 0), ("y", 0), ("z", 1), ("w", 1)).toDF("column_id", "cluster_id")
    // same partition under different labels → NMI 1
    val b = Seq(("x", 5), ("y", 5), ("z", 9), ("w", 9)).toDF("column_id", "cluster_id")
    assert(math.abs(Clustering.normalizedMutualInfo(a, b) - 1.0) < 1e-9)
    assert(math.abs(Clustering.normalizedMutualInfo(a, a) - 1.0) < 1e-9)
    // one big cluster vs the split → MI 0
    val c = Seq(("x", 0), ("y", 0), ("z", 0), ("w", 0)).toDF("column_id", "cluster_id")
    assert(Clustering.normalizedMutualInfo(a, c) === 0.0)
  }

  test("char-ngram embedder: similar names closer than dissimilar") {
    val e = new CharNgramEmbedder()
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val simNear = cos(e.embed("customer_2019"), e.embed("customer_2020"))
    val simFar = cos(e.embed("customer_2019"), e.embed("supplier"))
    assert(simNear > simFar)
    assert(simNear > 0.5)
  }

  test("two-stage clustering groups split tables and clusters columns") {
    val need = Set("mode", "pattern")
    val profiles = Seq("customer", "supplier", "nation")
      .map(t => Profiler.profileAuto(Tables.load(spark, sf, t), t, features = need))
      .reduce(_.unionByName(_))
    val out = TwoStage.cluster(profiles).collect()
    assert(out.length === profiles.count())
    // every column got a table group; ids are "table::column"
    val groups = out.map(r => r.getString(0).split("::")(0) -> r.getInt(1)).toMap
    assert(groups.keySet === Set("customer", "supplier", "nation"))
  }

  test("semantic typing heuristics") {
    val profiles = Profiler.profileAuto(Tables.load(spark, sf, "customer"),
      "customer", features = Set("mode"))
    val typed = SemanticTyping.annotate(profiles, HeuristicTyper)
      .select("column", "semantic_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(typed("c_custkey") === "identifier")
    assert(typed("c_name") === "name")
    assert(typed("c_acctbal") === "amount")
  }

  test("k-distance curve is sorted and sized like the input") {
    val pts = Seq(
      "a" -> Array(0.0, 0.0), "b" -> Array(0.0, 1.0),
      "c" -> Array(1.0, 0.0), "d" -> Array(10.0, 10.0))
    val curve = Clustering.kDistance(pts, k = 1)
    assert(curve.length === 4)
    assert(curve === curve.sorted)
    assert(curve.last > 9.0) // the isolated point's nearest neighbor is far
  }

  test("rule-centric assignment picks the most similar prototype") {
    import spark.implicits._
    import org.apache.spark.ml.linalg.Vectors
    val vecs = Seq(
      ("t::unique_col", Vectors.dense(1.0, 0.0)),
      ("t::nullable_col", Vectors.dense(0.0, 1.0))).toDF("column_id", "features")
    val protos = Map(
      "is_unique" -> Array(1.0, 0.0), "is_nullable" -> Array(0.0, 1.0))
    val assigned = Clustering.ruleCentricAssign(vecs, protos).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(assigned("t::unique_col") === "is_unique")
    assert(assigned("t::nullable_col") === "is_nullable")
  }

  test("vectorize supports standard and maxabs scaler blocks") {
    val profiles = Profiler.profileAuto(Tables.load(spark, sf, "nation"),
      "nation", features = Set("mode", "pattern"))
    Seq("minmax", "standard", "maxabs").foreach { s =>
      val v = Clustering.vectorize(profiles, scaler = s)
      assert(v.count() === 3)
    }
    assertThrows[IllegalArgumentException](
      Clustering.vectorize(profiles, scaler = "nope"))
  }

  test("GBT predicts a planted monotone relation") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // label = null_ratio (planted signal), other features noise
    val rows = (1 to 200).map { i =>
      val nullRatio = rng.nextDouble()
      ("t", s"c$i", nullRatio, nullRatio, rng.nextDouble(), rng.nextDouble())
    }
    val df = rows.toDF("table", "column", "label", "null_ratio",
      "unique_ratio", "avg_len")
    val feats = Seq("null_ratio", "unique_ratio", "avg_len")
    val model = StrategyPredictor.fit(df, feats)
    val preds = StrategyPredictor.predict(model, df, feats)
    val mae = preds.agg(avg(abs(col("prediction") - col("label"))))
      .head().getDouble(0)
    assert(mae < 0.05)
  }
}
