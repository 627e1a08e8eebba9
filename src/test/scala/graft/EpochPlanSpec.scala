package graft

import graft.sim.DomainMix
import org.apache.spark.sql.functions._

/** Pins [[DomainMix.epochPlan]] — the per-group epoch/sampling plan —
  * against hand-computed integer arithmetic: √-temperature targets,
  * the epoch cap and its reported deficit, the downsampling threshold
  * for over-sized groups, and the zero-token edge. */
class EpochPlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(rows: Seq[(String, Long)], num: Long = 1L,
      den: Long = 2L, maxEpochs: Int = 4) =
    DomainMix.epochPlan(rows.toDF("g", "n"), "g", "n", num, den, maxEpochs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("hand-computed plan: targets, epochs, deficit, thresholds") {
    // A: 100 docs x 100 tokens = 10000; B: 10 x 10 = 100
    val rows = (1 to 100).map(i => ("A", 100L)) ++
      (1 to 10).map(i => ("B", 10L))
    val got = plan(rows)
    // sqrt_w: 100, 10; total 10100; budget 5050
    // target_A = 5050*100 // 110 = 4590; target_B = 5050*10 // 110 = 459
    val (_, nA, availA, swA, tgtA, epA, achA, defA, thrA) = got("A")
    val (_, nB, availB, swB, tgtB, epB, achB, defB, thrB) = got("B")
    assert((nA, availA, swA, tgtA) == ((100L, 10000L, 100L, 4590L)))
    assert((nB, availB, swB, tgtB) == ((10L, 100L, 10L, 459L)))
    // A oversized: 1 epoch, fully achieved, downsample threshold
    assert((epA, achA, defA) == ((1L, 4590L, 0L)))
    assert(thrA == (4590L * (1L << 40) / 10000L) * (1L << 20))
    // B undersized: ceil(459/100) = 5 epochs capped to 4; deficit 59
    assert((epB, achB, defB) == ((4L, 400L, 59L)))
    assert(thrB == (1L << 60))
  }

  test("a zero-token group plans zero work and a zero threshold") {
    val got = plan(Seq(("A", 100L), ("E", 0L)))
    val (_, _, avail, sw, tgt, ep, ach, dfc, thr) = got("E")
    assert((avail, sw, tgt, ep, ach, dfc) ==
      ((0L, 0L, 0L, 0L, 0L, 0L)))
    // avail (0) is not > target (0): the keep-all branch — vacuous, a
    // zero-token group has nothing to sample either way
    assert(thr == (1L << 60))
  }

  test("budget fraction and epoch cap are honored") {
    // one group: budget = 3/4 of 1000 = 750, avail 1000 → 1 epoch
    val got = plan(Seq.fill(10)(("A", 100L)), num = 3L, den = 4L,
      maxEpochs = 2)
    val (_, _, avail, _, tgt, ep, ach, dfc, _) = got("A")
    assert((avail, tgt, ep, ach, dfc) == ((1000L, 750L, 1L, 750L, 0L)))
    // same group, budget 3x the corpus: wants 3 epochs, cap at 2
    val got2 = plan(Seq.fill(10)(("A", 100L)), num = 3L, den = 1L,
      maxEpochs = 2)
    val (_, _, _, _, tgt2, ep2, ach2, dfc2, _) = got2("A")
    assert((tgt2, ep2, ach2, dfc2) == ((3000L, 2L, 2000L, 1000L)))
  }
}
