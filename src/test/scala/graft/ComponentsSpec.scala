package graft

import graft.dedup.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("long chain collapses to one component (multi-round)") {
    // 0-1-2-...-19: diameter 19 forces the alternating algorithm
    // through >1 large/small-star round before the star fixpoint.
    val chain = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Components.connectedComponents(chain, "a", "b")
    assert(rounds > 1, s"chain of diameter 19 converged in $rounds round")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L to 19L).map(_ -> 0L).toMap)
  }

  test("concurrent rotating loops stay correct (shared-lock rotation)") {
    // Two multi-round CC queries on separate threads: their checkpoint
    // rotations serialize on the shared lock, so neither can adopt (and
    // later release) the other's round snapshot. Both must converge to
    // the exact labelling.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def run(offset: Long) = Future {
      val chain = (0L until 25L).map(i => (offset + i, offset + i + 1))
        .toDF("a", "b")
      Components.connectedComponents(chain, "a", "b")._1
        .as[(Long, Long)].collect().toMap
    }
    val (r1, r2) = (run(0L), run(1000L))
    assert(Await.result(r1, 120.seconds) == (0L to 25L).map(_ -> 0L).toMap)
    assert(Await.result(r2, 120.seconds) ==
      (1000L to 1025L).map(_ -> 1000L).toMap)
  }

  test("multiple components, canonical pick, duplicate/reversed pairs") {
    val pairs = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L), // triangle {3,5,9}
      (7L, 8L), (8L, 7L),           // reversed duplicate {7,8}
      (11L, 11L),                   // self pair: ignored entirely
      (20L, 21L), (21L, 22L)        // path {20,21,22}
    ).toDF("a", "b")
    val out = Components.dupComponents(pairs, "a", "b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (3L, 3L, true), (5L, 3L, false), (9L, 3L, false),
      (7L, 7L, true), (8L, 7L, false),
      (20L, 20L, true), (21L, 20L, false), (22L, 20L, false)))
  }

  test("superseded round checkpoints are released (bounded persistence)") {
    // Before the fix, every round's localCheckpoint stayed persisted —
    // rounds+1 retained edge-set copies, a scale-killer on a 10^11-edge
    // graph. The multi-round chain (diameter 39 → >1 round) must leave
    // only the FINAL fixpoint checkpoint behind, regardless of rounds.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Components.connectedComponents(chain, "a", "b")
    assert(rounds > 1)
    val retained = spark.sparkContext.getPersistentRDDs.size
    assert(retained <= 1,
      s"$retained checkpoints retained after $rounds rounds (expected ≤ 1: the fixpoint)")
    // and the labelling built on the surviving checkpoint is intact
    assert(labels.as[(Long, Long)].collect().toMap ==
      (0L to 39L).map(_ -> 0L).toMap)
  }

  test("empty pair list yields empty labelling") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val (labels, _) = Components.connectedComponents(empty, "a", "b")
    assert(labels.isEmpty)
  }

  test("keepBest retains the highest score, ties to the lowest id") {
    val labels = Seq((1L, 1L), (4L, 1L), (7L, 1L), // component 1
      (2L, 2L), (9L, 2L)) // component 2
      .toDF("id", "component_id")
    val scored = Seq((1L, 0.5), (4L, 0.9), (7L, 0.9), // tie at 0.9 → 4
      (2L, 0.3), (9L, 0.8)) // clear best → 9
      .toDF("id", "quality")
    val out = Components.keepBest(labels, scored, "id", "component_id", "quality")
      .select("id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 1L, false), (4L, 1L, true), (7L, 1L, false),
      (2L, 2L, false), (9L, 2L, true)))
  }

  test("keepBest works with STRING ids (only the score is negated)") {
    val labels = Seq(("u1", "c1"), ("u2", "c1"), ("u3", "c1"))
      .toDF("id", "component_id")
    val scored = Seq(("u1", 0.9), ("u2", 0.9), ("u3", 0.5))
      .toDF("id", "quality")
    val out = Components.keepBest(labels, scored, "id", "component_id", "quality")
      .select("id", "keep").as[(String, Boolean)].collect().toSet
    // tie at 0.9 breaks to the lexicographically lowest id
    assert(out == Set(("u1", true), ("u2", false), ("u3", false)))
  }

  test("adaptiveComponents: driver path == distributed labels") {
    val pairs = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L),
      (7L, 8L), (11L, 11L),
      (20L, 21L), (21L, 22L),
      (40L, 41L), (41L, 42L), (42L, 40L), (40L, 43L)
    ).toDF("a", "b")
    val dist = Components.connectedComponents(pairs, "a", "b")._1
      .as[(Long, Long)].collect().toMap
    val adap = Components.adaptiveComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(adap == dist)
  }

  test("adaptiveComponents: above the edge bound it falls back, same labels") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val adap = Components.adaptiveComponents(chain, "a", "b",
        driverEdgeLimit = 5) // 30 edges > 5: distributed path
      .as[(Long, Long)].collect().toMap
    assert(adap == (0L to 30L).map(_ -> 0L).toMap)
  }

  test("adaptiveComponents: non-Long ids take the distributed path") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("u", "v")
    val got = Components.adaptiveComponents(pairs, "u", "v")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }
}
