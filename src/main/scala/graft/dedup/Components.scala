package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over near-duplicate pair lists —
  * the step that turns d2/d4/d5/d6 pair output into an actual deduped
  * corpus (transitive merge semantics per the reference's typo-conflict
  * merge, profile_similarity.py:67-74, scaled out).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). Each
  * round is two groupBy+equi-join passes over the edge list; the edge
  * set converges to one star per component (every node linked directly
  * to its component minimum) in O(log n) rounds. Nothing but edge
  * CHECKSUMS ever reaches the driver — no union-find, no collected
  * adjacency — so the same loop runs unchanged on a 10^11-edge graph.
  *
  * Each round's result is eagerly localCheckpoint'ed: the loop would
  * otherwise stack 2·rounds shuffles of lineage, and a lost-block
  * replay through a nondeterministic ancestor could diverge from the
  * checksummed state the convergence test saw.
  */
object Components {

  /** (labels, rounds): one row per node appearing in `pairs`, labelled
    * with its component's minimum node id. `pairs` is undirected; self
    * pairs are ignored. Fails loudly (require) if not converged within
    * `maxRounds` — silently returning a half-merged labelling would
    * corrupt a dedup downstream.
    *
    * Checkpoint lifecycle: each round's eager localCheckpoint SUPERSEDES
    * the previous round's — on a 10^11-edge graph retaining all ~15
    * rounds would pin 15 O(E) edge-set copies on the executors. The new
    * checkpoint is materialized first (eager), then the superseded one
    * is released, so at most TWO edge sets are ever live; only the
    * final fixpoint (which the returned labels frame reads) stays
    * persisted for the caller's query. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val rot = new graft.ops.CheckpointRotation(pairs.sparkSession.sparkContext)
    var edges = rot.rotate(pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var sig = checksum(edges)
    var rounds = 0
    var done = edges.isEmpty
    while (!done && rounds < maxRounds) {
      edges = rot.rotate(smallStar(largeStar(edges)))
      val s = checksum(edges)
      done = s == sig
      sig = s
      rounds += 1
    }
    require(done, s"connectedComponents did not converge in $maxRounds rounds")
    // At fixpoint the edge set is a star per component: u > v = root.
    val labels = edges.select(col("u").as("id"), col("v").as("component_id"))
      .union(edges.select(col("v").as("id"), col("v").as("component_id")))
      .groupBy("id").agg(min("component_id").as("component_id"))
    (labels, rounds)
  }

  /** Component labels plus the deterministic canonical pick:
    * (id, component_id, is_canonical) where the canonical document of a
    * component is its minimum id. */
  def dupComponents(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)._1
      .withColumn("is_canonical", col("id") === col("component_id"))

  /** Quality-ranked canonical selection: keep the highest-scoring
    * member of each component, ties broken to the LOWEST id — what a
    * production dedup actually retains (the best copy), vs
    * [[dupComponents]]' arbitrary min-id convention.
    *
    * `labels`: (idCol, componentCol) from [[connectedComponents]];
    * `scored`: (idCol, scoreCol) — any deterministic per-id NUMERIC
    * score (it is negated to build the argmax ordering; e.g. the
    * rounded [[graft.text.TextAnalysis.qualityScore]]). idCol may be
    * any orderable type — string keys work.
    *
    * Scale shape: one equi-join on id, one partially-aggregated
    * groupBy(component) whose argmax carries a single struct per
    * group, and a component-keyed join back — all keyed shuffles with
    * map-side combine; nothing all-pairs, nothing on the driver. */
  def keepBest(labels: DataFrame, scored: DataFrame, idCol: String,
      componentCol: String, scoreCol: String): DataFrame = {
    val withScore = labels.join(scored, idCol)
    // argmax as a struct MIN over (-score, id) ⇒ highest score, then
    // lowest id — a total order, so the pick is deterministic. The
    // SCORE is negated (numeric by contract), never the id, so string
    // and other orderable id types work
    val best = withScore.groupBy(componentCol)
      .agg(min(struct((-col(s"`$scoreCol`")).as("negs"),
        col(s"`$idCol`").as("id"))).as("b"))
      .select(col(s"`$componentCol`"), col("b.id").as("__best_id"))
    withScore.join(best, componentCol)
      .withColumn("keep", col(s"`$idCol`") === col("__best_id"))
      .drop("__best_id")
  }

  /** (count, xor-of-row-hashes) — an order-independent edge-set
    * fingerprint; equal fingerprints on consecutive rounds = fixpoint.
    * bit_xor (not sum) so ANSI overflow can't throw; rows are distinct
    * so xor cancellation of duplicate rows cannot occur. */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Large-star: every node u links each LARGER neighbor to
    * m = min(N(u) ∪ {u}). Preserves big→small edge orientation
    * (m ≤ u < v). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u")
      .agg(least(min(col("v")), col("u")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node u (edges oriented u > v) links each of its
    * smaller neighbors — and itself — to m = min(N(u)). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min(col("v")).as("m"))
    edges.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }
}
