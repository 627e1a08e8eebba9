package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Superseded-checkpoint rotation for iterative loops: each round's
  * eager localCheckpoint replaces the previous round's, so at most two
  * snapshots are ever live (on a 10^11-edge component graph, retaining
  * all ~15 rounds would pin 15 O(E) copies on the executors).
  *
  * The new checkpoint is materialized FIRST, then the superseded one is
  * released. Ownership is tracked by diffing the registry of
  * CHECKPOINTED RDD ids around the checkpoint call — filtering on
  * `isCheckpointed` (true only once a checkpoint has materialized,
  * never for a plain persist) so a caller's lazy `persist` whose first
  * materialization happens to run inside our checkpoint job can never
  * be captured and mis-released. Assumes the session runs one query
  * thread at a time (this engine's execution model); a concurrent
  * localCheckpoint from another thread could still be mis-attributed.
  */
final class CheckpointRotation(sc: SparkContext) {

  private def ckptIds: Set[Int] =
    sc.getPersistentRDDs.filter(_._2.isCheckpointed).keySet.toSet

  private var own: Set[Int] = Set.empty

  /** Eagerly checkpoint `df`, then release the previously rotated
    * checkpoint (if any). Returns the checkpointed frame. */
  def rotate(df: DataFrame): DataFrame = {
    val before = ckptIds
    val out = df.localCheckpoint(true)
    val fresh = ckptIds -- before
    own.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    own = fresh
    out
  }
}
