package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative localCheckpoint loops.
  *
  * `Dataset.localCheckpoint` persists its internal RDD directly in the
  * block manager, OUTSIDE the cache manager — `clearCache()` never sees
  * it, and the ContextCleaner frees the blocks only when the RDD object
  * is garbage-collected. An iterative fixpoint that replaces its
  * checkpoint every round (PageRank, BFS, k-core peeling, HashMin
  * components) therefore accumulates one superseded vertex-sized block
  * set per round until a GC happens to run: ~60 retained copies for a
  * converged PageRank at the 100× probe, executor-memory pressure that
  * evicts/spills later queries' shuffle blocks long before the driver
  * GCs. The fix is to free the PREVIOUS round's checkpoint storage
  * explicitly the moment the new one is materialized.
  */
object Checkpoints {

  /** Free the block-manager storage behind a superseded localCheckpoint
    * result. Safe to call on any DataFrame: only plans that ARE a
    * checkpoint scan (LogicalRDD leaves) carry persisted RDDs to free;
    * anything else is a no-op. Non-blocking — the loop's next action
    * overlaps the async block removal. */
  def free(ds: DataFrame): Unit =
    ds.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
