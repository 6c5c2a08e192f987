package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Eager multi-consumer materialization ("pin") for intermediates that
 * feed several downstream actions or non-reusable exchange shapes.
 *
 * Local mode (the bench/verify session shape) uses eager
 * `localCheckpoint(true)`: a plain `cache()` is lazily filled, and under
 * AQE the consumers' racing query stages each recompute the full
 * upstream DAG before the InMemoryRelation is populated (measured 2-4x
 * on the dedup operators, OPTIMIZATION_r17.md §2); the checkpoint's
 * severed lineage is irrelevant in-process, where losing an executor is
 * losing the job anyway.
 *
 * Cluster mode keeps the lineage: persist + an eager `count()` (which
 * fully materializes the InMemoryRelation, closing the same AQE race)
 * so an executor loss or dynamic-allocation decommission recomputes the
 * blocks instead of failing every downstream action — Spark's documented
 * `localCheckpoint` caveat.
 *
 * [[Pins.unpin]] releases persisted blocks deterministically once every
 * consuming action has run — on the cluster (persist) path a
 * long-running stream must not wait on the ContextCleaner to free each
 * micro-batch's pin. On the local (checkpoint) path `unpersist()` is a
 * benign no-op (the blocks belong to the checkpointed RDD and are freed
 * when it is GC'd); call it only after ALL consumers either way.
 */
object Pins {
  implicit final class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned(): DataFrame =
      if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(true)
      else {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
  }

  def unpin(dfs: DataFrame*): Unit =
    dfs.foreach(df => try df.unpersist()
      catch { case scala.util.control.NonFatal(_) => () })
}
