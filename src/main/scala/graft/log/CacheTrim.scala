package graft.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cloud-storage cache eviction (reference
 * `cloud_storage/cache_service.cc`): the per-broker disk cache of
 * downloaded segments trims by LRU when it exceeds its byte/object
 * limits.
 *
 * Modeled semantics:
 *  - trim triggers when current size/objects exceed `max_bytes` /
 *    `max_objects`; whichever limit is exceeded has its target scaled
 *    by the LOW WATERMARK so the trim frees headroom, not just one
 *    byte (`cache::trim`, `.cc:345-360`);
 *  - `size_to_delete` / `objects_to_delete` are the overages against
 *    the (possibly lowered) targets (`.cc:432-440`);
 *  - candidates walk in ACCESS-TIME order (LRU, `.cc:494-495`) and the
 *    walk continues while EITHER quota is unmet (`.cc:759-761`);
 *  - the walk skips the access-time tracker (trim exempt, `.cc:798`),
 *    `.part` tmp files (someone may be writing,
 *    `recursive_directory_walker.h:23`), and `.tx` / `.index`
 *    companions — those are never demoted independently
 *    (`.cc:746-755`); instead, deleting a segment
 *    (`.*\.log(\.\d+)?`, `.cc:47`) deletes its companions with it,
 *    their bytes and object counts accruing to the same quotas
 *    (`remove_segment_full`, `.cc:627-700`);
 *  - chunked `_chunks` segment directories are out of scope here.
 *
 * Spark design: totals per node aggregate once and broadcast on; the
 * walk is a per-node LRU fold (the cache is per broker), emitting one
 * decision per file. The low watermark is integral permille so the
 * DuckDB oracle replays the arithmetic bit-exactly.
 */
object CacheTrim {

  private val SegmentRe = """.*\.log(\.\d+)?"""

  final case class FileRow(node_id: Int, path: String, size_bytes: Long,
      access_time: Long, total_size: Long, total_objects: Long)
  final case class Decision(node_id: Int, path: String, size_bytes: Long,
      action: String)

  /**
   * Trim decisions over a cache file table `(node_id, path, size_bytes,
   * access_time)`. Returns one row per file with `action` ∈
   * `deleted_lru` (evicted by the walk), `deleted_companion` (removed
   * with its segment), `skipped_exempt` / `skipped_tmp` /
   * `skipped_companion` (walked over), `kept` (walk stopped before
   * reaching it, or no trim needed).
   */
  def trim(files: DataFrame, maxBytes: Long, maxObjects: Long,
      lowWatermarkPermille: Int = 800): DataFrame = {
    require(maxBytes > 0 && maxObjects > 0)
    require(lowWatermarkPermille > 0 && lowWatermarkPermille <= 1000)
    val spark = files.sparkSession
    import spark.implicits._
    val totals = files.groupBy("node_id").agg(
      sum("size_bytes").as("total_size"), count(lit(1)).as("total_objects"))
    files
      .join(broadcast(totals), Seq("node_id"))
      .select(col("node_id").cast("int"), col("path"),
        col("size_bytes").cast("long"), col("access_time").cast("long"),
        col("total_size").cast("long"), col("total_objects").cast("long"))
      .as[FileRow]
      .repartition(col("node_id"))
      .sortWithinPartitions(col("node_id"), col("access_time"), col("path"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer[Decision]()
        val buf = scala.collection.mutable.ArrayBuffer[FileRow]()
        def isExempt(p: String) = p.endsWith("/accesstime") || p.endsWith("/accesstime.tmp")
        def isTmp(p: String) = p.endsWith(".part")
        def isCompanion(p: String) = p.endsWith(".tx") || p.endsWith(".index")
        def flushNode(): Unit = {
          if (buf.isEmpty) return
          val size = buf.head.total_size
          val objects = buf.head.total_objects
          if (size <= maxBytes && objects <= maxObjects) {
            buf.foreach(f => out += Decision(f.node_id, f.path, f.size_bytes, "kept"))
          } else {
            var targetSize = maxBytes
            var targetObjects = maxObjects
            if (objects > targetObjects)
              targetObjects = targetObjects * lowWatermarkPermille / 1000
            if (size > targetSize)
              targetSize = targetSize * lowWatermarkPermille / 1000
            val sizeToDelete = size - math.min(targetSize, size)
            val objectsToDelete = objects - math.min(targetObjects, objects)
            // companion weights: deleting seg also deletes seg.tx/.index
            val byPath = buf.map(f => f.path -> f).toMap
            def companions(p: String): Seq[FileRow] =
              if (!p.matches(SegmentRe)) Seq.empty
              else Seq(s"$p.tx", s"$p.index").flatMap(byPath.get)
            var delSize = 0L; var delCount = 0L
            val deleted = scala.collection.mutable.Set[String]()
            val walked = scala.collection.mutable.Map[String, String]()
            val itSorted = buf.iterator
            var go = true
            while (go && itSorted.hasNext) {
              if (delSize >= sizeToDelete && delCount >= objectsToDelete) go = false
              else {
                val f = itSorted.next()
                if (isExempt(f.path)) walked(f.path) = "skipped_exempt"
                else if (isTmp(f.path)) walked(f.path) = "skipped_tmp"
                else if (isCompanion(f.path)) {
                  // a companion already taken with its segment keeps its
                  // deleted_companion label; otherwise it is walked over
                  if (!deleted.contains(f.path)) walked(f.path) = "skipped_companion"
                } else if (deleted.contains(f.path)) {
                  // unreachable today (only companions pre-delete), kept
                  // for safety: never double-count
                } else {
                  deleted += f.path
                  delSize += f.size_bytes; delCount += 1
                  companions(f.path).foreach { c =>
                    if (!deleted.contains(c.path)) {
                      deleted += c.path
                      delSize += c.size_bytes; delCount += 1
                      walked(c.path) = "deleted_companion"
                    }
                  }
                }
              }
            }
            buf.foreach { f =>
              val action =
                if (deleted.contains(f.path))
                  if (walked.get(f.path).contains("deleted_companion"))
                    "deleted_companion" else "deleted_lru"
                else walked.getOrElse(f.path, "kept")
              out += Decision(f.node_id, f.path, f.size_bytes, action)
            }
          }
          buf.clear()
        }
        it.foreach { f =>
          if (buf.nonEmpty && buf.head.node_id != f.node_id) flushNode()
          buf += f
        }
        flushNode()
        out.iterator
      }
      .toDF()
  }
}
