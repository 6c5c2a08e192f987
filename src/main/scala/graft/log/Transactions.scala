package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Transactions / read_committed semantics (SURVEY §2.6, P4, A7, T4).
 *
 * Reference: `cluster/rm_stm.h` tracks per-partition open transactions and
 * aborted ranges; fetch with read_committed caps the scan at the last
 * stable offset and drops records inside aborted (pid, first, last) ranges
 * plus control batches (`kafka/server/handlers/fetch.cc:349-359`,
 * `kafka/data/replicated_partition.h:77,118-122`).
 *
 * Spark design: aborted ranges live in a small side table — the anti-join
 * below broadcasts it, so the read_committed filter costs no shuffle on
 * the data side at any scale.
 */
object Transactions {

  /**
   * P4: drop rows that fall inside an aborted transaction's offset range.
   * `aborted` has columns (pid, first, last); rows join on producer id and
   * offset containment. Broadcast anti-join: the aborted-range set is tiny
   * relative to the log.
   */
  def filterAborted(log: DataFrame, aborted: DataFrame): DataFrame =
    log.join(
      broadcast(aborted),
      log("pid") === aborted("pid") &&
        log("offset").between(aborted("first"), aborted("last")),
      "left_anti")

  /**
   * read_committed fetch: cap at LSO, drop aborted ranges and control
   * records (`replicated_partition.h:118-122`).
   */
  def readCommitted(
      log: DataFrame,
      aborted: DataFrame,
      lsoPerPartition: DataFrame,
      isControl: Column): DataFrame =
    filterAborted(log.where(!isControl), aborted)
      .join(broadcast(lsoPerPartition), Seq("partition"))
      .where(col("offset") < col("lso"))
      .drop("lso")

  /**
   * A7/T4: last stable offset per partition = min(first offset of an open
   * transaction), or high watermark when none is open
   * (`cluster/rm_stm.h:157`, `replicated_partition.h:43-53`).
   * `openTxStarts`: (partition, first_offset) of in-flight transactions.
   */
  def lastStableOffsets(log: DataFrame, openTxStarts: DataFrame): DataFrame = {
    val hwm = RecordLog.latestOffsets(log)
    val openMin = openTxStarts.groupBy("partition")
      .agg(min("first_offset").as("open_min"))
    hwm.join(openMin, Seq("partition"), "left")
      .select(col("partition"),
        coalesce(col("open_min"), col("hwm")).as("lso"))
  }
}
