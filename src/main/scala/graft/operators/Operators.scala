package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Remaining reference operators that are plain declarative plans:
 * usage metering (A5), Iceberg partition transforms (D4), record
 * translation (D2), and the WASM-transform semantic corpus (U1/U3) —
 * plus log-native extensions (as-of join, salted skew join).
 */
object Operators {

  /**
   * As-of join: for every left row, the most recent right row with
   * `right.ts <= left.ts` per key (LEFT semantics: unmatched left rows
   * keep null right values). The classic log/timeseries operator Spark
   * lacks natively.
   *
   * Scale design: NOT a per-row range scan or an inequality join (which
   * Spark would execute as a broadcast-nested-loop). Both sides union
   * into one stream sorted per key by (ts, side) — right rows first on
   * ties, so same-timestamp matches are inclusive — and one running
   * `last(non-null)` window carries each right row's payload forward to
   * every following left row. One shuffle on the key, one sort, linear
   * in total rows; right payloads travel as a struct so genuinely-null
   * payload FIELDS don't break the carry.
   *
   * `right` must be unique per (keys, ts) — pre-compact it otherwise.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val l = left
      .withColumn("__rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightValueCols.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
      .withColumn("__side", lit(1))
    val r = right.select(
      (keyCols :+ tsCol).map(col) ++
        Seq(struct(rightValueCols.map(col): _*).as("__rv"), lit(0).as("__side")) ++
        leftCols.filterNot((keyCols :+ tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carried", last("__rv", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /**
   * Range (interval-containment) join: pair every point row with the
   * interval rows of the same key that contain it
   * (`start <= pt <= end`). Spark plans a raw inequality join as a
   * nested loop; here both sides map to fixed-width buckets — an
   * interval explodes to every bucket it overlaps, a point to its one
   * bucket — so the join is an equi-join on (key, bucket) with an exact
   * containment filter behind it. Linear in points + interval-bucket
   * overlap; pick `bucketWidth` near the typical interval length.
   */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(i, keyCols :+ "__bucket")
      .where(col(ptCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /**
   * Salted equi-join for skewed keys: the big side gets a random-free
   * deterministic salt, the small side is replicated `salts` times, and
   * the join key becomes (key, salt) — spreading one hot key over
   * `salts` tasks (the manual form of AQE's skew-join split, usable when
   * AQE can't see the skew, e.g. under a window or in streaming).
   */
  def skewSaltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      salts: Int,
      saltSource: Column): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keyCols :+ "__salt").drop("__salt")
  }

  /**
   * A5 usage metering: fixed-width tumbling windows of bytes, aligned to
   * the epoch (`kafka/server/usage_aggregator.h:29-38,83`). Textbook
   * map-side-combinable aggregation: one shuffle on (window, group).
   */
  def usageWindows(df: DataFrame, tsCol: Column, groupCol: Column, bytesCol: Column): DataFrame =
    df.groupBy(date_trunc("hour", tsCol).as("window_start"), groupCol.as("grp"))
      .agg(sum(bytesCol).as("bytes"), count(lit(1)).as("records"))

  /**
   * A5 session metering: gap-based session windows per group —
   * consecutive events merge into one session while the gap between
   * them stays at or under `gap`; a `> gap` silence starts a new session
   * (Spark's `session_window`, the same islands semantics a SQL
   * lag-and-running-sum derivation produces). One shuffle on the group
   * key; the session merge runs inside the aggregation — no corpus
   * window, no self-join.
   */
  def sessionWindows(df: DataFrame, tsCol: Column, groupCol: Column,
      gap: String): DataFrame =
    df.groupBy(session_window(tsCol, gap).as("w"), groupCol.as("grp"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("grp"), col("n_events"))

  /**
   * D4 Iceberg partition transforms (`iceberg/transform.h:16-37`):
   * identity / bucket / truncate / year / month / day / hour. The
   * reference's default topic materialization partitions by
   * hour(timestamp) (`datalake/table_definition.cc:57-66`).
   */
  def icebergTransforms(df: DataFrame, tsCol: Column, idCol: Column, strCol: Column, nBuckets: Int): DataFrame =
    df.select(
      year(tsCol).as("t_year"),
      month(tsCol).as("t_month"),
      dayofmonth(tsCol).as("t_day"),
      hour(tsCol).as("t_hour"),
      pmod(idCol, lit(nBuckets)).cast("int").as("t_bucket"),
      substring(strCol, 1, 3).as("t_truncate"))

  /**
   * U3 transform corpus, from the reference SDK examples
   * (`src/transform-sdk/go/transform/example_*_test.go`):
   * mirror = identity projection; regexp filter; transcode; validation
   * with dead-letter routing. Each is a per-record flatMap in the
   * reference (`transform/transform_processor.h:78`); in Spark they are
   * narrow (no-shuffle) plans.
   */
  def transformMirror(df: DataFrame): DataFrame = df

  def transformRegexFilter(df: DataFrame, valueCol: Column, pattern: String): DataFrame =
    df.where(valueCol.rlike(pattern))

  def transformTranscode(df: DataFrame, out: Column): DataFrame =
    df.select(out.as("value"))

  /** Validation: tag rows valid/dead-letter; caller routes on `route`. */
  def transformValidate(df: DataFrame, isValid: Column): DataFrame =
    df.withColumn("route", when(isValid, lit("output")).otherwise(lit("dead_letter")))

  /**
   * A5b usage ring (reference `kafka/server/usage_manager.h` /
   * `usage_aggregator.h`): node usage is kept in a FIXED ring of
   * `numWindows` windows of `intervalS` seconds. Window open
   * timestamps come from timer fires and are SNAPPED to the interval
   * grid when within the error threshold (2 s for sub-2-minute
   * intervals, else 2 min — `detail::round_to_interval`); a fire
   * outside the threshold keeps its raw stamp and flags unaligned.
   * Only the newest `numWindows` windows survive (ring overwrite);
   * bytes accumulate into the window open at their timestamp.
   *
   * Spark design: the fire list is bounded control-plane metadata —
   * snap + lead() give each window its [begin, end) range; the byte
   * roll-up is one broadcast range join + aggregate over the data.
   */
  def usageRing(fires: DataFrame, events: DataFrame, tsSCol: Column,
      sentCol: Column, recvCol: Column, intervalS: Long,
      numWindows: Int): DataFrame = {
    val thr = if (intervalS < 120) 2L else 120L
    val snapped = fires.select(col("fire_s"))
      .withColumn("__cur", col("fire_s") - pmod(col("fire_s"), lit(intervalS)))
      .withColumn("__next", col("__cur") + intervalS)
      .withColumn("begin_s",
        when(col("fire_s") - col("__cur") <= thr, col("__cur"))
          .when(col("__next") - col("fire_s") <= thr, col("__next"))
          .otherwise(col("fire_s")))
      .withColumn("aligned", pmod(col("begin_s"), lit(intervalS)) === 0)
      .select("begin_s", "aligned").distinct()
    // bounded window list: rank + range ends via control-plane window
    val w = org.apache.spark.sql.expressions.Window.orderBy("begin_s")
    val ring = snapped
      .withColumn("end_s", lead("begin_s", 1, Long.MaxValue).over(w))
      .withColumn("__idx_desc", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("begin_s").desc)))
      .where(col("__idx_desc") <= numWindows)
    val rolled = events
      .select(tsSCol.as("__ts"), sentCol.as("__sent"), recvCol.as("__recv"))
      .join(broadcast(ring),
        col("__ts") >= col("begin_s") && col("__ts") < col("end_s"))
      .groupBy("begin_s", "aligned", "__idx_desc")
      .agg(sum("__sent").as("bytes_sent"), sum("__recv").as("bytes_received"))
    ring.select("begin_s", "aligned", "__idx_desc")
      .join(rolled.drop("aligned").drop("__idx_desc"), Seq("begin_s"), "left")
      .select(col("__idx_desc").as("w"), col("begin_s"), col("aligned"),
        coalesce(col("bytes_sent"), lit(0L)).as("bytes_sent"),
        coalesce(col("bytes_received"), lit(0L)).as("bytes_received"),
        (col("__idx_desc") === 1).as("open"))
  }
}
