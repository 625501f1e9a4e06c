package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props). Batch forms of the usual streaming shapes:
  * tumbling-window aggregation, gap sessionization, per-key top-k — each a
  * single shuffle on its natural key. */
object Events {
  /** Epoch seconds (floor) from a raw INT64 nanosecond-epoch column (the
    * events table is TIMESTAMP(NANOS) parquet, read with
    * spark.sql.legacy.parquet.nanosAsLong=true). Integer math throughout —
    * a double division of ~1e18 ns would lose whole seconds near
    * boundaries. */
  def epochSec(ts: Column): Column =
    ((ts - pmod(ts, lit(1000000000L))).cast("decimal(38,0)") / lit(1000000000L)).cast("long")

  /** Tumbling-window aggregate: (event_type, window start) → count, sum. */
  def hourly(events: DataFrame): DataFrame = {
    val es = epochSec(col("ts"))
    events.groupBy(col("event_type"), (es - pmod(es, lit(3600L))).as("hour_start"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  /** Gap sessionization: a new session starts when the per-user gap exceeds
    * `gapSec`. One shuffle (window by user), no state store needed in batch;
    * the streaming twin would be flatMapGroupsWithState with a session
    * timeout. Returns (user_id, n_sessions, n_events). */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    // order by whole seconds (not raw ts) so the gap flags are reproducible
    // across engines that read the nanosecond timestamps at different precision
    val w = Window.partitionBy(col("user_id")).orderBy(epochSec(col("ts")).asc, col("event_id").asc)
    events
      .withColumn("__prev", lag(epochSec(col("ts")), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        epochSec(col("ts")) - col("__prev") > gapSec, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("__new")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Hourly volume anomaly detection per event type: z-score of each
    * (type, hour) event count against that type's own hourly mean and
    * sample standard deviation — the ops-dashboard question ("which hour
    * is off-profile for this event type?") as one operator. Output:
    * (event_type, hour_start, n, z rounded to 4); types whose volume
    * never varies (sd = 0 or a single hour) emit nothing. Filter |z| at
    * the call site for an alert threshold.
    *
    * Scale shape: the hourly aggregate is the only corpus-wide shuffle
    * ([[hourly]]'s one hash-agg); the per-type stats frame is
    * types-sized and broadcasts back. */
  def anomaly(events: DataFrame): DataFrame = {
    val h = hourly(events).select(col("event_type"), col("hour_start"), col("n"))
    val stats = h.groupBy("event_type")
      .agg(avg(col("n")).as("__mu"), stddev_samp(col("n")).as("__sd"))
    h.join(broadcast(stats), "event_type")
      .filter(col("__sd") > 0)
      .select(col("event_type"), col("hour_start"), col("n"),
        round((col("n") - col("__mu")) / col("__sd"), 4).as("z"))
  }

  /** Top-k events per user by value (deterministic tie-break on event_id). */
  def topKByValue(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
    events.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("user_id"), col("event_id"), col("rank"))
  }

  /** As-of join: attach to every left event the LATEST right event at or
    * before its timestamp for the same key (the time-series enrichment
    * join Spark has no native operator for). Rights sharing one (key, ts)
    * are pre-collapsed to the max id so the match is deterministic.
    * Output: (leftId, keyCol, as_of_<rightId>) — null when no right event
    * precedes the left one.
    *
    * Scale shape: NOT a range join (whose candidate set is quadratic in
    * events-per-key) — both sides union into one stream, ONE shuffle on
    * the key, and a running `last(ignoreNulls)` over the per-key time
    * order resolves every left row in a single sorted pass. Rights sort
    * before lefts at equal timestamps, giving at-or-before semantics. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           leftId: String, rightId: String): DataFrame = {
    val r0 = right.groupBy(col(keyCol), col(tsCol)).agg(max(col(rightId)).as("__rid"))
    val l = left.select(col(keyCol), col(tsCol), col(leftId).as("__lid"),
      lit(null).cast("long").as("__rid"), lit(0).as("__side"))
    val r = r0.select(col(keyCol), col(tsCol), lit(null).cast("long").as("__lid"),
      col("__rid"), lit(1).as("__side"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__lid").as(leftId), col(keyCol), col("__last").as(s"as_of_$rightId"))
  }

  /** Range (interval-containment) join: every point joined to the
    * intervals of the same key containing it, half-open [start, end).
    * Output: (keyCol, pointId, intervalId).
    *
    * Scale shape: NOT a naive inequality join (quadratic per key) — the
    * time axis is cut into `bin`-sized buckets, each interval explodes to
    * the bins it covers (≈ length/bin rows), points map to exactly one
    * bin, and the join is a plain equi-join on (key, bin) with the exact
    * containment test as a post-filter. All bucket arithmetic is exact
    * long math (ts − pmod): at nanosecond scale a double division has
    * already lost the low bits. Pick `bin` near the typical interval
    * length — too small multiplies interval rows, too large packs
    * unrelated points into each bucket. */
  def rangeJoin(points: DataFrame, pointId: String, tsCol: String,
                intervals: DataFrame, intervalId: String,
                startCol: String, endCol: String,
                keyCol: String, bin: Long): DataFrame = {
    require(bin > 0, s"need bin > 0, got $bin")
    def aligned(c: org.apache.spark.sql.Column) = c - pmod(c, lit(bin))
    val iv = intervals.filter(col(endCol) >= col(startCol))
      .select(col(keyCol), col(intervalId), col(startCol), col(endCol),
        explode(sequence(aligned(col(startCol)), aligned(col(endCol)), lit(bin))).as("__bin"))
    points.select(col(keyCol), col(pointId), col(tsCol), aligned(col(tsCol)).as("__bin"))
      .join(iv, Seq(keyCol, "__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .select(col(keyCol), col(pointId), col(intervalId))
  }

  /** Cohort retention: bucket time into `bucketSec` periods, assign each
    * user to the cohort of their FIRST active bucket, and count distinct
    * users active again k periods later. Output: (cohort_start,
    * periods_later, n_users) — the retention matrix, cohort 0-offset row
    * included (its n_users is the cohort size).
    *
    * Scale shape: the (user, bucket) activity set is one distinct
    * aggregate; the cohort assignment reuses the user_id partitioning;
    * the final matrix aggregate is tiny (cohorts × offsets). The raw
    * event stream is scanned exactly once. */
  def retention(events: DataFrame, bucketSec: Long = 86400L): DataFrame = {
    require(bucketSec > 0, s"need bucketSec > 0, got $bucketSec")
    val es = epochSec(col("ts"))
    val active = events.select(col("user_id"),
        (es - pmod(es, lit(bucketSec))).as("__b"))
      .distinct()
    val cohort = active.groupBy("user_id").agg(min("__b").as("__c"))
    active.join(cohort, "user_id")
      .select(col("__c").as("cohort_start"),
        ((col("__b") - col("__c")) / lit(bucketSec)).cast("long").as("periods_later"))
      .groupBy("cohort_start", "periods_later")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel: how far each user progresses through `stages`, where
    * stage i+1 counts only if it happens STRICTLY AFTER the user's
    * earliest qualifying stage-i event (the standard sequential-earliest
    * funnel semantics). Output: (user_id, stages_completed) for every
    * user who completed at least stage 1.
    *
    * Scale shape: stage 1 is one filtered aggregate shuffling on user_id;
    * every later stage joins the (shrinking) survivor frame back to the
    * events filtered to that stage's type — all keyed on user_id, so the
    * chain reuses one partitioning end-to-end and AQE coalesces the
    * monotonically smaller exchanges. No window over the full event
    * stream, no per-user array materialization. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("__t"))
    val frames = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("__t").as("__pt")), "user_id")
        .filter(col("ts") > col("__pt"))
        .groupBy("user_id").agg(min("ts").as("__t"))
    }
    frames.map(_.select(col("user_id")))
      .reduce(_ unionByName _)
      .groupBy("user_id")
      .agg(count(lit(1)).as("stages_completed"))
  }
}
