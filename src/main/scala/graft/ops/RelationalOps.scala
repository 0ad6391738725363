package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark's built-in surface lacks: the as-of join
  * and the interval (range) join. Both are expressed as compositions of
  * built-in operators that Catalyst can optimize — no custom physical
  * nodes — chosen so the plan that comes out is the one a hand-written
  * physical operator would produce anyway:
  *
  *   - as-of join: ONE shuffle on the key and ZERO join operators (the
  *     union + ordered-window formulation), instead of the naive
  *     equi-join + per-left-row max subquery, which shuffles twice and
  *     materializes every (left, right-candidate) pair;
  *   - interval join: a bucketized equi-join, instead of the
  *     range-predicate theta join Spark would otherwise plan as
  *     BroadcastNestedLoopJoin (or worse, CartesianProduct) — per-pair
  *     work drops from |points|·|intervals| to the true overlap count
  *     plus one bucket row per (interval, covered bucket).
  *
  * Scale notes (100 TB): both shapes shuffle each input exactly once on
  * a short key (the join/partition key or the time bucket), both are
  * AQE-splittable on skew, and neither ever materializes a cross
  * product. The as-of window is partitioned per key — no global sort.
  */
object RelationalOps {

  /** As-of join: for each `left` row, attach the payload of the LATEST
    * `right` row with the same key and `rightTime <= leftTime` (nulls if
    * none). The classic shapes: trade→last-quote, purchase→last-click
    * attribution, probe→last-config-snapshot.
    *
    * Semantics pinned for determinism:
    *   - inclusive: a right row AT the left row's timestamp is visible
    *     (right rows sort before left rows at equal time);
    *   - among right rows tied on (key, time), the one with the GREATEST
    *     `rightTieBreak` wins — the caller names a unique column (an id)
    *     so the result is a pure function of the data, not of partition
    *     physical order;
    *   - left rows are returned exactly once each, unchanged, with the
    *     right payload columns appended as `prefix + name`.
    *
    * Plan shape: tag-union the two inputs, ONE hash-partition shuffle on
    * the key, per-key sort by (time, side, tiebreak), and a running
    * `last(payload, ignoreNulls)` window. No Join operator exists in the
    * plan at all — there is nothing to broadcast, nothing to skew beyond
    * the key distribution itself, and the right side is never
    * re-scanned per left row. Ties among LEFT rows (same key+time) are
    * harmless: left rows carry a null payload, so the ignore-nulls
    * running last is identical whichever physical order they land in.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: String,
      prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asofJoin: payload columns required")
    require(left.schema(leftKey).dataType == right.schema(rightKey).dataType,
      s"asofJoin: key types must match ($leftKey vs $rightKey)")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"asofJoin: time types must match ($leftTime vs $rightTime)")

    // Rows ride whole, as one struct per side, so the caller's schema is
    // reproduced exactly on the way out; the other side carries a typed
    // null of the same struct so the union lines up.
    val rStructT = right.select(
      struct((payload :+ rightTieBreak).distinct.map(right(_)): _*)
        .as("__r")).schema("__r").dataType
    val lStructT = left.select(
      struct(left.columns.map(left(_)): _*).as("__l"))
      .schema("__l").dataType
    val tbT = right.schema(rightTieBreak).dataType

    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).as("__tb"),
      struct((payload :+ rightTieBreak).distinct.map(right(_)): _*)
        .as("__r"),
      lit(null).cast(lStructT).as("__l"))
    val l = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tbT).as("__tb"),
      lit(null).cast(rStructT).as("__r"),
      struct(left.columns.map(left(_)): _*).as("__l"))

    val unioned = r.unionByName(l, allowMissingColumns = false)

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val outLeft = left.columns.map(c => col("__l").getField(c).as(c))
    val outRight =
      payload.map(c => col("__match").getField(c).as(prefix + c))
    matched.select(outLeft ++ outRight: _*)
  }

  /** Interval (range) join: pair every `points` row with every
    * `intervals` row whose `[lo, hi)` window contains the point's time
    * (lo inclusive, hi exclusive). Returns the matched pairs — interval
    * columns first, point columns appended as `prefix + name` — each
    * pair EXACTLY ONCE (no post-dedup needed: a point lives in exactly
    * one bucket, and an interval lists each covered bucket once).
    *
    * `bucketMillis` is the equi-join granularity: intervals explode to
    * one row per covered bucket (`sequence(floor(lo/w), floor((hi-1)/w))`),
    * points map to their single bucket, and the range predicate is
    * re-checked after the bucket equi-join. Pick it near the typical
    * interval length: too small and intervals explode to many rows, too
    * large and the post-filter discards most bucket matches. Either way
    * the join itself is a plain hash equi-join on a LONG — shuffled or
    * broadcast by Catalyst/AQE like any other, never a nested loop.
    *
    * Degenerate/hostile inputs: an empty interval (`hi <= lo`) covers
    * nothing and is dropped before the explode; an interval vastly
    * longer than `bucketMillis` is the caller's explosion to own —
    * `require` guards a zero/negative width.
    */
  def intervalJoin(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketMillis: Long,
      prefix: String = "pt_"): DataFrame = {
    require(bucketMillis > 0, "intervalJoin: bucketMillis must be > 0")

    // cast: parquet timestamps arrive as TIMESTAMP_NTZ; the session tz is
    // UTC library-wide, so NTZ→LTZ is the identity and unix_millis is the
    // naive epoch both engines agree on.
    def bucketOf(t: Column): Column =
      floor(unix_millis(t.cast("timestamp")) / lit(bucketMillis))
        .cast("long")

    val ivals = intervals
      .where(col(hiCol) > col(loCol))
      .withColumn("__b",
        explode(sequence(bucketOf(col(loCol)),
          // hi is exclusive: the last covered bucket is the one holding
          // hi - 1ms, so a [10:00, 10:10) window at 10-min buckets lists
          // one bucket, not two.
          floor((unix_millis(col(hiCol).cast("timestamp")) - 1) /
            lit(bucketMillis)).cast("long"))))

    val pts = points
      .withColumn("__b", bucketOf(col(pointTime)))
      .select(col("__b") +: points.columns.map(c =>
        col(c).as(prefix + c)): _*)

    val pTime = col(prefix + pointTime)
    ivals
      .join(pts, "__b")
      .where(pTime >= col(loCol) && pTime < col(hiCol))
      .drop("__b")
  }
}
