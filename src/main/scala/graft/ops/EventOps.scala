package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational shapes beyond plain windows/sessions.
  * (The reference has no event surface at all; these are beyond-brief
  * training-pipeline operators over the events table.)
  */
object EventOps {

  /** Per-user AS-OF join within one event stream: each `leftType` event
    * is matched to the most recent `rightType` event of the SAME user
    * with `r.ts <= l.ts` (equal timestamps match — the right row sorts
    * first). Events without a prior match are dropped (inner as-of).
    *
    * Spark lacks a native as-of join; the standard compositions are a
    * range join (quadratic blowup per user) or this: tag both sides,
    * union, and take a running `last(..., ignoreNulls)` over a per-user
    * (ts, kind, event_id) window — ONE shuffle by user_id, linear work,
    * skew bounded by per-user event counts (the same scale argument as
    * sessionization; at extreme per-user volumes the window
    * range-partitions by time first). The DuckDB oracle is the engine's
    * native ASOF JOIN, so the gate pins our composition against a real
    * as-of implementation.
    *
    * @return (event_id, user_id, matched_event_id, matched_value,
    *         lag_sec) — lag in whole seconds (floor-epoch difference).
    */
  def asofJoin(events: DataFrame, leftType: String = "click",
               rightType: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def ofRight(c: org.apache.spark.sql.Column) =
      last(when(col("kind") === 0, c), ignoreNulls = true).over(w)
    events.filter(col("event_type").isin(leftType, rightType))
      .withColumn("kind", when(col("event_type") === rightType, 0).otherwise(1))
      .withColumn("r_event_id", ofRight(col("event_id")))
      .withColumn("r_ts", ofRight(col("ts")))
      .withColumn("r_value", ofRight(col("value")))
      .filter(col("kind") === 1 && col("r_event_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("r_event_id").as("matched_event_id"),
        round(col("r_value"), 6).as("matched_value"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("r_ts")))
          .as("lag_sec"))
  }
}
