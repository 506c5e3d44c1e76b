package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation under a watermark — the St5 surface.
  *
  * The reference has no event-time path (its online loop is
  * arrival-ordered, buffer.py:75-199), but a web-scale event feed needs
  * the Structured-Streaming idiom: tumbling event-time windows with a
  * bounded-lateness watermark so state is finite. The SAME transform
  * runs on a batch DataFrame (the watermark is a no-op there, the
  * window is an ordinary expression) — q49 oracles the batch semantics
  * exactly; WindowedEventsSuite drives the streaming semantics
  * (append-mode finalization, late-data drop, checkpoint resume).
  *
  * Scale shape: one shuffle on (window, event_type) with map-side
  * partial aggregation; streaming state holds only windows inside the
  * lateness horizon per key, independent of stream length. Sums go
  * through decimal(18,4) so batch, streaming, and the DuckDB oracle
  * agree bit-for-bit regardless of accumulation order.
  */
object WindowedEvents {

  /** Tumbling 1-hour windows per event_type: event count + exact value
    * sum, tolerating `lateness` of out-of-order arrival. In append mode
    * a window emits exactly once, when the watermark
    * (max-event-time − lateness) passes its end; rows arriving after
    * that are dropped — the bounded-state contract.
    */
  def hourlyByType(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
}
