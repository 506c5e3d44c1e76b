package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Edge-promotion buffer: the reference's online "crystallization" loop
  * (src/qortex/hippocampus/buffer.py:75-199): per undirected node pair,
  * accumulate hit_count and cosine scores; when hits ≥ 3 AND avg score ≥
  * 0.75, promote the pair to a persistent SIMILAR_TO edge and clear it
  * from the buffer (thresholds at buffer.py:110-112).
  *
  * Two shapes:
  *  - batch: one groupBy over an observations table (A3 in SURVEY.md §2.5)
  *  - streaming: Structured Streaming flatMapGroupsWithState, the
  *    incremental analog (state = running count/sum per pair), keyed by
  *    the undirected (min,max) pair exactly like buffer.py:77
  */
object EdgePromotion {

  final case class Observation(node_a: String, node_b: String, score: Double, ts: Long)
  final case class PairState(hits: Long, scoreSum: Double)
  final case class PromotedEdge(source_id: String, target_id: String,
      relation_type: String, confidence: Double, hits: Long)

  val PromoteHits = 3L // buffer.py:110
  val PromoteAvg = 0.75 // buffer.py:112

  /** Batch: observations → promoted SIMILAR_TO edges. */
  def promoteBatch(observations: DataFrame): DataFrame =
    observations
      .select(
        least(col("node_a"), col("node_b")).as("source_id"),
        greatest(col("node_a"), col("node_b")).as("target_id"),
        col("score"))
      .groupBy("source_id", "target_id")
      .agg(count(lit(1)).as("hits"), avg("score").as("avg_score"))
      .filter(col("hits") >= PromoteHits && col("avg_score") >= PromoteAvg)
      .select(col("source_id"), col("target_id"),
        lit("SIMILAR_TO").as("relation_type"),
        col("avg_score").as("confidence"), col("hits"))

  /** Streaming: stateful accumulation; emits a promoted edge exactly once
    * per pair (state resets after promotion, mirroring the buffer removing
    * promoted pairs — buffer.py:146-158).
    */
  def promoteStream(observations: Dataset[Observation])(
      implicit spark: SparkSession): Dataset[PromotedEdge] = {
    import spark.implicits._
    observations
      .groupByKey(o =>
        if (o.node_a <= o.node_b) (o.node_a, o.node_b) else (o.node_b, o.node_a))
      .flatMapGroupsWithState[PairState, PromotedEdge](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((a, b), rows, state: GroupState[PairState]) =>
          var s = state.getOption.getOrElse(PairState(0L, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[PromotedEdge]
          for (o <- rows) {
            s = PairState(s.hits + 1, s.scoreSum + o.score)
            if (s.hits >= PromoteHits && s.scoreSum / s.hits >= PromoteAvg) {
              out += PromotedEdge(a, b, "SIMILAR_TO", s.scoreSum / s.hits, s.hits)
              s = PairState(0L, 0.0) // crystallized: clear buffer entry
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** A5 — factor drift snapshot (factors.py:152-172 FactorDriftSnapshot,
    * :243-261 summary): one row of count / mean / min / max / boosted
    * (> default 1.0) / penalized (< 1.0) / entropy over the factor
    * distribution. Entropy −Σ p·log2 p with p = v/Σv computed in ONE
    * aggregation pass via the identity
    *   H = log2(T) − (Σ v·log2 v) / T,  T = Σ v
    * (factors are clamped to [0.1, 5.0], so v > 0 always).
    */
  def factorDriftSnapshot(factors: DataFrame): DataFrame = {
    val v = col("factor").cast("double")
    factors
      .agg(
        count(lit(1)).as("count"),
        avg(v).as("mean"),
        min(v).as("min_val"),
        max(v).as("max_val"),
        sum(when(v > 1.0, 1L).otherwise(0L)).as("boosted"),
        sum(when(v < 1.0, 1L).otherwise(0L)).as("penalized"),
        sum(v).as("__t"),
        sum(v * log2(v)).as("__vlog"))
      .select(col("count"), col("mean"), col("min_val"), col("max_val"),
        col("boosted"), col("penalized"),
        when(col("__t") > 0.0, log2(col("__t")) - col("__vlog") / col("__t"))
          .otherwise(lit(0.0)).as("entropy"))
  }

  /** Teleportation-factor update (A4, src/qortex/hippocampus/factors.py:
    * 36-45, 102-143): per node, factor += Σ(outcome deltas), clamped to
    * [0.1, 5.0]. deltas: accepted +0.1, rejected −0.05, partial +0.03.
    */
  def updateFactors(factors: DataFrame, outcomes: DataFrame): DataFrame = {
    val delta = when(col("outcome") === "accepted", 0.1)
      .when(col("outcome") === "rejected", -0.05)
      .when(col("outcome") === "partial", 0.03)
      .otherwise(0.0)
    val deltas = outcomes
      .select(col("node_id"), delta.as("d"))
      .groupBy("node_id")
      .agg(sum("d").as("d"))
    factors
      .join(deltas, Seq("node_id"), "outer")
      .select(col("node_id"),
        least(lit(5.0), greatest(lit(0.1),
          coalesce(col("factor"), lit(1.0)) + coalesce(col("d"), lit(0.0)))).as("factor"))
  }
}
