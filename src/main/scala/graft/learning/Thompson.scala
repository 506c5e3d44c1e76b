package graft.learning

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A10 — Beta-Bernoulli Thompson sampling, the reference's default
  * learning strategy (packages/qortex-learning .../learning/strategy.py).
  *
  * Split for scale the way the reference's runtime splits it:
  *  - the POSTERIOR STATE is a per-arm aggregation over the observed
  *    reward stream (strategy.py:148-168: alpha += reward,
  *    beta += 1 − reward per observation). At web scale that stream is
  *    billions of feedback events, so it is the distributed half — one
  *    map-side-combining groupBy, no iteration.
  *  - SELECTION is a per-query draw over the candidate arms
  *    (strategy.py:52-146) — O(candidates) driver-side work on the small
  *    arm set, deterministic here via a caller-supplied seed (the
  *    reference uses module-level `random`, unusable distributed).
  */
object Thompson {

  /** ArmState (qortex/learning/types.py): Beta(alpha, beta) posterior. */
  final case class ArmState(
      alpha: Double = 1.0,
      beta: Double = 1.0,
      pulls: Long = 0L,
      totalReward: Double = 0.0) {
    def mean: Double = alpha / (alpha + beta)

    /** Posterior update (strategy.py:148-168). */
    def update(reward: Double): ArmState =
      ArmState(alpha + reward, beta + (1.0 - reward), pulls + 1, totalReward + reward)
  }

  final case class Arm(id: String, tokenCost: Long = 0L)

  final case class SelectionResult(
      selected: Seq[Arm],
      excluded: Seq[Arm],
      isBaseline: Boolean,
      scores: Map[String, Double],
      tokenBudget: Long,
      usedTokens: Long)

  /** Distributed posterior aggregation: observations (arm_id, reward) →
    * (arm_id, alpha, beta, pulls, total_reward, posterior_mean). Starting
    * from the uniform Beta(1,1) prior; fold an existing state table in by
    * unioning its (alpha−1)/(beta−1) mass back as pseudo-observations or
    * join downstream.
    */
  def posteriors(observations: DataFrame): DataFrame =
    observations
      .groupBy(col("arm_id"))
      .agg(
        (lit(1.0) + sum(col("reward"))).as("alpha"),
        (lit(1.0) + sum(lit(1.0) - col("reward"))).as("beta"),
        count(lit(1)).as("pulls"),
        sum(col("reward")).as("total_reward"))
      .withColumn("posterior_mean", col("alpha") / (col("alpha") + col("beta")))

  /** Deterministic Beta(a, b) sample via two Marsaglia–Tsang gamma draws
    * (x/(x+y)). Bernoulli-reward posteriors keep a, b ≥ 1 (uniform prior +
    * non-negative increments); signed rewards (e.g. the service's
    * rejected → −1.0 mapping fed through credit deltas) can push a shape
    * below 1 or to 0, so shapes are floored at a small positive value and
    * sub-1 shapes use the standard boost gamma(s) = gamma(s+1)·U^(1/s) —
    * never NaN (the reference's random.betavariate would raise instead).
    */
  private[graft] def betaSample(rng: java.util.Random, a: Double, b: Double): Double = {
    def gammaGe1(shape: Double): Double = {
      // Marsaglia–Tsang squeeze, valid for shape ≥ 1
      val d = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      var out = -1.0
      while (out < 0) {
        var x = 0.0
        var v = 0.0
        do { x = rng.nextGaussian(); v = 1.0 + c * x } while (v <= 0)
        v = v * v * v
        val u = rng.nextDouble()
        if (u < 1.0 - 0.0331 * x * x * x * x ||
          math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v)))
          out = d * v
      }
      out
    }
    def gamma(shape: Double): Double = {
      val s = math.max(shape, 1e-3)
      if (s >= 1.0) gammaGe1(s)
      else gammaGe1(s + 1.0) * math.pow(rng.nextDouble(), 1.0 / s)
    }
    val x = gamma(a)
    val y = gamma(b)
    if (x + y == 0.0) 0.5 else x / (x + y)
  }

  /** Thompson selection (strategy.py:52-146): cold-start arms below
    * `minPulls` are force-included; with probability `baselineRate` the
    * round is uniform-random exploration; otherwise arms rank by a draw
    * from their posterior. `tokenBudget` > 0 caps the summed token cost of
    * the RANKED picks — forced cold-start arms bypass both the budget and
    * k, exactly like the reference (strategy.py:85-90, 119-124 seed
    * `selected` with `forced` before the budget loop). k ≤ 0 means "no cap
    * on count".
    */
  def select(
      candidates: Seq[Arm],
      states: Map[String, ArmState],
      k: Int,
      seed: Long,
      minPulls: Long = 0L,
      baselineRate: Double = 0.0,
      tokenBudget: Long = 0L
  ): SelectionResult = {
    val rng = new java.util.Random(seed)
    val effectiveK = if (k > 0) k else candidates.size
    val (forced, eligible) =
      if (minPulls > 0)
        candidates.partition(a => states.getOrElse(a.id, ArmState()).pulls < minPulls)
      else (Seq.empty[Arm], candidates)
    val remainingK = math.max(effectiveK - forced.size, 0)
    val isBaseline = rng.nextDouble() < baselineRate

    val (ranked, sampledScores) =
      if (isBaseline) {
        val shuffled = rng.ints(0, Int.MaxValue).limit(eligible.size).toArray
          .zip(eligible).sortBy(_._1).map(_._2).toSeq
        (shuffled, Map.empty[String, Double])
      } else {
        val s = candidates
          .map(a => a.id -> {
            val st = states.getOrElse(a.id, ArmState())
            betaSample(rng, st.alpha, st.beta)
          }).toMap
        (eligible.sortBy(a => -s(a.id)), s)
      }

    val picked = scala.collection.mutable.ArrayBuffer.empty[Arm]
    picked ++= forced
    var used = forced.map(_.tokenCost).sum
    val it = ranked.iterator
    while (it.hasNext && picked.size - forced.size < remainingK) {
      val a = it.next()
      if (tokenBudget <= 0 || used + a.tokenCost <= tokenBudget) {
        picked += a
        used += a.tokenCost
      }
    }
    val pickedIds = picked.map(_.id).toSet
    // baseline rounds score only the SELECTED arms at 0.5 (strategy.py:103
    // returns `{a.id: 0.5 for a in selected}`); Thompson rounds keep every
    // candidate's sampled draw, like the reference's scores dict
    val scores =
      if (isBaseline) picked.map(a => a.id -> 0.5).toMap else sampledScores
    SelectionResult(picked.toSeq, candidates.filterNot(a => pickedIds(a.id)),
      isBaseline, scores, tokenBudget, used)
  }
}
