package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling — the boring operator
  * every training-data pipeline needs and `df.sample` cannot provide:
  * `sample()` is seed-dependent on PARTITIONING, so the same document
  * lands in different splits after a repartition, a rerun, or a
  * cluster-size change. Hashing the document id instead makes the
  * assignment a pure function of the row — stable across reruns,
  * reshuffles, executor counts, and engine versions (md5 is md5
  * everywhere, which is also what makes the q51 oracle fixture-free).
  *
  * All pure Catalyst expressions (md5/conv/substring — codegen'd, no
  * UDF): one narrow projection, no shuffle, pushes through scans.
  */
object Sampling {

  /** Stable per-row bucket in [0, n): first 8 hex digits of
    * `md5(id ":" salt)` as an integer, mod n. The salt decorrelates
    * independent splits/samples/packings over the same corpus.
    */
  def hashBucket(id: Column, salt: String, n: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % n

  def permilleBucket(id: Column, salt: String): Column = hashBucket(id, salt, 1000)

  /** train/val/test assignment: buckets [0, train) → "train",
    * [train, train+val) → "val", the rest → "test". Emits the bucket so
    * downstream jobs can re-derive or re-cut without re-hashing.
    */
  def assignSplits(
      docs: DataFrame,
      idCol: String = "doc_id",
      salt: String = "graft",
      trainPermille: Int = 900,
      valPermille: Int = 50
  ): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000, "split fractions must fit in 1000 permille")
    docs
      .withColumn("bucket", permilleBucket(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }

  /** Deterministic `permille`/1000 sample of the corpus — same row set
    * on every run at any parallelism.
    */
  def sample(
      docs: DataFrame,
      permille: Int,
      idCol: String = "doc_id",
      salt: String = "graft-sample"
  ): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille out of [0, 1000]")
    docs.filter(permilleBucket(col(idCol), salt) < permille)
  }

  /** Deterministic domain-mixture resampling — the Pile/DoReMi-style
    * reweighting step: accept each document with a per-source permille
    * rate (downsampling over-represented domains toward a target mix) as
    * a pure function of (id, source) — stable across reruns, reshuffles,
    * and parallelism, where `df.sample` is not. Sources absent from
    * `ratesPermille` use `defaultPermille`. Emits the permille `bucket`,
    * the applied `rate_permille`, and `keep_mix` instead of filtering, so
    * the decision is auditable and re-cuttable downstream.
    *
    * The rates map compiles into a codegen'd CASE chain — appropriate
    * for config-sized mixes (tens to hundreds of domains, the real-world
    * shape); a corpus-derived million-row rate TABLE should broadcast-join
    * instead (see [[graft.ops.Curation.capPerSource]] for that shape).
    * Zero shuffle: one narrow projection over the scan.
    */
  def resampleSources(
      docs: DataFrame,
      ratesPermille: Map[String, Int],
      defaultPermille: Int = 1000,
      idCol: String = "doc_id",
      sourceCol: String = "source",
      salt: String = "graft-mix"
  ): DataFrame = {
    require((defaultPermille +: ratesPermille.values.toSeq)
      .forall(p => p >= 0 && p <= 1000), "rates must be permille in [0, 1000]")
    // sorted fold so the CASE chain (and thus the plan) is deterministic
    val rate = ratesPermille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (src, p)) => when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    docs
      .withColumn("bucket", permilleBucket(col(idCol), salt))
      .withColumn("rate_permille", rate)
      .withColumn("keep_mix", col("bucket") < col("rate_permille"))
  }

  /** Pack documents into shards targeting `tokenBudget` tokens
    * (training-data sequence sharding). A single global greedy pack is a
    * one-task sequential fold — scale-hostile — so packing runs WITHIN
    * hash buckets: docs land in a deterministic bucket, a per-bucket
    * running token sum (window, parallel across buckets) cuts shards on
    * budget boundaries, and `shard_id = bucket · 2^32 + local_shard`
    * keeps ids globally unique. The whole layout is a pure function of
    * (id, n_tokens) — stable across runs and parallelism.
    *
    * Packing guarantee (the standard streaming-pack bound, not exact
    * bin-packing): a doc joins the shard its PREFIX offset falls in, so
    * a shard's total is < tokenBudget + its last doc — overflow bounded
    * by one document. Per-doc contributions to the prefix are clamped to
    * the budget, so one over-budget giant advances the cut by exactly
    * one window instead of smearing every later boundary. Exact
    * ≤-budget packing would be a sequential scan; this keeps it
    * embarrassingly parallel.
    */
  def packShards(
      docs: DataFrame,
      tokenBudget: Long,
      nBuckets: Int = 1000,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens",
      salt: String = "graft-pack"
  ): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(nBuckets > 0, "nBuckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket"))
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("__bucket", hashBucket(col(idCol), salt, nBuckets))
      // tokens BEFORE this doc in its bucket → the shard this doc starts
      // in; a doc is never split across shards
      .withColumn("__before",
        coalesce(sum(least(col(tokensCol).cast("long"), lit(tokenBudget))).over(w), lit(0L)))
      .select(col(idCol),
        (col("__bucket").cast("long") * lit(1L << 32) +
          (col("__before") / tokenBudget).cast("long")).as("shard_id"),
        col(tokensCol))
  }
}
