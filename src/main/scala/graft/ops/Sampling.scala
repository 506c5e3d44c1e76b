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

  /** Stable per-row bucket in [0, 1000): first 8 hex digits of
    * `md5(id ":" salt)` as an integer, mod 1000. The salt decorrelates
    * independent splits/samples over the same corpus.
    */
  def permilleBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % 1000

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
}
