package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-side bridge to the package-private signature-level annotation, so
  * suites (package `graft`) can pin the tie-break on crafted signatures.
  */
object IncrementalDedupTestAccess {
  def annotate(existingSigs: DataFrame, batchSigs: DataFrame,
      minEstJaccard: Double, bucketCap: Long = 10000L)(
      implicit spark: SparkSession): DataFrame =
    IncrementalDedup.annotateSigs(existingSigs, batchSigs, minEstJaccard, bucketCap)
}
