package graft.query

import graft.ops.Similarity
import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S7 — snapshot-backed vector index: the distributed re-expression of the
  * reference's VectorIndex protocol (src/qortex/vec/index.py:27-75) with
  * NumpyVectorIndex's add/remove/search semantics (index.py:78-230):
  *
  *  - upsert: new ids overwrite existing ones (index.py:114-118).
  *    MERGE-ON-READ: each upsert commits only its delta batch
  *    (commitAppend); nothing rewrites the table, so upsert cost is
  *    proportional to the batch, not the 10⁹-vector corpus. Batches carry
  *    a monotone `__seq`; readers resolve latest-wins per id.
  *  - remove: appends tombstone rows (id, __deleted=true) — same
  *    delta-only cost (index.py:231-257 semantics).
  *  - read: one window per id over `__seq` desc keeps the newest row and
  *    drops tombstoned ids — a single shuffle on id, the classic
  *    merge-on-read price. `compact()` folds the log back into one batch
  *    (Iceberg rewrite_data_files analog) to reclaim that read cost.
  *  - search: brute-force cosine top-k with a score threshold
  *    (index.py:161-230) — query broadcast, corpus streams once.
  *  - searchBatch: the scale path for many queries — hyperplane-LSH
  *    bucketed probing (Similarity.lshTopK).
  *  - buildIvf/searchIvf: the coarse-quantizer alternative (ops.Ivf) —
  *    build once per index snapshot, probe nprobe/k of the corpus.
  *
  * Time travel is preserved: `asOf(id)` resolves any retained snapshot with
  * the same latest-wins rule.
  *
  * Rows: (id STRING, embedding ARRAY<FLOAT>).
  *
  * WRITE CONCURRENCY: mutations are read-then-commit on `__seq` (latest
  * snapshot + 1), so the index is SINGLE-WRITER — the same contract the
  * snapshot store documents for `expire`. Within one JVM this class
  * serializes its own mutations (all writes hold `writeLock`, so two
  * threads sharing an instance cannot mint the same `__seq`); across
  * processes the caller must provide the single-writer discipline, as
  * with any optimistic table format without a catalog lock (real Iceberg
  * would reject the second commit on a seq conflict).
  */
final class VectorIndex(store: SnapshotStore, table: String = "vector_index")(
    implicit spark: SparkSession) {

  private val writeLock = new Object

  private def nextSeq(): Long =
    store.latest(table).map(_.id + 1).getOrElse(0L)

  /** Latest-wins resolution of the delta log (newest __seq per id, minus
    * tombstones). Within one batch, dropDuplicates at write time guarantees
    * one row per id.
    */
  private def resolve(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("__seq").desc)
    raw
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__deleted"))
      .select(col("id"), col("embedding"))
  }

  def read(): DataFrame = resolve(store.read(table))

  /** Time travel: the index as of a retained snapshot id. */
  def asOf(snapshotId: Long): DataFrame = resolve(store.read(table, snapshotId))

  def count(): Long = if (store.exists(table)) read().count() else 0L

  /** Add vectors; ids already present are overwritten (upsert). Writes ONLY
    * the incoming delta.
    */
  def upsert(rows: DataFrame): Unit = writeLock.synchronized {
    val delta = rows.select(col("id").cast("string").as("id"), col("embedding"))
      .dropDuplicates("id")
      .withColumn("__seq", lit(nextSeq()))
      .withColumn("__deleted", lit(false))
    store.commitAppend(table, delta, Seq.empty)
  }

  /** Remove ids via tombstone rows — delta-only, resolved at read. */
  def remove(ids: DataFrame): Unit = writeLock.synchronized {
    if (!store.exists(table)) return
    val tombstones = ids.select(col("id").cast("string").as("id"))
      .dropDuplicates("id")
      .withColumn("embedding", lit(null).cast("array<float>"))
      .withColumn("__seq", lit(nextSeq()))
      .withColumn("__deleted", lit(true))
    store.commitAppend(table, tombstones, Seq.empty)
  }

  /** Fold the merge-on-read log into one resolved batch (compaction).
    * History stays retained — older snapshots still time-travel — until
    * `store.expire` reclaims them.
    */
  def compact(): Unit = writeLock.synchronized {
    if (!store.exists(table)) return
    val resolved = read()
      .withColumn("__seq", lit(nextSeq()))
      .withColumn("__deleted", lit(false))
    store.commitReplace(table, resolved, Seq.empty)
  }

  /** Brute-force cosine search: (id, score) sorted desc, ties by id. */
  def search(queryVec: Array[Float], topK: Int = 10, threshold: Double = 0.0): DataFrame =
    read()
      .select(col("id"),
        Similarity.cosineUdf(col("embedding"), typedLit(queryVec.toSeq)).as("score"))
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)

  /** Batch ANN over many queries — LSH-bucketed probing. */
  def searchBatch(queries: DataFrame, k: Int = 10, planes: Int = 8): DataFrame =
    Similarity.lshTopK(read(), queries, k, planes,
      idCol = "id", vecCol = "embedding")

  /** Build an IVF layout over the CURRENT resolved index: trained
    * centroids + the cluster-stamped corpus, checkpointed so repeated
    * probes don't re-pay the merge-on-read resolution or re-assignment.
    * Rebuild after upserts/compaction (the returned layout is a snapshot
    * of the index at build time, like any ANN index).
    */
  def buildIvf(nClusters: Int = 16, iters: Int = 5): (Array[Array[Float]], DataFrame) = {
    val corpus = read().localCheckpoint()
    val cents = graft.ops.Ivf.train(corpus, nClusters, iters, idCol = "id")
    (cents, graft.ops.Ivf.index(corpus, cents, idCol = "id").localCheckpoint())
  }

  /** Batch ANN via a prebuilt IVF layout — probe cost ≈ nprobe/k of the
    * corpus per query, no shuffle of the indexed side.
    */
  def searchIvf(
      ivf: (Array[Array[Float]], DataFrame),
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 4
  ): DataFrame =
    graft.ops.Ivf.search(ivf._2, ivf._1, queries, k, nprobe, idCol = "id")
}
