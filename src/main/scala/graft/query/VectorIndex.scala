package graft.query

import graft.ops.Similarity
import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — snapshot-backed vector index: the distributed re-expression of the
  * reference's VectorIndex protocol (src/qortex/vec/index.py:27-75) with
  * NumpyVectorIndex's add/remove/search semantics (index.py:78-230):
  *
  *  - upsert: new ids overwrite existing ones (index.py:114-118) — an
  *    anti-join of the old snapshot against the incoming ids, union, one
  *    commitReplace. Copy-on-write per batch, exactly like an Iceberg
  *    overwrite snapshot; readers keep seeing the previous snapshot until
  *    LATEST flips, and time travel (`store.read(table, id)`) works.
  *  - remove: anti-join + commitReplace (index.py:231-257).
  *  - search: brute-force cosine top-k with a score threshold
  *    (index.py:161-230) — queries broadcast, corpus streams once.
  *  - searchBatch: the scale path for many queries — hyperplane-LSH
  *    bucketed probing (Similarity.lshTopK).
  *
  * Rows: (id STRING, embedding ARRAY<FLOAT>).
  */
final class VectorIndex(store: SnapshotStore, table: String = "vector_index")(
    implicit spark: SparkSession) {

  def count(): Long = if (store.exists(table)) store.read(table).count() else 0L

  /** Add vectors; ids already present are overwritten (upsert). */
  def upsert(rows: DataFrame): Unit = {
    val incoming = rows.select(col("id").cast("string").as("id"), col("embedding"))
      .dropDuplicates("id")
    val merged =
      if (store.exists(table))
        store.read(table)
          .join(incoming.select("id"), Seq("id"), "left_anti")
          .unionByName(incoming)
      else incoming
    store.commitReplace(table, merged, Seq.empty)
  }

  def remove(ids: DataFrame): Unit = {
    if (!store.exists(table)) return
    val pruned = store.read(table)
      .join(ids.select(col("id").cast("string").as("id")), Seq("id"), "left_anti")
    store.commitReplace(table, pruned, Seq.empty)
  }

  /** Brute-force cosine search: (id, score) sorted desc, ties by id. */
  def search(queryVec: Array[Float], topK: Int = 10, threshold: Double = 0.0): DataFrame =
    store.read(table)
      .select(col("id"),
        Similarity.cosineUdf(col("embedding"), typedLit(queryVec.toSeq)).as("score"))
      .filter(col("score") >= threshold)
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)

  /** Batch ANN over many queries — LSH-bucketed probing. */
  def searchBatch(queries: DataFrame, k: Int = 10, planes: Int = 8): DataFrame =
    Similarity.lshTopK(store.read(table), queries, k, planes,
      idCol = "id", vecCol = "embedding")
}
