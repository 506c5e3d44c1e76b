package graft.ops

import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) near-dup detection over a COMMITTED
  * signature index — the operation a production pipeline runs when a new
  * crawl batch arrives. Re-deduplicating a 100-TB corpus for every daily
  * batch is the naive O(corpus) answer; the incremental path is:
  *
  *  1. minhash the BATCH only (the corpus is never re-read or re-hashed);
  *  2. band-join the batch signatures against the committed signature
  *     table ([[Dedup.bandify]] re-derives banding from stored arrays by
  *     slicing — no text work), annotating each batch doc with its best
  *     existing match;
  *  3. resolve duplicates WITHIN the batch ([[Dedup.dedupClusters]]);
  *  4. atomically append the signatures of accepted docs (batch-cluster
  *     keepers that matched nothing existing) via [[SnapshotStore]].
  *
  * The signature table carries one 32-long array per doc (~300 bytes —
  * ~1 % of corpus bytes at web-document sizes), so step 2's scan is of
  * signatures, not documents. Commits are snapshot-atomic with the batch
  * id recorded as an input partition: a crashed run re-executes cleanly
  * and a duplicate [[ingestBatch]] call for an already-committed batch id
  * skips the append (same resume discipline as the KG ingest,
  * `pipeline/Ingest.scala`). Reference anchor: the reference re-embeds /
  * re-checks only new chunks per ingest (`core/memory.py` upsert path);
  * this is that idea applied to corpus-level dedup at Spark scale.
  */
object IncrementalDedup {

  /** Store table holding the accepted corpus signatures `(id, sig)`. */
  val SigTable = "corpus_signatures"

  /** Core annotation: for each batch doc the best-matching existing doc
    * (max `est_jaccard`, ties broken to the smallest existing id) at or
    * above the threshold. One row per batch doc; `dup_of` null ⇒ novel.
    * Both inputs are compact `(id, sig)` frames.
    */
  private[ops] def annotateSigs(existingSigs: DataFrame, batchSigs: DataFrame,
      minEstJaccard: Double, bucketCap: Long)(
      implicit spark: SparkSession): DataFrame = {
    val (ex, dropped) =
      Dedup.capBuckets(Dedup.bandify(existingSigs), Seq("band", "bucket"), bucketCap)
    Dedup.logDropped("incrementalDedup", dropped)
    val sim = Dedup.estJaccardUdf
    val hits = Dedup.bandify(batchSigs)
      .select(col("band"), col("bucket"), col("id").as("batch_id"),
        col("sig").as("sig_b"))
      .join(ex.select(col("band"), col("bucket"), col("id").as("existing_id"),
        col("sig").as("sig_e")), Seq("band", "bucket"))
      .select(col("batch_id"), col("existing_id"),
        sim(col("sig_b"), col("sig_e")).as("est_jaccard"))
      .groupBy("batch_id", "existing_id")
      .agg(max("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      // best match per batch doc: struct comparison is lexicographic, so
      // min(-est, id) = highest estimate, then smallest existing id.
      // Negating the DOUBLE estimate (not the id) keeps the tie-break
      // valid for ANY orderable id type — string-keyed corpora included
      .groupBy("batch_id")
      .agg(min(struct((-col("est_jaccard")).as("neg_est"),
        col("existing_id").as("eid"))).as("best"))
      .select(col("batch_id").as("doc_id"),
        col("best.eid").as("dup_of"),
        (-col("best.neg_est")).as("est_jaccard"))
    batchSigs.select(col("id").as("doc_id")).join(hits, Seq("doc_id"), "left")
  }

  /** Annotate a raw batch against an existing `(id, sig)` frame. */
  def annotateAgainst(existingSigs: DataFrame, batch: DataFrame,
      minEstJaccard: Double = 0.9, idCol: String = "doc_id",
      bucketCap: Long = 10000L)(implicit spark: SparkSession): DataFrame =
    annotateSigs(existingSigs, Dedup.signatures(batch, idCol).localCheckpoint(),
      minEstJaccard, bucketCap)

  /** Process one arriving batch end-to-end. Returns one row per batch
    * doc: `(doc_id, cluster_id, n_members, keep, dup_of, est_jaccard,
    * accepted)` where `accepted` = batch-cluster keeper with no committed
    * near-dup — the rows whose signatures were appended to the index.
    * Re-invoking with an already-committed `batchId` skips the append
    * (idempotent index state) and — PROVIDED no later batch committed in
    * between — reproduces the ORIGINAL annotation: the batch's own
    * committed signatures are excluded from the match side, so a crashed
    * run re-executes to identical output. A delayed replay after
    * subsequent commits still skips the append but annotates against the
    * grown index (later batches' signatures match too); for the
    * historical annotation use [[replayAnnotation]], which time-travels
    * the index to the state the original run saw.
    */
  def ingestBatch(store: SnapshotStore, batchId: String, batch: DataFrame,
      minEstJaccard: Double = 0.9, idCol: String = "doc_id",
      bucketCap: Long = 10000L)(implicit spark: SparkSession): DataFrame = {
    // hash the batch exactly once: clusters AND the vs-committed
    // annotation both read this checkpointed signature frame
    val batchSigs = Dedup.signatures(batch, idCol).localCheckpoint()
    val clusters = Dedup.dedupClustersFromSigs(batchSigs, minEstJaccard, bucketCap)
    val existing = store.latest(SigTable)
    val annotated0 = existing match {
      case Some(_) =>
        // exclude the batch's OWN committed signatures (broadcast of the
        // batch id set; the corpus-sized index never shuffles for it) —
        // otherwise re-running an already-committed batch self-matches
        // every doc at est 1.0 and flips its accepted rows to false,
        // breaking the resume contract below
        val others = store.read(SigTable)
          .join(broadcast(batchSigs.select("id")), Seq("id"), "left_anti")
        annotateSigs(others, batchSigs, minEstJaccard, bucketCap)
      case None =>
        batchSigs.select(col("id").as("doc_id"),
          lit(null).cast(batchSigs.schema("id").dataType).as("dup_of"),
          lit(null).cast("double").as("est_jaccard"))
    }
    val annotated = clusters.join(annotated0, Seq("doc_id"))
      .withColumn("accepted", col("keep") && col("dup_of").isNull)
      .localCheckpoint()
    val alreadyCommitted = existing.exists(_.inputPartitions.contains(batchId))
    if (!alreadyCommitted) {
      val acceptedSigs = batchSigs.join(
        annotated.filter(col("accepted")).select(col("doc_id").as("id")),
        Seq("id"), "left_semi")
      store.commitAppend(SigTable, acceptedSigs, Seq(batchId))
    }
    annotated
  }

  /** The signature index as it stood IMMEDIATELY BEFORE `batchId`
    * committed — the match side the original [[ingestBatch]] annotation
    * saw. `inputPartitions` is cumulative, so the FIRST snapshot listing
    * the batch id is the commit that recorded it; its parent is the
    * pre-batch state. Returns None if `batchId` was never committed;
    * Some(None) if the batch was the very first commit (empty index).
    * Only manifests are read to locate the version — no data scan.
    */
  def indexBefore(store: SnapshotStore, batchId: String)(
      implicit spark: SparkSession): Option[Option[DataFrame]] = {
    val committedAt = store.snapshotIds(SigTable).sorted.find(id =>
      store.snapshot(SigTable, id).exists(_.inputPartitions.contains(batchId)))
    committedAt.map { v =>
      val parent = store.snapshot(SigTable, v).get.parent
      if (parent < 0) None else Some(store.read(SigTable, parent))
    }
  }

  /** Reproduce the ORIGINAL [[ingestBatch]] annotation for an
    * already-committed batch, even after later batches have grown the
    * index: the match side is time-traveled to the pre-batch snapshot
    * (see [[indexBefore]]), so signatures committed by subsequent batches
    * cannot leak into the replayed `dup_of`/`accepted` columns. The batch
    * frame must carry the same rows as the original call (the signatures
    * are deterministic functions of the text). Never writes.
    */
  def replayAnnotation(store: SnapshotStore, batchId: String, batch: DataFrame,
      minEstJaccard: Double = 0.9, idCol: String = "doc_id",
      bucketCap: Long = 10000L)(implicit spark: SparkSession): DataFrame = {
    val before = indexBefore(store, batchId).getOrElse(sys.error(
      s"replayAnnotation: batch '$batchId' was never committed to $SigTable — " +
        "run ingestBatch first"))
    val batchSigs = Dedup.signatures(batch, idCol).localCheckpoint()
    val clusters = Dedup.dedupClustersFromSigs(batchSigs, minEstJaccard, bucketCap)
    val annotated0 = before match {
      case Some(existingSigs) =>
        annotateSigs(existingSigs, batchSigs, minEstJaccard, bucketCap)
      case None =>
        batchSigs.select(col("id").as("doc_id"),
          lit(null).cast(batchSigs.schema("id").dataType).as("dup_of"),
          lit(null).cast("double").as("est_jaccard"))
    }
    clusters.join(annotated0, Seq("doc_id"))
      .withColumn("accepted", col("keep") && col("dup_of").isNull)
  }
}
