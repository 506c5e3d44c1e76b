package graft.query

import graft.extract.Chunkers
import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped online retrieval — the reference's `ingest_message`
  * path (src/qortex/service.py:724-785) plus the ephemeral-domain
  * lifecycle the gateway builds on it: conversation messages are chunked
  * (the online chunker, deterministic sha256 ids), embedded, and upserted
  * into a session-namespaced vector index so retrieval DURING the
  * conversation can seed from what was just said; when the session ends
  * (or goes idle) its vectors are expired.
  *
  * Mapping:
  *  - ids are `"{session_id}:{chunk_id}"` (service.py:752) — the same
  *    `"{domain}:{name}"` shape as KG node ids, so a session IS an
  *    ephemeral domain;
  *  - roles outside {user, assistant, system, tool} index as "unknown"
  *    (service.py:737-742); blank text is a zero-count no-op;
  *  - chunk text is kept in a companion snapshot table so hits come back
  *    as text, not bare ids (the reference's vector backends store
  *    payloads; our VectorIndex is (id, embedding) by design);
  *  - expiry = tombstones in the vector index + a rewrite of the chunk
  *    table — both snapshot commits, so a killed expiry re-runs cleanly.
  *
  * Clock is injected (`nowMillis`) so idle-expiry is deterministic under
  * test — same discipline as the snapshot store's timestamps.
  */
final class SessionIndex(store: SnapshotStore,
    indexTable: String = "session_index",
    chunkTable: String = "session_chunks")(implicit spark: SparkSession) {
  import spark.implicits._

  val index = new VectorIndex(store, indexTable)

  /** Reference's _VALID_ROLES (service.py:737). */
  val ValidRoles: Set[String] = Set("user", "assistant", "system", "tool")

  // session_id → last-activity millis; driver-side, one entry per LIVE
  // session (the reference's gateway holds the same registry in-process)
  private val lastActive =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  // Chunk ids must be unique PER MESSAGE, not per (session, role):
  // Chunkers.chunkId hashes (sourceId, idx, text.take(64)), so without a
  // message discriminator two messages opening with the same 64 chars
  // would collide and the second upsert would silently overwrite the
  // first message's vectors. The discriminator is the sha256 of the FULL
  // message text — content-addressed, so it is deterministic across
  // processes AND replay-idempotent: a crash-retry of the same message
  // re-mints the same ids and the upsert self-heals (a counter or clock
  // here would orphan the first attempt's vectors). Consequence: a
  // byte-identical repeated message indexes as one memory, which is the
  // reference's content-addressed behavior too.

  final case class MessageIngestResult(
      sessionId: String, chunks: Int, concepts: Int, edges: Int)

  /** service.py:724-785 — chunk, embed, index. No LLM, no KG writes
    * (concepts/edges always 0, as in the reference).
    */
  def ingestMessage(text: String, sessionId: String, role: String = "user",
      domain: String = "session", nowMillis: Long = 0L): MessageIngestResult = {
    if (text == null || text.trim.isEmpty)
      return MessageIngestResult(sessionId, 0, 0, 0)
    val safeRole = if (ValidRoles.contains(role)) role else "unknown"
    val msgHash = graft.core.TextSpec.sha256Hex(text).take(16)
    val chunks = Chunkers.sentenceBoundary(text,
      sourceId = s"$sessionId:$safeRole:$msgHash")
    if (chunks.nonEmpty) {
      // no checkpoint: `chunks` is a driver-local Seq, so this is a
      // LocalRelation — both consumers (index upsert + chunk table) read
      // the literal rows at zero recompute cost, and the checkpoint's
      // materialization job was pure overhead per message
      val rows = chunks.map(c =>
        (s"$sessionId:${c.id}", sessionId, safeRole, c.text,
          graft.core.Embeddings.embed(c.text).toSeq))
        .toDF("id", "session_id", "role", "text", "embedding")
      index.upsert(rows.select(col("id"),
        col("embedding").cast("array<float>").as("embedding")))
      store.commitAppend(chunkTable,
        rows.select("id", "session_id", "role", "text"), Seq.empty)
    }
    lastActive.put(sessionId, nowMillis)
    graft.observe.Observe.emit("message.ingested",
      "session_id" -> sessionId, "role" -> safeRole, "domain" -> domain,
      "chunk_count" -> chunks.size, "concept_count" -> 0, "edge_count" -> 0)
    MessageIngestResult(sessionId, chunks.size, 0, 0)
  }

  private def chunksFrame: DataFrame =
    if (store.exists(chunkTable)) store.read(chunkTable)
    else Seq.empty[(String, String, String, String)]
      .toDF("id", "session_id", "role", "text")

  // a brand-new store has no committed index table — a first-query-
  // before-first-message call order must return empty, not sys.error
  private def indexFrame: DataFrame =
    if (store.exists(indexTable)) index.read()
    else Seq.empty[(String, Seq[Float])].toDF("id", "embedding")

  /** Session-scoped retrieval: cosine top-k over THIS session's chunks
    * only. The id prefix is the scope — no other session's vectors are
    * scanned past the resolve filter. Returns (id, role, text, score).
    */
  def search(sessionId: String, context: String, topK: Int = 5,
      nowMillis: Long = 0L): DataFrame = {
    lastActive.put(sessionId, nowMillis)
    val q = graft.core.Embeddings.embed(context)
    val scoped = indexFrame.filter(col("id").startsWith(sessionId + ":"))
    scoped
      .select(col("id"),
        graft.ops.Similarity.cosineUdf(col("embedding"), typedLit(q.toSeq)).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(math.max(1, topK))
      // dropDuplicates guards the top-k contract: the chunk table is
      // append-only, so a crash-replayed ingest could hold two rows per
      // id — joining them AFTER the limit would fan results past topK
      .join(chunksFrame.select("id", "role", "text").dropDuplicates("id"),
        Seq("id"), "left")
      .select("id", "role", "text", "score")
      .orderBy(col("score").desc, col("id").asc)
  }

  /** Sessions currently registered (live = has ingested or searched). */
  def liveSessions: Set[String] = lastActive.keySet.toSet

  /** Expire ONE session: tombstone its vectors, rewrite the chunk table
    * without its rows, forget its activity entry.
    */
  def expire(sessionId: String): Unit = {
    val ids = indexFrame.filter(col("id").startsWith(sessionId + ":"))
      .select("id")
    if (store.exists(indexTable)) index.remove(ids)
    if (store.exists(chunkTable))
      store.commitReplace(chunkTable,
        chunksFrame.filter(col("session_id") =!= sessionId), Seq.empty)
    lastActive.remove(sessionId)
    graft.observe.Observe.emit("session.expired", "session_id" -> sessionId)
  }

  /** Expire every session idle longer than `maxIdleMillis` as of
    * `nowMillis`; returns the expired ids (deterministic order).
    */
  def expireIdle(maxIdleMillis: Long, nowMillis: Long): Seq[String] = {
    val stale = lastActive.toSeq
      .filter { case (_, t) => nowMillis - t > maxIdleMillis }
      .map(_._1).sorted
    stale.foreach(expire)
    stale
  }
}
