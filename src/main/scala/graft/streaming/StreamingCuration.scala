package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Continuous corpus curation: online exact dedup + quality gating over a
  * document STREAM — the streaming sibling of the batch curation family
  * (`ops/Curation`, `ops/IncrementalDedup`). A training-data pipeline
  * that ingests crawls continuously cannot re-run batch dedup per
  * arrival; instead admission is decided online, with the seen-content
  * state living in the streaming checkpoint:
  *
  *  - documents are keyed by a content fingerprint (sha-256 of the
  *    trimmed text) via `groupByKey` → `flatMapGroupsWithState`;
  *  - the FIRST arrival of a fingerprint is emitted `novel = true`
  *    (admission), every later arrival — same micro-batch, later batch,
  *    or after a restart — is emitted `novel = false` with `dup_of`
  *    pointing at the admitted doc;
  *  - a per-doc quality gate (token floor) rides along so downstream
  *    keeps `novel && quality_ok` rows without a second pass.
  *
  * State is one (firstDocId, hits) pair per DISTINCT content — bounded by
  * unique corpus content, not stream length — and survives checkpoint
  * restart (`Trigger.AvailableNow` + same checkpoint dir resumes it,
  * proven in the suite). At scale the state store shards by the
  * fingerprint hash across executors; no driver-side set.
  */
object StreamingCuration {

  case class DocEvent(doc_id: Long, text: String)
  case class SeenState(firstDocId: Long, hits: Long)
  case class CuratedDoc(doc_id: Long, content_key: String, novel: Boolean,
      dup_of: Long, n_tokens: Int, quality_ok: Boolean)

  /** Minimum whitespace tokens for the quality gate. */
  val MinTokens = 3

  private[streaming] def contentKey(text: String): String = {
    val t = if (text == null) "" else text.trim
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def tokens(text: String): Int = {
    val t = if (text == null) "" else text.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  def curateStream(docs: Dataset[DocEvent])(
      implicit spark: SparkSession): Dataset[CuratedDoc] = {
    import spark.implicits._
    docs
      .groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState[SeenState, CuratedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[SeenState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[CuratedDoc]
          var s = state.getOption.orNull
          // deterministic within a micro-batch: admit the smallest doc_id
          // of the group so replays produce identical output
          for (d <- rows.toSeq.sortBy(_.doc_id)) {
            val nTok = tokens(d.text)
            if (s == null) {
              s = SeenState(d.doc_id, 1L)
              out += CuratedDoc(d.doc_id, key, novel = true, dup_of = d.doc_id,
                nTok, nTok >= MinTokens)
            } else {
              s = SeenState(s.firstDocId, s.hits + 1L)
              out += CuratedDoc(d.doc_id, key, novel = false, dup_of = s.firstDocId,
                nTok, nTok >= MinTokens)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Drain a parquet document source once into a parquet sink; safe to
    * call repeatedly — the seen-content state lives in `checkpointDir`.
    */
  def runOnce(docsDir: String, outDir: String, checkpointDir: String)(
      implicit spark: SparkSession): Unit = {
    import spark.implicits._
    val docs = spark.readStream.schema(DocSchema).parquet(docsDir).as[DocEvent]
    val q = curateStream(docs).toDF().writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
