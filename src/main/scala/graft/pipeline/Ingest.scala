package graft.pipeline

import graft.canon.Canon
import graft.core.{PageRow, TextSpec}
import graft.extract.{Chunkers, DetExtractor, Html2Text}
import graft.link.Linking
import graft.prune.Pruning
import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end KG-construction pipeline (SURVEY.md §7.2):
  *
  *   pages → html2text → chunk → extract (mentions+triples) → link →
  *   prune → canonicalize → snapshot-committed tables.
  *
  * Replaces the reference's two serial network boundaries (per-chunk LLM
  * calls + per-row Cypher writes, SURVEY.md §3.1) with partition-parallel
  * pure compute; the only cross-node exchanges are the linking joins, the
  * pruning groupBys, CC iterations, and the final columnar writes.
  *
  * Tables (store = Iceberg-style snapshot log, graft.store.SnapshotStore):
  *   - appendable, per-input-partition: extractions (staged per-page
  *     structs), pages_text, lineage
  *   - derived, rebuilt per commit: concepts, edges, canon_map, triples
  *
  * Resume: each appendable table gates on its OWN snapshot's ingested
  * partitions; a killed run re-processes only partitions missing from that
  * table (pages_text/lineage catch up from the staged extractions without
  * re-extracting).
  */
object Ingest {

  final case class MentionLite(chunk_id: String, name: String, description: String,
      confidence: Double, role: String, illustrates: String)
  final case class TripleLite(chunk_id: String, subj: String, pred: String, obj: String,
      confidence: Double, sentence: String)
  final case class AliasPair(name_a: String, name_b: String)

  /** One row per page out of the extraction stage — everything downstream
    * (pages_text, mentions, triples, aliases) is an explode of this, so the
    * expensive per-page work runs exactly once and is committed once.
    */
  final case class PageExtraction(
      url: String,
      day: String,
      text_sha256: String, // byte-identical-text-per-url gate
      n_chars: Long,
      n_chunks: Int,
      mentions: Seq[MentionLite],
      triples: Seq[TripleLite],
      aliases: Seq[AliasPair],
      rule_sentences: Seq[String], // normative sentences (explicit rules, E9)
      code_blocks: Seq[graft.extract.CodeExamples.CodeLite]) // fenced code (E9)

  /** "X is also known as Y" textual alias rule (canonicalization seed; our
    * spec — plays the role of the reference's illustrative-concept matching,
    * ingest/base.py:184-223).
    */
  private val aliasRe =
    ("([A-Z][A-Za-z0-9'\\-]*(?: [A-Z][A-Za-z0-9'\\-]*)*) is also known as " +
      "([A-Z][A-Za-z0-9'\\-]*(?: [A-Z][A-Za-z0-9'\\-]*)*)").r

  def aliasesIn(text: String): Seq[AliasPair] =
    aliasRe.findAllMatchIn(text).map { m =>
      AliasPair(TextSpec.titleCase(m.group(1)), TextSpec.titleCase(m.group(2)))
    }.filter(p => p.name_a != p.name_b).toVector.distinct

  final case class Config(
      domain: String = "web",
      langFilter: Option[String] = Some("en"),
      maxTokensPerChunk: Int = 256,
      overlapTokens: Int = 32,
      pruning: Pruning.Config = Pruning.Config(),
      nameSimThreshold: Double = 0.75,
      broadcastMaxRows: Long = 2000000L,
      saltBuckets: Int = 16,
      /** Some(n): assume the concept dictionary has ~n rows (skip the
        * sizing count; real deployments read this from table statistics).
        * None: count before choosing broadcast vs salted join.
        */
      dictSizeHint: Option[Long] = None,
      verbose: Boolean = sys.env.contains("GRAFT_VERBOSE"))

  private def timed[T](cfg: Config, name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (cfg.verbose)
      System.err.println(f"[graft] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** Pure per-page extraction — html2text, chunk, mention+triple detection.
    * Used identically by the distributed flatMap and the sequential oracle.
    */
  def extractPage(url: String, day: String, html: Array[Byte], cfg: Config): PageExtraction = {
    val text = Html2Text(html)
    val chunks =
      Chunkers.sentenceBoundary(text, cfg.maxTokensPerChunk, cfg.overlapTokens, sourceId = url)
    val mentions = Vector.newBuilder[MentionLite]
    val triples = Vector.newBuilder[TripleLite]
    for (c <- chunks) {
      val ex = DetExtractor.extract(c.text)
      mentions ++= ex.mentions.map(m =>
        MentionLite(c.id, m.name, m.description, m.confidence, m.role, m.illustrates))
      triples ++= ex.triples.map(t =>
        TripleLite(c.id, t.subj, t.pred, t.obj, t.confidence, t.sentence))
    }
    val ruleSentences = text.split("(?<=[.!?\\n])\\s+").iterator
      .map(_.trim).filter(graft.rules.Rules.isNormative).toVector.distinct
    PageExtraction(
      url, day, TextSpec.sha256Hex(text), text.length.toLong, chunks.length,
      mentions.result(), triples.result(), aliasesIn(text), ruleSentences,
      graft.extract.CodeExamples.extractBlocks(text))
  }

  /** Distributed extraction over a slice of the pages table. */
  def extract(pages: Dataset[PageRow], cfg: Config)(implicit spark: SparkSession): Dataset[PageExtraction] = {
    import spark.implicits._
    val filtered = cfg.langFilter match {
      case Some(l) => pages.filter(col("lang") === l) // pushed to the parquet scan
      case None => pages
    }
    filtered.map(p => extractPage(p.url, p.day, p.html, cfg))
  }

  /** Column-pruned explodes over the staged extraction table: parquet only
    * reads the struct fields each view touches.
    */
  def mentionsOf(extractions: DataFrame): DataFrame =
    extractions
      .select(col("url"), col("day"), explode(col("mentions")).as("m"))
      .select(col("url"), col("day"), col("m.chunk_id").as("chunk_id"),
        col("m.name").as("name"), col("m.description").as("description"),
        col("m.confidence").as("confidence"),
        col("m.role").as("role"), col("m.illustrates").as("illustrates"))

  def triplesOf(extractions: DataFrame): DataFrame =
    extractions
      .select(col("url"), col("day"), explode(col("triples")).as("t"))
      .select(
        col("t.subj").as("subj"), col("t.pred").as("pred"), col("t.obj").as("obj"),
        col("t.confidence").as("confidence"), col("url"), col("day"),
        col("t.chunk_id").as("chunk_id"),
        col("t.sentence").as("sentence"),
        lit(TextSpec.version).as("extractor_version"))

  def aliasesOf(extractions: DataFrame): DataFrame =
    extractions
      .select(explode(col("aliases")).as("a"))
      .select(col("a.name_a").as("name_a"), col("a.name_b").as("name_b"))
      .distinct()

  def ruleSentencesOf(extractions: DataFrame): DataFrame =
    extractions
      .select(col("url"), explode(col("rule_sentences")).as("text"))

  /** Code-example table (core/models.py:91-119 shape): exploded fenced
    * blocks, concept-linked by the detected description mention names —
    * the same equi-join linking rule as explicit rules.
    */
  def codeExamplesOf(extractions: DataFrame, concepts: DataFrame, domain: String): DataFrame = {
    // checkpointed: the exploded block frame is both the link-join input
    // and the left side of the final join — one nested-parquet decode
    // instead of two (the frame is code-block-cardinality, small)
    val blocks = extractions
      .select(col("url"), posexplode(col("code_blocks")).as(Seq("idx", "b")))
      .select(col("url"), col("idx"), col("b.code").as("code"),
        col("b.language").as("language"), col("b.description").as("description"),
        col("b.is_antipattern").as("is_antipattern"), col("b.names").as("__names"))
      .localCheckpoint()
    val dict = concepts.select(col("id").as("concept_id"), lower(col("name")).as("__n"))
    val linked = blocks
      .select(col("url"), col("idx"), explode(col("__names")).as("__n"))
      .join(dict, Seq("__n"))
      .groupBy("url", "idx")
      .agg(sort_array(collect_set(col("concept_id"))).as("concept_ids"))
    blocks
      .join(linked, Seq("url", "idx"), "left")
      .withColumn("concept_ids",
        coalesce(col("concept_ids"), typedLit(Seq.empty[String])))
      .withColumn("id", concat(lit(s"$domain:example:"),
        sha2(concat_ws("|", col("url"), col("idx")), 256).substr(1, 16)))
      .select(col("id"), col("code"), col("language"), col("description"),
        col("url").as("source_location"), col("concept_ids"), col("is_antipattern"))
  }

  /** Ingest any not-yet-committed input partitions, then rebuild the derived
    * tables. Returns the number of newly processed partitions.
    *
    * `knownPartitions`: on a real table the partition list comes from table
    * metadata (an Iceberg manifest / filesystem listing), never from a data
    * scan; callers that know the partition values pass them here. The
    * fallback scans the Dataset (correct but wasteful for a generated
    * input whose `day` only exists after the generator map runs).
    */
  def run(
      pages: Dataset[PageRow],
      store: SnapshotStore,
      cfg: Config = Config(),
      knownPartitions: Option[Seq[String]] = None
  )(implicit spark: SparkSession): Int = {
    import spark.implicits._

    val inputParts = knownPartitions.getOrElse(
      pages.select(col("day")).distinct().as[String].collect().sorted.toSeq)

    // Each appendable table is gated on ITS OWN snapshot's ingestedPartitions
    // — a kill between the extractions commit and the pages_text/lineage
    // commits must not permanently drop those partitions from the derived
    // appendables on resume. pages_text/lineage are cheap re-projections of
    // the staged extractions table, so catching them up never re-extracts.
    val t0 = System.nanoTime()
    val exTodo = inputParts.filterNot(store.ingestedPartitions("extractions"))
    if (exTodo.nonEmpty) {
      val slice = pages.filter(col("day").isin(exTodo: _*))
      // Stage the per-page extraction output to parquet in ONE pass — the
      // expensive compute is never recomputed and never cached on-heap
      // (at corpus scale an in-memory persist of this table thrashes GC;
      // downstream views read back column-pruned).
      timed(cfg, "extract+commit extractions") {
        store.commitAppend("extractions", extract(slice, cfg).toDF(), exTodo)
      }
    }

    val ptTodo = inputParts.filterNot(store.ingestedPartitions("pages_text"))
    if (ptTodo.nonEmpty) {
      val staged = store.read("extractions").filter(col("day").isin(ptTodo: _*))
      timed(cfg, "commit pages_text") {
        store.commitAppend("pages_text",
          staged.select(col("url"), col("day"), col("text_sha256"),
            col("n_chars"), col("n_chunks")),
          ptTodo)
      }
    }

    val linTodo = inputParts.filterNot(store.ingestedPartitions("lineage"))
    if (linTodo.nonEmpty) {
      val staged = store.read("extractions").filter(col("day").isin(linTodo: _*))
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val lineage = staged
        .groupBy(col("day").as("input_partition"))
        .agg(
          count(lit(1)).as("docs"),
          sum(col("n_chunks")).as("chunks"),
          sum(size(col("mentions"))).as("mentions"),
          sum(size(col("triples"))).as("triples_raw"))
        .withColumn("wall_ms", lit(wallMs))
        .withColumn("extractor_version", lit(TextSpec.version))
      timed(cfg, "commit lineage") { store.commitAppend("lineage", lineage, linTodo) }
    }

    timed(cfg, "rebuildDerived total") { rebuildDerived(store, cfg) }
    exTodo.size
  }

  /** Rebuild concepts / edges / canon_map / triples from the accumulated
    * appendable tables. Deterministic: same committed inputs ⇒ same outputs,
    * so interrupted runs converge to the uninterrupted result.
    */
  def rebuildDerived(store: SnapshotStore, cfg: Config)(implicit spark: SparkSession): Unit = {
    val allParts = store.latest("extractions").map(_.inputPartitions).getOrElse(Seq.empty)
    val staged = store.read("extractions")
    val mentions = mentionsOf(staged)
    val triplesRaw = triplesOf(staged)

    val concepts = timed(cfg, "buildConcepts") {
      Linking
        .buildConcepts(mentions, cfg.domain, TextSpec.version)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    // cross-chunk (s,o,type) dedup before pruning — keep max confidence, then
    // the longest evidence (E12, ingest/base.py:242-259 made deterministic)
    val rawEdges = timed(cfg, "resolveEdges") {
      Linking.resolveEdges(triplesRaw, concepts, cfg.broadcastMaxRows, cfg.saltBuckets,
        cfg.dictSizeHint)(spark)
    }
    // Stage the tagged edge set to parquet instead of an on-heap persist:
    // at web scale this table is tens of millions of rows carrying evidence
    // sentences — MEMORY_AND_DISK persist GC-thrashes the executors (same
    // lesson as the extraction staging above; measured at 1.6M pages: the
    // edges stage dominated the rebuild). Both consumers (survivors →
    // canonical edges, drop-reason stats) re-read column-pruned.
    timed(cfg, "stage edges_tagged") {
      store.commitReplace("edges_tagged", Pruning.tag(rawEdges, cfg.pruning)(spark), allParts)
    }
    val tagged = store.read("edges_tagged")
    val prunedEdges = Pruning.survivors(tagged)

    val aliasPairs = aliasesOf(staged)
    val canonMap = timed(cfg, "canonicalMap") {
      Canon.canonicalMap(concepts, aliasPairs, cfg.nameSimThreshold)(spark)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    val conceptsCanon = concepts
      .join(canonMap, Seq("id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("id")))

    // rewrite edges onto canonical ids and dedup (src,tgt,type) keeping the
    // max-confidence witness — core/backend.py:586-600 read-time dedup
    val edgesCanon = prunedEdges
      .join(canonMap.withColumnRenamed("id", "source_id")
        .withColumnRenamed("canonical_id", "src_canon"), Seq("source_id"), "left")
      .join(canonMap.withColumnRenamed("id", "target_id")
        .withColumnRenamed("canonical_id", "tgt_canon"), Seq("target_id"), "left")
      .withColumn("source_id", coalesce(col("src_canon"), col("source_id")))
      .withColumn("target_id", coalesce(col("tgt_canon"), col("target_id")))
      .drop("src_canon", "tgt_canon")
      .filter(col("source_id") =!= col("target_id"))
      .withColumn("__rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source_id"), col("target_id"), col("relation_type"))
          .orderBy(col("confidence").desc, length(col("source_text")).desc,
            col("source_text").asc, col("source_location").asc)))
      .filter(col("__rank") === 1)
      .drop("__rank")

    timed(cfg, "commit concepts") { store.commitReplace("concepts", conceptsCanon, allParts) }
    timed(cfg, "commit edges") { store.commitReplace("edges", edgesCanon, allParts) }
    timed(cfg, "commit canon_map") { store.commitReplace("canon_map", canonMap, allParts) }

    // Downstream consumers read the COMMITTED concepts/edges back instead
    // of re-planning the canonicalization joins: the conceptsCanon /
    // edgesCanon plans above (two canon-map joins + the dedup window over
    // the full edge set) would otherwise recompute once per consumer —
    // canonConceptNames feeds rules AND code examples, and derivedRules
    // re-consumed edgesCanon. The committed parquet is byte-identical to
    // the frames just written, so values are unchanged.
    val conceptsCommitted = store.read("concepts")
    val edgesCommitted = store.read("edges")

    // rules: explicit (normative sentences, E9) + derived (one per unique
    // canonical edge pair, flat.py invariant)
    val canonConceptNames = conceptsCommitted
      .groupBy(col("canonical_id").as("id"))
      .agg(min(col("name")).as("name"))
    val explicit = graft.rules.Rules.explicitRules(
      ruleSentencesOf(staged), canonConceptNames, cfg.domain)(spark)
      .withColumn("template_id", lit("")).withColumn("severity", lit(""))
    val derived = graft.rules.Rules.derivedRules(
      edgesCommitted.select("source_id", "target_id", "relation_type", "confidence"),
      canonConceptNames, cfg.domain)(spark)
      .withColumn("source_id", lit(null).cast("string"))
      .select("id", "text", "domain", "source_id", "concept_ids", "category", "confidence",
        "template_id", "severity")
    timed(cfg, "commit rules") {
      store.commitReplace("rules", explicit.unionByName(derived), allParts)
    }

    timed(cfg, "commit code_examples") {
      store.commitReplace("code_examples",
        codeExamplesOf(staged, canonConceptNames, cfg.domain), allParts)
    }

    // prune drop stats per snapshot → lineage_prune
    val pruneStats = tagged
      .groupBy(coalesce(col(Pruning.ReasonCol), lit("kept")).as("reason"))
      .agg(count(lit(1)).as("n"))
    timed(cfg, "commit lineage_prune") { store.commitReplace("lineage_prune", pruneStats, allParts) }

    concepts.unpersist(); canonMap.unpersist()
  }
}
