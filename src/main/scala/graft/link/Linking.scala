package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking: surface forms → concept ids.
  *
  * The reference links by an in-process alias dict `{name.lower(): concept}`
  * (packages/qortex-ingest/src/qortex/ingest/base.py:185-191; the same
  * pattern serves name-or-id resolution at src/qortex/service.py:629-666).
  * Distributed re-expression:
  *
  *  - the concept table is built by a map-side-combining groupBy on
  *    lower(name) — head-entity skew is absorbed by partial aggregation;
  *  - triple endpoints resolve to concept ids via an equi-join on
  *    lower(name). The alias dictionary is usually ≪ the mention stream, so
  *    we `broadcast()` it below a size threshold; above it we fall back to a
  *    SALTED sort-merge join: hot keys (head entities per SURVEY.md §7.5)
  *    are detected with a cheap pre-aggregation, the dictionary side is
  *    exploded across SALT_N buckets and the probe side salts by a hash of
  *    the row, so one key no longer lands on one task.
  */
object Linking {

  /** Node id scheme "{domain}:{Name}" — ingest/base.py:174. */
  def conceptId(domain: String, name: String): String = s"$domain:$name"

  /** E11: deterministic 384-d embedding of "name: description"
    * (ingest/base.py:225-235 text template; see graft.core.Embeddings).
    */
  private val embedUdf = udf { (name: String, description: String) =>
    graft.core.Embeddings.embedConcept(
      if (name == null) "" else name,
      if (description == null) "" else description)
  }

  /** Build the concept table from the mention stream — the distributed
    * two-pass of the reference's ingestion (E10, ingest/base.py:159-223):
    *
    *  pass 1 — generalizable mentions aggregate to concepts. Winner per
    *    lower(name): max confidence, then lexicographically smallest name
    *    variant then earliest (url, chunk_id) — a deterministic version of
    *    the reference's last-writer-wins upsert (core/memory.py:97-101),
    *    which is arrival-order dependent and therefore unusable distributed.
    *  pass 2 — illustrative mentions reconcile:
    *    · parent concept exists (lower(illustrates) matches) → attached as
    *      properties["examples"] = JSON array of {name, description,
    *      source_location, confidence} (base.py:190-205)
    *    · no parent → the mention becomes its own concept tagged
    *      properties{concept_role: illustrative, illustrates} — unless a
    *      generalizable concept of the same name already exists, which wins
    *      (the upsert semantics of base.py:206-222)
    *
    * Mentions without a `role` column (older stages/tests) are treated as
    * all-generalizable.
    */
  def buildConcepts(mentions: DataFrame, domain: String, extractorVersion: String): DataFrame = {
    val m =
      if (mentions.columns.contains("role")) mentions
      else mentions.withColumn("role", lit("generalizable"))
        .withColumn("illustrates", lit(null).cast("string"))
    val gen = m.filter(col("role") =!= "illustrative")
    val ill = m.filter(col("role") === "illustrative")

    // Single-winner semantics: ALL projected fields come from ONE mention —
    // min(struct(-confidence, ...)) picks that row in one partial-aggregable
    // pass (struct ordering is lexicographic over the fields).
    def aggregate(src: DataFrame): DataFrame =
      src
        .withColumn("__key", lower(col("name")))
        .groupBy(col("__key"))
        .agg(
          min(struct((-col("confidence")).as("nc"), col("name"), col("url"),
            col("chunk_id"), col("description"), col("illustrates"))).as("__w"),
          count(lit(1)).as("mention_count"))
        .select(
          col("__key"),
          concat(lit(domain), lit(":"), col("__w.name")).as("id"),
          col("__w.name").as("name"),
          col("__w.description").as("description"),
          lit(domain).as("domain"),
          col("__w.url").as("source_id"),
          col("__w.chunk_id").as("source_location"),
          (-col("__w.nc")).cast("double").as("confidence"),
          col("mention_count"),
          embedUdf(col("__w.name"), col("__w.description")).as("embedding"),
          lit("feature-hash-384-v1").as("embedding_model"),
          lit(extractorVersion).as("extractor_version"),
          col("__w.illustrates").as("__illustrates"))

    // Materialize the generalizable aggregation ONCE: `base` feeds the
    // examples join AND both orphan anti-joins (via baseKeys) — un-
    // checkpointed, the groupBy + per-concept embedding UDF re-ran once
    // per consumer (3× over the full mention stream; measured as the
    // dominant cost of buildConcepts at 20k pages). The frame is
    // concept-cardinality (small), so the materialization is cheap.
    val base = aggregate(gen).localCheckpoint()

    // pass 2a: examples attach to parents by lower(illustrates). The
    // reference appends every occurrence (base.py:196-204); at web scale a
    // head-entity parent would accumulate millions of example structs into
    // ONE aggregation buffer (measured: this alone doubled the 8-core wall
    // time at 800k pages). Scale-safe shape:
    //   1. one witness per (parent, example name) — high-cardinality keys,
    //      bounded groups, partial-aggregable
    //   2. window-cap to MaxExamplesPerParent BEFORE collecting (sort-based
    //      window spills; no unbounded array buffer)
    //   3. sorted + JSON-serialized, deterministic
    val MaxExamplesPerParent = 20
    val witnessed = ill
      .filter(col("illustrates").isNotNull)
      .groupBy(lower(col("illustrates")).as("__key"), lower(col("name")).as("__en"))
      .agg(min(struct((-col("confidence")).as("nc"), col("name"),
        col("description"), col("chunk_id"))).as("__w"))
      .select(col("__key"),
        struct(col("__w.name").as("name"), col("__w.description").as("description"),
          col("__w.chunk_id").as("source_location"),
          (-col("__w.nc")).cast("double").as("confidence")).as("ex"))
    val exWindow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__key")).orderBy(col("ex"))
    val examples = witnessed
      .withColumn("__rn", row_number().over(exWindow))
      .filter(col("__rn") <= MaxExamplesPerParent)
      .groupBy("__key")
      .agg(to_json(array_sort(collect_list(col("ex")))).as("__examples"))

    val emptyProps = typedLit(Map.empty[String, String])
    val withExamples = base
      .join(examples, Seq("__key"), "left")
      .withColumn("properties",
        when(col("__examples").isNotNull, map(lit("examples"), col("__examples")))
          .otherwise(emptyProps))
      .drop("__key", "__examples", "__illustrates")

    // pass 2b: orphans — parent key absent from the concept table AND own
    // name not already a concept
    val baseKeys = base.select(col("__key"))
    val orphanMentions = ill
      .join(baseKeys.withColumnRenamed("__key", "__pk"),
        lower(coalesce(col("illustrates"), lit("\u0000"))) === col("__pk"), "left_anti")
      .join(baseKeys, lower(col("name")) === col("__key"), "left_anti")
    val orphans = aggregate(orphanMentions)
      .withColumn("properties",
        map(lit("concept_role"), lit("illustrative"),
          lit("illustrates"), coalesce(col("__illustrates"), lit(""))))
      .drop("__key", "__illustrates")

    withExamples.unionByName(orphans)
  }

  /** Resolve triple endpoints (subj/obj surface names) to concept ids.
    * Keeps only triples whose BOTH endpoints exist in the concept table —
    * the reference's endpoint validation (anthropic.py:287-304,
    * service.py:663-666) as two equi-joins.
    *
    * `dict` = concepts projected to (lower(name) → id). Physical strategy:
    * broadcast below `broadcastMaxRows`, salted SMJ otherwise.
    */
  def resolveEdges(
      triples: DataFrame,
      concepts: DataFrame,
      broadcastMaxRows: Long = 2000000L,
      saltBuckets: Int = 16,
      /** None → count the dictionary to pick broadcast vs salted SMJ (one
        * extra job, amortized at scale); Some(n) → caller-supplied size
        * (e.g. from table stats) so no counting job runs.
        */
      dictSizeHint: Option[Long] = None
  )(implicit spark: SparkSession): DataFrame = {
    val dict = concepts.select(lower(col("name")).as("__key"), col("id"))

    val dictRows = dictSizeHint.getOrElse(dict.count())
    val resolved =
      if (dictRows <= broadcastMaxRows) {
        triples
          .join(broadcast(dict).withColumnRenamed("id", "source_id"),
            lower(col("subj")) === col("__key"), "inner")
          .drop("__key")
          .join(broadcast(dict).withColumnRenamed("id", "target_id"),
            lower(col("obj")) === col("__key"), "inner")
          .drop("__key")
      } else {
        val s1 = saltedJoin(triples.withColumn("__key", lower(col("subj"))), dict, saltBuckets)
          .withColumnRenamed("id", "source_id").drop("__key")
        saltedJoin(s1.withColumn("__key", lower(col("obj"))), dict, saltBuckets)
          .withColumnRenamed("id", "target_id").drop("__key")
      }

    resolved.select(
      col("source_id"), col("target_id"),
      col("pred").as("relation_type"),
      col("confidence"),
      lit(false).as("bidirectional"),
      col("sentence").as("source_text"),
      col("url").as("source_location"),
      col("extractor_version"))
  }

  /** Generic salted equi-join: probe (`big`, keyed by __key) ⋈ build
    * (`dict`, keyed by __key). The dict side is replicated across
    * `saltBuckets` salt values; the probe side computes its salt from a
    * hash of the whole row, so a single hot key spreads over `saltBuckets`
    * tasks instead of one straggler.
    */
  def saltedJoin(big: DataFrame, dict: DataFrame, saltBuckets: Int): DataFrame = {
    val saltedDict = dict
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    val saltedBig = big
      .withColumn("__salt", pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets)))
    saltedBig
      .join(saltedDict, Seq("__key", "__salt"), "inner")
      .drop("__salt")
  }
}
