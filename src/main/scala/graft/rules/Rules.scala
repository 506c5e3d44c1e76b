package graft.rules

import graft.core.TextSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rule extraction + projection (E9, J3, J5 and the template registry in
  * SURVEY.md §2/§3.3).
  *
  * The reference has two rule sources:
  *  - explicit rules extracted from text (LLM JSON at anthropic.py:307-358:
  *    text + concept_ids + category + confidence). Our deterministic
  *    stand-in extracts imperative/normative sentences ("X must/should/
  *    never/always ...") and links them to concepts by name containment —
  *    the same containment linking the reference uses to validate rule
  *    concept_ids against the concept set (ingest/base.py:300-306).
  *  - derived rules: one per unique (source,target) edge pair, text from a
  *    per-relation-type template expanded with the endpoint names
  *    (projectors/sources/flat.py:79-153; 39-template registry at
  *    core/templates.py:33-398 — we keep ONE canonical template per
  *    relation type, same expansion semantics).
  *
  * Deterministic invariant kept from the reference's e2e test
  * (tests/test_e2e_book_to_buildlog.py:386-394):
  *   derived rule count == number of unique (source,target) edge pairs.
  */
object Rules {

  private val modalRe =
    "(?i)\\b(must|should|never|always|do not|don't|avoid|require[sd]?)\\b".r

  /** Is this sentence a normative/imperative rule candidate? Pure — shared
    * by the extraction flatMap and the standalone rules job.
    */
  def isNormative(sentence: String): Boolean =
    sentence != null && modalRe.findFirstIn(sentence).isDefined &&
      TextSpec.tokenize(sentence).size >= 5

  /** Explicit rules from normative sentences in the chunk/page text.
    * Input: (url, text) rows; concepts: (id, name). Output rule rows:
    * (id, text, domain, source_id, concept_ids, category, confidence).
    */
  /** Distinct normative sentences with a deterministic witness source.
    * Exposed separately so the verify harness can dump it as an oracle
    * fixture. Output: (text, source_id).
    */
  def normativeSentences(pagesText: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    pagesText
      .select(col("url"), col("text"))
      .as[(String, String)]
      .flatMap { case (url, text) =>
        if (text == null) Iterator.empty
        else
          text.split("(?<=[.!?\\n])\\s+").iterator
            .map(_.trim)
            .filter(isNormative)
            .map(s => (url, s))
      }
      .toDF("source_id", "text")
      .groupBy("text")
      .agg(min("source_id").as("source_id")) // deterministic witness
  }

  /** Lowercased mention names detected in each sentence — the Scala-side
    * half of rule→concept linking (the SQL-checkable joins/groups sit
    * downstream of this). Output: (text, __n), distinct.
    */
  def sentenceMentionNames(sentences: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    sentences
      .select(col("text")).as[String]
      .flatMap { text =>
        val toks = graft.extract.DetExtractor.tokens(text)
        graft.extract.DetExtractor.detectMentions(text, toks).iterator
          .map(m => (text, m.name.toLowerCase(java.util.Locale.ROOT)))
      }
      .toDF("text", "__n")
      .distinct()
  }

  def explicitRules(
      pagesText: DataFrame, // (url, text)
      concepts: DataFrame, // (id, name)
      domain: String
  )(implicit spark: SparkSession): DataFrame = {
    val sentences = normativeSentences(pagesText)

    // concept linking (ingest/base.py:300-306 validation semantics): detect
    // mention spans in the sentence, EQUI-join their lowercased names to the
    // concept dictionary — never a quadratic containment scan.
    // All joins/groups key on sha2(text) instead of the full sentence string
    // — at web scale the sentence table is millions of mostly-unique long
    // strings, and shuffling/sorting them as keys was the measured memory
    // cliff of round 1 (511 s at 2 cores vs 33 s at 8 on 800k pages).
    val keyed = sentences.withColumn("__k", sha2(col("text"), 256))
    val cand = sentenceMentionNames(sentences)
      .select(sha2(col("text"), 256).as("__k"), col("__n"))

    val names = concepts.select(col("id").as("concept_id"), lower(col("name")).as("__n"))
    val category = when(lower(col("text")).rlike("\\bnever\\b|\\bdo not\\b|\\bdon't\\b|\\bavoid\\b"),
      "prohibition").otherwise("requirement")

    keyed
      .join(cand.join(names, Seq("__n")).select(col("__k"), col("concept_id")),
        Seq("__k"), "left")
      .groupBy(col("__k"))
      .agg(min(col("text")).as("text"), min(col("source_id")).as("source_id"),
        sort_array(collect_set(col("concept_id"))).as("concept_ids"))
      .withColumn("id", concat(lit("rule:"), col("__k").substr(1, 16)))
      .withColumn("domain", lit(domain))
      .withColumn("category", category)
      .withColumn("confidence", lit(0.8))
      .select("id", "text", "domain", "source_id", "concept_ids", "category", "confidence")
  }

  /** One canonical template per relation type (core/templates.py keeps 3
    * per type; the projection picks one by category hint —
    * flat.py:117-133). `{source}`/`{target}` expand to node names.
    */
  val templates: Map[String, String] = Map(
    "USES" -> "{source} builds on {target}; keep {target} available wherever {source} runs.",
    "REQUIRES" -> "{source} cannot operate without {target}; provision {target} first.",
    "CONTAINS" -> "{source} encompasses {target}; changes to {target} stay within {source}.",
    "IMPLEMENTS" -> "{source} realizes {target}; keep their contracts aligned.",
    "REFINES" -> "{source} specializes {target}; prefer {source} where its assumptions hold.",
    "PART_OF" -> "{source} is a component of {target}; version them together.",
    "SIMILAR_TO" -> "{source} and {target} are interchangeable in many designs; compare before choosing.",
    "ALTERNATIVE_TO" -> "{source} replaces {target} in some designs; document the trade-off.",
    "SUPPORTS" -> "{source} strengthens the case for {target}.",
    "CHALLENGES" -> "{source} works against {target}; mitigate the tension.",
    "CONTRADICTS" -> "{source} is incompatible with {target}; never assume both.",
    "BELONGS_TO" -> "{source} belongs to {target}.",
    "INSTANCE_OF" -> "{source} is an instance of {target}.",
    "RELATED_TO" -> "{source} relates to {target}; consider them together."
  )

  /** Derived rules: dedup edges on (source,target) keeping the
    * max-confidence relation (flat.py:96-116 dedups per pair), then expand
    * the relation's template with the endpoint names (J5: edges ⋈ concepts
    * twice ⋈ broadcast template registry).
    */
  def derivedRules(
      edges: DataFrame, // (source_id, target_id, relation_type, confidence)
      concepts: DataFrame, // (id, name)
      domain: String
  )(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source_id"), col("target_id"))
      .orderBy(col("confidence").desc, col("relation_type").asc)
    val uniquePairs = edges
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val names = concepts.select(col("id"), col("name"))
    val tmpl = spark.createDataFrame(templates.toSeq).toDF("relation_type", "template")

    uniquePairs
      .join(broadcast(names).withColumnRenamed("id", "source_id")
        .withColumnRenamed("name", "__sn"), Seq("source_id"))
      .join(broadcast(names).withColumnRenamed("id", "target_id")
        .withColumnRenamed("name", "__tn"), Seq("target_id"))
      .join(broadcast(tmpl), Seq("relation_type"), "left")
      .withColumn("text",
        regexp_replace(
          regexp_replace(coalesce(col("template"), lit("{source} relates to {target}.")),
            lit("\\{source\\}"), col("__sn")),
          lit("\\{target\\}"), col("__tn")))
      .withColumn("id", concat(lit("drule:"),
        sha2(concat_ws("|", col("source_id"), col("target_id")), 256).substr(1, 16)))
      .withColumn("domain", lit(domain))
      .withColumn("concept_ids", array(col("source_id"), col("target_id")))
      .withColumn("category", lit("derived"))
      .select("id", "text", "domain", "concept_ids", "category", "confidence")
  }

  /** J3 retrieval-side linkage: rules joined to activated concepts via
    * `concept_ids ∩ activated`, relevance = max activation score
    * (src/qortex/core/rules.py:17-96).
    */
  def rulesForConcepts(rules: DataFrame, activated: DataFrame): DataFrame =
    rules
      .select(col("id"), col("text"), col("category"),
        explode(col("concept_ids")).as("concept_id"))
      .join(activated.select(col("id").as("concept_id"), col("score")), Seq("concept_id"))
      .groupBy("id", "text", "category")
      .agg(max(col("score")).as("relevance"))
      .orderBy(col("relevance").desc, col("id").asc)
}
