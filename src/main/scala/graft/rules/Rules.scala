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
    // checkpoint: the distinct-sentence frame feeds BOTH the keyed join
    // side and the mention detection below — without it the normative
    // flatMap + witness groupBy run once per consumer
    val sentences = normativeSentences(pagesText).localCheckpoint()

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

  /** One template variant. Mirrors the registry shape of
    * core/templates.py:16-26 (id "type:variant", category, severity) with
    * ORIGINAL template texts — the derivation semantics are the spec, the
    * prose is ours.
    */
  final case class RuleTemplate(
      id: String,
      relationType: String,
      template: String, // contains {source}/{target} placeholders
      variant: String,
      category: String, // general | architectural | antipattern
      severity: String) // info | warning | error

  /** 42 templates — 3 variants per relation type (core/templates.py:33-398
    * keeps 3 per type; first variant is the default, select_template picks
    * by category hint — templates.py:419-437).
    */
  val templateRegistry: Vector[RuleTemplate] = {
    def t3(rel: String, v1: (String, String, String, String),
        v2: (String, String, String, String), v3: (String, String, String, String)) =
      Vector(v1, v2, v3).map { case (variant, cat, sev, text) =>
        RuleTemplate(s"${rel.toLowerCase(java.util.Locale.ROOT)}:$variant", rel, text,
          variant, cat, sev)
      }
    t3("USES",
      ("dependency", "general", "info",
        "{source} builds on {target}; keep {target} available wherever {source} runs."),
      ("coupling", "architectural", "warning",
        "Treat the link from {source} to {target} as a hard dependency; version and deploy them in step."),
      ("bypass", "antipattern", "warning",
        "Do not bypass {target} from inside {source}; shortcuts break the dependency contract.")) ++
    t3("REQUIRES",
      ("provisioning", "general", "info",
        "{source} cannot operate without {target}; provision {target} first."),
      ("ordering", "architectural", "error",
        "Bring up {target} before {source}; starting {source} without {target} is a deployment error."),
      ("guard", "antipattern", "warning",
        "Never ship {source} without validating that {target} is reachable; silent degradation follows.")) ++
    t3("CONTAINS",
      ("scope", "general", "info",
        "{source} encompasses {target}; changes to {target} stay within {source}."),
      ("boundary", "architectural", "warning",
        "Changes inside {target} must not leak outside {source}; the containment boundary is the review unit."),
      ("duplication", "antipattern", "info",
        "Avoid duplicating {target} outside {source}; containment implies single ownership.")) ++
    t3("IMPLEMENTS",
      ("contract", "general", "info",
        "{source} realizes {target}; keep their contracts aligned."),
      ("conformance", "architectural", "error",
        "{source} must satisfy every invariant {target} declares; partial conformance is an error."),
      ("drift", "antipattern", "warning",
        "Watch for drift between {source} and {target}; re-verify the contract after changes to either.")) ++
    t3("REFINES",
      ("specialization", "general", "info",
        "{source} specializes {target}; prefer {source} where its assumptions hold."),
      ("substitution", "architectural", "info",
        "Where {source} applies, prefer it over the more general {target}."),
      ("overreach", "antipattern", "warning",
        "Do not use {source} outside the assumptions it inherits from {target}.")) ++
    t3("PART_OF",
      ("composition", "general", "info",
        "{source} is a component of {target}; version them together."),
      ("lockstep", "architectural", "warning",
        "Release {source} in lockstep with {target}; a component cannot outrun its whole."),
      ("extraction", "antipattern", "info",
        "Avoid extracting {source} from {target} without re-checking every shared invariant.")) ++
    t3("SIMILAR_TO",
      ("comparison", "general", "info",
        "{source} and {target} are interchangeable in many designs; compare before choosing."),
      ("choice", "architectural", "info",
        "Pick exactly one of {source} and {target} per subsystem; mixing near-equivalents multiplies maintenance."),
      ("conflation", "antipattern", "warning",
        "Do not treat {source} and {target} as identical; similar is not interchangeable under load.")) ++
    t3("ALTERNATIVE_TO",
      ("tradeoff", "general", "info",
        "{source} replaces {target} in some designs; document the trade-off."),
      ("migration", "architectural", "info",
        "When replacing {target} with {source}, write the migration path down before switching."),
      ("dual-running", "antipattern", "warning",
        "Avoid running {source} and {target} side by side for the same duty; choose one.")) ++
    t3("SUPPORTS",
      ("evidence", "general", "info",
        "{source} strengthens the case for {target}."),
      ("reinforcement", "architectural", "info",
        "Strengthen {target} by investing in {source}; the support relation compounds."),
      ("overreliance", "antipattern", "warning",
        "Do not let {target} rest solely on {source}; support is not proof.")) ++
    t3("CHALLENGES",
      ("tension", "general", "info",
        "{source} works against {target}; mitigate the tension."),
      ("mitigation", "architectural", "warning",
        "Plan a mitigation wherever {source} works against {target}."),
      ("denial", "antipattern", "error",
        "Never ignore that {source} undermines {target}; unaddressed tension becomes an outage.")) ++
    t3("CONTRADICTS",
      ("incompatibility", "general", "warning",
        "{source} is incompatible with {target}; never assume both."),
      ("mutual-exclusion", "architectural", "error",
        "{source} and {target} exclude each other; a design using both is invalid."),
      ("avoidance", "antipattern", "warning",
        "When committed to {source}, avoid {target} entirely.")) ++
    t3("BELONGS_TO",
      ("membership", "general", "info",
        "{source} belongs to {target}."),
      ("lifecycle", "architectural", "info",
        "Manage {source} within the lifecycle of {target}."),
      ("orphaning", "antipattern", "warning",
        "Do not detach {source} from {target} without reassigning ownership.")) ++
    t3("INSTANCE_OF",
      ("classification", "general", "info",
        "{source} is an instance of {target}."),
      ("generalization", "architectural", "info",
        "Reason about {source} through the rules of {target} first; instance follows class."),
      ("special-casing", "antipattern", "warning",
        "Avoid special-casing {source}; as an instance of {target} it should obey the class rules.")) ++
    t3("RELATED_TO",
      ("association", "general", "info",
        "{source} relates to {target}; consider them together."),
      ("co-review", "architectural", "info",
        "Review {source} and {target} together; related concepts change together."),
      ("sprawl", "antipattern", "info",
        "Avoid deepening the link between {source} and {target} without naming its type."))
  }

  /** select_template (core/templates.py:419-437): first variant whose
    * category matches the hint, else the first (default) variant.
    */
  def selectTemplate(relationType: String, categoryHint: Option[String]): Option[RuleTemplate] = {
    val candidates = templateRegistry.filter(_.relationType == relationType)
    categoryHint.flatMap(h => candidates.find(_.category == h)).orElse(candidates.headOption)
  }

  /** Default-variant view (back-compat; also feeds the q32 oracle VALUES
    * list so operator and oracle share one registry).
    */
  def templates: Map[String, String] =
    templateRegistry.groupBy(_.relationType).map { case (k, v) => k -> v.head.template }

  /** Derived rules: dedup edges on (source,target) keeping the
    * max-confidence relation (flat.py:96-116 dedups per pair), then expand
    * the selected template variant with the endpoint names (J5: edges ⋈
    * concepts twice ⋈ broadcast template registry; selection by category
    * hint per flat.py:117-133). Output carries the template provenance the
    * reference stores in rule metadata (flat.py:135-150).
    */
  def derivedRules(
      edges: DataFrame, // (source_id, target_id, relation_type, confidence)
      concepts: DataFrame, // (id, name)
      domain: String,
      categoryHint: Option[String] = None
  )(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source_id"), col("target_id"))
      .orderBy(col("confidence").desc, col("relation_type").asc)
    val uniquePairs = edges
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val names = concepts.select(col("id"), col("name"))
    val selected = graft.core.RelationTypes.all
      .flatMap(rt => selectTemplate(rt, categoryHint))
      .map(t => (t.relationType, t.template, t.id, t.category, t.severity))
    val tmpl = spark.createDataFrame(selected)
      .toDF("relation_type", "template", "template_id", "__tcat", "severity")

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
      .withColumn("category", coalesce(col("__tcat"), lit("general")))
      .withColumn("template_id", coalesce(col("template_id"), lit("")))
      .withColumn("severity", coalesce(col("severity"), lit("info")))
      .select("id", "text", "domain", "concept_ids", "category", "confidence",
        "template_id", "severity")
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
