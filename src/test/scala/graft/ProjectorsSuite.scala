package graft

import graft.projectors.Projectors
import graft.rules.Rules
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ProjectorsSuite extends SparkFunSuite {
  import spark.implicits._

  // small deterministic KG: 3 concepts, 3 edges over 2 unique pairs, 2
  // explicit rule sentences
  private def fixtures(): (DataFrame, DataFrame) = {
    val concepts = Seq(
      ("web:Cache", "Cache"), ("web:Redis", "Redis"), ("web:Queue", "Queue"))
      .toDF("id", "name")
    val edges = Seq(
      ("web:Cache", "web:Redis", "USES", 0.9),
      ("web:Cache", "web:Redis", "RELATED_TO", 0.5), // same pair, loses dedup
      ("web:Queue", "web:Redis", "REQUIRES", 0.75))
      .toDF("source_id", "target_id", "relation_type", "confidence")
    val pages = Seq(
      ("u1", "Services must use Cache for hot reads. Never bypass Queue in production deployments."))
      .toDF("url", "text")
    val ex = Rules.explicitRules(pages, concepts, "web")
    val dv = Rules.derivedRules(edges, concepts, "web")
    (ex, dv)
  }

  test("invariant: projected count == explicit + one per unique edge pair") {
    val (ex, dv) = fixtures()
    val rules = Projectors.ruleSource(ex, dv)
    val nExplicit = ex.count()
    val uniquePairs = 2L
    assert(rules.count() == nExplicit + uniquePairs,
      s"rule_count must equal explicit ($nExplicit) + unique pairs ($uniquePairs)")
    assert(rules.filter(col("derivation") === "derived").count() == uniquePairs)
  }

  test("derived provenance recovered from the template registry id") {
    val (ex, dv) = fixtures()
    val entries = Projectors.seedEntries(
      Projectors.enrichTemplate(Projectors.ruleSource(ex, dv)))
    val uses = entries
      .filter(col("prov_derivation") === "derived" && col("prov_relation_type") === "USES")
      .collect()
    assert(uses.length == 1)
    val r = uses.head
    assert(r.getAs[String]("prov_template_id") == "uses:dependency")
    assert(r.getAs[String]("prov_template_variant") == "dependency")
    assert(r.getAs[String]("prov_template_severity") == "info")
    assert(r.getAs[Double]("prov_confidence") == 0.9) // max-confidence pair winner
    assert(r.getAs[String]("tags") == "web,general,derived")
    // explicit entries carry null template provenance
    val exp = entries.filter(col("prov_derivation") === "explicit").collect()
    assert(exp.nonEmpty && exp.forall(_.getAs[String]("prov_relation_type") == null))
    assert(exp.forall(_.getAs[String]("antipattern") == "Violating this rule"))
  }

  test("ProjectionFilter: domains, categories, minConfidence, derivation") {
    val (ex, dv) = fixtures()
    def n(f: Projectors.ProjectionFilter): Long = Projectors.ruleSource(ex, dv, f).count()
    val all = n(Projectors.ProjectionFilter())
    assert(n(Projectors.ProjectionFilter(derivation = "explicit")) == ex.count())
    assert(n(Projectors.ProjectionFilter(derivation = "derived")) == 2)
    assert(n(Projectors.ProjectionFilter(domains = Seq("web"))) == all)
    assert(n(Projectors.ProjectionFilter(domains = Seq("other"))) == 0)
    assert(n(Projectors.ProjectionFilter(minConfidence = 0.8)) ==
      Projectors.ruleSource(ex, dv).filter(col("confidence") >= 0.8).count())
    assert(n(Projectors.ProjectionFilter(categories = Seq("general"))) == 2)
  }

  test("flatJson artifact parses back to the rule dicts (conditional keys)") {
    val (ex, dv) = fixtures()
    val rules = Projectors.enrichTemplate(Projectors.ruleSource(ex, dv))
    val json = Projectors.flatJson(rules)
    val parsed = spark.read.json(Seq(json).toDS)
    assert(parsed.columns.toSeq == Seq("rules"))
    val entries = parsed.select(explode(col("rules")).as("r")).select("r.*")
    assert(entries.count() == rules.count())
    // derived rows carry metadata; explicit rows don't (null after parse)
    assert(entries.filter(col("derivation") === "derived")
      .filter(col("metadata.relation_type").isNotNull).count() == 2)
    assert(entries.filter(col("derivation") === "explicit")
      .filter(col("metadata").isNotNull).count() == 0)
    // enrichment present on all
    assert(entries.filter(col("enrichment.antipattern") === "Violating this rule")
      .count() == rules.count())
    // includeEnrichment=false drops the key
    val bare = spark.read.json(Seq(Projectors.flatJson(rules, includeEnrichment = false)).toDS)
      .select(explode(col("rules")).as("r")).select("r.*")
    assert(!bare.columns.contains("enrichment"))
  }

  test("serializeRuleset: universal schema with rule_count and provenance") {
    val (ex, dv) = fixtures()
    val rules = Projectors.enrichTemplate(Projectors.ruleSource(ex, dv))
    val doc = Projectors.serializeRuleset(rules, persona = "graft_test",
      graphVersion = Some("2026-01-01T00:00:00Z"), projectedAt = "2026-01-02T00:00:00Z")
    val parsed = spark.read.json(Seq(doc).toDS)
    val row = parsed.collect().head
    assert(parsed.select("persona").head.getString(0) == "graft_test")
    assert(parsed.select("version").head.getLong(0) == 1L)
    assert(parsed.select("metadata.rule_count").head.getLong(0) == rules.count())
    assert(parsed.select("metadata.projected_at").head.getString(0) == "2026-01-02T00:00:00Z")
    val rs = parsed.select(explode(col("rules")).as("r")).select("r.*")
    assert(rs.count() == rules.count())
    assert(rs.filter(col("provenance.graph_version") === "2026-01-01T00:00:00Z")
      .count() == rules.count())
    assert(rs.filter(col("provenance.derivation") === "derived")
      .filter(col("provenance.relation_type").isNotNull).count() == 2)
  }

  test("serializeRuleset envelope escapes hostile persona/timestamp strings") {
    val (ex, dv) = fixtures()
    val rules = Projectors.ruleSource(ex, dv)
    val doc = Projectors.serializeRuleset(rules, persona = "team \"web\"\\alpha",
      projectedAt = "2026-01-02T00:00:00Z")
    val parsed = spark.read.json(Seq(doc).toDS)
    assert(!parsed.columns.contains("_corrupt_record"), doc.take(200))
    assert(parsed.select("persona").head.getString(0) == "team \"web\"\\alpha")
  }

  test("flatYaml: list-of-dicts under a rules key, one entry per rule") {
    val (ex, dv) = fixtures()
    val rules = Projectors.enrichTemplate(Projectors.ruleSource(ex, dv))
    val yaml = Projectors.flatYaml(rules)
    assert(yaml.startsWith("rules:\n"))
    assert(yaml.linesIterator.count(_.startsWith("- ")) == rules.count())
  }

  test("skillMarkdown: frontmatter + rules grouped by category") {
    val (ex, dv) = fixtures()
    val rules = Projectors.ruleSource(ex, dv)
    val (path, content) = Projectors.skillMarkdown(rules, "graft-rules")
    assert(path == "graft-rules/SKILL.md")
    assert(content.startsWith("---\nname: graft-rules\n"))
    assert(content.contains("## general"))
    assert(content.linesIterator.count(_.startsWith("- ")) == rules.count())
  }

  test("writeArtifact: atomic single-file write, overwrite replaces") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proj").toString
    val p = s"$dir/out/rules.json"
    Projectors.writeArtifact(p, "{\"v\":1}")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p))) == "{\"v\":1}")
    Projectors.writeArtifact(p, "{\"v\":2}")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p))) == "{\"v\":2}")
  }

  test("skillFiles: one SKILL.md per domain; single-file mode; openclaw frontmatter") {
    val (ex, dv) = fixtures()
    val rules = Projectors.enrichTemplate(Projectors.ruleSource(ex, dv))

    // per-domain (one 'web' domain here)
    val perDomain = Projectors.skillFiles(rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(perDomain.keySet == Set("web/SKILL.md"))
    val content = perDomain("web/SKILL.md")
    assert(content.startsWith("---\nname: web\ndescription: "))
    assert(!content.contains("metadata:")) // claude flavor has no metadata line
    // one "## {id}" section per rule + enrichment lines
    assert(content.linesIterator.count(_.startsWith("## ")) == rules.count())
    assert(content.contains("**Context:** When working in the web domain"))
    assert(content.contains("**Antipattern:** Violating this rule"))

    // single-file mode folds every domain into the named skill
    val single = Projectors.skillFiles(rules, skillName = Some("all-rules"))
      .collect().map(_.getString(0))
    assert(single.toSeq == Seq("all-rules/SKILL.md"))

    // openclaw flavor adds license + single-line-JSON metadata
    val oc = Projectors.skillFiles(rules, flavor = Projectors.OpenClawSkill)
      .collect().map(r => r.getString(1)).head
    assert(oc.contains("\nlicense: MIT\n"))
    assert(oc.contains("""metadata: {"openclaw":{"emoji":"🧠"}}"""))
  }

  test("skillFiles: skill: domain prefix stripped; yamlQuote normalization") {
    assert(Projectors.yamlQuote("plain text") == "plain text")
    assert(Projectors.yamlQuote("has: colon") == "\"has: colon\"")
    assert(Projectors.yamlQuote("{starts with brace") == "\"{starts with brace\"")
    assert(Projectors.yamlQuote("line\nbreak") == "\"line\\nbreak\"")

    val rules = Seq(
      ("r1", "Do the thing.", "skill:deploy", "explicit", 0.8, "general", Seq("web:Cache"), 0.0))
      .toDF("id", "text", "domain", "derivation", "confidence", "category",
        "source_concepts", "relevance")
    val files = Projectors.skillFiles(rules).collect()
    assert(files.head.getString(0) == "deploy/SKILL.md")
  }

  test("skillipediaEntries: per-rule MDX with frontmatter, type inference, slugs") {
    val (ex, dv) = fixtures()
    val rules = Projectors.enrichTemplate(Projectors.ruleSource(ex, dv))
    val files = Projectors.skillipediaEntries(rules, "2026-01-01T00:00:00Z")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(files.size == rules.count())
    assert(files.keys.forall(p => p.startsWith("entries/") && p.endsWith(".mdx")))
    // slug shape: lowercase alnum + hyphens only
    assert(files.keys.forall(_.matches("entries/[a-z0-9-]{1,80}\\.mdx")))
    val derived = files.collect { case (p, c) if p.startsWith("entries/drule-") => c }
    assert(derived.nonEmpty && derived.forall(_.contains("\ntype: pattern\n")))
    val explicitOnes = files.collect { case (p, c) if p.startsWith("entries/rule-") => c }
    assert(explicitOnes.nonEmpty && explicitOnes.forall(_.contains("\ntype: learning\n")))
    files.values.foreach { c =>
      assert(c.startsWith("---\nid: "))
      assert(c.contains("\nprovenance:\n"))
      assert(c.contains("generated_at: 2026-01-01T00:00:00Z"))
      assert(c.contains("### Context\n"))
    }
    assert(Projectors.slugify("Hello, World! 42") == "hello-world-42")
    assert(Projectors.slugify("--x--") == "x")
  }

  test("writeFiles: multi-file artifact tree written atomically") {
    val (ex, dv) = fixtures()
    val rules = Projectors.ruleSource(ex, dv)
    val dir = java.nio.file.Files.createTempDirectory("graft-skillfiles").toString
    Projectors.writeFiles(dir, Projectors.skillFiles(rules))(spark)
    val p = java.nio.file.Paths.get(s"$dir/web/SKILL.md")
    assert(java.nio.file.Files.exists(p))
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .startsWith("---\nname: web\n"))
  }

  test("writeJsonl: distributed entry export, one JSON object per line") {
    val (ex, dv) = fixtures()
    val rules = Projectors.enrichTemplate(Projectors.ruleSource(ex, dv))
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/entries"
    Projectors.writeJsonl(rules, dir)
    val back = spark.read.json(dir)
    assert(back.count() == rules.count())
    assert(back.columns.contains("id") && back.columns.contains("derivation"))
  }
}
