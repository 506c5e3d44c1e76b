package graft

import graft.canon.Canon
import graft.fixtures.PagesGen
import graft.link.Linking
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.pipeline.Ingest
import graft.prune.Pruning
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), with ANSI-SQL oracles for everything DuckDB can express.
  *
  * Float discipline for oracle parity: any SUM over doubles goes through
  * DECIMAL so Spark's partial aggregation and DuckDB's sequential sum
  * produce bit-identical results; raw doubles only pass through untouched
  * (projection/sort) or via exact integer math.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: KG triple extraction over a deterministic generated pages
    * table (the engine's core operator). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s = spark
    val pages = PagesGen.pages(spark, 100)
    Ingest.triplesOf(Ingest.extract(pages, Ingest.Config()).toDF())
  }

  // ---- shared KG sub-pipeline over generated pages (rows-only checks) ----
  // The ten q25–q34 queries share one 300-page extraction: cache it per
  // session (it is ~1 MB) so the verify harness extracts once, not ten times.
  private val kgCache =
    new java.util.concurrent.atomic.AtomicReference[(SparkSession, DataFrame)]()

  private def kgExtractions(spark: SparkSession): DataFrame = {
    val cached = kgCache.get()
    if (cached != null && (cached._1 eq spark)) cached._2
    else {
      implicit val s = spark
      val df = Ingest.extract(PagesGen.pages(spark, 300), Ingest.Config()).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      kgCache.set((spark, df))
      df
    }
  }

  /** The random synthetic embeddings contain no true near-duplicates, so
    * near-dup ops are exercised on a corpus with injected dups: every 10th
    * vector gets a copy (id + 1,000,000) perturbed by +0.01 in dim 0 —
    * cosine ≈ 0.9999 to its original.
    */
  private val perturbUdf = udf { (v: Seq[Float]) =>
    if (v == null || v.isEmpty) v
    else (v.head + 0.01f) +: v.tail
  }

  private def withNearDups(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dups = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        perturbUdf(col("embedding")).as("embedding"), col("label"))
    emb.select("vec_id", "embedding", "label").union(dups)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- relational core over the TPC-H-ish tables ----------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1995-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),
    "q02_segment_revenue" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),
    "q03_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),
    "q04_exists_semi" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q05_not_exists_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q06_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    "q07_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),
    "q08_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"))
    }),
    "q09_broadcast_multijoin" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }),
    "q10_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
    }),
    // ---------- text analysis over documents ----------
    "q11_doc_lang_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    }),
    "q12_doc_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    }),
    "q13_dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),
    "q14_doc_quality" -> ((s, dir) => {
      TextAnalysis.quality(t(s, dir, "documents"))
        .select("doc_id", "lang", "n_chars", "len_bucket", "n_punct", "has_the")
    }),
    "q15_embed_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"), min(size(col("embedding"))).as("dim"))
    }),
    // ---------- similarity / dedup (rows-only: not ANSI-SQL-expressible) --
    "q16_knn_brute" -> ((s, dir) => {
      implicit val sp = s
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .withColumn("cosine", round(col("cosine"), 4))
    }),
    "q17_ann_lsh" -> ((s, dir) => {
      implicit val sp = s
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .withColumn("cosine", round(col("cosine"), 4))
    }),
    "q18_dedup_minhash" -> ((s, dir) => {
      implicit val sp = s
      Dedup.minhashLsh(t(s, dir, "documents")).filter(col("est_jaccard") >= 0.5)
    }),
    "q19_dedup_simhash" -> ((s, dir) => {
      implicit val sp = s
      Dedup.simhash(t(s, dir, "documents"), maxHamming = 8)
    }),
    "q20_dedup_ngram" -> ((s, dir) => {
      implicit val sp = s
      Dedup.ngramJaccard(t(s, dir, "documents"), threshold = 0.5)
    }),
    "q21_dedup_embed" -> ((s, dir) => {
      implicit val sp = s
      Dedup.embeddingCosine(withNearDups(s, dir), threshold = 0.95)
    }),
    "q22_langid" -> ((s, dir) => TextAnalysis.langId(t(s, dir, "documents"))),
    "q23_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(t(s, dir, "documents"))),
    "q24_mm_features" -> ((s, dir) => {
      implicit val sp = s
      Multimodal.extractFeatures(Multimodal.synthesizeFromDocuments(t(s, dir, "documents")))
    }),
    // ---------- KG construction over deterministic generated pages ------
    "q25_kg_triples" -> ((s, _) => {
      implicit val sp = s
      Ingest.triplesOf(kgExtractions(s))
    }),
    "q26_kg_concepts" -> ((s, _) => {
      implicit val sp = s
      Linking.buildConcepts(Ingest.mentionsOf(kgExtractions(s)), "web", graft.core.TextSpec.version)
    }),
    "q27_kg_edges_pruned" -> ((s, _) => {
      implicit val sp = s
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      Pruning.prune(Linking.resolveEdges(Ingest.triplesOf(ex), concepts))
    }),
    "q28_kg_canon_map" -> ((s, _) => {
      implicit val sp = s
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      Canon.canonicalMap(concepts, Ingest.aliasesOf(ex), 0.75)
    }),
    "q29_ppr" -> ((s, _) => {
      implicit val sp = s
      import sp.implicits._
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      val edges = Pruning.prune(Linking.resolveEdges(Ingest.triplesOf(ex), concepts))
      val seeds = Seq(("web:The Platform", 1.0)).toDF("id", "weight")
      // tol/maxIter trimmed for the verify harness — convergence-to-1e-6
      // behavior is pinned by GraphSuite against a dense reference
      graft.graph.Ppr.run(edges, seeds, tol = 1e-4, maxIter = 25)
        .withColumn("rank", round(col("rank"), 6))
    }),
    "q31_rules_explicit" -> ((s, _) => {
      implicit val sp = s
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      graft.rules.Rules.explicitRules(Ingest.ruleSentencesOf(ex), concepts, "web")
    }),
    "q32_rules_derived" -> ((s, _) => {
      implicit val sp = s
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      val edges = Pruning.prune(Linking.resolveEdges(Ingest.triplesOf(ex), concepts))
      graft.rules.Rules.derivedRules(
        edges.select("source_id", "target_id", "relation_type", "confidence"), concepts, "web")
    }),
    "q33_retrieval_hybrid" -> ((s, _) => {
      implicit val sp = s
      import sp.implicits._
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      val edges = Pruning.prune(Linking.resolveEdges(Ingest.triplesOf(ex), concepts))
      val factors = Seq.empty[(String, Double)].toDF("node_id", "factor")
      graft.query.Retrieval.retrieve(concepts, edges, factors,
        "platform access control tokens", topK = 10)
        .withColumn("vec_score", round(col("vec_score"), 4))
        .withColumn("combined", round(col("combined"), 4))
        .drop("ppr")
    }),
    "q34_bfs_neighborhood" -> ((s, _) => {
      implicit val sp = s
      import sp.implicits._
      val ex = kgExtractions(s)
      val concepts = Linking.buildConcepts(Ingest.mentionsOf(ex), "web", graft.core.TextSpec.version)
      val edges = Pruning.prune(Linking.resolveEdges(Ingest.triplesOf(ex), concepts))
      val seeds = Seq("web:The Platform").toDF("id")
      graft.graph.Bfs.patternCompletion(edges, seeds, maxDepth = 2)
    }),
    "q30_edge_promotion" -> ((s, dir) => {
      implicit val sp = s
      // synthetic observation stream: repeated high-cosine pairs from the
      // near-dup-injected embeddings table
      val pairs = Dedup.embeddingCosine(withNearDups(s, dir), threshold = 0.9)
      val obs = pairs.select(
        col("id_a").cast("string").as("node_a"),
        col("id_b").cast("string").as("node_b"),
        col("cosine").as("score"))
        .crossJoin(s.range(3).select(col("id").as("rep")))
        .drop("rep")
      graft.streaming.EdgePromotion.promoteBatch(obs)
    })
  )

  /** ANSI-SQL oracles DuckDB runs on the same parquet files. Keys absent
    * here get the driver's weaker rows-only check (the op is not
    * SQL-expressible: LSH, minhash, extraction, CC, PPR, ...).
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1995-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_segment_revenue" ->
      """SELECT c_mktsegment,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q03_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q04_exists_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q05_not_exists_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q06_filter_pushdown" ->
      """SELECT
        | CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q07_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin,
    "q08_distinct_agg" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_partkey) AS distinct_parts,
        | COUNT(DISTINCT l_suppkey) AS distinct_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q09_broadcast_multijoin" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q10_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q11_doc_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q12_doc_tokens" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        |FROM documents""".stripMargin,
    "q13_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q14_doc_quality" ->
      """SELECT doc_id, lang, n_chars,
        | CASE WHEN n_chars < 200 THEN 'short'
        |      WHEN n_chars < 1000 THEN 'medium' ELSE 'long' END AS len_bucket,
        | length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
        | contains(text, ' the ') AS has_the
        |FROM documents""".stripMargin,
    "q15_embed_stats" ->
      """SELECT label, COUNT(*) AS n_vectors, MIN(len(embedding)) AS dim
        |FROM embeddings GROUP BY label""".stripMargin
  )
}
