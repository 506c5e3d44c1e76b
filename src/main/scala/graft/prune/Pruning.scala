package graft.prune

import graft.core.{RelationTypes, TextSpec}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's deterministic six-step edge-quality pipeline
  * (src/qortex/core/pruning.py:29-100 docstring; engine :329-489),
  * re-expressed over DataFrames.
  *
  * Design: instead of filtering at each step (which would force either
  * multiple jobs or lost statistics), every row flows through tagged with a
  * nullable `drop_reason` column; survivors are `drop_reason IS NULL`. One
  * pass produces both the pruned edge set and the per-reason drop counts the
  * reference accumulates in PruningResult (pruning.py:160-201) — those counts
  * land in our per-partition lineage rows (SURVEY.md §7.4).
  *
  * Scale notes:
  *  - P1/P2/P6 are narrow per-row ops → whole-stage codegen.
  *  - P3 (Jaccard dedup within (src,tgt,type)) and P4 (competing relations
  *    within (src,tgt)) are order-dependent greedy sweeps; group = edges
  *    between ONE ordered node pair, so groups are tiny even at 100 TB.
  *    P3's key refines P4's key, so both run inside ONE groupByKey shuffle
  *    on (src,tgt).
  *  - P5 needs a degree table: explode endpoints → groupBy(id).count → join
  *    back. |V| ≪ |E|; AQE broadcasts the degree side when small.
  */
object Pruning {

  final case class Config(
      minEvidenceTokens: Int = 8, // pruning.py:140
      confidenceFloor: Double = 0.55, // :143
      confidenceWeak: Double = 0.70, // :144
      jaccardDuplicateThreshold: Double = 0.6, // :147
      competingOverlapThreshold: Double = 0.3, // :151
      isolatedWeakConfidence: Double = 0.65, // :153
      enabled: Boolean = true,
      tagLayers: Boolean = true
  )

  final case class Stats(
      input: Long,
      droppedLowEvidence: Long,
      droppedLowConfidence: Long,
      droppedDuplicate: Long,
      droppedCompeting: Long,
      droppedIsolated: Long,
      output: Long
  )

  val ReasonCol = "drop_reason"

  private val tokenizeUdf = udf((s: String) => TextSpec.tokenize(s).toSeq.sorted)

  /** Tag every edge with `drop_reason` (null = survivor), `strength`, and
    * (if cfg.tagLayers) `layer`. Input must have source_id, target_id,
    * relation_type, confidence, source_text; other columns pass through.
    *
    * The P3/P4 greedy sweeps keep the reference's descending-confidence
    * greedy semantics (pruning.py:406, 433) with a deterministic tie-break
    * on (source_text, relation_type) — the reference inherits Python list
    * order; a distributed run must not depend on arrival order.
    */
  def tag(edges: DataFrame, cfg: Config = Config())(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._

    if (!cfg.enabled) {
      val base = edges
        .withColumn(ReasonCol, lit(null).cast(StringType))
        .withColumn("strength", lit(null).cast(StringType))
      return if (cfg.tagLayers) withLayer(base) else base
    }

    // P1 + P2: narrow, codegen-friendly
    val tagged12 = edges
      .withColumn("__tokens", tokenizeUdf(coalesce(col("source_text"), lit(""))))
      .withColumn(
        ReasonCol,
        when(size(col("__tokens")) < cfg.minEvidenceTokens, "low_evidence")
          .when(col("confidence") < cfg.confidenceFloor, "low_confidence")
          .otherwise(lit(null).cast(StringType)))
      .withColumn(
        "strength",
        when(col(ReasonCol).isNotNull, lit(null).cast(StringType))
          .when(col("confidence") >= cfg.confidenceWeak, "strong")
          .otherwise("weak"))

    // P3 + P4 in one shuffle on (src,tgt)
    val schema = tagged12.schema
    val reasonIdx = schema.fieldIndex(ReasonCol)
    val tokIdx = schema.fieldIndex("__tokens")
    val confIdx = schema.fieldIndex("confidence")
    val relIdx = schema.fieldIndex("relation_type")
    val stIdx = schema.fieldIndex("source_text")
    val jdt = cfg.jaccardDuplicateThreshold
    val cot = cfg.competingOverlapThreshold

    implicit val rowEnc = org.apache.spark.sql.Encoders.row(schema)

    val after34 = tagged12
      .groupByKey(r => (r.getString(schema.fieldIndex("source_id")),
        r.getString(schema.fieldIndex("target_id"))))
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val (live, dead) = rows.partition(_.isNullAt(reasonIdx))
        val sorted = live.sortBy(r =>
          (-r.getDouble(confIdx), String.valueOf(r.get(stIdx)), r.getString(relIdx)))
        def toks(r: Row): Set[String] = r.getSeq[String](tokIdx).toSet
        def withReason(r: Row, reason: String): Row = {
          val vals = r.toSeq.toArray
          vals(reasonIdx) = reason
          Row.fromSeq(vals.toIndexedSeq)
        }
        val kept3 = scala.collection.mutable.ArrayBuffer.empty[Row]
        val dropped = scala.collection.mutable.ArrayBuffer.empty[Row]
        for (r <- sorted) { // P3: same relation_type, Jaccard > threshold
          if (kept3.exists(k => k.getString(relIdx) == r.getString(relIdx) &&
              TextSpec.jaccard(toks(r), toks(k)) > jdt))
            dropped += withReason(r, "duplicate")
          else kept3 += r
        }
        val kept4 = scala.collection.mutable.ArrayBuffer.empty[Row]
        for (r <- kept3) { // P4: different relation_type, overlap ≥ threshold
          if (kept4.exists(k => k.getString(relIdx) != r.getString(relIdx) &&
              TextSpec.jaccard(toks(r), toks(k)) >= cot))
            dropped += withReason(r, "competing")
          else kept4 += r
        }
        (kept4.iterator ++ dropped.iterator ++ dead.iterator)
      }
      .toDF(schema.fieldNames.toIndexedSeq: _*)
      .drop("__tokens")

    // P5: isolated weak — degrees over current survivors
    val degrees = after34
      .filter(col(ReasonCol).isNull)
      .select(explode(array(col("source_id"), col("target_id"))).as("__node"))
      .groupBy("__node")
      .agg(count(lit(1)).as("__deg"))

    val withDeg = after34
      .join(degrees.withColumnRenamed("__node", "source_id").withColumnRenamed("__deg", "__sdeg"),
        Seq("source_id"), "left")
      .join(degrees.withColumnRenamed("__node", "target_id").withColumnRenamed("__deg", "__tdeg"),
        Seq("target_id"), "left")

    val tagged5 = withDeg
      .withColumn(
        ReasonCol,
        when(
          col(ReasonCol).isNull &&
            (col("__sdeg") === 1 || col("__tdeg") === 1) &&
            col("confidence") < cfg.isolatedWeakConfidence,
          "isolated")
          .otherwise(col(ReasonCol)))
      .drop("__sdeg", "__tdeg")

    if (cfg.tagLayers) withLayer(tagged5) else tagged5
  }

  /** Survivors of a tagged frame, helper columns removed. */
  def survivors(tagged: DataFrame): DataFrame =
    tagged.filter(col(ReasonCol).isNull).drop(ReasonCol)

  /** Drop-reason counts from a tagged frame (single aggregation). */
  def stats(tagged: DataFrame): Stats = {
    val counts = tagged
      .groupBy(coalesce(col(ReasonCol), lit("__kept")).as("r"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    def g(k: String) = counts.getOrElse(k, 0L)
    Stats(
      input = counts.values.sum,
      droppedLowEvidence = g("low_evidence"),
      droppedLowConfidence = g("low_confidence"),
      droppedDuplicate = g("duplicate"),
      droppedCompeting = g("competing"),
      droppedIsolated = g("isolated"),
      output = g("__kept"))
  }

  /** Convenience: tag + survivors in one call (no stats needed). */
  def prune(edges: DataFrame, cfg: Config = Config())(implicit spark: SparkSession): DataFrame =
    survivors(tag(edges, cfg))

  /** P6: structural/causal layer tagging (pruning.py:317-326, 474-480). */
  def withLayer(edges: DataFrame): DataFrame = {
    val causalList = RelationTypes.causal.toSeq.map(_.toLowerCase(java.util.Locale.ROOT))
    edges.withColumn(
      "layer",
      when(lower(col("relation_type")).isin(causalList: _*), "causal")
        .otherwise("structural"))
  }

  /** Dry-run (pruning.py:492-504): statistics of what WOULD be dropped. */
  def dryRunStats(edges: DataFrame, cfg: Config = Config())(implicit spark: SparkSession): Stats =
    stats(tag(edges, cfg))
}
