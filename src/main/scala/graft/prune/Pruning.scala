package graft.prune

import graft.core.{RelationTypes, TextSpec}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's deterministic six-step edge-quality pipeline
  * (src/qortex/core/pruning.py:29-100 docstring; engine :329-489),
  * re-expressed over DataFrames.
  *
  * Design: every row flows through tagged with a nullable `drop_reason`
  * column; survivors are `drop_reason IS NULL`. One pass produces both the
  * pruned edge set and the per-reason drop counts the reference accumulates
  * in PruningResult (pruning.py:160-201) — those counts land in our
  * per-partition lineage rows (SURVEY.md §7.4).
  *
  * Scale shape — ONE wide exchange for P0–P4: the edge stream shuffles once
  * on (src,tgt); inside each group we collapse exact-duplicate evidence
  * (P0, ours), tokenize each surviving evidence once, apply P1/P2 as per-row
  * checks, and run the order-dependent greedy P3/P4 sweeps. Groups are the
  * edges between ONE node pair — bounded by the sweep cap for the quadratic
  * part. P5 (isolated-weak) needs a degree table: explode endpoints →
  * groupBy(id).count → join back; |V| ≪ |E| and AQE broadcasts the degree
  * side when small.
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
      tagLayers: Boolean = true,
      /** Scale adaptation (ours): the reference prunes per-document edge
        * lists (tens of rows); a whole-corpus prune sees thousands of
        * distinct evidence variants for head node pairs, and the greedy
        * P3 sweep is O(kept²) per group. Only the `sweepCap`
        * highest-confidence evidences per (src,tgt,relation) enter the
        * sweep; the tail is tagged duplicate (redundant evidence for an
        * edge whose best witnesses are already kept).
        */
      sweepCap: Int = 16
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

  /** Tag every edge with `drop_reason` (null = survivor), `strength`,
    * `__dups` (collapsed exact-duplicate multiplicity) and (if
    * cfg.tagLayers) `layer`. Input must have source_id, target_id,
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
        .withColumn("__dups", lit(0L))
      return if (cfg.tagLayers) withLayer(base) else base
    }

    val inSchema = edges.schema
    val outSchema = StructType(inSchema.fields ++ Array(
      StructField(ReasonCol, StringType, nullable = true),
      StructField("strength", StringType, nullable = true),
      StructField("__dups", LongType, nullable = false)))
    implicit val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)

    val srcIdx = inSchema.fieldIndex("source_id")
    val tgtIdx = inSchema.fieldIndex("target_id")
    val relIdx = inSchema.fieldIndex("relation_type")
    val confIdx = inSchema.fieldIndex("confidence")
    val stIdx = inSchema.fieldIndex("source_text")
    val nIn = inSchema.length

    val minTok = cfg.minEvidenceTokens
    val floor = cfg.confidenceFloor
    val weakT = cfg.confidenceWeak
    val jdt = cfg.jaccardDuplicateThreshold
    val cot = cfg.competingOverlapThreshold
    val cap = cfg.sweepCap

    val tagged14 = edges
      .groupByKey(r => (r.getString(srcIdx), r.getString(tgtIdx)))
      .flatMapGroups { (_, it) =>
        // P0 (ours): collapse exact-duplicate (relation, evidence) rows —
        // Jaccard-1.0 duplicates by definition; keep max confidence and a
        // deterministic witness for the passthrough columns
        final case class Acc(var row: Row, var conf: Double, var dups: Long)
        val byKey = scala.collection.mutable.HashMap.empty[(String, String), Acc]
        // deterministic witness: max confidence, ties broken on the full
        // row rendering — NEVER on arrival order (resume re-reads with a
        // different partitioning and must pick identical witnesses)
        def rowKey(r: Row): String = r.mkString("\u0001")
        for (r <- it) {
          val key = (r.getString(relIdx), String.valueOf(r.get(stIdx)))
          val conf = r.getDouble(confIdx)
          byKey.get(key) match {
            case None => byKey.update(key, Acc(r, conf, 0L))
            case Some(a) =>
              a.dups += 1
              if (conf > a.conf || (conf == a.conf && rowKey(r) < rowKey(a.row))) {
                a.row = r; a.conf = conf
              }
          }
        }

        def emit(r: Row, reason: String, strength: String, dups: Long): Row = {
          val vals = new Array[Any](nIn + 3)
          var i = 0
          while (i < nIn) { vals(i) = r.get(i); i += 1 }
          vals(nIn) = reason; vals(nIn + 1) = strength; vals(nIn + 2) = dups
          new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
        }

        val out = scala.collection.mutable.ArrayBuffer.empty[Row]

        // P1 + P2 per distinct evidence; survivors sorted for the sweeps
        final case class Live(row: Row, conf: Double, rel: String,
            text: String, toks: Set[String], dups: Long)
        val live = scala.collection.mutable.ArrayBuffer.empty[Live]
        for (a <- byKey.valuesIterator) {
          val r = a.row
          val text = String.valueOf(r.get(stIdx))
          val toks = TextSpec.tokenize(text)
          if (toks.size < minTok) out += emit(r, "low_evidence", null, a.dups)
          else if (a.conf < floor) out += emit(r, "low_confidence", null, a.dups)
          else live += Live(r, a.conf, r.getString(relIdx), text, toks, a.dups)
        }
        val sorted = live.sortBy(l => (-l.conf, l.text, l.rel))

        def strengthOf(conf: Double) = if (conf >= weakT) "strong" else "weak"

        // sweep cap per relation_type (the tail is redundant evidence)
        val perRel = scala.collection.mutable.Map.empty[String, Int]
        val sweep = scala.collection.mutable.ArrayBuffer.empty[Live]
        for (l <- sorted) {
          val n = perRel.getOrElse(l.rel, 0)
          if (n < cap) { perRel.update(l.rel, n + 1); sweep += l }
          else out += emit(l.row, "duplicate", strengthOf(l.conf), l.dups)
        }

        // P3: same relation, Jaccard > threshold vs any kept
        val kept3 = scala.collection.mutable.ArrayBuffer.empty[Live]
        for (l <- sweep) {
          if (kept3.exists(k => k.rel == l.rel && TextSpec.jaccard(l.toks, k.toks) > jdt))
            out += emit(l.row, "duplicate", strengthOf(l.conf), l.dups)
          else kept3 += l
        }
        // P4: different relation, overlap ≥ threshold vs any kept
        val kept4 = scala.collection.mutable.ArrayBuffer.empty[Live]
        for (l <- kept3) {
          if (kept4.exists(k => k.rel != l.rel && TextSpec.jaccard(l.toks, k.toks) >= cot))
            out += emit(l.row, "competing", strengthOf(l.conf), l.dups)
          else kept4 += l
        }
        for (l <- kept4) out += emit(l.row, null, strengthOf(l.conf), l.dups)
        out.iterator
      }
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
      // materialize the P0–P4 stage ONCE: it feeds the P5 degree
      // aggregation AND the main edge stream below, and the groupByKey +
      // per-group sweep closure is the operator's dominant compute —
      // without the checkpoint both consumers re-run it (the shuffle is
      // exchange-reused but the flatMapGroups itself is not)
      .localCheckpoint()

    // P5: isolated weak — degrees over current survivors
    val degrees = tagged14
      .filter(col(ReasonCol).isNull)
      .select(explode(array(col("source_id"), col("target_id"))).as("__node"))
      .groupBy("__node")
      .agg(count(lit(1)).as("__deg"))

    val withDeg = tagged14
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
    tagged.filter(col(ReasonCol).isNull)
      .drop(ReasonCol, "__dups")

  /** Drop-reason counts from a tagged frame (single aggregation).
    * Exact-duplicate evidence collapsed by P0 counts toward `duplicate`.
    */
  def stats(tagged: DataFrame): Stats = {
    val dupsCol =
      if (tagged.columns.contains("__dups")) col("__dups") else lit(0L)
    val counts = tagged
      .groupBy(coalesce(col(ReasonCol), lit("__kept")).as("r"))
      .agg(count(lit(1)).as("n"), sum(dupsCol).as("d"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    def g(k: String) = counts.get(k).map(_._1).getOrElse(0L)
    val exactDups = counts.values.map(_._2).sum
    Stats(
      input = counts.values.map(_._1).sum + exactDups,
      droppedLowEvidence = g("low_evidence"),
      droppedLowConfidence = g("low_confidence"),
      droppedDuplicate = g("duplicate") + exactDups,
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
