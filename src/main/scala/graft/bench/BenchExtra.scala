package graft.bench

import graft.fixtures.PagesGen
import graft.pipeline.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolation bench for the INGEST leg (guide §1.4): times each pipeline
  * stage separately against a noop sink so the computation is measured
  * without (or separately from) the sink. The FROZEN graft.Bench harness
  * stays untouched; numbers from here are cited in OPTIMIZATION_r06.md.
  *
  * Usage: runMain graft.bench.BenchExtra [nPages]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[extra] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cfg = Ingest.Config()
    val pages = PagesGen.pages(spark, nPages)

    // --- extract leg decomposition ---
    timed("pages gen only (noop)") { noop(pages.toDF()) }
    timed("gen+html2text+chunk+extract (noop)") {
      noop(Ingest.extract(pages, cfg).toDF())
    }
    val exDir = s"/tmp/graft-extra-ex-$cpus"
    graft.Bench.deleteRecursively(java.nio.file.Paths.get(exDir))
    timed("gen+extract+parquet write") {
      Ingest.extract(pages, cfg).toDF().write.mode("overwrite").parquet(exDir)
    }

    // --- derived-stage decomposition over the staged extractions ---
    val staged = spark.read.parquet(exDir)
    val mentions = Ingest.mentionsOf(staged)
    timed("mentions explode (noop)") { noop(mentions) }
    timed("triples explode (noop)") { noop(Ingest.triplesOf(staged)) }
    val concepts = timed("buildConcepts (noop)") {
      val c = graft.link.Linking.buildConcepts(mentions, cfg.domain,
        graft.core.TextSpec.version)
      noop(c); c
    }
    val conceptsCk = timed("concepts localCheckpoint") {
      concepts.localCheckpoint()
    }
    val resolved = timed("resolveEdges (noop)") {
      val r = graft.link.Linking.resolveEdges(Ingest.triplesOf(staged), conceptsCk,
        cfg.broadcastMaxRows, cfg.saltBuckets, cfg.dictSizeHint)
      noop(r); r
    }
    timed("pruning tag (noop)") {
      noop(graft.prune.Pruning.tag(resolved, cfg.pruning))
    }
    timed("canonicalMap (noop)") {
      noop(graft.canon.Canon.canonicalMap(conceptsCk, Ingest.aliasesOf(staged),
        cfg.nameSimThreshold))
    }
    timed("lineage agg (noop)") {
      noop(staged.groupBy(col("day")).agg(count(lit(1)),
        sum(col("n_chunks")), sum(size(col("mentions"))),
        sum(size(col("triples")))))
    }
    spark.stop()
  }
}
