package graft

import graft.fixtures.PagesGen
import graft.pipeline.Ingest
import graft.store.SnapshotStore
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds plus the
  * KG-ingestion throughput (docs/sec, triples/sec) on a deterministic
  * generated pages table. SPARK_GRAFT_SF_DIR picks the parquet scale,
  * SPARK_GRAFT_CPUS the local parallelism, SPARK_GRAFT_BENCH_PAGES the
  * ingest corpus size.
  */
object Bench {
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "20000").toLong
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

    // --- KG ingestion throughput on generated pages (fresh warehouse) ---
    val wh = s"/tmp/graft-bench-wh-$cpus"
    deleteRecursively(java.nio.file.Paths.get(wh))
    val store = new SnapshotStore(wh)
    val t0 = System.nanoTime()
    Ingest.run(PagesGen.pages(spark, nPages), store, Ingest.Config(),
      knownPartitions = Some(PagesGen.dayStrings(4)))
    val kgWall = (System.nanoTime() - t0) / 1e9
    val kgDocs = store.read("pages_text").count()
    val kgTriples = Ingest.triplesOf(store.read("extractions")).count()

    // --- per-query timings over the sf tables ---
    // Pre-warm the shared 300-page KG extraction so q25+ timings measure the
    // operator, not the (separately benchmarked) upstream extraction.
    SparkEntry.kg(spark)
    // Each query runs `reps` times; the MEDIAN is the headline number and
    // the raw runs stay in the JSON — the host's measured ±30 % single-run
    // band (BASELINE.md) otherwise dominates round-over-round reads.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional comma-separated query subset — local dev only (the driver
    // sets no filter and measures everything); names trimmed so
    // "q30, q31" doesn't silently match nothing
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val runs = (0 until reps).map { _ =>
        val q0 = System.nanoTime()
        // a failed query must be LOUD: a swallowed exception records ~0 s
        // and makes the bench total *improve* — print it, carry it in JSON
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] ERROR $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            errors += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
        (System.nanoTime() - q0) / 1e9
      }
      val median = runs.sorted.apply(runs.size / 2)
      (name, median, runs)
    }
    val qs = results.map { case (k, m, _) => "\"" + k + "\":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val qsRaw = results.map { case (k, _, runs) =>
      "\"" + k + "\":" + runs.map(v => f"$v%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")

    // --- ANN planted-duplicate recall: every 10th vector has a perturbed
    // copy at cosine ≈ 0.9999 (the q21 corpus); an ANN serving path must
    // put the source in the copy's top-5. Brute force is 1.0 by
    // construction — LSH and IVF are the measured operators. (Recall vs
    // exact top-5 on RANDOM vectors is meaningless — no cluster
    // structure — so the planted metric is the operational one.)
    val annRecall = {
      import graft.ops.{Ivf, Similarity}
      val corpus = SparkEntry.withNearDups(spark, sfDir)
      val planted = corpus.filter(org.apache.spark.sql.functions.col("vec_id") >= 1000000L)
      val nPlanted = planted.count()
      def hitRate(res: org.apache.spark.sql.DataFrame): Double =
        res.filter(org.apache.spark.sql.functions.col("neighbor_id") ===
            org.apache.spark.sql.functions.col("query_id") - 1000000L)
          .select("query_id").distinct().count().toDouble / nPlanted
      val lsh = hitRate(Similarity.lshTopK(corpus, planted, k = 5))
      val ivf = hitRate(Ivf.ivfTopK(corpus, planted, k = 5, nClusters = 16,
        iters = 5, nprobe = 4))
      f""""ann_planted_recall":{"n_queries":$nPlanted,"lsh":$lsh%.4f,"ivf":$ivf%.4f}"""
    }

    // --- retrieval quality (A9): hybrid vs vec-only on the auth corpus ---
    val evalResults = graft.query.Eval.compare(k = 5)
    val evalJson = evalResults.toSeq.sortBy(_._1)
      .map { case (k, r) => "\"" + k + "\":" + r.toJson }.mkString("{", ",", "}")
    def escJson(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val errJson = errors
      .map { case (n, m) => s"""{"query":"$n","error":"${escJson(m)}"}""" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum + kgWall
    // host-capacity probe AT MEASUREMENT TIME (after the timed work, so it
    // doesn't perturb the queries) — every bench carries its own variance
    // context per the BENCH/BASELINE.md protocol
    val cpuProbe = graft.bench.CpuScaling.probeJson()
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_probe":$cpuProbe,"queries":$qs,"sf":"$sfDir"""" +
        s""","kg_pages":$nPages,"kg_docs":$kgDocs,"kg_triples":$kgTriples""" +
        f""","kg_wall_sec":$kgWall%.2f,"docs_per_sec":${kgDocs / kgWall}%.1f""" +
        f""","triples_per_sec":${kgTriples / kgWall}%.1f,"cpus":$cpus""" +
        s""","bench_reps":$reps,"queries_runs":$qsRaw""" +
        s""","retrieval_eval":$evalJson,$annRecall,"errors":$errJson}"""
    println(json)
    // machine-readable copy — sbt prefixes stdout with [info], which breaks
    // the driver's JSON parse of the log tail. A FILTERED run must not
    // overwrite the committed full-run evidence with a subset that is
    // indistinguishable from a complete measurement — it writes a
    // clearly-named sidecar instead.
    val outName =
      if (only.isEmpty) "BENCH/last_run.json" else "BENCH/last_subset_run.json"
    val out = java.nio.file.Paths.get(outName)
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
