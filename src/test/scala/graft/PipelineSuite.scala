package graft

import graft.fixtures.PagesGen
import graft.oracle.SeqOracle
import graft.pipeline.Ingest
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._

/** End-to-end gates (BASELINE.md targets):
  *  - triple P/R ≥ 0.95 vs the sequential oracle (here: exactly 1.0)
  *  - byte-identical extracted text per url (sha256 comparison)
  *  - resume: a two-phase ingest equals an uninterrupted one
  */
class PipelineSuite extends SparkFunSuite {
  import spark.implicits._

  private val N = 120L

  test("triple P/R vs sequential oracle is 1.0 on the tiny corpus") {
    val triples = Ingest.triplesOf(Ingest.extract(PagesGen.pages(spark, N), Ingest.Config()).toDF())
      .select("subj", "pred", "obj").distinct()
      .as[(String, String, String)].collect().toSet
    val oracle = SeqOracle.run(N)
    val (p, r) = SeqOracle.precisionRecall(triples, oracle.triples)
    assert(p == 1.0, s"precision $p")
    assert(r == 1.0, s"recall $r")
  }

  test("byte-identical text per url: pipeline sha256 == oracle sha256") {
    val pipelineSha = Ingest.extract(PagesGen.pages(spark, N), Ingest.Config())
      .select("url", "text_sha256").as[(String, String)].collect().toMap
    val oracle = SeqOracle.run(N)
    assert(pipelineSha == oracle.textSha)
  }

  test("resume: two-phase ingest (kill between snapshots) equals uninterrupted run") {
    val whA = java.nio.file.Files.createTempDirectory("graft-resume-a").toString
    val whB = java.nio.file.Files.createTempDirectory("graft-resume-b").toString
    val pages = PagesGen.pages(spark, N)
    val days = pages.select("day").distinct().as[String].collect().sorted

    // A: uninterrupted
    Ingest.run(pages, new SnapshotStore(whA))
    // B: first only half the days (simulating the state after a kill —
    // committed snapshots for some partitions), then the full input
    val storeB = new SnapshotStore(whB)
    Ingest.run(pages.filter(col("day").isin(days.take(2).toSeq: _*)), storeB)
    val processedSecond = Ingest.run(pages, storeB)
    assert(processedSecond == days.length - 2, "only uncommitted partitions reprocess")

    def table(wh: String, t: String): Set[String] =
      new SnapshotStore(wh).read(t).collect().map(_.toString).toSet
    for (t <- Seq("pages_text", "extractions", "concepts", "edges", "canon_map"))
      assert(table(whA, t) == table(whB, t), s"table $t differs after resume")
  }

  test("lineage rows cover every input partition with extraction counters") {
    val wh = java.nio.file.Files.createTempDirectory("graft-lineage").toString
    val store = new SnapshotStore(wh)
    Ingest.run(PagesGen.pages(spark, N), store)
    val lineage = store.read("lineage")
    val parts = lineage.select("input_partition").as[String].collect().toSet
    assert(parts.size == 4)
    assert(lineage.filter(col("docs") <= 0).count() == 0)
    assert(lineage.filter(col("triples_raw") <= 0).count() == 0)
  }

  test("snapshot isolation: orphan batch dirs from a killed write are invisible") {
    val wh = java.nio.file.Files.createTempDirectory("graft-orphan").toString
    val store = new SnapshotStore(wh)
    Ingest.run(PagesGen.pages(spark, N), store)
    val before = store.read("concepts").count()
    // simulate a killed run: data directory written but no snapshot commit
    val orphan = new java.io.File(s"$wh/concepts/data/batch=99999")
    orphan.mkdirs()
    java.nio.file.Files.writeString(orphan.toPath.resolve("garbage.parquet"), "not parquet")
    assert(store.read("concepts").count() == before)
  }
}
