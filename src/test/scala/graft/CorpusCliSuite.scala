package graft

import graft.pipeline.CorpusCli

/** CorpusCli drives each training-data operator end-to-end against
  * parquet in/out — the spark-submit path, in-process.
  */
class CorpusCliSuite extends SparkFunSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-corpus-cli").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today", "en", 70L),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", "en", 70L),
      (2L, "completely different content about spark shuffle partitions and joins", "en", 69L)
    ).toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/docs")
    (0L until 8L).map(i => (i, Seq.tabulate(4)(d => if (d == (i % 2).toInt) 1.0f else 0.1f * i)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(s"$d/emb")
    d
  }

  test("dedup-clusters command clusters the exact dups") {
    val out = CorpusCli.run(Seq("dedup-clusters", s"$dir/docs", s"$dir/clusters"), spark)
    assert(out.head.contains("\"rows\":3"), out.head)
    val keep = spark.read.parquet(s"$dir/clusters")
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(keep == Set(0L, 2L))
  }

  test("decontaminate command reports cross-corpus hits") {
    Seq((50L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/bench")
    val out = CorpusCli.run(
      Seq("decontaminate", s"$dir/docs", s"$dir/bench", s"$dir/contam"), spark)
    assert(out.head.contains("\"rows\":2"), out.head) // docs 0 and 1 hit
  }

  test("split command writes stable assignments") {
    val out = CorpusCli.run(Seq("split", s"$dir/docs", s"$dir/splits", "500", "250"), spark)
    assert(out.head.contains("\"rows\":3"), out.head)
    val splits = spark.read.parquet(s"$dir/splits")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(splits.size == 3 && splits.values.forall(Set("train", "val", "test")))
  }

  test("pack command shards by token budget") {
    val out = CorpusCli.run(Seq("pack", s"$dir/docs", s"$dir/shards", "10", "3"), spark)
    assert(out.head.contains("\"rows\":3"), out.head)
    val cols = spark.read.parquet(s"$dir/shards").columns.toSet
    assert(cols == Set("doc_id", "shard_id", "n_tokens"))
  }

  test("quality command joins scores with language id") {
    CorpusCli.run(Seq("quality", s"$dir/docs", s"$dir/quality"), spark)
    val cols = spark.read.parquet(s"$dir/quality").columns.toSet
    assert(Set("doc_id", "n_tokens", "len_bucket", "predicted_lang",
      "dup_fraction", "top_share").subsetOf(cols), cols)
  }

  test("curate command emits shared-gram + rarity signals") {
    CorpusCli.run(Seq("curate", s"$dir/docs", s"$dir/curated"), spark)
    val rows = spark.read.parquet(s"$dir/curated")
    assert(rows.count() == 3)
    assert(Set("doc_id", "shared_fraction", "rare_fraction", "avg_token_freq")
      .subsetOf(rows.columns.toSet), rows.columns.mkString(","))
    // docs 0/1 are verbatim dups — every gram shared; doc 2 shares none
    val shared = rows.select("doc_id", "shared_fraction")
      .as[(Long, Double)].collect().toMap
    assert(shared(0L) == 1.0 && shared(1L) == 1.0 && shared(2L) == 0.0)
  }

  test("source-cap command keeps at most K docs per source") {
    (0L until 20L).map(i => (i, s"s${i % 2}", "text"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/srcdocs")
    val out = CorpusCli.run(
      Seq("source-cap", s"$dir/srcdocs", s"$dir/capped", "4"), spark)
    assert(out.head.contains("\"rows\":8"), out.head) // 2 sources × cap 4
    val bySrc = spark.read.parquet(s"$dir/capped")
      .select("source").as[String].collect().groupBy(identity).map(_._2.size)
    assert(bySrc.forall(_ == 4))
  }

  test("ann command serves IVF neighbors") {
    // 8 vectors under the default 16 centroids → every vector is its own
    // cluster; nprobe=4 probes the 3 nearest foreign clusters too
    CorpusCli.run(Seq("ann", s"$dir/emb", s"$dir/emb", s"$dir/ann", "2", "4"), spark)
    val res = spark.read.parquet(s"$dir/ann")
    assert(res.count() > 0)
    assert(res.columns.toSet == Set("query_id", "neighbor_id", "cosine", "rank"))
  }

  test("redact command scrubs spliced PII") {
    Seq((9L, "ping admin@ops.example or visit https://ops.example/x at 10.1.2.3"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/pii")
    CorpusCli.run(Seq("redact", s"$dir/pii", s"$dir/redacted"), spark)
    val r = spark.read.parquet(s"$dir/redacted")
      .select("text_redacted").as[String].collect().head
    assert(r == "ping <EMAIL> or visit <URL> at <IP>", r)
  }

  test("dedup-incremental command annotates a batch against the committed index") {
    val wh = s"$dir/incwh"
    val o1 = CorpusCli.run(Seq("dedup-incremental", wh, "day1", s"$dir/docs",
      s"$dir/inc1", "0.9"), spark)
    assert(o1.head.contains("\"rows\":3"), o1.head)
    // same content arriving as a later batch: flagged, nothing re-admitted
    Seq((80L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/day2")
    CorpusCli.run(Seq("dedup-incremental", wh, "day2", s"$dir/day2",
      s"$dir/inc2", "0.9"), spark)
    val acc = spark.read.parquet(s"$dir/inc2")
      .select("doc_id", "accepted").as[(Long, Boolean)].collect().toMap
    assert(acc == Map(80L -> false))
  }

  test("dedup-replay command reproduces the day1 annotation after day2 committed") {
    val wh = s"$dir/replaywh"
    CorpusCli.run(Seq("dedup-incremental", wh, "day1", s"$dir/docs",
      s"$dir/rp1", "0.9"), spark)
    Seq((80L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/rp-day2")
    CorpusCli.run(Seq("dedup-incremental", wh, "day2", s"$dir/rp-day2",
      s"$dir/rp2", "0.9"), spark)
    val out = CorpusCli.run(Seq("dedup-replay", wh, "day1", s"$dir/docs",
      s"$dir/rp1b", "0.9"), spark)
    assert(out.head.contains("\"rows\":3"), out.head)
    // day1 predates every other commit → all novel, exactly as originally
    val rep = spark.read.parquet(s"$dir/rp1b")
      .select("doc_id", "accepted").as[(Long, Boolean)].collect().toMap
    val orig = spark.read.parquet(s"$dir/rp1")
      .select("doc_id", "accepted").as[(Long, Boolean)].collect().toMap
    assert(rep == orig)
  }

  test("decontaminate-ngram command flags benchmark-quoting spans") {
    Seq((900L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/ngbench")
    val out = CorpusCli.run(Seq("decontaminate-ngram", s"$dir/docs",
      s"$dir/ngbench", s"$dir/ng1", "10"), spark)
    assert(out.head.contains("\"rows\":3"), out.head)
    val contam = spark.read.parquet(s"$dir/ng1")
      .select("doc_id", "n_contam_tokens").as[(Long, Int)].collect().toMap
    assert(contam(0L) > 0 && contam(1L) > 0 && contam(2L) == 0)
  }

  test("substring-dup and substring-dedup commands run the span family") {
    val o1 = CorpusCli.run(Seq("substring-dup", s"$dir/docs", s"$dir/ss1", "5"), spark)
    assert(o1.head.contains("\"rows\":3"), o1.head)
    val frac = spark.read.parquet(s"$dir/ss1")
      .select("doc_id", "dup_fraction").as[(Long, Double)].collect().toMap
    assert(frac(0L) == 1.0 && frac(1L) == 1.0 && frac(2L) == 0.0)
    val o2 = CorpusCli.run(Seq("substring-dedup", s"$dir/docs", s"$dir/ss2", "5"), spark)
    assert(o2.head.contains("\"rows\":3"), o2.head)
    val clean = spark.read.parquet(s"$dir/ss2")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(clean(0L).nonEmpty && clean(1L).isEmpty && clean(2L).nonEmpty)
  }

  test("curate-stream command drains a doc stream with online dedup") {
    Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/stream-in")
    val out = CorpusCli.run(Seq("curate-stream", s"$dir/stream-in",
      s"$dir/stream-out", s"$dir/stream-ck"), spark)
    assert(out.head.contains("\"rows\":2"), out.head)
    val novel = spark.read.parquet(s"$dir/stream-out")
      .select("doc_id", "novel").as[(Long, Boolean)].collect().toMap
    assert(novel == Map(0L -> true, 1L -> false))
  }

  test("c4-clean / gopher-quality / gopher-repetition commands run end-to-end") {
    val o1 = CorpusCli.run(Seq("c4-clean", s"$dir/docs", s"$dir/c4"), spark)
    assert(o1.head.contains("\"rows\":3"), o1.head)
    assert(spark.read.parquet(s"$dir/c4").columns.contains("keep_page"))
    val o2 = CorpusCli.run(Seq("gopher-quality", s"$dir/docs", s"$dir/gq"), spark)
    assert(o2.head.contains("\"rows\":3"), o2.head)
    assert(spark.read.parquet(s"$dir/gq").columns.contains("gopher_pass"))
    val o3 = CorpusCli.run(Seq("gopher-repetition", s"$dir/docs", s"$dir/gr"), spark)
    assert(o3.head.contains("\"rows\":3"), o3.head)
    // fixture docs are single-line with no duplicate structure → all pass
    val pass = spark.read.parquet(s"$dir/gr").filter($"repetition_pass").count()
    assert(pass == 3)
    val o4 = CorpusCli.run(Seq("dedup-paragraphs", s"$dir/docs", s"$dir/dp"), spark)
    assert(o4.head.contains("\"rows\":3"), o4.head)
    // single-paragraph docs: nothing to drop, text round-trips
    val kept = spark.read.parquet(s"$dir/dp")
      .select("n_parts", "n_kept").as[(Int, Int)].collect()
    assert(kept.forall { case (p, k) => p == 1 && k == 1 })
  }

  test("resample-mix command applies per-source permille rates") {
    // fixture docs lack a source column — write one with sources
    Seq((0L, "a"), (1L, "a"), (2L, "b"), (3L, "b"))
      .toDF("doc_id", "source").write.mode("overwrite").parquet(s"$dir/mix-in")
    val out = CorpusCli.run(Seq("resample-mix", s"$dir/mix-in", s"$dir/mix",
      "a=0,b=1000"), spark)
    assert(out.head.contains("\"rows\":4"), out.head)
    val keep = spark.read.parquet(s"$dir/mix")
      .filter($"keep_mix").select("doc_id").as[Long].collect().toSet
    assert(keep == Set(2L, 3L))
  }
}
