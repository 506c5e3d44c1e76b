package graft.bench

import graft.fixtures.PagesGen
import graft.pipeline.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Follow-up isolation experiments: parquet codec cost for the nested
  * extraction staging table, P0 duplicate rate (does a relational
  * pre-collapse pay?), and buildConcepts decomposition.
  */
object BenchExtra2 {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[extra2] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def du(p: String): Unit = {
      val kb = scala.sys.process.Process(Seq("du", "-sk", p)).!!.split("\\s+")(0)
      println(s"[extra2]   size $p: ${kb.toLong / 1024} MB")
    }

    val cfg = Ingest.Config()
    val pages = PagesGen.pages(spark, nPages)
    // one warm pass so codec runs compare like-for-like (JIT settled)
    val exDf = Ingest.extract(pages, cfg).toDF()
    timed("warmup extract (noop)") { noop(exDf) }

    // two passes per codec (sag-robust: compare the per-codec MINIMUM)
    for (round <- 1 to 2; codec <- Seq("lz4", "snappy", "zstd")) {
      val dir = s"/tmp/graft-extra2-$codec"
      graft.Bench.deleteRecursively(java.nio.file.Paths.get(dir))
      timed(s"extract+write codec=$codec round=$round") {
        exDf.write.mode("overwrite").option("compression", codec).parquet(dir)
      }
      du(dir)
    }

    val staged = spark.read.parquet("/tmp/graft-extra2-snappy")
    val concepts = graft.link.Linking.buildConcepts(
      Ingest.mentionsOf(staged), cfg.domain, graft.core.TextSpec.version)
      .localCheckpoint()

    // P0 duplicate rate on the resolved edge stream
    val resolved = graft.link.Linking.resolveEdges(
      Ingest.triplesOf(staged), concepts, cfg.broadcastMaxRows,
      cfg.saltBuckets, cfg.dictSizeHint).localCheckpoint()
    val r = resolved.agg(count(lit(1)).as("n"),
      countDistinct(col("source_id"), col("target_id"),
        col("relation_type"), col("source_text")).as("d")).collect()(0)
    println(s"[extra2] resolved rows=${r.getLong(0)} distinct(s,t,rel,text)=${r.getLong(1)}")
    val g = resolved.groupBy("source_id", "target_id").count()
      .agg(count(lit(1)), max("count"), avg("count")).collect()(0)
    println(s"[extra2] (s,t) groups=${g.getLong(0)} maxGroup=${g.getLong(1)} avgGroup=${g.getDouble(2)}")

    // buildConcepts decomposition
    val mentions = Ingest.mentionsOf(staged).localCheckpoint()
    println(s"[extra2] mentions rows=${mentions.count()}")
    timed("gen aggregate only (noop)") {
      val m = mentions.withColumn("role", col("role"))
      val gen = m.filter(col("role") =!= "illustrative")
      noop(gen.groupBy(lower(col("name")).as("__key"))
        .agg(min(struct((-col("confidence")).as("nc"), col("name"), col("url"),
          col("chunk_id"), col("description"), col("illustrates"))).as("__w"),
          count(lit(1)).as("mention_count")))
    }
    timed("full buildConcepts from ck'd mentions (noop)") {
      noop(graft.link.Linking.buildConcepts(mentions, cfg.domain,
        graft.core.TextSpec.version))
    }
    spark.stop()
  }
}
