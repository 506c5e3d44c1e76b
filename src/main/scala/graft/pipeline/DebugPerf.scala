package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measure per-job/shuffle overhead in this environment. */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[perf] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    t("warmup count") { spark.range(1000).count() }
    t("range 1e6 count") { spark.range(1000000).count() }
    t("groupBy shuffle 1e6") {
      spark.range(1000000).groupBy((col("id") % 10).as("k")).count().collect()
    }
    t("groupBy shuffle again") {
      spark.range(1000000).groupBy((col("id") % 7).as("k")).count().collect()
    }
    t("join 1e5") {
      val a = spark.range(100000).withColumn("k", col("id") % 1000)
      val b = spark.range(1000).withColumnRenamed("id", "k")
      a.join(b, "k").count()
    }
    t("parquet write") {
      spark.range(100000).write.mode("overwrite").parquet("/tmp/perf-test.parquet")
    }
    t("parquet read+count") {
      spark.read.parquet("/tmp/perf-test.parquet").count()
    }
    t("udf groupBy") {
      val u = udf((s: String) => s.toLowerCase)
      spark.range(100000).withColumn("s", u(col("id").cast("string")))
        .groupBy("s").count().count()
    }
    t("localCheckpoint") {
      spark.range(100000).toDF("id").localCheckpoint().count()
    }

    // isolate Canon components on tiny data
    implicit val sp = spark
    val concepts = graft.fixtures.PagesGen.allEntities
      .map(n => ("web:" + n, n)).toDF("id", "name")
      .persist()
    concepts.count()
    val aliasPairs = graft.fixtures.PagesGen.aliases.toSeq
      .map { case (a, b) => (a, b) }.toDF("name_a", "name_b")
    t("tiny bcast join #1") {
      import org.apache.spark.sql.functions.broadcast
      val a = Seq(("x", 1), ("y", 2)).toDF("k", "v")
      val b = Seq(("x", 10)).toDF("k", "w")
      a.join(broadcast(b), "k").count()
    }
    t("tiny bcast join #2") {
      import org.apache.spark.sql.functions.broadcast
      val a = Seq(("x", 1), ("y", 2)).toDF("k", "v")
      val b = Seq(("y", 10)).toDF("k", "w")
      a.join(broadcast(b), "k").count()
    }
    t("abbreviationPairs") { graft.canon.Canon.abbreviationPairs(concepts).count() }
    t("nameSimilarityPairs") { graft.canon.Canon.nameSimilarityPairs(concepts, 0.75).count() }
    t("aliasIdPairs-2-bcast-joins") {
      import org.apache.spark.sql.functions.{broadcast, lower}
      val byName = concepts.select(lower(col("name")).as("__k"), col("id"))
      aliasPairs
        .join(broadcast(byName).withColumnRenamed("id", "id_a"), lower(col("name_a")) === col("__k")).drop("__k")
        .join(broadcast(byName).withColumnRenamed("id", "id_b"), lower(col("name_b")) === col("__k")).drop("__k")
        .count()
    }
    t("variant: no-persisted-src") {
      import org.apache.spark.sql.functions.{broadcast, lower}
      val fresh = graft.fixtures.PagesGen.allEntities.map(n => ("web:" + n, n)).toDF("id", "name")
      val byName = fresh.select(lower(col("name")).as("__k"), col("id"))
      aliasPairs
        .join(broadcast(byName).withColumnRenamed("id", "id_a"), lower(col("name_a")) === col("__k")).drop("__k")
        .join(broadcast(byName).withColumnRenamed("id", "id_b"), lower(col("name_b")) === col("__k")).drop("__k")
        .count()
    }
    t("variant: precomputed-key equi-join") {
      import org.apache.spark.sql.functions.{broadcast, lower}
      val byName = concepts.select(lower(col("name")).as("ka"), col("id"))
      aliasPairs
        .withColumn("ka", lower(col("name_a")))
        .join(broadcast(byName).withColumnRenamed("id", "id_a"), Seq("ka")).drop("ka")
        .withColumn("kb", lower(col("name_b")))
        .join(broadcast(byName.withColumnRenamed("ka", "kb")).withColumnRenamed("id", "id_b"), Seq("kb")).drop("kb")
        .count()
    }
    t("variant: single join only") {
      import org.apache.spark.sql.functions.{broadcast, lower}
      val byName = concepts.select(lower(col("name")).as("__k"), col("id"))
      aliasPairs
        .join(broadcast(byName), lower(col("name_a")) === col("__k")).count()
    }
    t("variant: single join again") {
      import org.apache.spark.sql.functions.{broadcast, lower}
      val byName = concepts.select(lower(col("name")).as("__k"), col("id"))
      aliasPairs
        .join(broadcast(byName), lower(col("name_b")) === col("__k")).count()
    }
    t("connectedComponents") {
      val pairs = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("id_a", "id_b")
      graft.canon.Canon.connectedComponents(pairs).count()
    }
    t("canonicalMap full") {
      graft.canon.Canon.canonicalMap(concepts, aliasPairs, 0.75).count()
    }
    t("canonicalMap again") {
      graft.canon.Canon.canonicalMap(concepts, aliasPairs, 0.75).count()
    }
    spark.stop()
  }
}
