package graft.core

import org.apache.spark.sql.SparkSession

/** Shared discipline for iterative DataFrame loops (PPR / CC / BFS): the
  * session's `spark.sql.shuffle.partitions` is sized for corpus-scale
  * stages, so a 25-round loop over a small graph pays a fleet of
  * mostly-empty tasks per round. Scope the shuffle width to the MEASURED
  * loop input (~100k rows per partition) for the body's duration: a
  * retrieval-sized graph runs each round in one task, a 10⁹-edge graph
  * still gets real-cluster width.
  *
  * Contract: every frame the body publishes to callers must be
  * checkpointed/materialized inside the body — the width is restored on
  * exit, and only lazily-planned downstream shuffles would see it.
  */
object Loops {

  val RowsPerPartition = 100000L

  def withShuffleWidth[T](spark: SparkSession, measuredRows: Long)(body: => T): T = {
    val conf = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(conf)
    val parts = math.max(1L, measuredRows / RowsPerPartition + 1L).toInt
    val shrink = parts < prev.toInt
    if (shrink) spark.conf.set(conf, parts.toString)
    try body
    finally if (shrink) spark.conf.set(conf, prev)
  }
}
