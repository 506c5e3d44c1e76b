package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-index migration — the Spark re-expression of the reference's
  * `migrate_vec` (src/qortex/vec/migrate.py:40-120, tested by
  * tests/test_migrate.py): transfer every vector from one index to
  * another, optionally transforming / re-embedding en route, idempotently
  * (the destination write is an upsert, exactly the property the
  * reference leans on). The reference streams id/embedding batches
  * through `destination.add()` with a progress callback; here the
  * transfer is ONE distributed delta commit — batching disappears because
  * the dataflow IS the batch — and progress becomes Observe events
  * (`vec.migrate.start` / `vec.migrate.complete`, the reference's
  * logger.info event names).
  *
  * Validation (the reference's per-batch shape checks, made global):
  *  - every outgoing embedding shares ONE dimension (and matches
  *    `expectDim` when given) — checked with a `limit(2)` distinct probe,
  *    not a full aggregate;
  *  - the transform preserves the id count (a re-embed must not drop or
  *    duplicate vectors);
  *  - post-write, every migrated id resolves in the destination
  *    (left-anti probe — the "vectors_written" accounting is verified,
  *    not assumed).
  */
object VectorMigrate {

  final case class MigrateResult(
      vectorsRead: Long,
      vectorsWritten: Long,
      dimension: Int,
      dryRun: Boolean)

  def migrate(
      source: VectorIndex,
      destination: VectorIndex,
      /** Optional re-embed/transform: (id, embedding) → (id, embedding).
        * Must preserve the id set — checked.
        */
      transform: DataFrame => DataFrame = identity,
      expectDim: Option[Int] = None,
      dryRun: Boolean = false): MigrateResult = {
    graft.observe.Observe.emit("vec.migrate.start",
      "dry_run" -> dryRun, "expect_dim" -> expectDim.getOrElse(-1))
    // resolve the merge-on-read log ONCE; both the count and the write
    // read this materialized frame
    val resolved = source.read().localCheckpoint()
    val vectorsRead = resolved.count()
    val out = transform(resolved).localCheckpoint()

    val dims = out.select(size(col("embedding")).as("d")).distinct()
      .limit(2).collect().map(_.getInt(0)).toSeq
    require(dims.size <= 1,
      s"vec.migrate: mixed embedding dimensions (saw ${dims.mkString(", ")}, …)")
    val dim = dims.headOption.getOrElse(0)
    expectDim.foreach(e => require(dims.isEmpty || dim == e,
      s"vec.migrate: embedding dimension $dim != expected $e"))
    val outCount = out.count()
    require(outCount == vectorsRead,
      s"vec.migrate: transform changed the vector count " +
        s"($vectorsRead read, $outCount after transform) — a migration " +
        "must carry every vector; filter before migrating instead")
    // the documented contract is id-SET preservation, not just count:
    // a transform that collides two ids while keeping the row count
    // would otherwise pass every check (upsert dedups silently) and
    // over-report vectorsWritten. Distinct count + re-key count come
    // from ONE aggregation job over the checkpointed frame.
    val idStats = out.select("id")
      .join(resolved.select(col("id"), lit(1).as("__src")), Seq("id"), "left")
      .agg(countDistinct("id").as("d"),
        // coalesce: sum over an EMPTY out frame is null, not 0
        coalesce(sum(when(col("__src").isNull, 1L).otherwise(0L)), lit(0L))
          .as("rk"))
      .collect().head
    val (distinctIds, rekeyed) = (idStats.getLong(0), idStats.getLong(1))
    require(rekeyed == 0,
      s"vec.migrate: transform re-keyed $rekeyed id(s) not present in " +
        "the source — a migration must preserve the id set")
    require(distinctIds == outCount,
      s"vec.migrate: transform produced duplicate ids " +
        s"($outCount rows, $distinctIds distinct) — the destination " +
        "upsert would silently collapse them")

    var written = 0L
    if (!dryRun) {
      destination.upsert(out)
      written = outCount
      val missing = out.select(col("id").cast("string").as("id"))
        .join(destination.read().select("id"), Seq("id"), "left_anti").count()
      require(missing == 0,
        s"vec.migrate: $missing migrated id(s) do not resolve in the " +
          "destination after upsert")
    }
    graft.observe.Observe.emit("vec.migrate.complete",
      "vectors_read" -> vectorsRead, "vectors_written" -> written,
      "dimension" -> dim, "dry_run" -> dryRun)
    MigrateResult(vectorsRead, written, dim, dryRun)
  }
}
