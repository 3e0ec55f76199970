package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe surrogate-id assignment.
  *
  * The reference's AUTO_INCREMENT semantics (ref mysql/.../01_tables.sql
  * `Players.id`, ref src/app/controllers/player.py:60-71 get-or-insert)
  * need contiguous ids in a stable key order. The naive Spark analog —
  * `row_number().over(Window.orderBy(key))` — moves EVERY row to one
  * task (Spark logs `WindowExec: No Partition Defined`); fine for a
  * 34-row dim, fatal when the dim's distinct count tracks the fact
  * (e.g. a location dim keyed by coordinates grows linearly with
  * events — at 100 TB that window funnels a fact-sized distinct
  * through a single partition).
  *
  * This is the two-phase partition-offset scheme instead:
  *   1. range-repartition by the key (so partition i holds keys all
  *      smaller than partition i+1's) and sort within partitions —
  *      one ordinary shuffle, every task bounded by its partition;
  *   2. `zipWithIndex` — Spark runs one tiny count-per-partition job,
  *      computes each partition's cumulative offset on the driver
  *      (numPartitions longs, not rows), and stamps
  *      `offset + positionInPartition` map-side.
  *
  * The result is exactly `row_number() OVER (ORDER BY key NULLS
  * FIRST)` — Spark's ascending sort places nulls first, while DuckDB's
  * default is nulls LAST, so every oracle using this scheme states
  * `NULLS FIRST` explicitly (nullable keys — e.g. a dim keyed on a
  * JSON-extracted field — would otherwise scramble the id order
  * cross-engine). No task ever holds more than one partition of the
  * dim. The sorted input is eagerly
  * local-checkpointed first so (a) the count job and the stamping pass
  * read materialized partitions instead of recomputing the upstream
  * distinct/anti-join, and (b) downstream broadcast exchanges of the
  * dim stop replanning that subplan (measured: dropping this
  * checkpoint and relying on shuffle-output reuse across AQE-replanned
  * actions is 3-5× slower at sf0.1).
  */
object Ids {

  /** Append `idCol`: 1-based contiguous longs in ascending `keys`
    * order (ties impossible when `keys` are distinct, as for a dim).
    *
    * `numParts <= 0` (the default) means "the session's
    * `spark.sql.shuffle.partitions`": on a real cluster that conf
    * tracks executor parallelism, so a fact-sized dim range-partitions
    * into cluster-sized slices instead of a hardcoded constant (a
    * literal 32 was right for local[32] but would make each task hold
    * ~1/32 of a fact-scale distinct at 1000 executors). Callers with a
    * known tiny dim can still pass an explicit count.
    */
  def withOrderedId(df: DataFrame, keys: Seq[String], idCol: String,
      numParts: Int = 0): DataFrame = {
    val s = df.sparkSession
    // numParts <= 0: leave the partition count to AQE (no explicit n
    // ⇒ the range exchange is coalescible), r21: a KB-sized dim then
    // checkpoints and stamps as 1-2 tasks instead of a fixed 32 of
    // ~100 ms fixed cost each, while a fact-sized dim still gets the
    // session's full shuffle width — scale-adaptive in both
    // directions. Partition widths cannot change the assigned ids
    // (range partitions preserve the global key order; coalescing
    // merges ADJACENT ranges). Non-AQE sessions plan the same
    // fixed-width exchange as before.
    val sorted = (if (numParts > 0)
        df.repartitionByRange(numParts, keys.map(col): _*)
      else df.repartitionByRange(keys.map(col): _*))
      .sortWithinPartitions(keys.map(col): _*)
      .localCheckpoint(true)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    s.createDataFrame(rdd, schema)
  }
}
