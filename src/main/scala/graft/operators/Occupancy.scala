package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-occupancy counting for banded candidate builders.
  *
  * Every banded near-dup/ANN builder needs "how many rows share this
  * bucket key" so the MaxBucket/MaxCell policies can split or drop
  * degenerate buckets. Counting it with
  * `count(*) OVER (PARTITION BY bucketKey)` is a scale trap: a window
  * moves ALL rows of a partition into ONE task (`WindowExec` buffers
  * the whole partition), and AQE's skew mitigation applies to joins
  * and aggregates, not windows — so the hot bucket the cap exists to
  * defuse (boilerplate license header, near-constant band, hot phash)
  * lands on a single reducer BEFORE it can be counted. At the test SFs
  * this is invisible; at 100 TB it is a 10⁷–10⁹-row single-task wall.
  *
  * The scalable shape is aggregate-then-join: `groupBy(key).count()`
  * collapses the hot key map-side (partial aggregation) to one row per
  * mapper, and the join-back is either a broadcast (when the key
  * cardinality is bounded, e.g. k quantizer cells) or a shuffle join
  * AQE CAN skew-split. Row set and values are identical to the window
  * form for non-null keys (every key here is an md5 / bit-arithmetic /
  * argmin product — never null), so the DuckDB oracles keep their
  * window formulation and stay byte-identical.
  */
private[graft] object Occupancy {

  /** Attach the per-key row count of `df` as column `outCol`.
    *
    * @param broadcastCounts broadcast the counts relation instead of
    *   shuffle-joining it — use when the key cardinality is bounded
    *   (quantizer cells: exactly k rows), never for corpus-cardinality
    *   keys like band hashes.
    */
  def attach(df: DataFrame, keys: Seq[String], outCol: String,
      broadcastCounts: Boolean = false): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(outCol))
    df.join(if (broadcastCounts) broadcast(counts) else counts, keys)
  }
}
