package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable handles on Spark's own bloom-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`, which Catalyst
  * normally injects only when its cost heuristics fire).
  *
  * Registering them as session functions lets an operator state the
  * sketch-prefilter shape EXPLICITLY: build one bloom over the small
  * side's join keys (an aggregate that combines map-side — the sketch
  * is a few MB however many rows feed it), ship it to every task as a
  * scalar-subquery literal, and kill non-matching big-side rows in the
  * scan stage, before any exchange. `might_contain` has no false
  * negatives, so an exact join downstream of the prefilter returns
  * exactly the unfiltered result — the sketch only sheds work.
  *
  * Usage (SQL, after `register`):
  * {{{
  *   SELECT * FROM big
  *   WHERE graft_bloom_contains(
  *     (SELECT graft_bloom_agg(xxhash64(k), 400000L) FROM small),
  *     xxhash64(k))
  * }}}
  * The sketch argument must be a constant or scalar subquery (the
  * expression's own contract); the hashes are xxhash64, same as the
  * optimizer's injected filters.
  */
object BloomMembership {

  /** Register `graft_bloom_agg(hash[, n_items])` and
    * `graft_bloom_contains(sketch, hash)` in the session registry
    * (idempotent). The analyzer wraps the aggregate in a Complete
    * AggregateExpression exactly as for built-in aggregates.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs =>
        if (exprs.length >= 2) new BloomFilterAggregate(exprs(0), exprs(1))
        else new BloomFilterAggregate(exprs(0)),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}
