package graft

import org.apache.spark.sql.functions._
import graft.functions.{BoundedLru, BoundedLruCache}

/** The bounded LRU (ref _cache.py SimpleALRUCache) — semantics pinned
  * to the reference's own example usage, then the per-partition
  * resolution operator checked against the declarative join.
  */
class BoundedLruSpec extends SparkSpec {

  test("LRU semantics match the reference example (_cache.py main)") {
    val c = new BoundedLruCache[String, Int](3)
    c.put("a", 1); c.put("b", 2); c.put("c", 3)
    assert(c.get("a") === Some(1))
    assert(c.get("b") === Some(2))
    assert(c.get("c") === Some(3))
    c.put("d", 4) // evicts 'a', the least recently used
    assert(c.get("a") === None, "'a' must be evicted")
    assert(c.get("d") === Some(4))
    assert(c.size === 3, "size never exceeds the bound")
    assert(c.evictions === 1L)
    assert(c.hits === 4L && c.misses === 1L, "hit/miss accounting")
  }

  test("access refreshes recency: touched keys survive eviction") {
    val c = new BoundedLruCache[Int, Int](2)
    c.put(1, 1); c.put(2, 2)
    c.get(1) // 1 becomes most-recent; 2 is now LRU
    c.put(3, 3) // evicts 2, not 1
    assert(c.get(1) === Some(1))
    assert(c.get(2) === None)
  }

  test("cachedResolve: bounded per-partition cache matches the join") {
    val events = Tables.events(spark, sf).select("event_id", "user_id")
    val lookup = Tables.customer(spark, sf)
      .select("c_custkey").collect().map(r => r.getLong(0) -> r.getLong(0))
      .toMap
    val st = BoundedLru.stats(spark)
    // bound far below the distinct-key count (15 at sf0.001) to
    // force evictions
    val resolved = BoundedLru.cachedResolve(
      events, "user_id", "player_id", lookup, maxSize = 4, st = st)
    val n = resolved.count()
    assert(n === events.count())

    // accounting: every row is exactly one get (hit or miss)
    assert(st.hits.value + st.misses.value === n)
    assert(st.misses.value > 0)
    assert(st.evictions.value > 0, "a 4-entry bound must evict")

    // correctness: identical to the broadcast-join resolution
    val viaJoin = events.join(
      broadcast(Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id"),
          col("c_custkey").as("player_id"))),
      Seq("user_id"), "left")
      .withColumn("player_id", coalesce(col("player_id"), lit(-1L)))
      .select("event_id", "player_id")
    assert(resolved.select("event_id", "player_id")
      .except(viaJoin).count() === 0)
    assert(viaJoin.except(
      resolved.select("event_id", "player_id")).count() === 0)
  }
}
