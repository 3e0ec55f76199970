package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BoundedLruCache, Scored, TopKAgg}

/** Randomized model checks for the two hand-rolled kernels: the
  * bounded LRU against an access-ordered reference model, and the
  * top-k aggregator against sort-and-take — seeded random streams
  * catch the orderings and eviction interleavings example tests miss.
  */
class PropertySpec extends AnyFunSuite {

  test("TopKAgg ≡ sortWith.take(k) under arbitrary insert/merge splits") {
    val rnd = new Random(42)
    for (trial <- 1 to 200) {
      val k = 1 + rnd.nextInt(8)
      val xs = List.fill(rnd.nextInt(60))(
        Scored(rnd.nextInt(50).toLong, (rnd.nextInt(2001) - 1000).toLong))
      val agg = new TopKAgg(k)
      // reduce a prefix, reduce a suffix, merge — any split must give
      // the same answer as global sort-take
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val left = xs.take(cut).foldLeft(agg.zero)(agg.reduce)
      val right = xs.drop(cut).foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(left, right))
      val want = xs.sortWith((a, b) =>
        a.score > b.score || (a.score == b.score && a.id < b.id)).take(k)
      assert(got === want, s"trial $trial (k=$k, cut=$cut)")
    }
  }

  test("BoundedLruCache ≡ access-ordered model under random op streams") {
    val rnd = new Random(7)
    for (trial <- 1 to 200) {
      val max = 1 + rnd.nextInt(6)
      val cache = new BoundedLruCache[Int, Int](max)
      // reference model: access-ordered vector, oldest first
      var model = Vector.empty[(Int, Int)]
      for (_ <- 1 to 80) {
        val k = rnd.nextInt(12)
        if (rnd.nextBoolean()) {
          val v = k * 7
          model = model.filterNot(_._1 == k) :+ (k -> v)
          if (model.length > max) model = model.tail
          cache.put(k, v)
        } else {
          val expected = model.find(_._1 == k).map(_._2)
          if (expected.isDefined) // touched keys become most-recent
            model = model.filterNot(_._1 == k) :+ (k -> expected.get)
          assert(cache.get(k) === expected, s"trial $trial get($k)")
        }
      }
      assert(cache.size === model.length && cache.size <= max)
    }
  }
}
