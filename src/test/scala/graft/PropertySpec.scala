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

  test("bpeTrainLocal ≡ naive recount-from-scratch BPE on random " +
    "type tables — the incremental pair index never drifts") {
    import scala.collection.mutable
    // reference: recount EVERY pair from scratch each round (the
    // O(rounds · corpus) shape the incremental detach/attach
    // bookkeeping exists to avoid); same total order, same
    // left-to-right non-overlapping rewrite
    def naive(types0: Seq[(String, Long)],
        rounds: Int): Seq[(Long, String, String, String, Long)] = {
      var words = types0.map { case (w, c) =>
        (w.map(_.toString).toArray, c) }
      val out =
        mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val pw = mutable.HashMap.empty[(String, String), Long]
        for ((a, c) <- words; i <- 0 until a.length - 1)
          pw.updateWith((a(i), a(i + 1)))(v => Some(v.getOrElse(0L) + c))
        if (pw.isEmpty) done = true
        else {
          val ((lhs, rhs), w) = pw.toSeq
            .sortBy { case ((l, rr), ww) => (-ww, l, rr) }.head
          out += ((r.toLong, lhs, rhs, lhs + rhs, w))
          words = words.map { case (a, c) =>
            val b = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < a.length) {
              if (i < a.length - 1 && a(i) == lhs && a(i + 1) == rhs) {
                b += lhs + rhs; i += 2
              } else { b += a(i); i += 1 }
            }
            (b.toArray, c)
          }
          r += 1
        }
      }
      out.toSeq
    }
    val rnd = new Random(13)
    for (trial <- 1 to 100) {
      val nTypes = 1 + rnd.nextInt(12)
      val types = List.fill(nTypes)(
        (List.fill(1 + rnd.nextInt(8))(
          ('a' + rnd.nextInt(3)).toChar).mkString,
          1L + rnd.nextInt(5)))
        .distinctBy(_._1)
      val rounds = 1 + rnd.nextInt(10)
      assert(graft.operators.TextAnalysis.bpeTrainLocal(types, rounds)
        === naive(types, rounds), s"trial $trial: $types rounds=$rounds")
    }
  }
}
