package graft.functions

import org.scalatest.funspec.AnyFunSpec

/** Property spec for [[MinKPairAggregator]] against the sort-take reference
  * it replaced (`array_sort(collect_list(struct(d, id)))` truncated to k):
  * arbitrary reduce/merge interleavings must agree with sorting the whole
  * group, including ties on d (break by id), the k boundary, and NaN/-0.0
  * (total order per java.lang.Double.compare — NaN greatest, -0.0 < 0.0,
  * the same ordering array_sort applies).
  */
class MinKPairSpec extends AnyFunSpec {

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { case ((d1, i1), (d2, i2)) =>
      val c = java.lang.Double.compare(d1, d2)
      c < 0 || (c == 0 && i1 < i2)
    }.take(k)

  private def viaAggregator(
      xs: Seq[(Double, Long)], k: Int, chunks: Int, seed: Long): Seq[(Double, Long)] = {
    val agg = new MinKPairAggregator(k)
    val rnd = new scala.util.Random(seed)
    // shuffle + split into partials, reduce each, then merge in a
    // random order — the distributed execution shape
    val parts = rnd.shuffle(xs.toVector)
      .grouped(math.max(1, xs.size / math.max(1, chunks))).toVector
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
    val out = agg.finish(merged)
    out.ds.toSeq.zip(out.ids.toSeq)
  }

  it("matches the sort-take reference over randomized inputs, sizes and k") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 60) {
      val n = rnd.nextInt(200)
      // duplicate-heavy distances force tie-on-id resolution
      val xs = Seq.fill(n)((rnd.nextInt(8).toDouble / 4.0, rnd.nextLong() % 50))
      val k = 1 + rnd.nextInt(12)
      val got = viaAggregator(xs, k, chunks = 1 + rnd.nextInt(6), seed = trial)
      assert(got == reference(xs, k),
        s"trial $trial (n=$n k=$k): $got vs ${reference(xs, k)}")
    }
  }

  it("k boundary: groups smaller than, equal to, and one-over k") {
    val xs = Seq((3.0, 1L), (1.0, 2L), (2.0, 3L), (1.0, 1L))
    for (k <- 1 to 6)
      assert(viaAggregator(xs, k, 2, k) == reference(xs, k), s"k=$k")
    assert(viaAggregator(Nil, 3, 1, 0) == Nil, "empty group")
  }

  it("total ordering: NaN sorts greatest, -0.0 below 0.0, ties break by id") {
    val xs = Seq((Double.NaN, 5L), (0.0, 2L), (-0.0, 7L), (1.0, 1L),
      (Double.NaN, 1L), (-0.0, 3L), (Double.PositiveInfinity, 9L))
    for (k <- Seq(1, 3, 5, 7, 9)) {
      val got = viaAggregator(xs, k, 3, k)
      val ref = reference(xs, k)
      // compare via bit patterns: NaN != NaN under ==
      def bits(s: Seq[(Double, Long)]) =
        s.map { case (d, i) => (java.lang.Double.doubleToLongBits(d), i) }
      assert(bits(got) == bits(ref), s"k=$k: $got vs $ref")
    }
    // a NaN arriving before smaller finite values must not block them
    // (the regression the total-order comparator guards against)
    val nanFirst = Seq((Double.NaN, 1L), (5.0, 2L), (0.5, 3L))
    val agg = new MinKPairAggregator(2)
    val out = nanFirst.foldLeft(agg.zero)(agg.reduce)
    assert(out.ds.toSeq == Seq(0.5, 5.0) && out.ids.toSeq == Seq(3L, 2L))
  }
}
