package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Count-min sketch invariants: never undercounts, bounded overcount,
  * merge = concatenation (the map-side-combine contract), and the SQL
  * probe arithmetic agrees with the aggregator's Scala hashing.
  */
class CountMinSpec extends AnyFunSpec with SparkTestBase {

  private val D = 4
  private val W = 512 // small width to force collisions in-test

  import scala.jdk.CollectionConverters._

  private def sketchOf(tokens: Seq[String]): Array[Long] = {
    val df = spark.createDataset(tokens.asJava)(org.apache.spark.sql.Encoders.STRING)
      .toDF("tok")
    val cms = udaf(new CountMinAggregator(D, W))
    df.agg(cms(col("tok"))).collect().head
      .getSeq[Long](0).toArray
  }

  private val corpus: Seq[String] =
    Seq.tabulate(2000)(i => s"w${i % 97}") ++ Seq.fill(500)("hot") ++
      Seq.tabulate(300)(i => s"rare$i")

  it("never undercounts and stays within the e*N/w bound for every token") {
    val sk = sketchOf(corpus)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = math.ceil(math.E * corpus.size / W).toLong
    exact.foreach { case (tok, n) =>
      val est = CountMinAggregator.estimate(sk, D, W, tok)
      assert(est >= n, s"undercount for $tok: $est < $n")
      assert(est <= n + bound, s"$tok overcounted past the bound: $est > $n + $bound")
    }
  }

  it("merging partition sketches equals sketching the concatenation") {
    val (a, b) = corpus.splitAt(corpus.size / 3)
    val whole = sketchOf(corpus)
    val merged = sketchOf(a).zip(sketchOf(b)).map { case (x, y) => x + y }
    assert(whole.sameElements(merged))
  }

  it("the declarative md5-slice probe matches the aggregator's Scala hashing") {
    val sk = sketchOf(corpus)
    val skLit = typedLit(sk.toSeq)
    val probes = spark.createDataset(Seq("hot", "w3", "rare42", "absent").asJava)(
      org.apache.spark.sql.Encoders.STRING).toDF("term")
    def rowEst(i: Int) =
      element_at(skLit,
        (lit(i * W) + conv(substring(md5(col("term")), 1 + 7 * i, 7), 16, 10).cast("long") % W + 1)
          .cast("int"))
    val got = probes.select(col("term"), least((0 until D).map(rowEst): _*).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (term, est) =>
      assert(est == CountMinAggregator.estimate(sk, D, W, term),
        s"SQL probe diverged for $term")
    }
  }
}
