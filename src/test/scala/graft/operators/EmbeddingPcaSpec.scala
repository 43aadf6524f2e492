package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** `q_embedding_pca`: the distributed covariance + power iteration must
  * equal a local scalar replay of the SAME algorithm bit for bit (the
  * rounding discipline makes that an exact-equality assertion, not a
  * tolerance), the 3-step estimate must already point near the true
  * dominant eigenvector, and the reported top-5 must be internally
  * consistent.
  */
class EmbeddingPcaSpec extends AnyFunSpec with SparkTestBase {

  private val D = 64

  /** Spark's Round(DoubleType) semantics: decimal HALF_UP on the
    * double's shortest decimal representation. */
  private def rd(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private def vecs: Array[Array[Double]] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("emb"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Scalar replay of pcaParts: 6dp means, 6dp centering, integer-micros
    * covariance, 6dp-rounded power steps from w0 = 1/8. */
  private def localPca(vs: Array[Array[Double]], iters: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val n = vs.length
    val mu = Array.tabulate(D)(j => rd(vs.foldLeft(0.0)(_ + _(j)) / n, 6))
    val xc = vs.map(v => Array.tabulate(D)(j => rd(v(j) - mu(j), 6)))
    val micro = Array.ofDim[Long](D, D)
    for (x <- xc; i <- 0 until D; j <- 0 until D)
      micro(i)(j) += java.math.BigDecimal.valueOf(x(i) * x(j) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val cm = micro.map(_.map(m => rd(m / 1e6 / n, 6)))
    var w = Array.fill(D)(0.125)
    for (_ <- 1 to iters) {
      val y = cm.map(rw =>
        rd((0 until D).foldLeft(0.0)((acc, i) => acc + rw(i) * w(i)), 6))
      val nrm = math.sqrt(y.foldLeft(0.0)((acc, u) => acc + u * u))
      w = y.map(v => rd(v / nrm, 6))
    }
    (w, cm)
  }

  it("the distributed covariance + power iteration equals a local replay exactly") {
    val (wLocal, _) = localPca(vecs, Similarity.PCA_ITERS)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("emb"))
    val (_, wFrame) = Similarity.pcaParts(spark, e)
    val wSpark = wFrame.collect()(0).getSeq[Double](0).toArray
    assert(wSpark.toSeq == wLocal.toSeq,
      s"distributed power iteration diverged from the scalar replay:\n" +
        s"spark=${wSpark.take(8).mkString(",")}...\nlocal=${wLocal.take(8).mkString(",")}...")
  }

  it("recovers a planted dominant direction in 3 steps") {
    // The driver's synthetic embeddings are near-isotropic (no spectral
    // gap), where ANY fixed-step power method points nowhere in
    // particular — so learnability is asserted on a corpus with a
    // planted rank-1 component: v_i ± 3·u with alternating sign (mean
    // cancels, variance 9 along u dwarfs the per-dim data variance).
    val u = {
      val raw = Array.tabulate(D)(i => if (i % 2 == 0) 1.0 else -0.5)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val planted = vecs.zipWithIndex.map { case (v, k) =>
      val c = if (k % 2 == 0) 3.0 else -3.0
      Array.tabulate(D)(j => v(j) + c * u(j))
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("emb",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    val df = spark.createDataFrame(
      planted.map(a => org.apache.spark.sql.Row(a.toSeq)).toSeq.asJava, schema)
    val (_, wFrame) = Similarity.pcaParts(spark, df)
    val w3 = wFrame.collect()(0).getSeq[Double](0).toArray
    val cos = math.abs((0 until D).foldLeft(0.0)((a, i) => a + w3(i) * u(i)))
    assert(cos >= 0.99, s"|cos(w3, planted u)| = $cos")
  }

  it("the Rayleigh quotient is non-decreasing across the rounded power steps") {
    val (_, cm) = localPca(vecs, Similarity.PCA_ITERS)
    def rayleigh(w: Array[Double]): Double = {
      val y = cm.map(rw => (0 until D).foldLeft(0.0)((a, i) => a + rw(i) * w(i)))
      (0 until D).foldLeft(0.0)((a, i) => a + w(i) * y(i)) /
        w.map(x => x * x).sum
    }
    var w = Array.fill(D)(0.125)
    var prev = rayleigh(w)
    for (k <- 1 to Similarity.PCA_ITERS) {
      val y = cm.map(rw =>
        rd((0 until D).foldLeft(0.0)((acc, i) => acc + rw(i) * w(i)), 6))
      val nrm = math.sqrt(y.foldLeft(0.0)((acc, u) => acc + u * u))
      w = y.map(v => rd(v / nrm, 6))
      val cur = rayleigh(w)
      assert(cur >= prev - 1e-5, s"Rayleigh fell at step $k: $prev -> $cur")
      prev = cur
    }
  }

  it("reports 5 internally-consistent rows: ranked |loadings|, positive spectrum share") {
    val rows = Similarity.qEmbeddingPca(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val absLd = rows.map(r => math.abs(r.getDouble(2)))
    assert(absLd.zip(absLd.tail).forall { case (a, b) => a >= b },
      s"top-5 |loadings| not non-increasing: ${absLd.mkString(",")}")
    val lambda = rows.head.getDouble(3)
    val share = rows.head.getDouble(4)
    assert(lambda > 0, s"lambda=$lambda")
    assert(share > 0 && share <= 1, s"explained_share=$share")
    assert(rows.forall(r => r.getDouble(3) == lambda && r.getDouble(4) == share))
  }
}
