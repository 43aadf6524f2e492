package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch buffer: `d` rows × `w` counters, flattened row-major.
  * Public (not nested/private) — Catalyst encoders codegen against it.
  */
case class CmsBuf(counters: Array[Long])

/** Count-min sketch over a token stream, as a typed one-pass Aggregator.
  *
  * The scale story (the missing member of the sketch family next to
  * HLL++ distinct counts and GK quantiles): exact per-token frequency
  * needs a shuffle keyed by token — at 100 TB that is the whole corpus
  * keyed by word, with the usual stopword skew. The CMS partial is a
  * fixed `d·w`-long grid per task, map-side combinable (merge =
  * elementwise add), so frequency queries cost one narrow shuffle of
  * O(d·w) state no matter the corpus size, and the estimate only ever
  * OVERcounts: `exact ≤ est ≤ exact + e/w·N` (per query, w.p. ≥
  * 1−e^−d).
  *
  * Hashing is engine-portable BY SLICING md5: row `i` uses hex chars
  * `[7i, 7i+7)` (0-based) of `md5(token)` (28 bits) mod `w` — the same
  * arithmetic is expressible in Spark SQL (`conv(substring(md5(t),…))`)
  * for the probe side and in DuckDB for the oracle, so the sketch the
  * aggregator builds and the sketch the oracle rebuilds agree exactly
  * (no JVM-private seed/finisher). `d ≤ 4` (md5 has 32 hex chars).
  */
class CountMinAggregator(d: Int, w: Int) extends Aggregator[String, CmsBuf, Array[Long]] {
  require(d >= 1 && d <= 4, "d rows must be 1..4 (md5 supplies 4 disjoint 28-bit slices)")
  require(w > 0)

  override def zero: CmsBuf = CmsBuf(new Array[Long](d * w))

  override def reduce(b: CmsBuf, tok: String): CmsBuf = {
    val hex = CountMinAggregator.md5Hex(tok)
    var i = 0
    while (i < d) {
      val slice = java.lang.Long.parseLong(hex.substring(7 * i, 7 * i + 7), 16)
      b.counters(i * w + (slice % w).toInt) += 1L
      i += 1
    }
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    val out = a.counters
    var i = 0
    while (i < out.length) { out(i) += b.counters(i); i += 1 }
    CmsBuf(out)
  }

  override def finish(b: CmsBuf): Array[Long] = b.counters

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lowercase md5 hex — identical to Spark's `md5()` and DuckDB's. */
  def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /** Driver-side estimate probe (tests): min over rows of the token's
    * counter. */
  def estimate(counters: Array[Long], d: Int, w: Int, tok: String): Long = {
    val hex = md5Hex(tok)
    (0 until d).map { i =>
      val slice = java.lang.Long.parseLong(hex.substring(7 * i, 7 * i + 7), 16)
      counters(i * w + (slice % w).toInt)
    }.min
  }
}
