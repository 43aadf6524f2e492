package graft.operators

import graft.{SparkTestBase, Tables}
import org.scalatest.funspec.AnyFunSpec

/** BM25 retrieval head: cross-shape recomputation through Spark SQL and
  * ranking sanity.
  */
class Bm25Spec extends AnyFunSpec with SparkTestBase {

  it("matches a Spark-SQL recomputation of the same formula") {
    val got = TextAnalysis.qBm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty && got.length <= 10)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_bm25")
    val terms = TextAnalysis.BM25_QUERY.map(t => s"'$t'").mkString("(", ",", ")")
    val viaSql = spark.sql(
      s"""WITH d AS (SELECT doc_id, CAST(size(split(text, ' ')) AS DOUBLE) AS dl,
         |                  split(text, ' ') AS w FROM docs_bm25),
         |toks AS (SELECT doc_id, dl, explode(w) AS term FROM d),
         |hits AS (SELECT doc_id, dl, term FROM toks WHERE term IN $terms),
         |ft AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, first(dl) AS dl
         |       FROM hits GROUP BY doc_id, term),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
         |dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM hits GROUP BY term)
         |SELECT doc_id,
         | round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |   * (tf * (1.2 + 1.0))
         |   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
         |FROM ft JOIN dfq USING (term) CROSS JOIN stats
         |GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == viaSql.toSeq)
  }

  it("scores are positive and ranked descending with doc_id tie-break") {
    val got = TextAnalysis.qBm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.forall(_._2 > 0.0))
    got.sliding(2).foreach {
      case Array((d1, s1), (d2, s2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2), s"ranking violated at $d1/$d2")
      case _ =>
    }
  }
}
