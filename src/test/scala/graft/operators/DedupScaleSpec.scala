package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funspec.AnyFunSpec

/** Proves the exact-dup pre-collapse bounds near-dup candidate
  * generation by DISTINCT texts, not documents — the one quadratic a
  * web-scale corpus (10⁵-copy boilerplate clusters) would otherwise hit
  * in the MinHash/SimHash band joins.
  */
class DedupScaleSpec extends AnyFunSpec with SparkTestBase {

  private val CLUSTER = 1000 // copies of one boilerplate text
  private val UNIQUE  = 20

  /** CLUSTER copies of one text + UNIQUE distinct docs (>=3 words each,
    * no shared shingles between distinct docs). */
  private def docs: DataFrame = {
    val cluster = spark.range(CLUSTER)
      .selectExpr("id AS doc_id",
        "'subscribe to our newsletter for daily updates and offers' AS text")
    val unique = spark.range(CLUSTER, CLUSTER + UNIQUE)
      .selectExpr("id AS doc_id",
        "concat('uniq', id, ' alpha', id, ' beta', id, ' gamma', id, ' delta', id) AS text")
    cluster.union(unique)
  }

  describe("exact-dup pre-collapse") {

    it("collapses a 1000-copy cluster to one representative with its size") {
      val reps = Dedup.collapseExact(docs).collect()
      assert(reps.length == UNIQUE + 1)
      val cluster = reps.filter(_.getAs[Long]("copies") == CLUSTER.toLong)
      assert(cluster.length == 1)
      assert(cluster.head.getAs[Long]("doc_id") == 0L) // min member is the rep
      assert(reps.count(_.getAs[Long]("copies") == 1L) == UNIQUE)
    }

    it("keeps MinHash band candidates O(distinct texts) where raw docs pay k^2") {
      val maxDistinctPairs = (UNIQUE + 1) * UNIQUE / 2
      val collapsed = Dedup.minhashBandCandidates(
        Dedup.minhashSignatures(Dedup.shingleTable(Dedup.collapseExact(docs)))).count()
      assert(collapsed <= maxDistinctPairs,
        s"collapsed candidates $collapsed exceed distinct-pair bound $maxDistinctPairs")
      // the counterfactual: identical texts share all bands, so the raw
      // path emits every pair within the cluster — C(1000,2) rows
      val raw = Dedup.minhashBandCandidates(
        Dedup.minhashSignatures(Dedup.shingleTable(docs))).count()
      assert(raw >= CLUSTER.toLong * (CLUSTER - 1) / 2)
    }

    it("keeps SimHash band candidates O(distinct texts) where raw docs pay k^2") {
      val maxDistinctPairs = (UNIQUE + 1) * UNIQUE / 2
      val collapsed = Dedup.simhashBandCandidates(
        Dedup.simhashFrame(Dedup.collapseExact(docs))).count()
      assert(collapsed <= maxDistinctPairs)
      val raw = Dedup.simhashBandCandidates(Dedup.simhashFrame(docs)).count()
      assert(raw >= CLUSTER.toLong * (CLUSTER - 1) / 2)
    }

    it("resolves connected components over near-dup pairs (chain, triangle, isolated pair)") {
      // chain 1-2-3-4 (diameter 3 = CC_ITERS), triangle 10-11-12, pair 20-21
      val pairs = spark.createDataFrame(Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (11L, 12L), (10L, 12L),
        (20L, 21L))).toDF("doc_a", "doc_b")
      val labels = Dedup.ccLabels(pairs).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
      assert(Seq(1L, 2L, 3L, 4L).map(labels) == Seq(1L, 1L, 1L, 1L))
      assert(Seq(10L, 11L, 12L).map(labels) == Seq(10L, 10L, 10L))
      assert(Seq(20L, 21L).map(labels) == Seq(20L, 20L))
    }

    it("converges on chains deeper than the oracle's unroll (iterate-until-fixed)") {
      // a 10-node path: min-label needs 9 rounds to reach the far end —
      // a fixed 3-round unroll would silently split this component into
      // several labels; the convergence loop must not
      val pairs = spark.createDataFrame((1L to 9L).map(i => (i, i + 1)))
        .toDF("doc_a", "doc_b")
      val labels = Dedup.ccLabels(pairs).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
      assert(labels.size == 10)
      assert(labels.values.toSet == Set(1L),
        s"chain split into ${labels.values.toSet.size} labels: $labels")
    }

    it("pointer-doubling makes rounds O(log diameter): a 64-node path needs <=10") {
      val pairs = spark.createDataFrame((1L to 63L).map(i => (i, i + 1)))
        .toDF("doc_a", "doc_b")
      val (labelsDf, rounds) = Dedup.ccLabelsWithRounds(pairs)
      val labels = labelsDf.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
      assert(labels.size == 64)
      assert(labels.values.toSet == Set(1L), s"split: ${labels.values.toSet}")
      // pure propagation needs 63 rounds (> CC_MAX_ITERS); the shortcut
      // must land well under the cap
      assert(rounds <= 10, s"took $rounds rounds — shortcut not doubling")
    }

    it("dedup verdict is internally consistent: keepers keep themselves, drops point at kept docs") {
      val v = Dedup.qDedupVerdict(spark, sfDir).collect()
      assert(v.nonEmpty)
      val byId = v.map(r => r.getAs[Long]("doc_id") -> r).toMap
      v.foreach { r =>
        val keeper = r.getAs[Long]("keeper")
        assert(byId(keeper).getAs[Long]("keep") == 1L,
          s"doc ${r.getAs[Long]("doc_id")} points at non-kept keeper $keeper")
        if (r.getAs[Long]("keep") == 1L) {
          assert(r.getAs[Long]("doc_id") == keeper)
          assert(r.getAs[String]("reason") == "keep")
        } else assert(Set("exact_dup", "near_dup")(r.getAs[String]("reason")))
      }
      // kept docs are exactly the distinct keepers
      assert(v.count(_.getAs[Long]("keep") == 1L) ==
        v.map(_.getAs[Long]("keeper")).distinct.length)
    }

    it("keeps duplicate clusters visible to the Jaccard df-cap (df counts distinct texts)") {
      import org.apache.spark.sql.functions._
      // raw path: every cluster shingle has df=1000 > MAX_SHINGLE_DF, so
      // the cap would silently drop the cluster from Jaccard entirely
      val rawMaxDf = Dedup.shingleTable(docs)
        .groupBy("sh").count().agg(max("count")).collect().head.getLong(0)
      assert(rawMaxDf == CLUSTER.toLong)
      assert(rawMaxDf > Dedup.MAX_SHINGLE_DF)
      // collapsed path: one representative per text -> df=1 everywhere
      // here; a shingle only exceeds the cap when >MAX_SHINGLE_DF
      // DISTINCT texts share it (the hot-boilerplate-fragment case the
      // cap is for)
      val collapsedMaxDf = Dedup.shingleTable(Dedup.collapseExact(docs))
        .groupBy("sh").count().agg(max("count")).collect().head.getLong(0)
      assert(collapsedMaxDf == 1L)
    }

    it("the df-cap never materializes a hot shingle's occurrence list in one task") {
      import org.apache.spark.sql.functions._
      // a boilerplate shingle shared by MANY DISTINCT texts survives the
      // exact-collapse and hits the df-cap as a hot key. The r10 verdict
      // finding: count().over(Window.partitionBy("sh")) dragged all its
      // occurrences into ONE window task before the filter could drop
      // them. Pin the fixed shape on the real query plan: zero WindowExec
      // anywhere, and the cap realized as a broadcast anti-join (the hot
      // set is N/cap distinct values — broadcastable at any real scale).
      // the capped frame is .cache()d, so the cap's join lives inside an
      // InMemoryRelation — traverse into cached plans too
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val cached = p match {
          case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            allNodes(s.relation.cachedPlan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allNodes(a.inputPlan) // AQE wraps cached plans; subtree not in children
          case _ => Nil
        }
        p +: (p.children.flatMap(allNodes) ++ cached)
      }
      val nodes = allNodes(
        Dedup.qDedupNgramJaccard(spark, sfDir).queryExecution.sparkPlan)
      val windows = nodes.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"df-cap regressed to a window: ${windows.map(_.partitionSpec.map(_.sql))}")
      val bcastAnti = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType.sql == "LEFT ANTI" => j
      }
      assert(bcastAnti.nonEmpty, "hot-key drop must be a broadcast anti-join")
      // and behaviorally: a corpus where >MAX_SHINGLE_DF distinct texts
      // share one boilerplate shingle still caps it (no pair survives on
      // the shared shingle alone) without any single-task window
      val n = Dedup.MAX_SHINGLE_DF.toInt + 50
      val hotDocs = spark.range(n).selectExpr("id AS doc_id",
        "concat('common boiler plate ', 'tail', id, ' filler', id) AS text")
      val pairs = Dedup.containmentPairs(hotDocs)
      assert(pairs.count() == 0L,
        "pairs must not form through a shingle past the df cap")
    }
  }
}
