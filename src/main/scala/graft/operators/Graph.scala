package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond the dedup connected components: PageRank over
  * the customer↔supplier transaction graph (entity importance in a
  * bipartite interaction graph — the "which suppliers anchor the
  * network" question).
  *
  * Scale design: the graph lives in DataFrames (edges from one
  * fact-table aggregate); each PageRank round is ONE equality join
  * (edge src → rank) + one map-side-combinable aggregate on dst — the
  * standard distributed PageRank shape, unrolled PR_ITERS times in a
  * single plan. Per-round ranks are ROUNDED to 9dp so cross-engine
  * double drift cannot compound across rounds (the Lloyd/probe pin);
  * transition probabilities w/outw are exact integer-ratio doubles.
  */
object Graph {

  private val PR_ITERS = 3
  private val PR_D     = "0.85" // damping, literal text shared with the oracle
  private val PR_BASE  = "0.15" // 1 - d

  /** Weighted PageRank over the bipartite transaction graph
    * (`q_pagerank`): nodes are customers (`c<id>`) and suppliers
    * (`s<id>`), one undirected edge per trading pair weighted by
    * lineitem count (made directed both ways, so no dangling mass and
    * rank flows through both sides). Top-20 nodes by final rank.
    */
  def qPagerank(s: SparkSession, dir: String): DataFrame =
    pagerankAll(s, dir)
      .select(col("node"), round(col("pr"), 6).as("pagerank"))
      .orderBy(desc("pagerank"), col("node"))
      .limit(20)

  /** Full (node, pr, n) rank frame after PR_ITERS rounds — `qPagerank`
    * takes its top-20; the spec checks mass conservation over all of it. */
  private[graft] def pagerankAll(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cnode"),
        concat(lit("s"), col("l_suppkey")).as("snode"))
      .groupBy("cnode", "snode").agg(count(lit(1)).cast("double").as("w"))
    // localCheckpoint (eager) instead of cache: every round references
    // these frames under new broadcasts, and a cached-but-lazy plan made
    // each round's broadcast re-plan the whole upstream lineage
    val edges = pairs.select(col("cnode").as("src"), col("snode").as("dst"), col("w"))
      .unionByName(pairs.select(col("snode").as("src"), col("cnode").as("dst"), col("w")))
      .localCheckpoint()
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    val trans = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    val nN = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(nN))
      .select(col("node"), round(lit(1.0) / col("n"), 9).as("pr"), col("n"))
    for (_ <- 1 to PR_ITERS) {
      // rank and inflow frames are VERTEX-sized — dim-sized for this
      // bipartite graph, so broadcast them and the edge set never
      // re-shuffles per round (bench: 9.5 s → the shuffle-join shape's
      // per-round stage overhead dominated a 150k-edge graph). On a
      // billion-vertex graph the same two joins run as shuffle joins —
      // only the hints change, not the plan shape.
      val inflow = trans.join(broadcast(pr.select(col("node").as("src"), col("pr"))), "src")
        .groupBy("dst").agg(sum(col("pr") * col("p")).as("inflow"))
      pr = nodes.crossJoin(broadcast(nN))
        .join(broadcast(inflow), col("node") === col("dst"), "left")
        .select(col("node"),
          round(expr(PR_BASE) / col("n") +
            expr(PR_D) * coalesce(col("inflow"), lit(0.0)), 9).as("pr"),
          col("n"))
    }
    pr
  }

  val oraclePagerank: String = {
    def iterCte(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT node, round($PR_BASE / n + $PR_D * coalesce(inflow, 0.0), 9) AS pr, n
         |  FROM (SELECT node, n FROM nodes, nn) nb
         |  LEFT JOIN (
         |    SELECT dst, sum(pr * p) AS inflow
         |    FROM trans JOIN $prev ON src = node GROUP BY dst) f
         |  ON nb.node = f.dst)""".stripMargin
    val iters = (1 to PR_ITERS).map(i =>
      iterCte(if (i == 1) "pr0" else s"pr${i - 1}", s"pr$i")).mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT 'c' || o_custkey AS cnode, 's' || l_suppkey AS snode,
       |         count(*)::DOUBLE AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT cnode AS src, snode AS dst, w FROM pairs
       |  UNION ALL SELECT snode, cnode, w FROM pairs),
       |outw AS (SELECT src, sum(w) AS outw FROM edges GROUP BY src),
       |trans AS (SELECT e.src, e.dst, e.w / o.outw AS p
       |          FROM edges e JOIN outw o USING (src)),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
       |pr0 AS (SELECT node, round(1.0 / n, 9) AS pr, n FROM nodes, nn),
       |$iters
       |SELECT node, round(pr, 6) AS pagerank FROM pr$PR_ITERS
       |ORDER BY pagerank DESC, node LIMIT 20""".stripMargin
  }
}
