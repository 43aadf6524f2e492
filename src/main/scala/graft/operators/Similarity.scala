package graft.operators

import graft.Tables
import graft.functions.{CosineSimilarity, HashFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over the `embeddings` table
  * (embedding: array<float> — cast to double before any arithmetic so both
  * engines do identical double math on identical float32 inputs).
  *
  * Scale story:
  *  - `qKnnBrute` is the exact baseline: broadcast the (single) query
  *    vector, one scan, TakeOrderedAndProject top-k — no shuffle of the
  *    corpus, linear in data. This is the correct plan even at 100 TB for
  *    one query.
  *  - `qKnnLsh` is the batch/scale path: 16-plane random-hyperplane
  *    signatures → bucket-equality shuffle join → exact re-rank within the
  *    bucket. Quadratic work is confined to a bucket (expected n/2^16 of
  *    the corpus per bucket).
  *  - `qKnnCentroid` is the IVF building block: per-cell centroid
  *    (map-side-combined avg per dimension) + nearest-to-centroid medoid.
  */
object Similarity {

  private val DIM = 64

  /** Random-hyperplane LSH geometry: PLANES sign bits split into BANDS
    * bands of BITS bits. Candidates must agree on at least one FULL band
    * (classic banding), so quadratic work is confined to 2^BITS buckets
    * per band. 2^BITS is the scale knob: at the driver corpus (500–5000
    * vectors) 8-bit bands keep recall non-trivial; at 100 TB you'd raise
    * BITS to ~log2(n / target_bucket_size) (e.g. 24 bits → 16M buckets)
    * and/or add bands — the plan shape (explode → band-equality shuffle
    * join → per-bucket re-rank) is unchanged, only the key gets wider.
    */
  private[graft] val PLANES = 16
  private[graft] val BANDS  = 2
  private[graft] val BITS   = PLANES / BANDS

  /** cosine(a, b) with left-to-right double summation (matches the
    * oracle's list_sum(list_transform(...)) fold order). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** The §2.8 native kernel: same IEEE fold order as dot/norm above but
    * one fused codegen loop (see [[graft.functions.CosineSimilarity]]). */
  private def cosine(s: SparkSession, a: String, b: String): Column = {
    CosineSimilarity.register(s)
    expr(s"graft_cosine($a, $b)")
  }

  /** Exact brute-force cosine top-10 for query vector vec_id=0. */
  def qKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = broadcast(e.filter(col("vec_id") === 0).select(col("emb").as("qemb")))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(q)
      .select(col("vec_id"), cosine(s, "emb", "qemb").as("cos"))
      .orderBy(desc("cos"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  val oracleKnnBrute: String =
    """WITH q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, round(
      |  list_sum(list_transform(generate_series(1, len(embedding)),
      |    i -> embedding[i]::DOUBLE * qemb[i]::DOUBLE))
      |  / (sqrt(list_sum(list_transform(generate_series(1, len(embedding)), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
      |   * sqrt(list_sum(list_transform(generate_series(1, len(qemb)), i -> qemb[i]::DOUBLE * qemb[i]::DOUBLE)))), 6) AS cos
      |FROM embeddings, q WHERE vec_id <> 0
      |ORDER BY list_sum(list_transform(generate_series(1, len(embedding)),
      |    i -> embedding[i]::DOUBLE * qemb[i]::DOUBLE))
      |  / (sqrt(list_sum(list_transform(generate_series(1, len(embedding)), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
      |   * sqrt(list_sum(list_transform(generate_series(1, len(qemb)), i -> qemb[i]::DOUBLE * qemb[i]::DOUBLE)))) DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Deterministic random-hyperplane weights, identical literals on both
    * engines (computed from md5 at plan-build time — 3 exact decimals). */
  private[graft] def planeWeights: IndexedSeq[IndexedSeq[Double]] =
    (0 until PLANES).map(p => (0 until DIM).map(d =>
      (HashFns.h60Local(s"plane:$p:$d") % 2001 - 1000) / 1000.0))

  /** LSH candidate pairs with exact cosine, both directions
    * (vec_id, cand_id, cos): explode each vector into its BANDS band
    * values, shuffle-join on (band, value) equality, score survivors with
    * the native `graft_cosine` kernel, distinct the (possibly multi-band)
    * duplicates. Shared by `qKnnLsh` (top-3) and `qDedupEmbedding` (top-1).
    */
  private[graft] def lshCandidates(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val ws = planeWeights
    val bandCols = (0 until BANDS).map { b =>
      val bv = (0 until BITS).map { i =>
        val w = array(ws(b * BITS + i).map(lit): _*)
        when(dot(col("emb"), w) > 0, 1 << i).otherwise(0)
      }.reduce(_ + _)
      struct(lit(b).as("band"), bv.as("bv"))
    }
    val bands = e
      .select(col("vec_id"), col("emb"), explode(array(bandCols: _*)).as("bd"))
      .select(col("vec_id"), col("emb"), col("bd.band").as("band"), col("bd.bv").as("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("cand_id"),
        cosine(s, "x.emb", "y.emb").as("cos"))
      .distinct()
  }

  /** DuckDB mirror of [[lshCandidates]] as CTEs ending in `cand`. */
  private[graft] def lshCandidatesSql: String = {
    val ws = planeWeights
    def bandExpr(b: Int): String = (0 until BITS).map { i =>
      val lits = ws(b * BITS + i).mkString("[", ", ", "]")
      s"CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)), i -> embedding[i]::DOUBLE * ($lits)[i])) > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")
    val bandSel = (0 until BANDS).map(b =>
      s"SELECT vec_id, embedding, $b AS band, (${bandExpr(b)}) AS bv FROM embeddings")
      .mkString(" UNION ALL ")
    s"""bands AS ($bandSel),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS cand_id,
       |    list_sum(list_transform(generate_series(1, len(x.embedding)),
       |      i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
       |    / (sqrt(list_sum(list_transform(generate_series(1, len(x.embedding)), i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE)))
       |     * sqrt(list_sum(list_transform(generate_series(1, len(y.embedding)), i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)))) AS cos
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.vec_id <> y.vec_id)""".stripMargin
  }

  /** LSH-banded ANN: per-band sign signatures → band-equality join →
    * exact top-3 re-rank within candidates. Approximate by construction
    * but fully deterministic, so the oracle reproduces it exactly.
    */
  def qKnnLsh(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("cand_id"))
    lshCandidates(s, dir)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("vec_id"), col("cand_id").as("nn_id"), col("rnk"),
        round(col("cos"), 6).as("cos"))
      .orderBy("vec_id", "rnk")
  }

  val oracleKnnLsh: String =
    s"""WITH $lshCandidatesSql,
       |ranked AS (SELECT vec_id, cand_id, cos,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cand_id) AS rnk FROM cand)
       |SELECT vec_id, cand_id AS nn_id, CAST(rnk AS BIGINT) AS rnk, round(cos, 6) AS cos
       |FROM ranked WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin

  /** DuckDB fragment: cosine(aExpr, bExpr) over list columns. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       | / (sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))
       |  * sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i]::DOUBLE * $b[i]::DOUBLE)))))"""
      .stripMargin.replace("\n", " ")

  /** Per-label centroids as a (label, centroid) frame — the coarse
    * quantizer shared by `qKnnCentroid` and `qKnnIvf`. */
  private def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg("v").as("av"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("av")))),
        x => x.getField("av")).as("centroid"))

  /** IVF search: (1) assign EVERY vector to its nearest centroid cell
    * (argmin via a map-side-combinable struct-min — no per-vector window
    * shuffle); (2) pick the query's top-2 cells (nprobe=2); (3) exact
    * cosine re-rank only within the probed cells. At 100 TB the probed
    * cells are the only data touched after assignment — the classic
    * IVF recall/cost dial (nprobe, #cells) without changing plan shape.
    */
  def qKnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val cent = centroids(e)
    // argmin assignment: min over (negated cos, cell) mirrors the
    // oracle's ORDER BY cos DESC, cell ASC tie-break exactly
    val scoredCells = e.crossJoin(broadcast(cent.select(col("label").as("cell"), col("centroid"))))
      .select(col("vec_id"), col("emb"),
        struct((-cosine(s, "emb", "centroid")).as("nc"), col("cell")).as("sc"))
    val assigned = scoredCells.groupBy("vec_id")
      .agg(min("sc").as("m"), first("emb").as("emb"))
      .select(col("vec_id"), col("m.cell").as("cell"), col("emb"))
    val qv = broadcast(e.filter(col("vec_id") === 0).select(col("emb").as("qemb")))
    val qCells = broadcast(cent.crossJoin(qv)
      .select(col("label").as("cell"), cosine(s, "centroid", "qemb").as("qc"))
      .orderBy(desc("qc"), col("cell")).limit(2).select("cell"))
    assigned.filter(col("vec_id") =!= 0)
      .join(qCells, Seq("cell"))
      .crossJoin(qv)
      .select(col("vec_id"), col("cell"), cosine(s, "emb", "qemb").as("cos"))
      .orderBy(desc("cos"), col("vec_id")).limit(5)
      .select(col("vec_id"), col("cell"), round(col("cos"), 6).as("cos"))
  }

  val oracleKnnIvf: String =
    s"""WITH flat AS (
       |  SELECT label, unnest(embedding)::DOUBLE AS v,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |cent AS (
       |  SELECT label AS cell, list(av ORDER BY pos) AS centroid
       |  FROM (SELECT label, pos, avg(v) AS av FROM flat GROUP BY 1, 2) GROUP BY label),
       |ac AS (
       |  SELECT e.vec_id, e.embedding, cent.cell, ${cosSql("e.embedding", "cent.centroid")} AS cos_c
       |  FROM embeddings e CROSS JOIN cent),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT vec_id, embedding, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell) AS rn
       |    FROM ac) WHERE rn = 1),
       |q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
       |qc AS (
       |  SELECT cell FROM cent, q
       |  ORDER BY ${cosSql("centroid", "qemb")} DESC, cell LIMIT 2)
       |SELECT vec_id, cell, round(${cosSql("a.embedding", "qemb")}, 6) AS cos
       |FROM assigned a JOIN qc USING (cell), q
       |WHERE vec_id <> 0
       |ORDER BY ${cosSql("a.embedding", "qemb")} DESC, vec_id LIMIT 5""".stripMargin
  def qKnnCentroid(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val cent = centroids(e)
    val scored = e.join(broadcast(cent), Seq("label"))
      .select(col("label"), col("vec_id"),
        cosine(s, "emb", "centroid").as("cos"))
    val w = Window.partitionBy("label").orderBy(desc("cos"), col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("label"), col("vec_id").as("medoid_id"), round(col("cos"), 6).as("cos"))
      .orderBy("label")
  }

  val oracleKnnCentroid: String =
    """WITH flat AS (
      |  SELECT label, unnest(embedding)::DOUBLE AS v,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, list(av ORDER BY pos) AS centroid
      |  FROM (SELECT label, pos, avg(v) AS av FROM flat GROUP BY 1, 2) GROUP BY label),
      |scored AS (
      |  SELECT e.label, e.vec_id,
      |    list_sum(list_transform(generate_series(1, len(e.embedding)),
      |      i -> e.embedding[i]::DOUBLE * centroid[i]))
      |    / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
      |     * sqrt(list_sum(list_transform(generate_series(1, len(centroid)), i -> centroid[i] * centroid[i])))) AS cos
      |  FROM embeddings e JOIN cent ON e.label = cent.label),
      |ranked AS (SELECT label, vec_id, cos,
      |  row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rn FROM scored)
      |SELECT label, vec_id AS medoid_id, round(cos, 6) AS cos
      |FROM ranked WHERE rn = 1 ORDER BY label""".stripMargin
}
