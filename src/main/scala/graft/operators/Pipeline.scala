package graft.operators

import graft.Tables
import graft.functions.HashFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation shape, as ONE declarative plan:
  * quality gate → exact-dedup keeper filter → deterministic hash split →
  * per-split stats. This is the composition a production corpus pipeline
  * runs nightly; expressing it as a single plan lets Catalyst share the
  * documents scan across the quality and dedup branches and push the
  * split assignment into the same stage as the filters.
  *
  * Scale notes: two shuffles total (dedup keeper hash-agg, final
  * per-split agg); the quality gate is a pure projection fused into the
  * scan; the split is a stateless hash — reproducible across reruns and
  * engines, which is what makes train/val/test assignment auditable.
  */
object Pipeline {

  private[graft] val QUALITY_T = 0.42 // keeps ~60% of the driver corpus

  /** The quality score over a `text` column (same signals as
    * q_text_quality) — shared by the batch curation plan and the
    * streaming curation composition (`StreamOps.curateStream`). */
  private[graft] def qualityScore: org.apache.spark.sql.Column = {
    val words  = split(col("text"), " ")
    val nWords = size(words).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct  = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double")
    val nStop  = size(expr("filter(split(text, ' '), w -> w IN ('the','a','or','and','of'))")).cast("double")
    round(lit(0.5) * (nStop / nWords) +
      lit(0.3) * (lit(1.0) - punct / nChars) +
      lit(0.2) * least(nWords / 100.0, lit(1.0)), 6)
  }

  /** DuckDB transliteration of [[qualityScore]] (same 6dp round). */
  private[graft] val qualityScoreSql: String =
    """round(0.5 * (len(list_filter(string_split(text, ' '), w -> w IN ('the','a','or','and','of')))::DOUBLE / len(string_split(text, ' ')))
      |        + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
      |        + 0.2 * least(len(string_split(text, ' ')) / 100.0, 1.0), 6)""".stripMargin

  /** Deterministic 80/10/10 split assignment on the doc-id hash —
    * shared with the streaming curation path. */
  private[graft] def splitCol: org.apache.spark.sql.Column = {
    val bucket = h60(col("doc_id").cast("string")) % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  def qCorpusCurate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val words  = split(col("text"), " ")
    val quality = qualityScore
    // exact-dedup keepers: first doc_id per distinct text
    val keepers = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // deterministic split on the doc id hash: 80/10/10
    val split_ = splitCol
    docs.select(col("doc_id"), quality.as("quality"), size(words).cast("long").as("n_words"))
      .filter(col("quality") >= QUALITY_T)
      .join(keepers, Seq("doc_id")) // left-semi shape: keeper ids only
      .select(col("doc_id"), col("quality"), col("n_words"), split_.as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        round(avg("quality"), 6).as("avg_quality"))
      .orderBy("split")
  }

  /** Deterministic stratified sampling — the standard mixture-control op
    * when assembling a training corpus from unevenly-sized sources:
    * within every stratum (here `lang`) keep the documents whose id hash
    * falls under the target rate. Pure projection + one aggregate (no
    * shuffle before the stats), trivially reproducible across reruns,
    * engines, and cluster sizes — which is what makes the sampled corpus
    * auditable. Output verifies the realized rate per stratum.
    */
  private val SAMPLE_PCT = 10

  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keep = h60(concat_ws(":", col("lang"), col("doc_id"))) % 100 < SAMPLE_PCT
    docs.select(col("lang"), keep.cast("long").as("k"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"), sum("k").as("n_sampled"))
      .select(col("lang"), col("n_total"), col("n_sampled"),
        round(col("n_sampled") * 100.0 / col("n_total"), 2).as("pct"))
      .orderBy("lang")
  }

  val oracleSampleStratified: String =
    s"""SELECT lang, count(*) AS n_total,
       |  CAST(sum(CASE WHEN ${h60Sql("lang || ':' || CAST(doc_id AS VARCHAR)")} % 100 < $SAMPLE_PCT THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  round(sum(CASE WHEN ${h60Sql("lang || ':' || CAST(doc_id AS VARCHAR)")} % 100 < $SAMPLE_PCT THEN 1 ELSE 0 END) * 100.0 / count(*), 2) AS pct
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Mixture REBALANCING — the actuator the mixture report feeds:
    * deterministically downsample every stratum (lang) to the size of
    * the smallest, giving an equal-share corpus. Per-stratum rates are
    * derived from the data (counts → min target → basis-point
    * threshold), membership from the same h60 hash rule as
    * [[qSampleStratified]] — reproducible across engines, reruns and
    * cluster sizes. Plan shape: one aggregate for the counts, a window
    * min over the ALREADY-AGGREGATED |strata|-row frame, a broadcast
    * join back onto the corpus, and a final aggregate reporting the
    * realized rate against target.
    */
  def qSampleBalanced(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
      .withColumn("target",
        min("n_total").over(org.apache.spark.sql.expressions.Window.partitionBy()))
    val threshold = floor(col("target") * 10000.0 / col("n_total"))
    val kept = (h60(concat_ws(":", col("lang"), col("doc_id"))) % 10000 < threshold)
      .cast("long")
    docs.join(broadcast(counts), Seq("lang"))
      .select(col("lang"), col("n_total"), col("target"), kept.as("k"))
      .groupBy("lang", "n_total", "target")
      .agg(sum("k").as("n_kept"))
      .select(col("lang"), col("n_total"), col("target"), col("n_kept"),
        round(col("n_kept") * 100.0 / col("n_total"), 2).as("realized_pct"))
      .orderBy("lang")
  }

  val oracleSampleBalanced: String = {
    val h = h60Sql("lang || ':' || CAST(doc_id AS VARCHAR)")
    s"""WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang),
       |t AS (SELECT lang, n_total, (SELECT min(n_total) FROM c) AS target FROM c),
       |k AS (
       |  SELECT d.lang, t.n_total, t.target,
       |    CASE WHEN $h % 10000 < floor(t.target * 10000.0 / t.n_total)
       |         THEN 1 ELSE 0 END AS kept
       |  FROM documents d JOIN t USING (lang))
       |SELECT lang, n_total, target, CAST(sum(kept) AS BIGINT) AS n_kept,
       |  round(sum(kept) * 100.0 / n_total, 2) AS realized_pct
       |FROM k GROUP BY lang, n_total, target ORDER BY lang""".stripMargin
  }

  /** Importance-weighted sampling — acceptance probability PROPORTIONAL
    * to the document's quality score (the corpus-shaping move between
    * a hard quality gate and uniform sampling: high-quality docs are
    * kept at ~their score, low-quality docs survive at a trickle
    * instead of vanishing — preserving distribution coverage while
    * shifting mass toward quality). Membership is the same
    * deterministic h60 basis-point rule as the other samplers
    * (h % 10000 < floor(quality·10000)), so the sample is reproducible
    * across engines/reruns/cluster sizes; pure projection + one
    * map-side-combinable aggregate. The report emits realized vs
    * expected (mean-quality) acceptance per source — both
    * deterministic, both oracle-pinned.
    */
  def qSampleImportance(s: SparkSession, dir: String): DataFrame = {
    val quality = qualityScore
    val kept = (h60(concat_ws(":", lit("imp"), col("doc_id"))) % 10000 <
      floor(quality * 10000)).cast("long")
    Tables.documents(s, dir)
      .select(col("source"), quality.as("quality"), kept.as("k"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"), sum("k").as("n_kept"),
        round(avg("quality") * 100, 2).as("expected_pct"))
      .select(col("source"), col("n_total"), col("n_kept"),
        round(col("n_kept") * 100.0 / col("n_total"), 2).as("realized_pct"),
        col("expected_pct"))
      .orderBy("source")
  }

  val oracleSampleImportance: String = {
    val h = h60Sql("'imp:' || CAST(doc_id AS VARCHAR)")
    s"""WITH q AS (
       |  SELECT source, doc_id,
       |    round(0.5 * (len(list_filter(string_split(text, ' '), w -> w IN ('the','a','or','and','of')))::DOUBLE / len(string_split(text, ' ')))
       |        + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
       |        + 0.2 * least(len(string_split(text, ' ')) / 100.0, 1.0), 6) AS quality
       |  FROM documents),
       |k AS (
       |  SELECT source, quality,
       |    CASE WHEN $h % 10000 < floor(quality * 10000) THEN 1 ELSE 0 END AS kept
       |  FROM q)
       |SELECT source, count(*) AS n_total, CAST(sum(kept) AS BIGINT) AS n_kept,
       |  round(sum(kept) * 100.0 / count(*), 2) AS realized_pct,
       |  round(avg(quality) * 100, 2) AS expected_pct
       |FROM k GROUP BY source ORDER BY source""".stripMargin
  }

  /** Corpus mixture report — what share of documents and tokens each
    * (source, lang) cell contributes. The first question asked of any
    * assembled training mix, and the input to re-weighting decisions
    * (paired with [[qSampleStratified]] as the actuator). One map-side-
    * combinable aggregate over a narrow projection; the global token
    * total is a window over the ALREADY-AGGREGATED frame (|sources|×
    * |langs| rows), so the second pass is over dozens of rows at any
    * corpus size. */
  def qCorpusMixture(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs"), sum("w").as("words"))
    cells
      .withColumn("total", sum("words").over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("source"), col("lang"), col("docs"), col("words"),
        round(col("words") / col("total"), 6).as("word_share"))
      .orderBy("source", "lang")
  }

  val oracleCorpusMixture: String =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS words
      |  FROM documents GROUP BY source, lang)
      |SELECT source, lang, docs, words,
      |  round(words::DOUBLE / (SELECT sum(words) FROM cells), 6) AS word_share
      |FROM cells ORDER BY source, lang""".stripMargin

  /** Temperature-scaled mixture plan (`q_sample_temperature`) — the
    * standard multilingual/multi-source re-balancing rule (mT5-style):
    * sample source i with probability ∝ c_i^(1/τ) instead of its raw
    * token share, boosting low-resource sources. τ = 2, i.e. exponent
    * 0.5 — deliberately, because sqrt is IEEE-correctly-rounded and
    * therefore ENGINE-IDENTICAL, where a libm pow(c, 0.3) need not be
    * (the repo's no-libm-on-compared-values rule). Emits per source:
    * raw token share, temperature share, and the upsampling factor a
    * sampler must apply (temp share / raw share).
    *
    * Scale shape: ONE map-side-combinable fact aggregate to the
    * |sources|-row frame; both normalizing totals are windows over that
    * already-aggregated enum-sized frame. Nothing else touches the
    * corpus.
    */
  def qSampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nw"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("nw").as("tokens"))
      .withColumn("tot", sum("tokens").over(w))
      .withColumn("stot", sum(sqrt(col("tokens"))).over(w))
      .select(col("source"), col("docs"), col("tokens"),
        round(col("tokens") / col("tot"), 6).as("raw_share"),
        round(sqrt(col("tokens")) / col("stot"), 6).as("temp_share"),
        round((sqrt(col("tokens")) / col("stot")) / (col("tokens") / col("tot")), 6)
          .as("upsample"))
      .orderBy("source")
  }

  val oracleSampleTemperature: String =
    """WITH cells AS (
      |  SELECT source, count(*) AS docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT sum(tokens) AS tot, sum(sqrt(tokens)) AS stot FROM cells)
      |SELECT source, docs, tokens,
      |  round(tokens / tot, 6) AS raw_share,
      |  round(sqrt(tokens) / stot, 6) AS temp_share,
      |  round((sqrt(tokens) / stot) / (tokens / tot), 6) AS upsample
      |FROM cells, t ORDER BY source""".stripMargin

  /** Curriculum staging (`q_curriculum`) — order the corpus into K
    * difficulty stages (here K=10 deciles of per-doc token count, the
    * classic length-curriculum) and report each stage's census: doc
    * count, token range, mean quality. The plan a curriculum loader
    * consumes to schedule epochs easy→hard.
    *
    * Scale shape: the decile assignment is [[graft.operators.Relational
    * .ntileExact]] — the bucketed two-phase rank, NO global sort — over
    * the (token_count, doc_id) composite, exercised here at corpus
    * scale as a second call site (q_order_gaps' machinery). One
    * aggregate to the 10-row stage frame follows.
    */
  def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("tok"),
        qualityScore.as("quality"))
    Relational.ntileExact(scored, "tok", "doc_id", 10, "stage")
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"),
        min("tok").cast("long").as("min_tok"),
        max("tok").cast("long").as("max_tok"),
        round(avg("quality"), 6).as("avg_quality"))
      .orderBy("stage")
  }

  val oracleCurriculum: String =
    s"""WITH scored AS (
       |  SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS tok,
       |    $qualityScoreSql AS quality
       |  FROM documents),
       |staged AS (
       |  SELECT tok, quality,
       |    CAST(ntile(10) OVER (ORDER BY tok, doc_id) AS INT) AS stage
       |  FROM scored)
       |SELECT stage, count(*) AS n_docs,
       |  CAST(min(tok) AS BIGINT) AS min_tok,
       |  CAST(max(tok) AS BIGINT) AS max_tok,
       |  round(avg(quality), 6) AS avg_quality
       |FROM staged GROUP BY stage ORDER BY stage""".stripMargin

  /** Distribution-drift monitor (`q_corpus_drift`) — the check a corpus
    * pipeline runs when a new source lands: per-source word-count
    * quantiles against the global distribution, flagged when any
    * quantile deviates relatively by more than DRIFT_T. Quantiles come
    * from [[Relational.percentilesTwoPhase]] (one union puts the global
    * "ALL" stratum through the same two-phase plan — histogram +
    * bracketing-bucket rescan, no whole-group sort), so the monitor
    * inherits the 100 TB-safe exact-quantile shape; the global row
    * joins back as a bounded 1-row broadcast.
    */
  private[graft] val DRIFT_T = 0.1

  def qCorpusDrift(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("double").as("nw"))
    val both = base.unionByName(base.withColumn("source", lit("ALL")))
    val qs = Relational.percentilesTwoPhase(both, "source", "nw",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9))
    val globals = qs.filter(col("source") === "ALL")
      .select(col("p25").as("g25"), col("p50").as("g50"),
        col("p75").as("g75"), col("p90").as("g90"))
    val gap = greatest(
      abs(col("p25") - col("g25")) / col("g25"),
      abs(col("p50") - col("g50")) / col("g50"),
      abs(col("p75") - col("g75")) / col("g75"),
      abs(col("p90") - col("g90")) / col("g90"))
    qs.filter(col("source") =!= "ALL")
      .crossJoin(broadcast(globals))
      .select(col("source"), col("p25"), col("p50"), col("p90"),
        round(gap, 6).as("max_rel_gap"),
        (round(gap, 6) > DRIFT_T).as("drifted"))
      .orderBy("source")
  }

  val oracleCorpusDrift: String =
    s"""WITH nw AS (
       |  SELECT source, len(string_split(text, ' '))::DOUBLE AS nw FROM documents),
       |q AS (
       |  SELECT source,
       |    round(quantile_cont(nw, 0.25), 4) AS p25,
       |    round(quantile_cont(nw, 0.5), 4) AS p50,
       |    round(quantile_cont(nw, 0.75), 4) AS p75,
       |    round(quantile_cont(nw, 0.9), 4) AS p90
       |  FROM nw GROUP BY source),
       |g AS (
       |  SELECT
       |    round(quantile_cont(nw, 0.25), 4) AS g25,
       |    round(quantile_cont(nw, 0.5), 4) AS g50,
       |    round(quantile_cont(nw, 0.75), 4) AS g75,
       |    round(quantile_cont(nw, 0.9), 4) AS g90
       |  FROM nw)
       |SELECT q.source, q.p25, q.p50, q.p90,
       |  round(greatest(abs(q.p25 - g.g25) / g.g25, abs(q.p50 - g.g50) / g.g50,
       |    abs(q.p75 - g.g75) / g.g75, abs(q.p90 - g.g90) / g.g90), 6) AS max_rel_gap,
       |  round(greatest(abs(q.p25 - g.g25) / g.g25, abs(q.p50 - g.g50) / g.g50,
       |    abs(q.p75 - g.g75) / g.g75, abs(q.p90 - g.g90) / g.g90), 6) > $DRIFT_T AS drifted
       |FROM q, g ORDER BY q.source""".stripMargin

  /** Quality-threshold sensitivity sweep (`q_quality_sweep`) — what each
    * candidate cutoff costs: for thresholds 0.0, 0.1, …, 0.9, the
    * surviving doc/token counts and shares under `quality >= t`. The
    * readout a curation pipeline consults BEFORE hard-coding a gate
    * like [[QUALITY_T]] (the corpus's own threshold sits where the
    * token_share knee is).
    *
    * Scale shape: ONE pass — per-doc quality/tokens fold into a ≤10-row
    * decile-bucket aggregate (map-side combinable), and the
    * survivors-at-threshold curve is a suffix cumsum window over that
    * enum frame (bounded global window, whitelisted). Nothing downstream
    * of the single scan grows with the corpus.
    */
  def qQualitySweep(s: SparkSession, dir: String): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val sfx = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val agg = Tables.documents(s, dir)
      .select(least(floor(qualityScore * 10), lit(9)).cast("long").as("bucket"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("d"), sum("tok").as("t"))
    // complete the 10-row threshold grid: an empty decile still yields a
    // row (its survivors are the suffix sum of the buckets above it)
    s.range(10).select(col("id").as("bucket"))
      .join(agg, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("t"), lit(0L)).as("t"))
      .withColumn("n_docs", sum("d").over(sfx))
      .withColumn("n_tokens", sum("t").over(sfx))
      .withColumn("doc_share", round(col("n_docs") / sum("d").over(all), 6))
      .withColumn("token_share", round(col("n_tokens") / sum("t").over(all), 6))
      .select(round(col("bucket") / 10.0, 1).as("threshold"),
        col("n_docs"), col("n_tokens"), col("doc_share"), col("token_share"))
      .orderBy("threshold")
  }

  val oracleQualitySweep: String =
    s"""WITH b AS (
       |  SELECT least(CAST(floor($qualityScoreSql * 10) AS BIGINT), 9) AS bucket,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
       |  FROM documents),
       |agg AS (SELECT bucket, count(*) AS d, sum(tok) AS t FROM b GROUP BY bucket),
       |grid AS (
       |  SELECT g.bucket, coalesce(agg.d, 0) AS d, coalesce(agg.t, 0) AS t
       |  FROM (SELECT unnest(generate_series(0, 9)) AS bucket) g
       |  LEFT JOIN agg ON g.bucket = agg.bucket),
       |c AS (
       |  SELECT bucket,
       |    CAST(sum(d) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs,
       |    CAST(sum(t) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_tokens,
       |    sum(d) OVER () AS td, sum(t) OVER () AS tt
       |  FROM grid)
       |SELECT round(bucket / 10.0, 1) AS threshold, n_docs, n_tokens,
       |  round(n_docs::DOUBLE / td, 6) AS doc_share,
       |  round(n_tokens::DOUBLE / tt, 6) AS token_share
       |FROM c ORDER BY threshold""".stripMargin

  // -------------------------------------------- distributional divergence

  /** Vocabulary size for the JS-divergence gauge: the global top-V terms
    * carry the comparison, everything else folds into one OOV bucket so
    * both distributions stay complete (mass sums to 1) and the per-source
    * frame stays ENUM-SIZED regardless of corpus vocabulary. */
  private[graft] val JS_V = 32

  /** The out-of-vocabulary bucket's term name. (A corpus token literally
    * spelled "<OOV>" would fold into the bucket; the synthetic corpus
    * has none, and at worst the fold only coarsens the comparison.) */
  private[graft] val JS_OOV = "<OOV>"

  /** Trained term-distribution artifact: the corpus's global top-[[JS_V]]
    * term shares plus the [[JS_OOV]] remainder (always present, possibly
    * 0), summing to 1. This is the nightly reference a streaming drift
    * monitor scores against (`StreamOps.driftScore`) — the
    * `trainNoveltyBloom` pattern: train on the batch corpus, broadcast
    * as a literal, score streams statelessly. The collect is of an
    * enum-sized (V+1-row) frame; the corpus-scale work is the same ONE
    * map-side-combinable word count [[jsDivergence]] runs.
    */
  def trainTermDistribution(docs: DataFrame): Map[String, Double] = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val sw = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    val topv = sw.orderBy(col("c").desc, col("word")).limit(JS_V)
      .select(col("word"), lit(1).as("inv"))
    val terms = sw.join(broadcast(topv), Seq("word"), "left")
      .select(when(col("inv") === 1, col("word")).otherwise(lit(JS_OOV)).as("term"),
        col("c"))
      .groupBy("term").agg(sum("c").as("c"))
      .withColumn("q", col("c").cast("double") / sum("c").over(w))
    val m = terms.select("term", "q").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    if (m.contains(JS_OOV)) m else m + (JS_OOV -> 0.0)
  }

  /** Jensen–Shannon divergence of each source's unigram distribution vs
    * the whole corpus (`q_js_divergence`) — the standard symmetric,
    * bounded (≤ ln 2) corpus-comparison readout; where `q_corpus_drift`
    * compares LENGTH quantiles, this compares CONTENT. Distributions are
    * restricted to the global top-[[JS_V]] terms (tie-broken by term) plus
    * an out-of-vocabulary bucket, so both sides are complete probability
    * vectors and a term present globally but absent in a source (p=0)
    * contributes only through the q-side (0·ln 0 := 0). Natural log, the
    * cross-engine `q_text_entropy` precedent.
    *
    * Scale shape: ONE shuffle touches corpus-scale data — the map-side-
    * combinable (source, word) count, the same shape as vocabulary
    * counting. The top-V selection, OOV fold, totals, and the JS sum all
    * run on already-aggregated frames (per-source vocabulary at worst,
    * |sources|×(V+1) at the end); the V-term list is broadcast.
    */
  def qJsDivergence(s: SparkSession, dir: String): DataFrame =
    jsDivergence(Tables.documents(s, dir))

  private[graft] def jsDivergence(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val sw = docs
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
      .cache()
    val topv = sw.groupBy("word").agg(sum("c").as("gc"))
      .orderBy(col("gc").desc, col("word")).limit(JS_V)
      .select(col("word"), lit(1).as("inv"))
    val bySrc = sw.join(broadcast(topv), Seq("word"), "left")
      .select(col("source"),
        when(col("inv") === 1, col("word")).otherwise(lit("<OOV>")).as("term"),
        col("c"))
      .groupBy("source", "term").agg(sum("c").as("c"))
    val glob = bySrc.groupBy("term").agg(sum("c").as("gc"))
      .withColumn("gtot", sum("gc").over(w))
    val srcTot = bySrc.groupBy("source").agg(sum("c").as("stot"))
    val full = srcTot.crossJoin(broadcast(glob))
      .join(bySrc, Seq("source", "term"), "left")
      .withColumn("p", coalesce(col("c"), lit(0L)).cast("double") / col("stot"))
      .withColumn("q", col("gc").cast("double") / col("gtot"))
      .withColumn("mm", (col("p") + col("q")) / 2)
    full.groupBy("source")
      .agg(max("stot").as("n_tokens"),
        round(sum(
          when(col("p") > 0, lit(0.5) * col("p") * log(col("p") / col("mm")))
            .otherwise(lit(0d)) +
          lit(0.5) * col("q") * log(col("q") / col("mm"))), 6).as("js"))
      .orderBy("source")
  }

  val oracleJsDivergence: String =
    s"""WITH sw AS (
       |  SELECT source, word, count(*) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1, 2),
       |topv AS (
       |  SELECT word FROM (SELECT word, sum(c) AS gc FROM sw GROUP BY 1)
       |  ORDER BY gc DESC, word LIMIT $JS_V),
       |bysrc AS (
       |  SELECT source,
       |    CASE WHEN word IN (SELECT word FROM topv) THEN word ELSE '<OOV>' END AS term,
       |    CAST(sum(c) AS BIGINT) AS c
       |  FROM sw GROUP BY 1, 2),
       |gv AS (SELECT term, CAST(sum(c) AS BIGINT) AS gc FROM bysrc GROUP BY 1),
       |gt AS (SELECT CAST(sum(gc) AS BIGINT) AS gtot FROM gv),
       |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS stot FROM bysrc GROUP BY 1),
       |f AS (
       |  SELECT st.source, st.stot,
       |    coalesce(b.c, 0)::DOUBLE / st.stot AS p,
       |    g.gc::DOUBLE / gt.gtot AS q,
       |    (coalesce(b.c, 0)::DOUBLE / st.stot + g.gc::DOUBLE / gt.gtot) / 2 AS mm
       |  FROM st CROSS JOIN gv g CROSS JOIN gt
       |  LEFT JOIN bysrc b ON b.source = st.source AND b.term = g.term)
       |SELECT source, max(stot) AS n_tokens,
       |  round(sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / mm) ELSE 0 END
       |            + 0.5 * q * ln(q / mm)), 6) AS js
       |FROM f GROUP BY source ORDER BY source""".stripMargin

  /** Sequence packing — concatenate-and-chunk assignment of documents to
    * fixed token-budget training contexts: lay the corpus out as one
    * deterministic token stream per (source, shard) and cut every
    * PACK_BUDGET tokens; a document belongs to the context window its
    * first token lands in. This is the GPT-style packing recipe
    * expressed as ONE window cumsum — no sequential driver loop, no
    * state: bin = floor(start_offset / budget) where start_offset is the
    * running token count before the doc.
    *
    * Scale shape: the window partitions on (source, shard) — the shard
    * key caps per-partition window size, so one giant source cannot
    * serialize the cumsum onto one task (production would use
    * shard = h60(doc_id) % K with K sized to ~budget·10⁴ tokens per
    * shard; packing across shards is embarrassingly parallel because
    * context windows are independent units). One shuffle for the window,
    * one map-side-combinable aggregate for the per-bin report.
    */
  private[graft] val PACK_BUDGET = 256L
  private val PACK_SHARDS = 4L

  def qPackSequences(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        pmod(col("doc_id"), lit(PACK_SHARDS)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("source"), col("shard"),
        floor((col("cum") - col("n_tokens")) / lit(PACK_BUDGET).cast("double")).as("bin"),
        col("n_tokens"))
      .groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        round(sum("n_tokens") / lit(PACK_BUDGET.toDouble), 4).as("fill"))
      .orderBy("source", "shard", "bin")
  }

  val oraclePackSequences: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, doc_id % $PACK_SHARDS AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT source, shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t)
       |SELECT source, shard,
       |  CAST(floor((cum - n_tokens) / ${PACK_BUDGET}.0) AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       |  round(sum(n_tokens) / ${PACK_BUDGET}.0, 4) AS fill
       |FROM c GROUP BY source, shard, bin
       |ORDER BY source, shard, bin""".stripMargin

  val oracleCorpusCurate: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    round(0.5 * (len(list_filter(string_split(text, ' '), w -> w IN ('the','a','or','and','of')))::DOUBLE / len(string_split(text, ' ')))
       |        + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
       |        + 0.2 * least(len(string_split(text, ' ')) / 100.0, 1.0), 6) AS quality,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
       |  FROM documents),
       |keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |curated AS (
       |  SELECT q.doc_id, quality, n_words,
       |    CASE WHEN ${h60Sql("CAST(q.doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
       |         WHEN ${h60Sql("CAST(q.doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM q JOIN keepers ON q.doc_id = keepers.doc_id
       |  WHERE quality >= $QUALITY_T)
       |SELECT split, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS total_words,
       |  round(avg(quality), 6) AS avg_quality
       |FROM curated GROUP BY split ORDER BY split""".stripMargin

  // --------------------------------------------------------- fixed budget

  private val FIXED_K = 100

  /** Fixed-BUDGET deterministic sample (`q_sample_fixed`): exactly
    * FIXED_K documents, chosen as the K smallest md5-order keys — the
    * "give me exactly 10k docs for the eval set" op the rate-based
    * samplers can't express (a rate yields a binomial-sized sample).
    * Scale shape: TakeOrderedAndProject — per-partition top-K then a
    * K-sized merge on one reducer; the corpus never globally sorts.
    * Reproducible on any cluster size (hash order is data-intrinsic).
    */
  def qSampleFixed(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        h60(concat(lit("fix:"), col("doc_id").cast("string"))).as("hk"))
      .orderBy("hk", "doc_id")
      .limit(FIXED_K)

  val oracleSampleFixed: String =
    s"""SELECT doc_id, source, lang,
       | ${h60Sql("'fix:' || doc_id")} AS hk
       |FROM documents
       |ORDER BY hk, doc_id LIMIT $FIXED_K""".stripMargin

  // --------------------------------------------------- per-stratum reservoir

  private[graft] val RES_K = 10

  /** Exact-k per-STRATUM deterministic reservoir (`q_sample_reservoir`):
    * precisely RES_K documents from every source, the k smallest
    * hash-order keys within the stratum — [[qSampleFixed]]'s exact-count
    * guarantee delivered per group. Rate-based stratified sampling
    * yields binomial counts; a per-group sort-and-rank window sorts
    * whole strata in single tasks. This uses the O(k)
    * map-side-combinable [[graft.functions.MinKPairAggregator]] (the
    * ANN gauges' ranker): k pairs of state per stratum per partial, no
    * task ever holds a stratum. The hash key is folded to 50 bits so
    * its double-encoded aggregator form stays EXACT (2^50 < 2^53; the
    * raw 60-bit key would round in double and could disagree with the
    * oracle's exact bigint ordering near ulp-adjacent keys).
    */
  def qSampleReservoir(s: SparkSession, dir: String): DataFrame = {
    val minK = udaf(new graft.functions.MinKPairAggregator(RES_K))
    Tables.documents(s, dir)
      .select(col("source"),
        (h60(concat(lit("res:"), col("doc_id").cast("string")))
          % lit(1125899906842624L)).as("hk"), // 2^50
        col("doc_id"))
      .groupBy("source")
      .agg(minK(col("hk").cast("double"), col("doc_id")).as("take"),
        count(lit(1)).as("n_source"))
      .select(col("source"), col("n_source"),
        posexplode(arrays_zip(col("take.ds"), col("take.ids")))
          .as(Seq("pos", "z")))
      .select(col("source"), col("n_source"),
        (col("pos") + 1).cast("int").as("rank"),
        col("z.ids").as("doc_id"), col("z.ds").cast("long").as("hk"))
      .orderBy("source", "rank")
  }

  val oracleSampleReservoir: String =
    s"""WITH keyed AS (
       |  SELECT source, doc_id,
       |    ${h60Sql("'res:' || doc_id")} % 1125899906842624 AS hk
       |  FROM documents),
       |ranked AS (
       |  SELECT source, doc_id, hk,
       |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rank,
       |    count(*) OVER (PARTITION BY source) AS n_source
       |  FROM keyed)
       |SELECT source, n_source, CAST(rank AS INT) AS rank, doc_id, hk
       |FROM ranked WHERE rank <= $RES_K
       |ORDER BY source, rank""".stripMargin

  // ------------------------------------------------- overlapping chunks

  /** Chunk window (tokens) and stride; overlap = CHUNK_W - CHUNK_STRIDE. */
  private[graft] val CHUNK_W      = 32
  private[graft] val CHUNK_STRIDE = 24

  /** Sliding-window document chunking (`q_chunk_overlap`): cut every
    * document into CHUNK_W-token windows advancing by CHUNK_STRIDE
    * tokens (8-token overlap) — the RAG/pretraining chunker that keeps
    * context across cut points (the HF `return_overflowing_tokens`
    * recipe). Emits the APPLIED chunk table: one row per chunk with its
    * token offsets and an md5 of the chunk text, so the content of
    * every chunk — not just counts — is oracle-verified.
    *
    * Scale shape: scan → explode → project, ZERO shuffles (the explain
    * has no Exchange) — chunking is embarrassingly parallel and the
    * fan-out is ~n_tokens/stride per doc. The chunk count is closed
    * form (1 + ceil(max(n-W,0)/stride), integer arithmetic both
    * engines), so no per-doc loop exists anywhere.
    */
  def qChunkOverlap(s: SparkSession, dir: String): DataFrame = {
    val (w, st) = (CHUNK_W, CHUNK_STRIDE)
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        (lit(1) + expr(s"(greatest(size(toks) - $w, 0) + $st - 1) div $st"))
          .cast("int").as("nc"))
      .select(col("doc_id"),
        explode(expr("sequence(0, nc - 1)")).as("chunk_id"), col("toks"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * st).as("tok_start"),
        expr(s"slice(toks, chunk_id * $st + 1, $w)").as("sl"))
      .select(col("doc_id"), col("chunk_id"), col("tok_start"),
        size(col("sl")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("sl"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  val oracleChunkOverlap: String = {
    val (w, st) = (CHUNK_W, CHUNK_STRIDE)
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    1 + (greatest(len(string_split(text, ' ')) - $w, 0) + $st - 1) // $st AS nc
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, unnest(generate_series(0, nc - 1)) AS chunk_id, toks
       |  FROM t)
       |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |  CAST(chunk_id * $st AS INT) AS tok_start,
       |  CAST(len(list_slice(toks, chunk_id * $st + 1, chunk_id * $st + $w)) AS BIGINT) AS n_tok,
       |  md5(array_to_string(list_slice(toks, chunk_id * $st + 1, chunk_id * $st + $w), ' ')) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ------------------------------------------------------------------- PSI

  /** Zero-share clamp for PSI terms — the standard ε substitution that
    * keeps ln(p/q) finite when a source has no docs in a bin. */
  private[graft] val PSI_EPS = 1e-4
  private[graft] val PSI_T   = 0.1

  /** Population stability index per source (`q_psi`) — the third rung of
    * the drift family: [[qCorpusDrift]] reads quantile GAPS,
    * [[qJsDivergence]] the TERM distribution; PSI is the industry-standard
    * binned score over a numeric feature (doc length in words): global
    * deciles define 10 bins, and each source's bin shares p_i compare to
    * the corpus's q_i via Σ (p_i − q_i)·ln(p_i/q_i), zero shares clamped
    * at [[PSI_EPS]]. <0.1 stable, >0.25 action.
    *
    * Scale shape: decile boundaries come from
    * [[graft.operators.Relational.percentilesTwoPhase]] (bucketed
    * two-phase rank, no global sort) and broadcast as ONE row; binning is
    * a scan-side projection; everything downstream is the |sources|×10
    * grid built exactly like [[jsDivergence]]'s full frame (zero-doc bins
    * are data, not dropped rows).
    */
  def qPsi(s: SparkSession, dir: String): DataFrame = {
    val nw = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("nw"))
    val cuts = (1 to 9).map(i => s"d$i" -> i / 10.0)
    val bounds = Relational.percentilesTwoPhase(
      nw.withColumn("g", lit("ALL")), "g", "nw", cuts).drop("g")
    val binned = nw.crossJoin(broadcast(bounds))
      .withColumn("bin",
        cuts.map { case (n, _) => (col("nw") > col(n)).cast("int") }
          .reduce(_ + _))
      .select("source", "bin")
    val srcBin = binned.groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val srcTot = srcBin.groupBy("source").agg(sum("c").as("stot"))
    val globBin = srcBin.groupBy("bin").agg(sum("c").as("gc"))
    val globTot = globBin.agg(sum("gc").as("gtot"))
    val grid = srcTot
      .crossJoin(broadcast(globBin.crossJoin(globTot)))
      .join(srcBin, Seq("source", "bin"), "left")
      .withColumn("p",
        greatest(coalesce(col("c"), lit(0L)).cast("double") / col("stot"),
          lit(PSI_EPS)))
      .withColumn("q",
        greatest(col("gc").cast("double") / col("gtot"), lit(PSI_EPS)))
    grid.groupBy("source")
      .agg(max("stot").as("n_docs"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"))
      .withColumn("drifted", col("psi") > PSI_T)
      .orderBy("source")
  }

  val oraclePsi: String = {
    val qsSql = (1 to 9)
      .map(i => s"round(quantile_cont(nw, 0.${i}), 4) AS d$i").mkString(", ")
    val binSql = (1 to 9)
      .map(i => s"CASE WHEN nw > b.d$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH nw AS (
       |  SELECT source, len(string_split(text, ' '))::DOUBLE AS nw FROM documents),
       |b AS (SELECT $qsSql FROM nw),
       |binned AS (SELECT source, $binSql AS bin FROM nw, b),
       |sb AS (SELECT source, bin, count(*) AS c FROM binned GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS stot FROM sb GROUP BY 1),
       |gb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS gc FROM sb GROUP BY 1),
       |gt AS (SELECT CAST(sum(gc) AS BIGINT) AS gtot FROM gb),
       |grid AS (
       |  SELECT st.source, st.stot,
       |    greatest(coalesce(sb.c, 0)::DOUBLE / st.stot, $PSI_EPS) AS p,
       |    greatest(gb.gc::DOUBLE / gt.gtot, $PSI_EPS) AS q
       |  FROM st CROSS JOIN gb CROSS JOIN gt
       |  LEFT JOIN sb ON sb.source = st.source AND sb.bin = gb.bin)
       |SELECT source, max(stot) AS n_docs,
       |  round(sum((p - q) * ln(p / q)), 6) AS psi,
       |  round(sum((p - q) * ln(p / q)), 6) > $PSI_T AS drifted
       |FROM grid GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------------- trained quality classifier

  /** GD hyperparameters for the TEXT-feature quality probe — same
    * protocol as the embedding probe (`Similarity.probeWeights`):
    * full-batch logistic steps, weights rounded 6dp after every step so
    * cross-engine libm drift cannot accumulate through the recursion. */
  private[graft] val QP_ITERS = 3
  private val QP_LR = "4.0" // literal text, shared by both plans

  /** Left-to-right double fold, matching the oracle's
    * list_sum(list_transform(...)) order — the DotProduct codegen
    * kernel, not an interpreted HOF (scored once per document). */
  private def qpDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(graft.functions.DotProduct(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))

  /** Bias-extended text feature vector, every derived ratio rounded 6dp
    * BEFORE training so both engines feed the GD identical doubles:
    * [1, stopword ratio, punctuation ratio, length signal, mean-word-
    * length signal] — the [[qualityScore]] heuristic's raw inputs,
    * handed to a trained model instead of fixed weights. */
  private def qpX: org.apache.spark.sql.Column = {
    val words   = split(col("text"), " ")
    val nWords  = size(words).cast("double")
    val nChars  = length(col("text")).cast("double")
    val noSpace = length(regexp_replace(col("text"), " ", "")).cast("double")
    val punct   = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double")
    val nStop   = size(expr("filter(split(text, ' '), w -> w IN ('the','a','or','and','of'))")).cast("double")
    array(lit(1.0),
      round(nStop / nWords, 6),
      round(punct / nChars, 6),
      round(least(nWords / 100.0, lit(1.0)), 6),
      round(noSpace / nWords / 10.0, 6))
  }

  /** DuckDB transliteration of [[qpX]] (same 6dp rounds, same order). */
  private val qpXSql: String =
    """list_prepend(1.0, [
      |   round(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','or','and','of')))::DOUBLE / len(string_split(text, ' ')), 6),
      |   round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text), 6),
      |   round(least(len(string_split(text, ' ')) / 100.0, 1.0), 6),
      |   round(length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) / 10.0, 6)])""".stripMargin

  /** Trained text-quality weights: [[QP_ITERS]] full-batch logistic GD
    * steps over ([[qpX]], y = lang=='en') — the weak-supervision setup
    * every corpus quality filter uses (positives from a trusted slice,
    * here the language the stopword lexicon is for, so the signal is
    * genuinely learnable). One posexplode aggregate per step; the
    * feature frame is computed once and cached across the steps. */
  private[graft] def qpWeights(docs: DataFrame): DataFrame = {
    val feat = docs.select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"), qpX.as("x"))
      .cache()
    var w = docs.sparkSession.range(1).select(
      transform(sequence(lit(1), lit(5)), _ => lit(0.0)).as("w"))
    for (_ <- 1 to QP_ITERS) {
      val d = lit(1.0) / (lit(1.0) + exp(-qpDot(col("x"), col("w")))) - col("y")
      w = feat.crossJoin(broadcast(w))
        .select(d.as("d"), col("x"), col("w"))
        .select(col("d"), posexplode(col("x")).as(Seq("pos", "v")), col("w"))
        .groupBy("pos")
        .agg(round(
          element_at(first("w"), col("pos") + 1) - expr(QP_LR) * avg(col("d") * col("v")),
          6).as("wj"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("wj")))),
          x => x.getField("wj")).as("w"))
    }
    w
  }

  /** In-engine trained quality classifier (`q_quality_probe`) — the
    * fastText-style curation filter: train a logistic probe on cheap
    * text features against a weak label, score every document, report
    * per-language doc counts, mean score and predicted positives. The
    * mean is an integer-micros sum of the 6dp-rounded scores (exact,
    * order-free — the cent-sum discipline), never a float partial agg.
    *
    * Scale shape: training is [[QP_ITERS]] map-side-combinable
    * aggregates over a cached 6-double feature frame; scoring is one
    * codegen projection against the broadcast 1-row weight frame; the
    * output is enum-sized (one row per language).
    */
  def qQualityProbe(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = qpWeights(docs).localCheckpoint()
    docs.select(col("lang"), qpX.as("x"))
      .crossJoin(broadcast(w))
      .select(col("lang"),
        round(lit(1.0) / (lit(1.0) + exp(-qpDot(col("x"), col("w")))), 6).as("sc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(round(col("sc") * 1e6).cast("long")).as("micro"),
        sum((col("sc") >= 0.5).cast("long")).as("n_pos"))
      .select(col("lang"), col("n_docs"),
        round(col("micro") / 1e6 / col("n_docs"), 6).as("mean_score"),
        col("n_pos"))
      .orderBy("lang")
  }

  /** DuckDB replay of the probe training + scoring: `eq` (features +
    * label), `wq0` (zero weights), `wq1..wqN` GD steps — the
    * probeTrainSql shape with the text feature vector. */
  val oracleQualityProbe: String = {
    val dotXW = "list_sum(list_transform(generate_series(1, len(x)), i -> x[i] * w[i]))"
    def stepCte(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT list(wj ORDER BY pos) AS w FROM (
         |    SELECT pos, round(any_value(w)[pos] - $QP_LR * avg(d * v), 6) AS wj FROM (
         |      SELECT 1.0 / (1.0 + exp(-($dotXW))) - y AS d,
         |             unnest(x) AS v, unnest(generate_series(1, len(x))) AS pos, w
         |      FROM eq, $prev)
         |    GROUP BY pos))""".stripMargin
    val steps = (1 to QP_ITERS).map(i =>
      stepCte(if (i == 1) "wq0" else s"wq${i - 1}", s"wq$i")).mkString(",\n")
    s"""WITH eq AS (
       |  SELECT lang, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |         $qpXSql AS x
       |  FROM documents),
       |wq0 AS (SELECT list_transform(generate_series(1, 5), i -> 0.0) AS w),
       |$steps,
       |scored AS (
       |  SELECT lang, round(1.0 / (1.0 + exp(-($dotXW))), 6) AS sc
       |  FROM eq, wq$QP_ITERS)
       |SELECT lang, count(*) AS n_docs,
       |  round(CAST(sum(CAST(round(sc * 1000000) AS BIGINT)) AS BIGINT)
       |        / 1000000.0 / count(*), 6) AS mean_score,
       |  CAST(sum(CASE WHEN sc >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
       |FROM scored GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ------------------------------------------------------ filter ablation
  /** Quality-rule ablation: for each curation filter, how many docs it
    * flags and — the number that actually matters when tuning a filter
    * stack — how many it flags ALONE (its marginal contribution: drop
    * the rule and exactly n_only docs come back). `q_quality_sweep`
    * varies ONE threshold; this attributes the drop set across RULES,
    * which is how a curation reviewer decides what to relax.
    *
    * Rules (calibrated to fire distinctly on the driver corpus):
    * short (< 20 words), low_stop (stopword ratio < 2%), low_ttr
    * (type-token ratio < 0.33 — templated/repetitive), long_words
    * (mean word length > 4.75 — code/gibberish proxy).
    *
    * All counts are exact integers; rates are one division at the 6dp
    * edge. Scale: ONE corpus pass reduces to a 1-row flag-sum frame
    * (map-side combinable), localCheckpointed so the four per-rule
    * output branches read one cached row instead of re-planning four
    * corpus scans (the q_corr_matrix lesson); output is |rules| rows.
    */
  def qFilterAblation(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nw = size(words).cast("double")
    val nStop = size(expr(
      "filter(split(text, ' '), w -> w IN ('the','a','or','and','of'))")).cast("double")
    val ttr = size(array_distinct(words)).cast("double") / nw
    val mwl = length(regexp_replace(col("text"), " ", "")).cast("double") / nw
    val flags = Tables.documents(s, dir).select(
      (nw < 20).cast("long").as("f1"),
      (nStop / nw < 0.02).cast("long").as("f2"),
      (ttr < 0.33).cast("long").as("f3"),
      (mwl > 4.75).cast("long").as("f4"))
    def only(i: Int): org.apache.spark.sql.Column = {
      val others = (1 to 4).filter(_ != i).map(j => col(s"f$j")).reduce(_ + _)
      sum(when(col(s"f$i") === 1 && others === 0, 1L).otherwise(0L))
    }
    val agg = flags.agg(
      count(lit(1)).as("n_docs"),
      sum("f1").as("n1"), sum("f2").as("n2"),
      sum("f3").as("n3"), sum("f4").as("n4"),
      only(1).as("o1"), only(2).as("o2"), only(3).as("o3"), only(4).as("o4"),
      sum(when(col("f1") + col("f2") + col("f3") + col("f4") > 0, 1L)
        .otherwise(0L)).as("n_any"))
      .localCheckpoint()
    val rules = Seq("short" -> 1, "low_stop" -> 2, "low_ttr" -> 3, "long_words" -> 4)
    rules.map { case (name, i) =>
      agg.select(lit(name).as("rule"),
        col(s"n$i").as("n_flagged"), col(s"o$i").as("n_only"),
        round(col(s"n$i") / col("n_docs").cast("double"), 6).as("flag_rate"),
        round(col(s"o$i") / col("n_docs").cast("double"), 6).as("only_rate"),
        col("n_any"))
    }.reduce(_.union(_)).orderBy("rule")
  }

  val oracleFilterAblation: String = {
    val f = Seq(
      "CASE WHEN len(string_split(text,' ')) < 20 THEN 1 ELSE 0 END",
      "CASE WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a','or','and','of')))::DOUBLE / len(string_split(text,' ')) < 0.02 THEN 1 ELSE 0 END",
      "CASE WHEN len(list_distinct(string_split(text,' ')))::DOUBLE / len(string_split(text,' ')) < 0.33 THEN 1 ELSE 0 END",
      "CASE WHEN length(replace(text,' ',''))::DOUBLE / len(string_split(text,' ')) > 4.75 THEN 1 ELSE 0 END")
    def only(i: Int): String = {
      val others = (1 to 4).filter(_ != i).map(j => s"f$j").mkString(" + ")
      s"CAST(sum(CASE WHEN f$i = 1 AND $others = 0 THEN 1 ELSE 0 END) AS BIGINT)"
    }
    val rules = Seq("short" -> 1, "low_stop" -> 2, "low_ttr" -> 3, "long_words" -> 4)
    val branches = rules.map { case (name, i) =>
      s"""SELECT '$name' AS rule, n$i AS n_flagged, o$i AS n_only,
         |  round(n$i / CAST(n_docs AS DOUBLE), 6) AS flag_rate,
         |  round(o$i / CAST(n_docs AS DOUBLE), 6) AS only_rate, n_any
         |FROM a""".stripMargin
    }
    s"""WITH fl AS (SELECT ${f.zipWithIndex.map { case (e, i) => s"$e AS f${i + 1}" }.mkString(", ")}
       |  FROM documents),
       |a AS (SELECT count(*) AS n_docs,
       |  ${(1 to 4).map(i => s"CAST(sum(f$i) AS BIGINT) AS n$i").mkString(", ")},
       |  ${(1 to 4).map(i => s"${only(i)} AS o$i").mkString(", ")},
       |  CAST(sum(CASE WHEN f1 + f2 + f3 + f4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_any
       |  FROM fl)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY rule""".stripMargin
  }

  // ---------------------------------------------------------- SRM check
  /** Expected split shares for the 80/10/10 assignment — doubles with
    * exact binary representations are NOT guaranteed here (0.8/0.1
    * aren't dyadic), but both engines parse the identical literal to
    * the identical double, which is all the hash compare needs. */
  private[graft] val SRM_SHARES = Seq("train" -> "0.8", "val" -> "0.1", "test" -> "0.1")
  /** χ² critical value at df=2, α=0.001 — the guardrail threshold the
    * experimentation literature recommends for SRM gates (false SRM
    * alarms at 5% would page every few runs at fleet scale). */
  private[graft] val SRM_CRIT = "13.8155"

  /** Sample-ratio-mismatch audit of the deterministic train/val/test
    * split: observed vs expected counts, per-split χ² contribution, and
    * the df=2 verdict — the FIRST check an experimentation/data
    * platform runs before trusting anything downstream of an
    * assignment (a biased split silently invalidates `q_ab_welch` and
    * `q_cuped`, which assume it). Counts are exact integers; E = N·p
    * and the (O−E)²/E terms are mirrored double expressions; the total
    * and verdict ride a second 1-row crossJoin over the 3-row frame.
    *
    * Scale: one enum-keyed count aggregate (map-side combinable), then
    * arithmetic on ≤3-row frames — nothing downstream grows with the
    * corpus.
    */
  def qSrmCheck(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.documents(s, dir)
      .select(splitCol.as("split"))
      .groupBy("split").agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum("n_obs").as("n_total"))
    // bare 0.8/0.1 literals are DECIMAL in both engines (the recursive-CTE
    // anchor-typing lesson) — cast the share to DOUBLE before any use
    val expShare = SRM_SHARES.tail.foldLeft(
      when(col("split") === SRM_SHARES.head._1, expr(SRM_SHARES.head._2))) {
      case (c, (k, v)) => c.when(col("split") === k, expr(v))
    }.cast("double")
    val terms = obs.crossJoin(broadcast(tot))
      .select(col("split"), col("n_obs"), col("n_total"),
        expShare.as("p"),
        (col("n_total").cast("double") * expShare).as("expected"))
      .select(col("split"), col("n_obs"),
        round(col("n_obs") / col("n_total").cast("double"), 6).as("obs_share"),
        col("p").as("exp_share"),
        round((col("n_obs") - col("expected")) * (col("n_obs") - col("expected"))
          / col("expected"), 6).as("chi2_term"))
    val total = terms.agg(round(sum("chi2_term"), 6).as("chi2_total"))
    terms.crossJoin(broadcast(total))
      .select(col("split"), col("n_obs"), col("obs_share"), col("exp_share"),
        col("chi2_term"), col("chi2_total"),
        (col("chi2_total") > expr(SRM_CRIT)).cast("long").as("srm_flag"))
      .orderBy("split")
  }

  val oracleSrmCheck: String = {
    val h = graft.functions.HashFns.h60Sql("CAST(doc_id AS VARCHAR)")
    val shareCase = SRM_SHARES.map { case (k, v) =>
      s"WHEN split = '$k' THEN $v"
    }.mkString("CAST(CASE ", " ", " END AS DOUBLE)")
    s"""WITH assigned AS (
       |  SELECT CASE WHEN $h % 100 < 80 THEN 'train'
       |              WHEN $h % 100 < 90 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |obs AS (SELECT split, count(*) AS n_obs FROM assigned GROUP BY split),
       |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs),
       |terms AS (
       |  SELECT split, n_obs,
       |    round(n_obs / CAST(n_total AS DOUBLE), 6) AS obs_share,
       |    $shareCase AS exp_share,
       |    round((n_obs - CAST(n_total AS DOUBLE) * ($shareCase))
       |        * (n_obs - CAST(n_total AS DOUBLE) * ($shareCase))
       |        / (CAST(n_total AS DOUBLE) * ($shareCase)), 6) AS chi2_term
       |  FROM obs, t),
       |ct AS (SELECT round(sum(chi2_term), 6) AS chi2_total FROM terms)
       |SELECT split, n_obs, obs_share, exp_share, chi2_term, chi2_total,
       |  CAST(CASE WHEN chi2_total > $SRM_CRIT THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
       |FROM terms, ct ORDER BY split""".stripMargin
  }

  // ------------------------------------------------- dataset card
  /** Per-source dataset card (`q_dataset_card`) — the one-page corpus
    * profile a release ships next to the data: volume (docs, tokens,
    * chars), exact-duplicate ratio, mean quality score, English share,
    * and language-mix entropy. One documents scan feeds two enum-keyed
    * aggregates (the per-source profile and the language-mix cells);
    * they join back on the enum source key.
    *
    * Determinism: the per-doc quality score (the [[TextAnalysis
    * .qTextQuality]] formula) is rounded to integer MICROS before the
    * source sum, so the mean folds exactly; the language entropy folds
    * in sorted language order on both engines (the sorted-fold
    * discipline). Exact-dup ratio uses count(DISTINCT md5(text)) — the
    * same digest the dedup family collapses on.
    */
  def qDatasetCard(s: SparkSession, dir: String): DataFrame = {
    val stopList = TextAnalysis.STOPWORDS.map(w => s"'$w'").mkString("(", ",", ")")
    val words  = split(col("text"), " ")
    val nWords = size(words).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct  = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double")
    val nStop = size(expr(s"filter(split(text, ' '), w -> w IN $stopList)")).cast("double")
    val quality = lit(0.5) * (nStop / nWords) +
      lit(0.3) * (lit(1.0) - punct / nChars) +
      lit(0.2) * least(nWords / 100.0, lit(1.0))
    val per = Tables.documents(s, dir).select(
      col("source"), col("lang"),
      size(words).cast("long").as("toks"),
      col("n_chars"),
      md5(col("text")).as("h"),
      round(quality * 1e6).cast("long").as("q_micros"))
    val bySource = per.groupBy("source").agg(
      count(lit(1)).as("docs"),
      countDistinct(col("h")).as("distinct_texts"),
      sum("toks").as("tokens"),
      sum("n_chars").as("chars"),
      sum("q_micros").as("q_sum"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en_docs"))
    val langEnt = per.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("nl"),
        collect_list(struct(col("lang"), col("c"))).as("parts"))
      .select(col("source"),
        aggregate(array_sort(col("parts")), lit(0.0d),
          (acc, e) => acc
            - (e.getField("c").cast("double") / col("nl").cast("double"))
              * log(e.getField("c").cast("double") / col("nl").cast("double")))
          .as("lang_ent"))
    def d(c: String) = col(c).cast("double")
    bySource.join(langEnt, Seq("source"))
      .select(col("source"), col("docs"), col("distinct_texts"),
        round(lit(1.0) - d("distinct_texts") / d("docs"), 6).as("dup_ratio"),
        col("tokens"), col("chars"),
        round(d("tokens") / d("docs"), 4).as("avg_tokens"),
        round(d("q_sum") / d("docs") / 1000000.0, 6).as("avg_quality"),
        round(d("en_docs") / d("docs"), 4).as("en_share"),
        round(col("lang_ent"), 6).as("lang_entropy"))
      .orderBy("source")
  }

  val oracleDatasetCard: String = {
    val stopList = TextAnalysis.STOPWORDS.map(w => s"'$w'").mkString("(", ",", ")")
    s"""WITH per AS (
       |  SELECT source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |    n_chars, md5(text) AS h,
       |    CAST(round((0.5 * (len(list_filter(string_split(text, ' '), w -> w IN $stopList))::DOUBLE / len(string_split(text, ' ')))
       |      + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
       |      + 0.2 * least(len(string_split(text, ' ')) / 100.0, 1.0)) * 1e6) AS BIGINT) AS q_micros
       |  FROM documents),
       |by_source AS (
       |  SELECT source, count(*) AS docs, count(DISTINCT h) AS distinct_texts,
       |    CAST(sum(toks) AS BIGINT) AS tokens, CAST(sum(n_chars) AS BIGINT) AS chars,
       |    CAST(sum(q_micros) AS BIGINT) AS q_sum,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS en_docs
       |  FROM per GROUP BY source),
       |cells AS (SELECT source, lang, count(*) AS c FROM per GROUP BY source, lang),
       |c2 AS (SELECT source, lang, c,
       |  sum(c) OVER (PARTITION BY source) AS nl FROM cells),
       |ent AS (SELECT source,
       |  list_reduce(list_prepend(0.0::DOUBLE,
       |    list(-(CAST(c AS DOUBLE) / CAST(nl AS DOUBLE))
       |         * ln(CAST(c AS DOUBLE) / CAST(nl AS DOUBLE)) ORDER BY lang)),
       |    (acc, x) -> acc + x) AS lang_ent
       |  FROM c2 GROUP BY source)
       |SELECT b.source, CAST(b.docs AS BIGINT) AS docs,
       |  CAST(b.distinct_texts AS BIGINT) AS distinct_texts,
       |  round(1.0 - CAST(b.distinct_texts AS DOUBLE) / CAST(b.docs AS DOUBLE), 6) AS dup_ratio,
       |  b.tokens, b.chars,
       |  round(CAST(b.tokens AS DOUBLE) / CAST(b.docs AS DOUBLE), 4) AS avg_tokens,
       |  round(CAST(b.q_sum AS DOUBLE) / CAST(b.docs AS DOUBLE) / 1000000.0, 6) AS avg_quality,
       |  round(CAST(b.en_docs AS DOUBLE) / CAST(b.docs AS DOUBLE), 4) AS en_share,
       |  round(ent.lang_ent, 6) AS lang_entropy
       |FROM by_source b JOIN ent ON b.source = ent.source
       |ORDER BY b.source""".stripMargin
  }

  // ------------------------------------------------- weighted sampling
  /** Weighted sample size for [[qSampleWeighted]]. */
  private[graft] val WS_K = 20

  /** Weighted sampling WITHOUT replacement (`q_sample_weighted`) —
    * Ohlsson's Sequential Poisson sampling: priority = u/w (u the
    * deterministic h60 hash folded to 40 bits, w = document length),
    * keep the k smallest priorities. Longer documents draw smaller
    * priorities, so inclusion is ∝ weight — the curation move when
    * "pick k docs uniformly" over-represents boilerplate stubs.
    *
    * Determinism across engines: the priority is ONE IEEE division of
    * two exact integers — correctly rounded on both sides, unlike the
    * u^(1/w) exponential keys of Efraimidis–Spirakis whose libm
    * log/pow may differ at 1 ulp and FLIP a rank (the project ban on
    * ranking over libm outputs). Scale: the O(k) MinKPair aggregate —
    * map-side combinable, no sort, no window.
    */
  def qSampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val minK = udaf(new graft.functions.MinKPairAggregator(WS_K))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        ((h60(concat(lit("ws:"), col("doc_id").cast("string")))
          % lit(1099511627776L)).cast("double") / col("n_chars").cast("double"))
          .as("priority"))
      .agg(minK(col("priority"), col("doc_id")).as("take"),
        count(lit(1)).as("n_corpus"))
      .select(col("n_corpus"),
        posexplode(arrays_zip(col("take.ds"), col("take.ids")))
          .as(Seq("pos", "z")))
      .select(col("n_corpus"),
        (col("pos") + 1).cast("int").as("rank"),
        col("z.ids").as("doc_id"),
        // unrounded: the doubles are the SAME ieee division both
        // engines; a 6dp round on a ~1e8 value re-enters the q_anova
        // 1-ulp cross-engine rounding hazard
        col("z.ds").as("priority"))
      .orderBy("rank")
  }

  val oracleSampleWeighted: String =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    CAST(${graft.functions.HashFns.h60Sql("'ws:' || doc_id")} % 1099511627776 AS DOUBLE)
       |      / CAST(n_chars AS DOUBLE) AS priority
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, priority,
       |    row_number() OVER (ORDER BY priority, doc_id) AS rank,
       |    count(*) OVER () AS n_corpus
       |  FROM keyed)
       |SELECT CAST(n_corpus AS BIGINT) AS n_corpus, CAST(rank AS INT) AS rank,
       |  doc_id, priority
       |FROM ranked WHERE rank <= $WS_K
       |ORDER BY rank""".stripMargin
}
