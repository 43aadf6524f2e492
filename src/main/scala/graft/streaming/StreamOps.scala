package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.7), built for batch/stream
  * parity: `windowCounts` is ONE transform applied verbatim to the static
  * `events` table (in `EventOps.qEventsWindowAgg`, oracle-checked) and to
  * a `readStream` source (spec-checked via MemoryStream) — Spark treats
  * `withWatermark` as a no-op on batch, so the same code path serves both.
  *
  * Scale notes: the windowed aggregate is an ordinary hash-aggregate over
  * (window, event_type) — partial aggregation applies, state store size is
  * O(open windows × types), bounded by the watermark horizon. The
  * sessionizer keys state by user_id, so state is O(active users in the
  * gap window); timeouts evict closed sessions — nothing grows with total
  * stream length.
  */
object StreamOps {

  /** Typed event for the streaming surface (mirrors the events table). */
  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

  /** One emitted session. */
  case class SessionOut(
      user_id: Long, sess_id: Long, n_events: Long,
      duration_sec: Double, sum_value: Double)

  case class SessState(
      sessId: Long, startSec: Double, lastSec: Double, nEv: Long, sum: Double)

  /** Tumbling 1-hour counts/sums per event type. Works identically on a
    * static DataFrame (watermark is a no-op) and a streaming one (append
    * mode, windows close `delay` after their end passes the watermark).
    */
  def windowCounts(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream attribution join: each purchase matched to the same
    * user's views within the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * evict join state once the watermark passes — state is O(events per
    * horizon) regardless of stream length. The streaming twin of
    * `EventOps.qAsofJoin`'s batch attribution (inner, all views in range,
    * rather than latest-only).
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    val v = views.withWatermark("ts", horizon).alias("v")
    val p = purchases.withWatermark("ts", horizon).alias("p")
    p.join(v, expr(
        s"""v.user_id = p.user_id AND
           |v.ts <= p.ts AND v.ts >= p.ts - INTERVAL $horizon""".stripMargin))
      .select(col("p.event_id").as("purchase_id"), col("p.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("p.ts").as("purchase_ts"), col("v.ts").as("view_ts"))
  }

  /** LEFT OUTER stream-stream attribution: like [[attributionJoin]] but a
    * purchase with NO view in its preceding horizon still emits — with a
    * null view side — once the watermark passes the end of its match
    * window (Spark holds the row in state until no future view can match,
    * then releases it null-padded). The "unattributed conversions" feed a
    * marketing pipeline needs alongside the matched ones; same bounded
    * state story as the inner join.
    */
  def attributionJoinOuter(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    val v = views.withWatermark("ts", horizon).alias("v")
    val p = purchases.withWatermark("ts", horizon).alias("p")
    p.join(v, expr(
        s"""v.user_id = p.user_id AND
           |v.ts <= p.ts AND v.ts >= p.ts - INTERVAL $horizon""".stripMargin),
      "left_outer")
      .select(col("p.event_id").as("purchase_id"), col("p.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("p.ts").as("purchase_ts"), col("v.ts").as("view_ts"))
  }

  /** Streaming exact dedup — the incremental-ingestion twin of
    * `Dedup.qDedupExact`: keeps the first record per key, dropping
    * re-arrivals within the watermark horizon. State is evicted once the
    * watermark passes (`dropDuplicatesWithinWatermark`), so the store is
    * O(keys per horizon), not O(all keys ever) — the property that lets
    * a 100 TB/day ingest run forever.
    */
  def dedupStream(records: DataFrame, tsCol: String, keyCols: Seq[String],
      delay: String = "1 hour"): DataFrame =
    records.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming corpus curation — the incremental twin of
    * `Pipeline.qCorpusCurate`, composed from the same shared pieces:
    * quality gate (stateless projection, identical `qualityScore`
    * expression), exact dedup keyed on md5(text) with watermark-bounded
    * state, and the identical deterministic h60 80/10/10 split. Emits
    * one curated row per surviving document as it arrives — the corpus
    * pipeline running forever on an ingest stream instead of nightly
    * over a snapshot. State is O(distinct texts per horizon); everything
    * else is stateless, so the throughput profile is the batch plan's.
    */
  def curateStream(docs: DataFrame, delay: String = "1 hour"): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("text"), col("ts"),
        graft.operators.Pipeline.qualityScore.as("quality"))
      .filter(col("quality") >= graft.operators.Pipeline.QUALITY_T)
      .withColumn("text_hash", md5(col("text")))
    dedupStream(scored, "ts", Seq("text_hash"), delay)
      .select(col("doc_id"), col("quality"),
        graft.operators.Pipeline.splitCol.as("split"))
  }

  /** Streaming n-gram novelty — the incremental twin of
    * `TextAnalysis.qNgramNovelty`: each arriving document's distinct
    * trigram h60s are probed against the TRAINED reference-vocabulary
    * bloom (`TextAnalysis.trainNoveltyBloom`, the nightly artifact),
    * injected as a byte literal so the whole scorer is ONE STATELESS
    * projection — no state store, no shuffle, identical on batch and
    * stream (the parity spec runs both). Bloom fp (~1%) only
    * UNDER-reports novelty; a 0-novelty verdict (pure re-crawl) is
    * exact because false negatives are impossible. The caller's session
    * must have `BloomFns.register`ed (trainNoveltyBloom does).
    */
  def noveltyScore(docs: DataFrame, refBloom: Array[Byte]): DataFrame = {
    import graft.operators.TextAnalysis
    val hashes = transform(TextAnalysis.trigramArray(col("__nv_w")),
      g => graft.functions.HashFns.h60(g))
    docs
      .withColumn("__nv_w", split(col("text"), " "))
      .withColumn("__nv_h", hashes)
      .filter(size(col("__nv_h")) > 0)
      .select(col("doc_id"),
        size(col("__nv_h")).cast("long").as("total_grams"),
        size(filter(col("__nv_h"), h =>
          !call_function("graft_bloom_contains", lit(refBloom), h)))
          .cast("long").as("unseen_grams"))
      .withColumn("novelty", round(col("unseen_grams") / col("total_grams"), 6))
  }

  /** Streaming content-drift scoring — the incremental twin of
    * `Pipeline.qJsDivergence`: each arriving document's unigram
    * distribution (over the TRAINED reference vocabulary
    * `Pipeline.trainTermDistribution` — top-V terms + OOV bucket,
    * injected as a literal map) is compared to the reference by
    * Jensen–Shannon divergence, entirely as ONE STATELESS projection —
    * no state store, no shuffle, identical on batch and stream. Both
    * sides are complete distributions (every doc token folds into a
    * reference term or OOV), so js ∈ [0, ln 2] with js = ln 2 exactly
    * for fully-disjoint content and 0 for a doc mirroring the
    * reference. Zero-side terms contribute only through the other side
    * (0·ln 0 := 0 on both p and q).
    *
    * Cost per doc is O(V · |words|) interpreted-lambda work on the
    * already-materialized words attribute — V is a constant (33), so
    * the scorer scales exactly like any per-row projection.
    */
  def driftScore(docs: DataFrame, ref: Map[String, Double]): DataFrame = {
    import graft.operators.Pipeline.JS_OOV
    val refMap = typedLit(ref)
    docs
      .withColumn("__dr_w", split(col("text"), " "))
      .filter(size(col("__dr_w")) > 0)
      .withColumn("__dr_n", size(col("__dr_w")).cast("double"))
      .withColumn("js", round(aggregate(map_entries(refMap), lit(0.0), (acc, e) => {
        val t = e.getField("key")
        val q = e.getField("value")
        val c = when(t === lit(JS_OOV),
            size(filter(col("__dr_w"), x => isnull(element_at(refMap, x)))))
          .otherwise(size(filter(col("__dr_w"), x => x === t)))
        val p = c.cast("double") / col("__dr_n")
        val m = (p + q) / lit(2.0)
        acc +
          when(p > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
          when(q > 0, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))
      }), 6))
      .withColumn("n_tokens", col("__dr_n").cast("long"))
      .drop("__dr_w", "__dr_n")
  }

  /** Windowed drift monitor over [[driftScore]]: per tumbling hour, the
    * doc count and mean/max per-doc JS vs the trained reference — the
    * alerting readout a corpus-ingest pipeline watches (a re-crawl of
    * known content trends to 0, a topic shift or junk flood pushes the
    * window mean up). One stateful op (the windowed agg, append mode,
    * state bounded by open windows); the scorer itself is stateless.
    * Works identically on a static frame (watermark no-op).
    */
  def driftMonitor(docs: DataFrame, ref: Map[String, Double],
      delay: String = "1 hour"): DataFrame =
    driftScore(docs, ref)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg("js"), 6).as("avg_js"),
        round(max("js"), 6).as("max_js"))
      .select(col("w.start").cast("timestamp_ntz").as("hour_start"),
        col("n_docs"), col("avg_js"), col("max_js"))

  /** Trained doc-length decile artifact for [[psiMonitor]] — the batch
    * side of the streaming PSI pair (`graft.operators.Pipeline.qPsi`'s
    * global boundaries + bin shares, collected once as the nightly
    * artifact): 9 decile cuts and the 10 reference bin shares. The
    * quantiles come from `percentilesTwoPhase` — no global sort.
    */
  def trainLengthDeciles(docs: DataFrame): (Seq[Double], Seq[Double]) = {
    val nw = docs.select(size(split(col("text"), " ")).cast("double").as("nw"),
      lit("ALL").as("g"))
    val cutsSpec = (1 to 9).map(i => s"d$i" -> i / 10.0)
    val row = graft.operators.Relational
      .percentilesTwoPhase(nw, "g", "nw", cutsSpec).collect().head
    val cuts = (1 to 9).map(i => row.getAs[Double](s"d$i"))
    val binCol = cuts.map(c => (col("nw") > c).cast("int")).reduce(_ + _)
    val counts = nw.groupBy(binCol.as("bin")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val shares = (0 to 9).map(b => counts.getOrElse(b, 0L) / total)
    (cuts, shares)
  }

  /** Windowed PSI drift monitor — the population twin of
    * [[driftMonitor]] (which scores CONTENT per doc; this scores the
    * LENGTH DISTRIBUTION per window): each arriving doc bins against
    * the trained decile cuts (stateless projection), and per tumbling
    * hour the window's bin shares compare to the trained reference via
    * Σ(p−q)ln(p/q), zero shares clamped at `Pipeline.PSI_EPS`. One
    * stateful op (the windowed agg, append mode, state = 10 counters
    * per open window); identical on a static frame (watermark no-op).
    */
  def psiMonitor(docs: DataFrame, cuts: Seq[Double], ref: Seq[Double],
      delay: String = "1 hour"): DataFrame = {
    import graft.operators.Pipeline.PSI_EPS
    require(cuts.length == 9 && ref.length == 10, "artifact shape: 9 cuts, 10 shares")
    val binCol = cuts
      .map(c => (size(split(col("text"), " ")).cast("double") > c).cast("int"))
      .reduce(_ + _)
    val counts = (0 to 9).map(b =>
      sum((col("bin") === b).cast("long")).as(s"c$b"))
    val n = col("n_docs").cast("double")
    val psi = (0 to 9).map { b =>
      val p = greatest(col(s"c$b").cast("double") / n, lit(PSI_EPS))
      val q = lit(math.max(ref(b), PSI_EPS))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    docs.withColumn("bin", binCol)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_docs"), counts: _*)
      .select(col("w.start").cast("timestamp_ntz").as("hour_start"),
        col("n_docs"), round(psi, 6).as("psi"),
        (round(psi, 6) > graft.operators.Pipeline.PSI_T).as("drifted"))
  }

  /** Trained per-dimension embedding-stats artifact for [[oodMonitor]]
    * — the batch side of the streaming OOD pair
    * (`Similarity.qOodScore`'s per-dim μ/σ, collected once as the
    * nightly artifact, 6dp-rounded like the batch query so the two
    * paths score identically). One DIM-keyed map-side-combinable
    * aggregate; the collect is DIM rows. */
  def trainDimStats(embs: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = embs
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(round(avg("v"), 6).as("mu"), round(stddev_pop("v"), 6).as("sd"))
      .orderBy("pos").collect()
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** Windowed embedding-OOD monitor — the EMBEDDING-space member of the
    * drift family (`driftMonitor` watches content, `psiMonitor` watches
    * the length population; this watches the representation): each
    * arriving vector scores the diagonal Mahalanobis √Σ((v−μ)/σ)²
    * against the trained artifact (a stateless zip_with fold over two
    * literal arrays — constant dims σ=0 contribute 0, mirroring the
    * batch query's null-drop), and per tumbling hour the monitor emits
    * count, mean/max distance, and how many vectors crossed `thresh` —
    * the alert a feature-store ingest watches for an upstream encoder
    * change or corrupted batch. One stateful op (the windowed agg,
    * append mode, state bounded by open windows); identical on a
    * static frame (watermark no-op).
    */
  def oodMonitor(vecs: DataFrame, mu: Seq[Double], sd: Seq[Double],
      thresh: Double, delay: String = "1 hour"): DataFrame = {
    require(mu.length == sd.length && mu.nonEmpty, "artifact shape: per-dim mu/sd")
    val diffs = zip_with(col("embedding").cast("array<double>"),
      typedLit(mu), (v, m) => v - m)
    val z2 = zip_with(diffs, typedLit(sd), (d, s) =>
      when(s =!= 0.0, (d / s) * (d / s)).otherwise(lit(0.0)))
    val md = round(sqrt(aggregate(z2, lit(0.0), (acc, x) => acc + x)), 6)
    vecs.withColumn("__md", md)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("__md"), 6).as("mean_mahal"),
        max("__md").as("max_mahal"),
        sum((col("__md") > thresh).cast("long")).as("n_ood"))
      .select(col("w.start").cast("timestamp_ntz").as("hour_start"),
        col("n_vecs"), col("mean_mahal"), col("max_mahal"), col("n_ood"))
  }

  /** Streaming incremental near-dup probe — the streaming twin of
    * `Dedup.qDedupIncremental`'s near channel: each arriving document's
    * K-minhash signature (one stateless projection, bit-identical to
    * the batch aggregate) explodes into its LSH bands and probes the
    * STATIC corpus band index (the nightly artifact; re-readable or
    * broadcast per micro-batch) through a stream-static equality join;
    * the corpus signature rides the index row, so the exact
    * est-jaccard verify is a projection. A pair agreeing on several
    * bands is emitted EXACTLY ONCE without any state: both signatures
    * are in hand, so only the LOWEST agreeing band's row survives
    * (the nearDupStream trick, minus its state store). Fully
    * stateless — no watermark required, identical on batch; the
    * corpus is never probed against itself (it only ever sits on the
    * static side).
    */
  def incrementalDedupStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.functions.HashFns.{h60, shinglesFromWords}
    val D = graft.operators.Dedup
    val K = D.minhashK
    val corpusSig = D.minhashSignatures(D.shingleTable(corpus))
    val corpusIdx = D.bandFrame(corpusSig)
      .join(corpusSig, "doc_id")
      .select(col("band"), col("h1"), col("h2"), col("doc_id").as("match_id"),
        array((0 until K).map(i => col(s"mh$i")): _*).as("msig"))
    val sigd = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), shinglesFromWords(col("w"), 3).as("sh_strs"))
      .select(col("doc_id"), transform(col("sh_strs"), x => h60(x)).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"), D.minhashSigArray(col("shs")).as("sig"))
    val bandStructs = (0 until D.minhashBands).map { b =>
      struct(lit(b).as("band"),
        element_at(col("sig"), 2 * b + 1).as("h1"),
        element_at(col("sig"), 2 * b + 2).as("h2"))
    }
    val banded = sigd
      .select(col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.h1").as("h1"), col("bk.h2").as("h2"))
    val eq = (0 until K).map(i =>
      when(element_at(col("sig"), i + 1) === element_at(col("msig"), i + 1), 1)
        .otherwise(0)).reduce(_ + _)
    val firstAgree = (0 until D.minhashBands).map { b =>
      when(element_at(col("sig"), 2 * b + 1) === element_at(col("msig"), 2 * b + 1) &&
        element_at(col("sig"), 2 * b + 2) === element_at(col("msig"), 2 * b + 2),
        lit(b)).otherwise(lit(Int.MaxValue))
    }.reduce(least(_, _))
    banded.join(corpusIdx, Seq("band", "h1", "h2"))
      .filter(col("band") === firstAgree) // one emission per (doc, match)
      .withColumn("est_jaccard", round(eq.cast("double") / K, 6))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id"), col("match_id"), col("est_jaccard"))
  }

  /** One doc in one LSH band bucket (streaming near-dup input row). */
  case class BandDoc(band: Int, h1: Long, h2: Long, doc_id: Long,
      sig: Seq[Long], ts: java.sql.Timestamp)

  /** One member buffered in a bucket's state. */
  case class MemberSig(docId: Long, sig: Seq[Long], tsMs: Long)

  case class BucketState(members: List[MemberSig])

  /** An emitted near-dup pair (doc_a < doc_b), with the arrival time of
    * the later member as its event time. */
  case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double,
      ts: java.sql.Timestamp)

  /** Streaming MinHash near-dup detection — the incremental twin of
    * `Dedup.qDedupMinhashLsh`'s pair generator. Each arriving document's
    * K-minhash signature is ONE stateless projection
    * (`Dedup.minhashSigArray` — same affine arithmetic as the batch
    * min-aggregate, so signatures are bit-identical); the doc then lands
    * in BANDS keyed state buckets (band, h1, h2), each holding the
    * signatures of its members within the watermark horizon. A new
    * member is compared against the bucket's members (bucket population
    * is the corpus's band-collision rate — the same bound the batch
    * band join has), and a pair with estimated Jaccard >= 0.5 is emitted
    * EXACTLY ONCE even when the pair agrees on several bands: both full
    * signatures are in hand, so only the lowest agreeing band's bucket
    * emits. No second dedup stage, so the op composes without chaining
    * stateful operators.
    *
    * State is evicted by event-time timeout once the watermark passes a
    * bucket's newest member + horizon, and members individually age out
    * at each invocation — the store is O(docs per horizon x BANDS),
    * independent of stream length. Input must be exact-deduped (the
    * batch path's `collapseExact`; on streams, `dedupStream` keyed on
    * md5(text) upstream) — re-arrivals of an already-buffered doc_id are
    * ignored defensively.
    */
  def nearDupStream(docs: DataFrame, delaySec: Long = 3600): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    import graft.functions.HashFns.{h60, shinglesFromWords}
    val K = graft.operators.Dedup.minhashK
    val horizonMs = delaySec * 1000
    // each select materializes the attribute the next lambda consumes
    val sigd = docs
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("ts"), shinglesFromWords(col("w"), 3).as("sh_strs"))
      .select(col("doc_id"), col("ts"), transform(col("sh_strs"), s => h60(s)).as("shs"))
      .filter(size(col("shs")) > 0) // <3-word docs have no signature (batch parity)
      .select(col("doc_id"), col("ts"),
        graft.operators.Dedup.minhashSigArray(col("shs")).as("sig"))
      .withWatermark("ts", s"$delaySec seconds")
    val bandStructs = (0 until graft.operators.Dedup.minhashBands).map { b =>
      struct(lit(b).as("band"),
        element_at(col("sig"), 2 * b + 1).as("h1"),
        element_at(col("sig"), 2 * b + 2).as("h2"))
    }
    val banded = sigd
      .select(col("doc_id"), col("ts"), col("sig"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.h1").as("h1"), col("bk.h2").as("h2"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandDoc]

    def lowestAgreeingBand(a: Seq[Long], b: Seq[Long]): Int =
      (0 until graft.operators.Dedup.minhashBands)
        .find(i => a(2 * i) == b(2 * i) && a(2 * i + 1) == b(2 * i + 1)).getOrElse(-1)

    banded
      .groupByKey(d => (d.band, d.h1, d.h2))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long, Long), it: Iterator[BandDoc], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          def alive(ms: List[MemberSig]) = ms.filter(_.tsMs + horizonMs > wm)
          if (state.hasTimedOut) {
            val left = alive(state.get.members)
            if (left.isEmpty) state.remove()
            else {
              state.update(BucketState(left))
              state.setTimeoutTimestamp(math.max(left.map(_.tsMs).max + horizonMs, wm + 1))
            }
            Iterator.empty
          } else {
            var members = alive(state.getOption.map(_.members).getOrElse(Nil))
            val out = List.newBuilder[NearDupPair]
            it.toIndexedSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              if (!members.exists(_.docId == d.doc_id)) {
                members.foreach { m =>
                  val eq = (0 until K).count(i => m.sig(i) == d.sig(i))
                  val est = math.round(eq.toDouble / K * 1e6) / 1e6
                  // emit from the lowest band both agree on — exactly once
                  if (est >= 0.5 && lowestAgreeingBand(m.sig, d.sig) == key._1)
                    out += NearDupPair(math.min(m.docId, d.doc_id),
                      math.max(m.docId, d.doc_id), est, d.ts)
                }
                members ::= MemberSig(d.doc_id, d.sig, d.ts.getTime)
              }
            }
            if (members.isEmpty) state.remove()
            else {
              state.update(BucketState(members))
              state.setTimeoutTimestamp(math.max(members.map(_.tsMs).max + horizonMs, wm + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`): the streaming twin of
    * `EventOps.qEventsSessionize`. A session closes when `gapSec` passes
    * with no event (detected either by a later in-stream event or by an
    * event-time timeout once the watermark passes last+gap).
    */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.sessId, s.nEv, s.lastSec - s.startSec, s.sum))
          } else {
            val evs = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var st = state.getOption
            evs.foreach { e =>
              val tSec = e.ts.getTime / 1000.0
              st = st match {
                case Some(s) if tSec - s.lastSec <= gapSec =>
                  Some(s.copy(lastSec = tSec, nEv = s.nEv + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.sessId, s.nEv, s.lastSec - s.startSec, s.sum)
                  Some(SessState(s.sessId + 1, tSec, tSec, 1, e.value))
                case None =>
                  Some(SessState(1L, tSec, tSec, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSec * 1000).toLong + gapSec * 1000)
            }
            closed.reverse.iterator
          }
      }
  }

  // --------------------------------------------- streaming heavy hitters
  /** One timestamped value observation for the streaming TWAP. */
  case class ValueArrival(key: String, tsSec: Double, eventId: Long, value: Double)

  /** Running TWAP snapshot per key (one row per key per micro-batch). */
  case class TwapSnapshot(key: String, twap: Double, n_seg: Long)

  /** Per-key fold state: the open segment + closed-segment accumulators. */
  case class TwapState(lastTs: Double, lastVal: Double,
      accVdt: Double, accDt: Double, nSeg: Long)

  /** Streaming time-weighted average on `transformWithState` — the
    * incremental twin of `EventOps.qTimeWeightedAvg`: each observation
    * holds until the next one, so the key's TWAP is Σv·Δt/ΣΔt over
    * closed segments. State per key is ONE open segment + two running
    * sums (O(1) forever — stream length never grows it); each
    * micro-batch folds its rows in (ts, event_id) order on top of that
    * state, exactly the batch lead-window semantics. Callers key by
    * (entity, day) like the batch query so state count is day-bounded;
    * per-key event-time order across batches is the caller's contract
    * (watermark + drop-late upstream), matching the batch query's
    * window ordering.
    */
  class TwapProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, ValueArrival, TwapSnapshot] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var st: org.apache.spark.sql.streaming.ValueState[TwapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TwapState]("twap", Encoders.product[TwapState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[ValueArrival],
        timerValues: TimerValues): Iterator[TwapSnapshot] = {
      val ordered = rows.toSeq.sortBy(r => (r.tsSec, r.eventId))
      if (ordered.isEmpty) Iterator.empty
      else {
        var s = if (st.exists()) st.get()
        else TwapState(ordered.head.tsSec, ordered.head.value, 0.0, 0.0, 0L)
        val it = if (st.exists()) ordered.iterator else ordered.iterator.drop(1)
        it.foreach { r =>
          val dt = r.tsSec - s.lastTs
          s = TwapState(r.tsSec, r.value,
            s.accVdt + s.lastVal * dt, s.accDt + dt, s.nSeg + 1L)
        }
        st.update(s)
        if (s.accDt > 0.0) Iterator.single(TwapSnapshot(key, s.accVdt / s.accDt, s.nSeg))
        else Iterator.empty
      }
    }
  }

  /** Value stream → per-key running TWAP snapshots (Update mode). */
  def twapStream(values: Dataset[ValueArrival]): Dataset[TwapSnapshot] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .transformWithState(new TwapProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** One ordered observation for the streaming control chart. */
  case class CusumArrival(key: String, seq: Long, x: Double)

  /** Control-chart snapshot per key per micro-batch. */
  case class CusumSnapshot(key: String, s: Double, max_s: Double, n_alarms: Long)

  case class CusumState(s: Double, maxS: Double, alarms: Long)

  /** Streaming CUSUM control chart on `transformWithState` — the
    * train-offline/monitor-online twin of `Stats.qCusumChangepoint`:
    * control limits (μ, σ) come from a nightly batch job as a bounded
    * per-key map closed over by the processor (the same serve-as-
    * literals shape as the batch-trained probe weights); the stream
    * folds S_t = max(0, S_{t−1} + (x_t − μ − 0.5σ)) with O(1) state
    * per key, alarming while S_t > 4σ. Batch-order parity: rows fold
    * in `seq` order within a batch on top of the persisted state, so a
    * replayed series produces bit-identical accumulators to the batch
    * fold (the spec's contract).
    */
  class CusumProcessor(limits: Map[String, (Double, Double)])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, CusumArrival, CusumSnapshot] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var st: org.apache.spark.sql.streaming.ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum", Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[CusumArrival],
        timerValues: TimerValues): Iterator[CusumSnapshot] =
      limits.get(key) match {
        case None => Iterator.empty // unknown key: no control limits trained
        case Some((mu, sd)) =>
          var s = if (st.exists()) st.get() else CusumState(0.0, 0.0, 0L)
          rows.toSeq.sortBy(_.seq).foreach { r =>
            val sNew = math.max(0.0, s.s + (r.x - mu - 0.5 * sd))
            s = CusumState(sNew, math.max(s.maxS, sNew),
              s.alarms + (if (sNew > 4.0 * sd) 1L else 0L))
          }
          st.update(s)
          Iterator.single(CusumSnapshot(key, s.s, s.maxS, s.alarms))
      }
  }

  /** Observation stream → per-key CUSUM snapshots under batch-trained
    * limits (Update mode). */
  def cusumStream(values: Dataset[CusumArrival],
      limits: Map[String, (Double, Double)]): Dataset[CusumSnapshot] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .transformWithState(new CusumProcessor(limits),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** One token arrival routed to its shard. */
  case class TokenArrival(shard: Int, token: String)

  /** Snapshot row: the shard's current Misra–Gries estimate for a token. */
  case class HitterEstimate(shard: Int, token: String, est: Long)

  /** Streaming heavy hitters on `transformWithState` — the new-generation
    * arbitrary-state API (typed `MapState` against the RocksDB store,
    * v2 state checkpoints) and the streaming twin of `q_heavy_hitters`.
    *
    * Algorithm: MERGEABLE Misra–Gries per shard — each micro-batch is
    * pre-aggregated locally, merged into the shard's ≤k resident
    * counters, and if the merge overflows k, every survivor is docked
    * by the (k+1)-th largest count (the summary-merge form of the MG
    * decrement). Guarantees, independent of arrival order: estimates
    * never exceed true counts, undercount by at most N_shard/(k+1),
    * and any token with true frequency > N_shard/(k+1) is resident.
    *
    * Scale shape: state is O(shards·k) FOREVER — stream length never
    * grows it (the CMS twin bounds error by total N; MG bounds rank).
    * Tokens hash-route to shards, so one shard holds a token's whole
    * count; shard count spreads the state store, k dials accuracy.
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`) — transformWithState rejects
    * the default HDFS-backed store.
    */
  class MisraGriesProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Int, TokenArrival, HitterEstimate] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var counters: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        shard: Int,
        rows: Iterator[TokenArrival],
        timerValues: TimerValues): Iterator[HitterEstimate] = {
      val merged = scala.collection.mutable.Map.empty[String, Long]
      counters.iterator().foreach { case (t, c) => merged(t) = c }
      rows.foreach(r => merged(r.token) = merged.getOrElse(r.token, 0L) + 1L)
      val kept =
        if (merged.size <= k) merged.toSeq
        else {
          val sorted = merged.toSeq.sortBy { case (t, c) => (-c, t) }
          val dock = sorted(k)._2 // (k+1)-th largest: the MG decrement
          sorted.take(k).map { case (t, c) => (t, c - dock) }.filter(_._2 > 0L)
        }
      counters.clear()
      kept.foreach { case (t, c) => counters.updateValue(t, c) }
      kept.sortBy { case (t, c) => (-c, t) }
        .iterator.map { case (t, c) => HitterEstimate(shard, t, c) }
    }
  }

  /** Token stream → per-shard MG heavy-hitter snapshots, one snapshot row
    * set per shard per micro-batch (Update mode). */
  def heavyHittersStream(tokens: Dataset[TokenArrival], k: Int): Dataset[HitterEstimate] = {
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(_.shard)
      .transformWithState(new MisraGriesProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** One keyed arrival for the streaming distinct-count monitor. */
  case class DistinctArrival(source: String, doc_id: Long)

  /** Distinct-count snapshot per source per micro-batch. */
  case class DistinctEstimate(source: String, estimate: Long, n_arrivals: Long)

  /** Streaming mergeable distinct-count monitor on `transformWithState`
    * — the streaming twin of `q_sketch_merge`'s HLL rung (r11 VERDICT
    * item 5) and the drift family's distinct-count gauge: per source, a
    * DataSketches HLL sketch held as serialized ValueState, updated per
    * micro-batch, emitting the running distinct estimate.
    *
    * Parity discipline: the sketch is constructed EXACTLY as Spark's
    * `hll_sketch_agg` builds its buffer (same lgK, target type HLL_8,
    * long-typed updates), so after any stream prefix the emitted
    * estimate EQUALS `hll_sketch_estimate(hll_sketch_agg(doc_id, lgK))`
    * over the same rows — not merely close (StreamHllSpec pins
    * equality, plus the ±5%-of-exact tolerance the batch verdict uses).
    * HLL updates are idempotent per item, so re-delivered ids (replays,
    * overlapping backfills) NEVER move the estimate — set semantics for
    * free, where the reservoir needed an explicit seen-set.
    *
    * Scale shape: state is one ~2^lgK-register sketch per source
    * forever (lgK=12 → ~4 KB dense); each batch folds locally and the
    * serialized state is MERGEABLE (Union.update accepts it), so a
    * catalog can union per-source sketches across streams exactly as
    * `q_sketch_merge` unions months.
    */
  class HllDistinctProcessor(lgK: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, DistinctArrival, DistinctEstimate] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    import org.apache.datasketches.hll.{HllSketch, TgtHllType}

    @transient private var sk: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    @transient private var nArr: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sk = getHandle.getValueState[Array[Byte]]("hll", Encoders.BINARY, TTLConfig.NONE)
      nArr = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        source: String,
        rows: Iterator[DistinctArrival],
        timerValues: TimerValues): Iterator[DistinctEstimate] = {
      val sketch =
        if (sk.exists()) HllSketch.heapify(sk.get())
        else new HllSketch(lgK, TgtHllType.HLL_8) // hll_sketch_agg's buffer
      var n = if (nArr.exists()) nArr.get() else 0L
      rows.foreach { r => sketch.update(r.doc_id); n += 1L }
      sk.update(sketch.toUpdatableByteArray)
      nArr.update(n)
      // Math.round(getEstimate) is hll_sketch_estimate's exact read
      Iterator.single(DistinctEstimate(source, Math.round(sketch.getEstimate), n))
    }
  }

  /** Keyed arrival stream → per-source running distinct estimates
    * (Update mode; RocksDB state store required, like every
    * transformWithState op here). */
  def distinctStream(docs: Dataset[DistinctArrival], lgK: Int = 12): Dataset[DistinctEstimate] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new HllDistinctProcessor(lgK),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** One ordered observation for the streaming forecaster. */
  case class HoltArrival(key: String, seq: Long, n: Double)

  /** Forecast snapshot per key per micro-batch: the smoothed state, the
    * NEXT-step forecast it implies, and the last observation's error. */
  case class HoltSnapshot(key: String, level: Double, trend: Double,
      next_forecast: Double, last_err: Double, n_obs: Long)

  case class HoltState(level: Double, trend: Double, nObs: Long, lastErr: Double)

  /** Streaming Holt forecaster on `transformWithState` — the online twin
    * of `EventOps.qHoltWinters`: per key, O(1) (level, trend) state
    * folds the same α/β recurrence with the same 9dp step rounding, so
    * a series replayed through any micro-batch partitioning produces
    * BIT-IDENTICAL state to the batch fold (HoltStreamSpec pins parity
    * against qHoltWinters' constants). Rows fold in `seq` order within
    * a batch on top of persisted state — the CUSUM/TWAP discipline.
    * Emits one snapshot per key per batch with the next-step forecast a
    * capacity dashboard would chart.
    */
  class HoltProcessor(alpha: Double, beta: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, HoltArrival, HoltSnapshot] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var st: org.apache.spark.sql.streaming.ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HoltState]("holt", Encoders.product[HoltState], TTLConfig.NONE)

    private def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

    override def handleInputRows(
        key: String,
        rows: Iterator[HoltArrival],
        timerValues: TimerValues): Iterator[HoltSnapshot] = {
      val ordered = rows.toSeq.sortBy(_.seq)
      if (ordered.isEmpty) Iterator.empty
      else {
        var s = if (st.exists()) st.get() else {
          val h = ordered.head
          HoltState(h.n, 0.0, 1L, 0.0) // seed: level = first obs, trend 0
        }
        val it = if (st.exists()) ordered.iterator else ordered.iterator.drop(1)
        it.foreach { x =>
          val f = r9(s.level + s.trend)
          val lvl = r9(alpha * x.n + (1.0 - alpha) * f)
          val tr = r9(beta * (lvl - s.level) + (1.0 - beta) * s.trend)
          s = HoltState(lvl, tr, s.nObs + 1L, r9(x.n - f))
        }
        st.update(s)
        Iterator.single(HoltSnapshot(key, s.level, s.trend,
          r9(s.level + s.trend), s.lastErr, s.nObs))
      }
    }
  }

  /** Observation stream → per-key Holt forecast snapshots (Update mode). */
  def holtStream(values: Dataset[HoltArrival], alpha: Double = 0.5,
      beta: Double = 0.3): Dataset[HoltSnapshot] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .transformWithState(new HoltProcessor(alpha, beta),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  // ---------------------------------------------- streaming A/B monitor

  /** Live A/B experiment monitor (`abMonitor`) — the streaming twin of
    * `Stats.qAbWelch`: each arriving event assigns to an arm by the h60
    * parity of its user (stateless projection, the same rule as the
    * batch test), and per tumbling hour the two arms' moment sums fold
    * in the ONE allowed stateful op (windowed agg — state is 6 numbers
    * per open window), with Welch's t computed as a closing projection.
    * The dashboard an experimenter watches BETWEEN nightly batch reads;
    * exact batch/stream parity by construction (watermark no-op on
    * batch).
    */
  def abMonitor(events: DataFrame, delay: String = "1 hour"): DataFrame = {
    import graft.functions.HashFns.h60
    def m(arm: Int, c: org.apache.spark.sql.Column) =
      sum(when(col("arm") === arm, c).otherwise(lit(0.0)))
    val armed = events
      .withColumn("arm", (h60(col("user_id").cast("string")) % 2).cast("int"))
    val agg = armed
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        m(0, col("value")).as("sxa"), m(1, col("value")).as("sxb"),
        m(0, col("value") * col("value")).as("sx2a"),
        m(1, col("value") * col("value")).as("sx2b"))
    // nullif-guarded divisors: an arm can be empty in a thin window and
    // ANSI mode hard-errors on /0 — null propagates instead
    def nz(c: org.apache.spark.sql.Column) = when(c =!= 0, c)
    val ma = col("sxa") / nz(col("na")); val mb = col("sxb") / nz(col("nb"))
    val sea = (col("sx2a") - col("sxa") * col("sxa") / nz(col("na"))) /
      nz(col("na") - 1) / nz(col("na"))
    val seb = (col("sx2b") - col("sxb") * col("sxb") / nz(col("nb"))) /
      nz(col("nb") - 1) / nz(col("nb"))
    agg.select(col("w.start").cast("timestamp_ntz").as("hour_start"),
      col("na"), col("nb"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      round((ma - mb) / nz(sqrt(sea + seb)), 6).as("welch_t"))
  }

  // ------------------------------------------------- streaming MERGE sink

  /** Current contents of an [[upsertStream]]-maintained table: the
    * version the `_CURRENT` pointer names, or an empty (key, value)
    * frame before the first commit. */
  def upsertTableRead(s: SparkSession, tableDir: String): DataFrame = {
    val ptr = new java.io.File(tableDir, "_CURRENT")
    if (ptr.exists()) {
      val v = currentPointer(tableDir).get._1
      s.read.parquet(s"$tableDir/$v")
    } else {
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("key BIGINT, value DOUBLE"))
    }
  }

  /** `_CURRENT` pointer, parsed: (version dir name, owning streaming
    * query id if the marker carries one). The pointer's first token is
    * the version — older tables wrote the bare version with no owner,
    * and both forms stay readable. */
  private def currentPointer(tableDir: String): Option[(String, Option[String])] = {
    val ptr = new java.io.File(tableDir, "_CURRENT")
    if (!ptr.exists()) None
    else {
      val toks = new String(java.nio.file.Files.readAllBytes(ptr.toPath))
        .trim.split("\\s+")
      Some((toks(0), toks.lift(1)))
    }
  }

  // ---------------------------------------------- streaming funnel

  /** One funnel-relevant event (ts in epoch seconds; seq breaks ties
    * within a micro-batch the way the batch window's min does not need
    * to — ordered folding requires a total order). */
  case class FunnelEvent(user_id: Long, event_type: String, ts_sec: Double, seq: Long)

  case class FunnelState(t1: Double, t2: Double, t3: Double)

  /** Funnel snapshot per user per micro-batch: the deepest stage
    * reached and the stage timestamps (-1 = not reached). */
  case class FunnelSnapshot(user_id: Long, stage: Int,
      t1: Double, t2: Double, t3: Double)

  /** Streaming conversion funnel on `transformWithState` — the online
    * twin of `EventOps.qEventsFunnel` (view → click → purchase, each
    * within the horizon of the previous stage's timestamp). Per user
    * the state is THREE doubles, set once each, folded in event-time
    * order within a batch on top of persisted state (the CUSUM/TWAP
    * discipline): under in-order delivery the final state is EXACTLY
    * the batch query's (t1, t2, t3) — t1 is the first view, hence the
    * min view; t2 the first horizon-qualified click after t1, hence
    * the min; likewise t3 (FunnelStreamSpec pins count-level parity
    * against the batch funnel on the driver data).
    *
    * Scale shape: state is O(1) per user forever; each arrival is a
    * constant-work fold — the streaming funnel a growth dashboard
    * polls without ever re-scanning history.
    */
  class FunnelProcessor(horizonSec: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelEvent, FunnelSnapshot] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var st: org.apache.spark.sql.streaming.ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelSnapshot] = {
      var s = if (st.exists()) st.get() else FunnelState(-1d, -1d, -1d)
      rows.toSeq.sortBy(e => (e.ts_sec, e.seq)).foreach { e =>
        if (s.t1 < 0 && e.event_type == "view")
          s = s.copy(t1 = e.ts_sec)
        else if (s.t1 >= 0 && s.t2 < 0 && e.event_type == "click" &&
            e.ts_sec >= s.t1 && e.ts_sec - s.t1 <= horizonSec)
          s = s.copy(t2 = e.ts_sec)
        else if (s.t2 >= 0 && s.t3 < 0 && e.event_type == "purchase" &&
            e.ts_sec >= s.t2 && e.ts_sec - s.t2 <= horizonSec)
          s = s.copy(t3 = e.ts_sec)
      }
      st.update(s)
      val stage = if (s.t3 >= 0) 3 else if (s.t2 >= 0) 2 else if (s.t1 >= 0) 1 else 0
      Iterator.single(FunnelSnapshot(user, stage, s.t1, s.t2, s.t3))
    }
  }

  /** Event stream → per-user funnel snapshots (Update mode; RocksDB
    * state store required, like every transformWithState op here). */
  def funnelStream(events: Dataset[FunnelEvent],
      horizonSec: Double = graft.operators.EventOps.FUNNEL_HORIZON_SEC): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(horizonSec),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  // ---------------------------------------------- streaming reservoir

  /** One document arrival for the streaming reservoir. */
  case class DocArrival(source: String, doc_id: Long)

  /** Reservoir snapshot per source per micro-batch: the current exact-k
    * sample in hash order, plus the running source count. */
  case class ReservoirSnapshot(source: String, rank: Int, doc_id: Long,
      hk: Long, n_source: Long)

  case class ReservoirState(hks: Seq[Long], ids: Seq[Long], n: Long)

  /** Streaming exact-k reservoir on `transformWithState` — the online
    * twin of `Pipeline.qSampleReservoir`, via the same determinization:
    * "uniform k of n" becomes "the k smallest h60('res:'+id) keys", so
    * the reservoir is a bounded-state MinK fold that is INVARIANT to
    * arrival order and micro-batch partitioning — after any prefix of
    * the stream, the state equals the batch query's answer on the same
    * prefix (StreamReservoirSpec pins row-for-row parity). Classic
    * Algorithm R matches batch sampling only in distribution; the
    * hash-order reservoir matches it exactly, which is what an
    * incremental curation pipeline needs to keep its published sample
    * stable under replays and backfills.
    *
    * Scale shape: state is O(k) per source forever; each batch folds
    * locally and writes k values — stream length never grows state.
    */
  class ReservoirProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, DocArrival, ReservoirSnapshot] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var res: org.apache.spark.sql.streaming.ValueState[ReservoirState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      res = getHandle.getValueState[ReservoirState](
        "res", Encoders.product[ReservoirState], TTLConfig.NONE)

    override def handleInputRows(
        source: String,
        rows: Iterator[DocArrival],
        timerValues: TimerValues): Iterator[ReservoirSnapshot] = {
      val prev = if (res.exists()) res.get() else ReservoirState(Nil, Nil, 0L)
      var n = prev.n
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      buf ++= prev.hks.zip(prev.ids)
      // Dedupe re-deliveries (r11 ADVICE): an at-least-once replay or
      // overlapping backfill re-sends ids already ingested; without the
      // guard a duplicate (hk, id) occupied TWO reservoir slots (evicting
      // a legitimate k-th element) and double-incremented n. The SAMPLE
      // is now exactly min-k over distinct ids under any replay: a
      // re-delivered id either sits in the reservoir (seen-set hit, no
      // second slot) or was evicted because k smaller keys exist — in
      // which case sorted.take(k) re-drops it for the same reason. n
      // stays exact under exactly-once delivery and for replays of
      // reservoir-resident ids; only a replay of an already-EVICTED id
      // re-counts (exact distinct-n needs O(n) state, not O(k)).
      val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
      seen ++= buf
      rows.foreach { r =>
        // the batch query's exact key: h60 of "res:"+id folded to 2^50
        val hk = graft.functions.HashFns.h60Local("res:" + r.doc_id) % 1125899906842624L
        if (seen.add((hk, r.doc_id))) {
          n += 1L
          buf += ((hk, r.doc_id))
        }
      }
      val kept = buf.sorted.take(k) // (hk, id) lexicographic — MinKPair's tie order
      res.update(ReservoirState(kept.map(_._1).toSeq, kept.map(_._2).toSeq, n))
      kept.iterator.zipWithIndex.map { case ((hk, id), i) =>
        ReservoirSnapshot(source, i + 1, id, hk, n)
      }
    }
  }

  /** Document stream → per-source exact-k reservoir snapshots (Update
    * mode; requires the RocksDB state store, like every
    * transformWithState op here). */
  def reservoirStream(docs: Dataset[DocArrival], k: Int): Dataset[ReservoirSnapshot] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new ReservoirProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Streaming MERGE into a parquet warehouse table — the foreachBatch
    * upsert sink every CDC-to-lake pipeline ends in, built on the same
    * full-outer merge shape as `Warehouse.qMergeUpsert`. Per micro-batch:
    * the batch REDUCES to its latest change per key (max_by on the
    * sequence number — map-side combinable, no window), full-outer
    * merges with the current table version, and commits by writing
    * `v<batchId>` and atomically renaming the `_CURRENT` pointer.
    *
    * Exactly-once table state: a replayed batch (restart between write
    * and checkpoint commit) rewrites the SAME `v<batchId>` dir from the
    * same inputs and re-points `_CURRENT` at it — idempotent by
    * construction, no transaction log needed. Readers see only
    * committed versions (the pointer flips after the version lands).
    * The pointer also records the owning streaming-query id (stable
    * across restarts from one checkpoint): a replay is recognized only
    * when BOTH batchId and owner match, and a different owner — a fresh
    * checkpoint attached to a live table, whose restarted batchIds would
    * collide with committed versions — is refused loudly instead of
    * silently dropping its first batch.
    * At 100 TB the merge co-partitions on key (bucketed table versions
    * make it zero-exchange) and old versions retire by any vacuum
    * policy; the pointer-swap commit is O(1) regardless of table size.
    *
    * `changes` schema: (key BIGINT, op STRING 'U'|'D', value DOUBLE,
    * seq BIGINT).
    */
  def upsertStream(changes: DataFrame, tableDir: String): DataStreamWriter[Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // Spark sets the streaming query id (STABLE across restarts from
      // the same checkpoint, unlike runId) as a local property on the
      // thread running the batch; it is the table's ownership token.
      val queryId = Option(batch.sparkSession.sparkContext
        .getLocalProperty("sql.streaming.queryId"))
      // Replay short-circuit: if `_CURRENT` already names v<batchId> AND
      // the pointer's owner is this same streaming query, the crash
      // happened AFTER the pointer flip but BEFORE the offsets commit.
      // The version is fully committed — re-running the merge would read
      // v<batchId> via upsertTableRead and overwrite the same path in one
      // job, which Spark rejects ("Cannot overwrite a path that is also
      // being read from") and would crash-loop recovery. Skipping is
      // exactly-once-correct: the committed state IS the deterministic
      // merge of this batch. Matching on version alone is NOT enough: a
      // fresh checkpoint attached to an existing table restarts batchIds
      // at 0 while `_CURRENT` still names v0, and skipping there silently
      // discards the first real batch — so a foreign owner is a refusal,
      // not a skip.
      val pointer = currentPointer(tableDir)
      val alreadyCommitted = pointer.exists { case (v, owner) =>
        v == s"v$batchId" &&
          (owner.isEmpty || queryId.isEmpty || owner == queryId)
      }
      pointer.foreach { case (_, owner) =>
        if (!alreadyCommitted &&
            owner.isDefined && queryId.isDefined && owner != queryId)
          throw new IllegalStateException(
            s"upsert table $tableDir is owned by streaming query " +
              s"${owner.get} but this batch comes from ${queryId.get}: " +
              "attaching a fresh checkpoint to a live table would collide " +
              "its restarted batchIds with committed versions. Resume the " +
              "original checkpoint, or rebuild the table dir.")
      }
      if (!batch.isEmpty && !alreadyCommitted) {
        val s = batch.sparkSession
        val latest = batch
          .groupBy("key")
          .agg(expr("max_by(struct(op, value), seq)").as("ch"))
          .select(col("key"), col("ch.op").as("op"), col("ch.value").as("cv"))
        val cur = upsertTableRead(s, tableDir)
          .select(col("key").as("t_key"), col("value").as("t_value"))
        val merged = cur.join(latest, col("t_key") === col("key"), "full_outer")
          .filter(coalesce(col("op"), lit("K")) =!= "D")
          .select(coalesce(col("t_key"), col("key")).as("key"),
            when(col("op") === "U", col("cv")).otherwise(col("t_value")).as("value"))
        merged.write.mode("overwrite").parquet(s"$tableDir/v$batchId")
        // Version and owner flip together in ONE atomic move, so there is
        // no window where the commit marker and the ownership disagree.
        val marker = s"v$batchId${queryId.map(" " + _).getOrElse("")}"
        val tmp = new java.io.File(tableDir, s"_CURRENT.tmp$batchId")
        java.nio.file.Files.write(tmp.toPath, marker.getBytes)
        java.nio.file.Files.move(tmp.toPath,
          new java.io.File(tableDir, "_CURRENT").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      ()
    }

  /** Version ids currently on disk under an [[upsertStream]] table,
    * ascending — each `v<batchId>` dir is an immutable committed
    * snapshot of the table after that micro-batch's merge. */
  def upsertTableVersions(tableDir: String): Seq[Long] = {
    val d = new java.io.File(tableDir)
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).sorted.toSeq
  }

  /** Time-travel read: the [[upsertStream]] table AS OF `version` —
    * versions are immutable once `_CURRENT` has moved past them, so a
    * historical read needs no lock and no log replay, just the dir. */
  def upsertTableReadVersion(s: SparkSession, tableDir: String,
      version: Long): DataFrame =
    s.read.parquet(s"$tableDir/v$version")

  /** Retention GC for an [[upsertStream]] table: drop all but the newest
    * `keep` versions, NEVER the one `_CURRENT` names (a reader that
    * resolved the pointer a moment ago may still be scanning it).
    * Returns the version ids deleted. O(#versions) metadata work —
    * independent of table size, safe to run while the stream commits,
    * because the stream only ever appends new `v<batchId>` dirs and
    * flips the pointer forward. */
  def vacuumUpsertTable(tableDir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "retention must keep at least one version")
    val current: Option[String] = currentPointer(tableDir).map(_._1)
    val doomed = upsertTableVersions(tableDir).dropRight(keep)
      .filterNot(v => current.contains(s"v$v"))
    doomed.foreach { v =>
      val root = new java.io.File(tableDir, s"v$v").toPath
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete(_: Path))
      finally walk.close()
    }
    doomed
  }
}
