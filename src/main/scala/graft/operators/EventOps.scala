package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream operators over the `events` table.
  *
  * The events parquet has shipped `ts` in two physical shapes across data
  * generations: TIMESTAMP(NANOS) (read as a raw nanos LONG under the
  * legacy flag) and plain TIMESTAMP(MICROS). [[events]] normalizes both to
  * a microsecond TIMESTAMP, matching the DuckDB oracle's
  * `make_timestamp(epoch_ns(ts)//1000)` (identity on micros), so both
  * engines see identical instants regardless of the file's physical type.
  *
  * Scale notes: every operator here shuffles at most once, on `user_id`
  * (sessionize, as-of) or on the coarse window key (window agg). The as-of
  * join is the union/last-value pattern — one shuffle, no range cross-join,
  * which survives arbitrarily large fact tables as long as a single user's
  * history fits a partition (salt by time-bucket if it ever doesn't).
  */
object EventOps {

  /** events with `ts` as a proper microsecond timestamp, whatever the
    * file's physical type: a nanos LONG (legacy TIMESTAMP(NANOS) data read
    * under `spark.sql.legacy.parquet.nanosAsLong=true`) is truncated to
    * micros; TIMESTAMP / TIMESTAMP_NTZ is cast directly (identity
    * wall-clock under the UTC session). Config is never mutated here:
    * operators must not side-effect session state.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(s, dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling 1-hour window aggregation — batch/stream parity: this IS
    * [[graft.streaming.StreamOps.windowCounts]] applied to the static
    * table (withWatermark is a no-op on batch). `hour_start` is emitted
    * as TIMESTAMP_NTZ: the oracle's `make_timestamp` is tz-naive, and the
    * session runs UTC, so the NTZ wall-clock equals the oracle instant.
    */
  def qEventsWindowAgg(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.windowCounts(events(s, dir))
      .orderBy("hour_start", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap) per user.
    * lag → new-session flag → running sum = session id → per-session agg.
    */
  def qEventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tsSec  = col("ts").cast("double")
    val newSess = when(
      lag(tsSec, 1).over(byUser).isNull ||
        tsSec - lag(tsSec, 1).over(byUser) > 1800d, 1).otherwise(0)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        newSess.as("new_sess"))
      .withColumn("sess_id",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(max(col("ts").cast("double")) - min(col("ts").cast("double")), 6).as("duration_sec"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "sess_id")
  }

  /** As-of join: for every purchase, the most recent prior-or-equal view by
    * the same user. Spark-first: tag + union + last_value(ignoreNulls) over
    * an event-time window — one shuffle on user_id, no range cross join.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
        lit(null).cast("long").as("purchase_id"), lit(0).as("is_purchase"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("view_id"),
        col("event_id").as("purchase_id"), lit(1).as("is_purchase"))
    // At equal ts a view sorts before the purchase (inclusive as-of).
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_purchase"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("last_view_id", last("view_id", ignoreNulls = true).over(w))
      .withColumn("last_view_ts",
        last(when(col("view_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(
        col("purchase_id"),
        col("user_id"),
        col("last_view_id").as("view_id"),
        round(col("ts").cast("double") - col("last_view_ts").cast("double"), 6).as("lag_sec"))
      .orderBy("purchase_id")
  }

  /** Per-stage conversion horizon for [[qEventsFunnel]]: the next stage
    * must happen within a day of the previous one (chosen so the funnel
    * is non-trivial on the driver corpus: 150 → 60 → 25 users). */
  private[graft] val FUNNEL_HORIZON_SEC = 86400d

  /** Ordered funnel: first view → first click within a day of it →
    * first purchase within a day of that. Spark-first sequential-pattern
    * shape: ONE shuffle on user_id, then three stacked whole-partition
    * `min(when(...))` window steps (each may reference the previous
    * stage's timestamp — Window nodes stack over the same partitioning,
    * so the exchange is reused, no self-joins per stage), then a
    * per-user collapse and a global count. At 100 TB the cost is one
    * repartition of events by user plus map-side work — the classic
    * funnel query without a single join.
    */
  private[graft] def funnel(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val tsSec = col("ts").cast("double")
    val within = (prev: Column) =>
      tsSec >= prev && tsSec - prev <= FUNNEL_HORIZON_SEC
    ev
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "view", tsSec)).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && within(col("t1")), tsSec)).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && within(col("t2")), tsSec)).over(w))
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .agg(
        count("t1").as("users_view"),
        count("t2").as("users_click_1d"),
        count("t3").as("users_purchase_1d"),
        round(avg(col("t3") - col("t1")), 2).as("avg_sec_to_convert"))
  }

  def qEventsFunnel(s: SparkSession, dir: String): DataFrame =
    funnel(events(s, dir))

  /** Semi-structured property extraction: the events' JSON `props`
    * parsed with a SCHEMA-PINNED `from_json` — one parse per row into a
    * struct the optimizer prunes like any other column. The
    * per-field alternative (`get_json_object`) re-parses the document
    * once PER FIELD extracted; at 100 TB with wide property bags that
    * multiplier is the whole query cost. Inference is likewise banned
    * for the same reason schema inference is banned on CSV/JSONL reads:
    * it is a full extra pass.
    */
  def qJsonProps(s: SparkSession, dir: String): DataFrame = {
    val propsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    Tables.events(s, dir)
      .select(col("event_type"), from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"),
        sum("k").as("sum_k"), countDistinct("k").as("distinct_k"))
      .orderBy("event_type")
  }

  val oracleJsonProps: String =
    """WITH j AS (
      |  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
      |SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k, count(DISTINCT k) AS distinct_k
      |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Weekly retention cohorts — the canonical growth-analytics query:
    * users bucketed by first-activity week, each cohort's share still
    * active N weeks later. Shape: one distinct over (user, week) — the
    * activity matrix is tiny relative to the event stream — then a
    * per-user min (same shuffle key), a cohort×offset count, and a
    * broadcast-sized cohort-size join. The raw events reduce to
    * |users|·|weeks| rows in the FIRST aggregate; everything after is
    * cheap at any corpus size.
    */
  def qRetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val activity = events(s, dir)
      .select(col("user_id"),
        floor(col("ts").cast("double") / (86400d * 7)).cast("long").as("wk"))
      .distinct()
    val cohorts = activity.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val sizes = cohorts.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active")) // rows already distinct (user, wk)
      .join(sizes, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active") * 100.0 / col("cohort_size"), 2).as("retention_pct"))
      .orderBy("cohort_wk", "week_offset")
  }

  val oracleRetentionCohorts: String =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id,
       |    CAST(floor(epoch(make_timestamp(epoch_ns(ts) // 1000)) / ${86400d * 7}) AS BIGINT) AS wk
       |  FROM events),
       |c AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY user_id),
       |s AS (SELECT cohort_wk, count(*) AS cohort_size FROM c GROUP BY cohort_wk),
       |m AS (
       |  SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset, count(*) AS n_active
       |  FROM a JOIN c USING (user_id)
       |  GROUP BY c.cohort_wk, a.wk - c.cohort_wk)
       |SELECT m.cohort_wk, m.week_offset, m.n_active, s.cohort_size,
       |  round(m.n_active * 100.0 / s.cohort_size, 2) AS retention_pct
       |FROM m JOIN s USING (cohort_wk)
       |ORDER BY cohort_wk, week_offset""".stripMargin

  /** Band width for [[qRangeJoin]] — must be >= the range span so every
    * probe interval covers at most two bands. */
  private[graft] val RANGE_SEC = 3600d

  /** Banded RANGE JOIN — the big-big interval join Spark has no native
    * operator for: for every purchase, count the system-wide `error`
    * events in the preceding hour (an ops-health attribution query with
    * no shared key between the sides).
    *
    * A naive formulation is a cross join with a range predicate —
    * O(n·m) and banned by the plan audit. The scale-safe shape BANDS
    * the time axis: each error keys to its hour band; each purchase
    * probes its own band and the previous one (a window of width W
    * overlaps at most two W-wide bands), so the join is a plain
    * EQUALITY shuffle join on the band key with the exact range
    * predicate as a residual condition, and total work is
    * O(pairs-within-band), never O(n·m). The residual lives in the ON
    * clause so unmatched purchases survive the LEFT join (zero-error
    * hours are data, not dropped rows); each real match satisfies
    * exactly one of the probe's two band keys, so counts need no
    * dedup. Fan-out is the fixed factor 2 regardless of scale; band
    * width is the knob (size it ~range span; skewed hot bands salt
    * like any other shuffle key).
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("es", col("ts").cast("double"))
    val errors = ev.filter(col("event_type") === "error")
      .select(floor(col("es") / RANGE_SEC).cast("long").as("band"),
        col("es").as("err_es"), col("event_id").as("err_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("es"),
        floor(col("es") / RANGE_SEC).cast("long").as("pband"))
      .withColumn("band", explode(array(col("pband"), col("pband") - 1)))
    purchases.join(errors,
        purchases("band") === errors("band") &&
          col("err_es") >= col("es") - RANGE_SEC && col("err_es") <= col("es"),
        "left")
      .groupBy("purchase_id")
      .agg(count(col("err_id")).as("n_errors_1h"))
      .orderBy("purchase_id")
  }

  val oracleRangeJoin: String =
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    epoch(make_timestamp(epoch_ns(ts) // 1000)) AS es
       |  FROM events)
       |SELECT p.event_id AS purchase_id, count(x.event_id) AS n_errors_1h
       |FROM e p LEFT JOIN e x
       |  ON x.event_type = 'error' AND x.es >= p.es - $RANGE_SEC AND x.es <= p.es
       |WHERE p.event_type = 'purchase'
       |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin

  val oracleEventsFunnel: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |    epoch(make_timestamp(epoch_ns(ts) // 1000)) AS es
       |  FROM events),
       |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN es END)
       |  OVER (PARTITION BY user_id) AS t1 FROM e),
       |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND es >= t1
       |    AND es - t1 <= ${FUNNEL_HORIZON_SEC} THEN es END)
       |  OVER (PARTITION BY user_id) AS t2 FROM a),
       |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND es >= t2
       |    AND es - t2 <= ${FUNNEL_HORIZON_SEC} THEN es END)
       |  OVER (PARTITION BY user_id) AS t3 FROM b),
       |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
       |  FROM c GROUP BY user_id)
       |SELECT count(t1) AS users_view, count(t2) AS users_click_1d,
       |  count(t3) AS users_purchase_1d,
       |  round(avg(t3 - t1), 2) AS avg_sec_to_convert
       |FROM u""".stripMargin

  /** Value anomaly detection (`q_events_anomaly`) — the monitoring op a
    * pipeline runs on every ingest batch: per-event-type mean/stddev in
    * one map-side-combinable aggregate, broadcast back onto the stream,
    * z-score outliers (|v − mean| > 3σ) counted per type. The corpus
    * never shuffles: the stats frame is |event types| rows, the probe
    * is a broadcast hash join + projection. Mean and σ are rounded 6dp
    * BEFORE the comparison so both engines threshold on the identical
    * double (Welford vs naive σ accumulation differ in final ulps).
    * Degenerate groups (one row → stddev_samp NULL) make the z-score
    * predicate NULL for every row, so the sum is coalesced to 0 to match
    * the oracle's `CASE … ELSE 0` semantics.
    */
  def qEventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_type", "value")
    val stats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg("value"), 6).as("mean_v"),
        round(stddev_samp("value"), 6).as("sd_v"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy("event_type", "n", "mean_v", "sd_v")
      .agg(coalesce(
        sum((abs(col("value") - col("mean_v")) > col("sd_v") * 3).cast("long")),
        lit(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("mean_v"), col("sd_v"), col("n_outliers"))
      .orderBy("event_type")
  }

  val oracleEventsAnomaly: String =
    """WITH st AS (
      |  SELECT event_type, count(*) AS n,
      |    round(avg(value), 6) AS mean_v,
      |    round(stddev_samp(value), 6) AS sd_v
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, st.n, st.mean_v, st.sd_v,
      |  CAST(sum(CASE WHEN abs(e.value - st.mean_v) > st.sd_v * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN st USING (event_type)
      |GROUP BY e.event_type, st.n, st.mean_v, st.sd_v
      |ORDER BY e.event_type""".stripMargin

  // ------------------------------------------------------- session window

  /** Native `session_window` sessionization (`q_session_window`) — the
    * built-in operator twin of `q_events_sessionize`'s window-cumsum
    * construction (and of the streaming fMGWS path): one groupBy over
    * (user, session_window(ts, gap)) — Spark's SessionWindowing plans a
    * dedicated merging aggregate, no lag/cumsum scaffolding. Spark's gap
    * semantics are half-open (an event exactly GAP after the previous
    * starts a NEW session), mirrored by the oracle's `>=` cut.
    */
  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("sess_start"),
        col("sw.end").cast("timestamp_ntz").as("sess_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")

  val oracleSessionWindow: String =
    """WITH e AS (SELECT user_id, value, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
      |x AS (SELECT user_id, value, ts,
      |  CASE WHEN lag(ts) OVER w IS NULL OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
      |       THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, value, ts,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
      | count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin

  // --------------------------------------------------------------- EWMA

  /** Smoothing factor for the EWMA monitor — literal text shared with
    * the oracle. */
  private val EWMA_ALPHA = "0.3"

  /** EWMA spike monitor (`q_events_ewma`): per event type, hourly counts
    * folded left-to-right through e_t = α·x_t + (1−α)·e_{t−1} (seeded
    * with the first hour), counting hours whose count exceeds 2× the
    * running mean — the TREND-aware anomaly twin of `q_events_anomaly`'s
    * static z-score (a level shift stops alarming once the EWMA adapts).
    *
    * Scale shape: the raw events reduce to an hourly aggregate first
    * (map-side combinable); the sequential fold runs over each type's
    * bounded hours-long array only — never the event stream. The fold is
    * pure double arithmetic in a fixed order, so both engines produce
    * bit-identical states.
    */
  def qEventsEwma(s: SparkSession, dir: String): DataFrame = {
    val a = expr(EWMA_ALPHA)
    val hourly = events(s, dir)
      .groupBy(col("event_type"),
        floor(col("ts").cast("double") / 3600).cast("long").as("hr"))
      .agg(count(lit(1)).cast("double").as("n"))
    hourly.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("hr"), col("n")))).as("series"))
      .select(col("event_type"),
        size(col("series")).cast("long").as("n_hours"),
        aggregate(
          expr("slice(series, 2, greatest(size(series) - 1, 0))"),
          array(col("series").getItem(0).getField("n"), lit(0.0)),
          (acc, x) => array(
            a * x.getField("n") + (lit(1.0) - a) * element_at(acc, 1),
            element_at(acc, 2) +
              (x.getField("n") > element_at(acc, 1) * 2.0).cast("double"))).as("st"))
      .select(col("event_type"), col("n_hours"),
        round(element_at(col("st"), 1), 6).as("ewma_final"),
        element_at(col("st"), 2).cast("long").as("n_spikes"))
      .orderBy("event_type")
  }

  val oracleEventsEwma: String =
    s"""WITH hourly AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(make_timestamp(epoch_ns(ts) // 1000)) / 3600) AS BIGINT) AS hr,
       |    count(*)::DOUBLE AS n
       |  FROM events GROUP BY 1, 2),
       |series AS (SELECT event_type, list(n ORDER BY hr) AS xs FROM hourly GROUP BY 1)
       |SELECT event_type, CAST(len(xs) AS BIGINT) AS n_hours,
       | round(list_reduce(list_transform(xs, x -> [x, 0.0]),
       |   (acc, el) -> [$EWMA_ALPHA * el[1] + (1.0 - $EWMA_ALPHA) * acc[1],
       |                 acc[2] + CASE WHEN el[1] > acc[1] * 2.0 THEN 1.0 ELSE 0.0 END])[1], 6)
       |   AS ewma_final,
       | CAST(list_reduce(list_transform(xs, x -> [x, 0.0]),
       |   (acc, el) -> [$EWMA_ALPHA * el[1] + (1.0 - $EWMA_ALPHA) * acc[1],
       |                 acc[2] + CASE WHEN el[1] > acc[1] * 2.0 THEN 1.0 ELSE 0.0 END])[2] AS BIGINT)
       |   AS n_spikes
       |FROM series ORDER BY event_type""".stripMargin

  /** Time-weighted average (`q_time_weighted_avg`) — the TWAP of the
    * value stream per (event type, day): each observation holds until
    * the next one, so the day's mean weights every value by its holding
    * interval (irregular cadence makes the plain avg wrong). One lead
    * window per (type, day) partition — DAY-BOUNDED by construction, so
    * no partition outgrows a task at any corpus size (contrast a
    * per-type-only partition: one task per type forever). The last
    * observation of each day has no successor and carries no weight in
    * both engines.
    */
  def qTimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("ts"), col("event_id"), col("value"))
      .withColumn("dt", lead(col("ts").cast("double"), 1).over(w) - col("ts").cast("double"))
      .filter(col("dt").isNotNull)
      .groupBy("event_type", "d")
      .agg(round(sum(col("value") * col("dt")) / sum("dt"), 6).as("twap"),
        count(lit(1)).as("n_seg"))
      .orderBy("event_type", "d")
  }

  val oracleTimeWeightedAvg: String =
    """WITH e AS (
      |  SELECT event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id, value
      |  FROM events),
      |x AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, value,
      |    epoch(lead(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |      ORDER BY ts, event_id)) - epoch(ts) AS dt
      |  FROM e)
      |SELECT event_type, d, round(sum(value * dt) / sum(dt), 6) AS twap,
      |  count(*) AS n_seg
      |FROM x WHERE dt IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Day-of-week seasonality profile (`q_seasonal_profile`): per
    * (event type, weekday) counts and mean value, the weekday's share
    * of the type's volume, and a peak-day flag. One map-side-combined
    * aggregate to the ≤|types|·7-row frame; share/peak via window sums
    * over THAT bounded frame only. Weekday numbering is pinned to
    * 0=Sunday in both engines (Spark dayofweek()−1 = DuckDB dayofweek).
    */
  def qSeasonalProfile(s: SparkSession, dir: String): DataFrame = {
    val agg = events(s, dir)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"), col("value"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("avg_v"))
    val byType = Window.partitionBy("event_type")
    agg
      .withColumn("share", round(col("n").cast("double") / sum("n").over(byType), 6))
      .withColumn("is_peak", (col("n") === max("n").over(byType)).cast("int"))
      .select("event_type", "dow", "n", "avg_v", "share", "is_peak")
      .orderBy("event_type", "dow")
  }

  val oracleSeasonalProfile: String =
    """WITH e AS (
      |  SELECT event_type, dayofweek(make_timestamp(epoch_ns(ts) // 1000)) AS dow, value
      |  FROM events),
      |agg AS (
      |  SELECT event_type, dow, count(*) AS n, round(avg(value), 6) AS avg_v
      |  FROM e GROUP BY 1, 2)
      |SELECT event_type, dow, n, avg_v,
      |  round(n::DOUBLE / sum(n) OVER (PARTITION BY event_type), 6) AS share,
      |  CAST(n = max(n) OVER (PARTITION BY event_type) AS INT) AS is_peak
      |FROM agg ORDER BY event_type, dow""".stripMargin

  /** Multiplicative-residual anomaly band for [[qStlDecompose]]. */
  private[graft] val STL_BAND = 0.3

  /** Classical trend/seasonal/residual decomposition (`q_stl_decompose`)
    * of the daily event volume — the moving-average decomposition
    * behind every capacity dashboard, and what [[qSeasonalProfile]]'s
    * static profile can't do: tell a GROWING Tuesday from a Tuesday
    * that is merely always big. Trend = centered 7-day MA (edge days
    * average their available neighbors — same ROWS-frame semantics
    * both engines); seasonal index = mean detrended ratio per weekday;
    * residual = volume/(trend·seasonal) with ±[[STL_BAND]] anomaly
    * flags.
    *
    * Scale shape: the raw stream reduces to the |days| frame FIRST;
    * every window after that is over the calendar-bounded daily frame
    * (whitelisted), never the event stream.
    */
  def qStlDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val ma = Window.orderBy("day").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend", avg(col("n")).over(ma))
      .withColumn("dow", dayofweek(col("day")) - 1)
      .withColumn("ratio", col("n") / col("trend"))
    // Deterministic seasonal fold: sum the per-dow ratios in sorted order
    // (collect_list → array_sort → aggregate) instead of a float partial
    // aggregation whose addition order varies with the shuffle — the same
    // order-pinned discipline qSurvivalKm/qBootstrapCi use. The per-dow
    // frame is calendar-bounded (≤|days|/7 doubles), so the collected
    // array is tiny at any corpus size.
    val seasonal = trended.groupBy("dow")
      .agg(collect_list(col("ratio")).as("ratios"))
      .select(col("dow"),
        round(aggregate(array_sort(col("ratios")), lit(0.0d),
          (acc, x) => acc + x) / size(col("ratios")), 6).as("seasonal"))
    trended.join(broadcast(seasonal), "dow")
      .withColumn("resid",
        round(col("n") / (col("trend") * col("seasonal")), 6))
      .select(col("day").cast("timestamp_ntz").as("day"), col("n"),
        round(col("trend"), 4).as("trend"), col("dow"), col("seasonal"),
        col("resid"),
        (col("resid") > 1 + STL_BAND || col("resid") < 1 - STL_BAND)
          .as("anomaly"))
      .orderBy("day")
  }

  val oracleStlDecompose: String =
    s"""WITH daily AS (
       |  SELECT date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT day, n,
       |    avg(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
       |    dayofweek(day) AS dow
       |  FROM daily),
       |r AS (SELECT day, n, trend, dow, n / trend AS ratio FROM t),
       |-- sorted left-fold, mirroring Spark's aggregate(array_sort(...)):
       |-- a plain avg() sums in scan order and a last-ulp difference can
       |-- cross the 6dp rounding grain on larger calendars
       |se AS (SELECT dow,
       |  round(list_reduce(list_prepend(0.0::DOUBLE, list_sort(list(ratio))),
       |    (acc, x) -> acc + x) / count(ratio), 6) AS seasonal
       |  FROM r GROUP BY dow)
       |SELECT r.day, r.n, round(r.trend, 4) AS trend, r.dow, se.seasonal,
       |  round(r.n / (r.trend * se.seasonal), 6) AS resid,
       |  (round(r.n / (r.trend * se.seasonal), 6) > ${1 + STL_BAND}
       |   OR round(r.n / (r.trend * se.seasonal), 6) < ${1 - STL_BAND}) AS anomaly
       |FROM r JOIN se USING (dow) ORDER BY r.day""".stripMargin

  /** Holt's smoothing weights, literal text shared with the oracle so
    * both engines fold the identical constants. */
  private val HW_ALPHA = "0.5"
  private val HW_BETA  = "0.3"

  /** Holt double-exponential smoothing (`q_holt_winters`) of the daily
    * event volume — the trend-aware operational forecaster between
    * [[qEventsEwma]] (level only; lags any trend) and
    * [[qStlDecompose]] (retrospective decomposition; no forecast):
    * level ← α·n + (1−α)·(level+trend), trend ← β·Δlevel + (1−β)·trend,
    * with the one-step-ahead forecast and its error per day. The
    * recursion is inherently sequential, so it folds LEFT-TO-RIGHT over
    * the sorted daily array (collect_list → array_sort → aggregate) —
    * the deterministic-fold discipline — with each step 9dp-rounded so
    * the Spark fold and the oracle's recursive CTE walk bit-identical
    * state.
    *
    * Scale shape: the event stream reduces to the calendar-bounded
    * daily frame FIRST (one map-side-combinable aggregate); the fold
    * runs once over that |days| array — O(days) state on one row, never
    * a per-event window.
    */
  def qHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val a = lit(HW_ALPHA.toDouble); val b = lit(HW_BETA.toDouble)
    val rowT = "array<struct<day:timestamp,n:bigint,level:double," +
      "trend:double,forecast:double,err:double>>"
    daily.agg(collect_list(struct(col("day"), col("n"))).as("ds"))
      .select(aggregate(
        array_sort(col("ds")),
        struct(lit(0.0).as("level"), lit(0.0).as("trend"),
          array().cast(rowT).as("rows")),
        (acc, x) => {
          val first = size(acc.getField("rows")) === 0
          val nD = x.getField("n").cast("double")
          val fPrev = round(acc.getField("level") + acc.getField("trend"), 9)
          val lvl = when(first, nD)
            .otherwise(round(a * nD + (lit(1.0) - a) * fPrev, 9))
          val tr = when(first, lit(0.0))
            .otherwise(round(b * (lvl - acc.getField("level")) +
              (lit(1.0) - b) * acc.getField("trend"), 9))
          val fc = when(first, lit(null).cast("double")).otherwise(fPrev)
          val er = when(first, lit(null).cast("double"))
            .otherwise(round(nD - fPrev, 9))
          struct(lvl.as("level"), tr.as("trend"),
            concat(acc.getField("rows"), array(struct(
              x.getField("day").as("day"), x.getField("n").as("n"),
              lvl.as("level"), tr.as("trend"),
              fc.as("forecast"), er.as("err")))).as("rows"))
        }).as("st"))
      .select(explode(col("st.rows")).as("r"))
      // no output re-rounding: the state is already 9dp-pinned per step
      // and BIT-IDENTICAL across engines; a second coarser round can
      // land on a decimal tie where Spark (HALF_UP on the shortest
      // repr) and DuckDB (C rounding) disagree — the sf1 battery caught
      // exactly one such row
      .select(col("r.day").cast("timestamp_ntz").as("day"), col("r.n").as("n"),
        col("r.level").as("level"), col("r.trend").as("trend"),
        col("r.forecast").as("forecast"), col("r.err").as("err"))
      .orderBy("day")
  }

  val oracleHoltWinters: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1),
       |idx AS (SELECT day, n, row_number() OVER (ORDER BY day) AS i FROM daily),
       |hw AS (
       |  -- the anchor's literals must be typed DOUBLE: a bare 0.0 is
       |  -- DECIMAL(2,1) and the union would pin the recursive trend
       |  -- column to one decimal place, silently quantizing every step
       |  SELECT i, day, n, n::DOUBLE AS level, 0.0::DOUBLE AS trend,
       |    NULL::DOUBLE AS forecast, NULL::DOUBLE AS err
       |  FROM idx WHERE i = 1
       |  UNION ALL
       |  SELECT x.i, x.day, x.n,
       |    round($HW_ALPHA * x.n + (1.0 - $HW_ALPHA) * round(h.level + h.trend, 9), 9),
       |    round($HW_BETA * (round($HW_ALPHA * x.n + (1.0 - $HW_ALPHA)
       |        * round(h.level + h.trend, 9), 9) - h.level)
       |      + (1.0 - $HW_BETA) * h.trend, 9),
       |    round(h.level + h.trend, 9),
       |    round(x.n - round(h.level + h.trend, 9), 9)
       |  FROM idx x JOIN hw h ON x.i = h.i + 1)
       |SELECT day, n, level, trend, forecast, err
       |FROM hw ORDER BY day""".stripMargin

  /** First-order Markov transition model over per-user event paths — the
    * path-mining primitive behind next-action prediction and funnel
    * drop-off attribution: P(next event type | current event type), top-3
    * next states per state.
    *
    * Scale shape: the only fact-sized work is one `lead` window over
    * per-user history (shuffles once on user_id — the same partitioning
    * every operator in this file rides) and one map-side-combined
    * groupBy; everything after runs on the ≤|event_types|² transition
    * frame (bounded at any corpus size), so the per-state total join is
    * broadcast and the ranking window is over a bounded frame, never raw
    * events.
    */
  def qMarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bigrams = events(s, dir)
      .select(col("event_type").as("cur_state"),
        lead("event_type", 1).over(byUser).as("next_state"))
      .filter(col("next_state").isNotNull)
    val counts = bigrams.groupBy("cur_state", "next_state")
      .agg(count(lit(1)).as("n_trans"))
    val totals = counts.groupBy("cur_state").agg(sum("n_trans").as("tot"))
    val byCur = Window.partitionBy("cur_state")
      .orderBy(desc("n_trans"), col("next_state"))
    counts.join(broadcast(totals), "cur_state")
      .withColumn("prob", round(col("n_trans") / col("tot"), 6))
      .withColumn("trans_rank", row_number().over(byCur))
      .filter(col("trans_rank") <= 3)
      .select("cur_state", "next_state", "n_trans", "prob", "trans_rank")
      .orderBy("cur_state", "trans_rank")
  }

  val oracleMarkovTransitions: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         make_timestamp(epoch_ns(ts) // 1000) AS t
      |  FROM events),
      |b AS (
      |  SELECT event_type AS cur_state,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS next_state
      |  FROM e),
      |c AS (SELECT cur_state, next_state, count(*) AS n_trans
      |      FROM b WHERE next_state IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT cur_state, CAST(sum(n_trans) AS BIGINT) AS tot FROM c GROUP BY 1),
      |r AS (
      |  SELECT cur_state, next_state, n_trans,
      |         round(n_trans * 1.0 / tot, 6) AS prob,
      |         row_number() OVER (PARTITION BY cur_state
      |                            ORDER BY n_trans DESC, next_state) AS trans_rank
      |  FROM c JOIN tot USING (cur_state))
      |SELECT cur_state, next_state, n_trans, prob, CAST(trans_rank AS INT) AS trans_rank
      |FROM r WHERE trans_rank <= 3
      |ORDER BY cur_state, trans_rank""".stripMargin

  /** Multi-touch attribution (`q_attribution`): credit each purchase's
    * preceding touches (same user, since the previous purchase) under
    * BOTH standard models at once — last-touch (the final touch before
    * the conversion gets the whole credit) and linear (every touch in
    * the journey segment gets 1/n) — the marketing/behavior attribution
    * readout over event paths. Touches in a segment with no closing
    * purchase earn nothing.
    *
    * Scale shape: segments come from ONE user-partitioned running sum
    * (purchases-before-me), so journey assembly is a window, not a
    * self-join; the closing-purchase check is an equality join on
    * (user, seg). Per-touch linear credit 1/n is rounded to 9dp and
    * summed as DECIMAL(18,9) — one correctly-rounded IEEE division per
    * touch, then an EXACT sum, so the total is engine-identical in any
    * aggregation order (the float-sum-order trap never opens). Raw
    * nanos `ts` is used for ordering only, never emitted.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("seg",
        sum("is_p").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("is_p"))
    val closed = evs.filter(col("is_p") === 1).select(col("user_id"), col("seg"))
    val bySeg = Window.partitionBy("user_id", "seg")
    val touches = evs.filter(col("is_p") === 0)
      .join(closed, Seq("user_id", "seg"))
      .withColumn("rn", row_number().over(bySeg.orderBy(desc("ts"), desc("event_id"))))
      .withColumn("nseg", count(lit(1)).over(bySeg))
    touches.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_touch"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("last_touch"),
        sum(round(lit(1.0) / col("nseg"), 9).cast("decimal(18,9)"))
          .cast("double").as("linear"))
      .orderBy("event_type")
  }

  val oracleAttribution: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      |  FROM events),
      |s AS (
      |  SELECT *, sum(is_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) - is_p AS seg
      |  FROM e),
      |closed AS (SELECT user_id, seg FROM s WHERE is_p = 1),
      |t AS (
      |  SELECT s.user_id, s.seg, s.event_type, s.ts, s.event_id
      |  FROM s JOIN closed USING (user_id, seg) WHERE s.is_p = 0),
      |r AS (
      |  SELECT event_type,
      |    row_number() OVER (PARTITION BY user_id, seg
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id, seg) AS nseg
      |  FROM t)
      |SELECT event_type, count(*) AS n_touch,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
      |  CAST(sum(CAST(round(1.0::DOUBLE / nseg, 9) AS DECIMAL(18,9))) AS DOUBLE) AS linear
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- active-user curve

  /** DAU/WAU active-user curve (`q_active_users`) — the canonical product
    * engagement readout: per observed day, distinct daily actives,
    * distinct trailing-7-day actives, and stickiness = DAU/WAU. The
    * trailing-window distinct is NOT a sliding window: each (user, day)
    * activity fact fans out FORWARD to the ≤7 calendar days it keeps the
    * user "weekly active" for (a 7× explode of the already-distinct
    * user-day frame), and WAU is a plain distinct count per day — the
    * shape that scales, because the user-day frame is ≤ |users|×|days|
    * however large the raw event stream is, and the fan-out is a
    * constant 7.
    *
    * Scale shape: one map-side-partial distinct to the user-day frame;
    * DAU is a count over it (already unique); the 7-day fan-out and the
    * WAU distinct run on that reduced frame, never the events fact.
    */
  def qActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val ud = events(s, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct()
      .cache()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val cover = ud.select(col("user_id"),
      explode(sequence(col("day"), col("day") + expr("interval 6 days"),
        expr("interval 1 day"))).as("day"))
    val wau = cover.groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day").cast("timestamp_ntz").as("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  val oracleActiveUsers: String =
    """WITH e AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id FROM events),
      |ud AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM e),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |cover AS (
      |  SELECT user_id, day + i * INTERVAL 1 DAY AS day
      |  FROM ud, unnest(generate_series(0, 6)) t(i)),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM cover GROUP BY day)
      |SELECT d.day, d.dau, w.wau,
      |  round(d.dau::DOUBLE / w.wau, 6) AS stickiness
      |FROM dau d JOIN wau w ON d.day = w.day
      |ORDER BY d.day""".stripMargin

  // ---------------------------------------------------------- session paths

  /** Events per session the path string keeps (the classic path-analysis
    * truncation — long sessions share their prefix). */
  private[graft] val PATH_CAP = 8
  private[graft] val PATH_TOP = 15

  /** Session path mining (`q_session_paths`): the top event-type
    * SEQUENCES users actually walk ("view>view>purchase"), the product
    * readout funnels approximate with fixed stages. Sessions are the
    * same 30-minute-gap construction as [[qEventsSessionize]]; each
    * session's first [[PATH_CAP]] event types (by event time) join into
    * a path string, reported with session counts and mean session
    * length, top [[PATH_TOP]] by frequency.
    *
    * Scale shape: ONE shuffle on user_id (the session window);
    * the per-session fold reuses that partitioning (user_id clusters
    * (user_id, sess_id) — no second exchange) and its collect_list is
    * bounded by session length (the watermarked-stream twin bounds it
    * by the horizon); the path frequency agg shuffles only the
    * |distinct paths| frame, and top-K is TakeOrdered, never a global
    * sort.
    */
  def qSessionPaths(s: SparkSession, dir: String): DataFrame =
    sessionPathsOf(events(s, dir))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(PATH_TOP)

  /** The full (path, n_sessions, avg_len) frame before the top-K cut,
    * over any (user_id, event_id, ts, event_type) events frame. */
  private[graft] def sessionPathsOf(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tsSec  = col("ts").cast("double")
    val newSess = when(
      lag(tsSec, 1).over(byUser).isNull ||
        tsSec - lag(tsSec, 1).over(byUser) > 1800d, 1).otherwise(0)
    // Per-session agg state is bounded at PATH_CAP: rank events within
    // the session FIRST (row_number over (user_id, sess_id) — satisfied
    // by the existing user_id hash partitioning, so it costs a sort, not
    // a shuffle) and collect only the first PATH_CAP structs
    // (collect_list skips the nulls the `when` produces past the cap).
    // Without this, one bot emitting an event every 25 minutes forever is
    // ONE session whose entire history would buffer in a single group's
    // state; with it, state is O(PATH_CAP) per session at any corpus
    // size while `len` still counts the full session.
    val bySess = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    val paths = ev
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        newSess.as("new_sess"))
      .withColumn("sess_id",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(bySess))
      .groupBy("user_id", "sess_id")
      .agg(
        concat_ws(">",
          transform(
            array_sort(collect_list(when(col("rn") <= PATH_CAP,
              struct(col("ts"), col("event_id"), col("event_type"))))),
            x => x.getField("event_type"))).as("path"),
        count(lit(1)).as("len"))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"), round(avg("len"), 6).as("avg_len"))
  }

  val oracleSessionPaths: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |  make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
       |x AS (SELECT user_id, event_id, event_type, ts,
       |  CASE WHEN lag(ts) OVER w IS NULL OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
       |       THEN 1 ELSE 0 END AS new_sess
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (SELECT user_id, event_id, event_type, ts,
       |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
       |  FROM x),
       |p AS (
       |  SELECT user_id, sess_id,
       |    array_to_string(list_slice(list(event_type ORDER BY ts, event_id),
       |      1, $PATH_CAP), '>') AS path,
       |    count(*) AS len
       |  FROM s GROUP BY user_id, sess_id)
       |SELECT path, count(*) AS n_sessions, round(avg(len), 6) AS avg_len
       |FROM p GROUP BY path
       |ORDER BY n_sessions DESC, path LIMIT $PATH_TOP""".stripMargin

  // ---------------------------------------------------- growth accounting

  /** Daily growth accounting (`q_user_lifecycle`) — the decomposition
    * product teams read before any DAU number: each day's actives split
    * into NEW (first day ever), RETAINED (also active yesterday) and
    * RESURRECTED (active before, but not yesterday), plus CHURNED (active
    * yesterday, silent today) and the quick ratio (new + resurrected) /
    * churned. Complements [[qActiveUsers]] (level, not flow) and
    * [[qRetentionCohorts]] (cohort decay, not day-over-day state).
    *
    * Churn is only accounted inside the observation window (a user whose
    * last active day is the corpus's last day is not declared churned on
    * the day after the data ends).
    *
    * Scale shape: the distinct (user, day) frame shuffles ONCE on
    * user_id; both lag and lead ride the same window partitioning. The
    * per-day flows are map-side-combinable aggregates to a |days|-row
    * frame, and the churn cap is a 1-row broadcast. No global windows,
    * nothing downstream of the user_id shuffle grows with the corpus.
    */
  def qUserLifecycle(s: SparkSession, dir: String): DataFrame = {
    val ud = events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val byUser = Window.partitionBy("user_id").orderBy("day")
    val w = ud
      .withColumn("prev_day", lag(col("day"), 1).over(byUser))
      .withColumn("next_day", lead(col("day"), 1).over(byUser))
    val flows = w.groupBy("day").agg(
      sum(when(col("prev_day").isNull, 1).otherwise(0)).as("n_new"),
      sum(when(col("prev_day") === col("day") - expr("interval 1 day"), 1)
        .otherwise(0)).as("n_retained"),
      sum(when(col("prev_day").isNotNull &&
        col("prev_day") < col("day") - expr("interval 1 day"), 1)
        .otherwise(0)).as("n_resurrected"))
    val lastDay = ud.agg(max("day").as("last_day"))
    val churn = w
      .filter(col("next_day").isNull ||
        col("next_day") > col("day") + expr("interval 1 day"))
      .select((col("day") + expr("interval 1 day")).as("day"))
      .crossJoin(broadcast(lastDay))
      .filter(col("day") <= col("last_day"))
      .groupBy("day").agg(count(lit(1)).as("n_churned"))
    flows.join(churn, Seq("day"), "full_outer")
      .select(col("day").cast("timestamp_ntz").as("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .withColumn("quick_ratio",
        round((col("n_new") + col("n_resurrected")).cast("double") /
          expr("nullif(n_churned, 0)"), 6))
      .orderBy("day")
  }

  val oracleUserLifecycle: String =
    """WITH e AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id FROM events),
      |ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM e),
      |w AS (SELECT user_id, day,
      |        lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
      |        lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      |      FROM ud),
      |flows AS (SELECT day,
      |    count(*) FILTER (WHERE prev_day IS NULL) AS n_new,
      |    count(*) FILTER (WHERE prev_day = day - INTERVAL 1 DAY) AS n_retained,
      |    count(*) FILTER (WHERE prev_day IS NOT NULL
      |                       AND prev_day < day - INTERVAL 1 DAY) AS n_resurrected
      |  FROM w GROUP BY day),
      |churn AS (
      |  SELECT day + INTERVAL 1 DAY AS day, count(*) AS n_churned
      |  FROM w
      |  WHERE (next_day IS NULL OR next_day > day + INTERVAL 1 DAY)
      |    AND day + INTERVAL 1 DAY <= (SELECT max(day) FROM ud)
      |  GROUP BY day + INTERVAL 1 DAY)
      |SELECT coalesce(f.day, c.day) AS day,
      |  coalesce(f.n_new, 0) AS n_new,
      |  coalesce(f.n_retained, 0) AS n_retained,
      |  coalesce(f.n_resurrected, 0) AS n_resurrected,
      |  coalesce(c.n_churned, 0) AS n_churned,
      |  round((coalesce(f.n_new, 0) + coalesce(f.n_resurrected, 0))::DOUBLE
      |    / nullif(coalesce(c.n_churned, 0), 0), 6) AS quick_ratio
      |FROM flows f FULL OUTER JOIN churn c ON f.day = c.day
      |ORDER BY day""".stripMargin

  // -------------------------------------------------------------- dwell

  /** Dwell-time per event type (`q_dwell_time`) — time-on-task: how long
    * a user stays on each event before their NEXT action, and how often
    * each type ENDS a session. Dwell = gap to the user's next event (any
    * type) when within the 30-minute session gap; a gap beyond it (or no
    * next event) marks the current event session-terminating — the
    * per-type exit rate. Equivalent to sessionizing first and taking
    * lead-within-session, without materializing sessions.
    *
    * Scale shape: ONE shuffle on user_id (the lead window — bounded
    * per-user partitions), then a map-side-combinable aggregate onto the
    * |event types| frame.
    */
  def qDwellTime(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tsSec = col("ts").cast("double")
    val gap = lead(tsSec, 1).over(byUser) - tsSec
    EventOps.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("dwell_s", when(gap <= 1800d, gap))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count("dwell_s").as("n_with_dwell"),
        round(avg("dwell_s"), 4).as("mean_dwell_s"),
        round(max("dwell_s"), 4).as("max_dwell_s"))
      .withColumn("exit_rate",
        round(lit(1d) - col("n_with_dwell").cast("double") / col("n_events"), 6))
      .orderBy("event_type")
  }

  val oracleDwellTime: String =
    """WITH e AS (SELECT user_id, event_type, event_id,
      |  make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
      |g AS (SELECT event_type,
      |    epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch(ts) AS gap
      |  FROM e),
      |d AS (SELECT event_type,
      |    CASE WHEN gap <= 1800 THEN gap ELSE NULL END AS dwell_s FROM g)
      |SELECT event_type, count(*) AS n_events,
      |  count(dwell_s) AS n_with_dwell,
      |  round(avg(dwell_s), 4) AS mean_dwell_s,
      |  round(max(dwell_s), 4) AS max_dwell_s,
      |  round(1.0 - count(dwell_s)::DOUBLE / count(*), 6) AS exit_rate
      |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- burstiness

  /** Inter-arrival burstiness per event type (`q_burstiness`) — is a
    * user's stream of each event type Poisson-like, periodic, or bursty?
    * Gaps are measured WITHIN each (user, event_type) series (a global
    * per-type gap series would just measure fleet arrival rate); the
    * per-type readout aggregates every user's gaps: mean, sample SD,
    * coefficient of variation, and the Goh–Barabási burstiness
    * B = (σ − μ)/(σ + μ) (−1 periodic, 0 Poisson, → 1 bursty).
    *
    * Scale shape: one shuffle on (user_id, event_type) — high
    * cardinality, no low-cardinality window partitions — then a
    * map-side-combinable moment aggregate onto the |event types| frame.
    */
  def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val gaps = events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_s",
        col("ts").cast("double") - lag(col("ts").cast("double"), 1).over(byKey))
      .filter(col("gap_s").isNotNull)
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        avg("gap_s").as("mu"),
        stddev_samp(col("gap_s")).as("sd"))
      .select(col("event_type"), col("n_gaps"),
        round(col("mu"), 4).as("mean_gap_s"),
        round(col("sd"), 4).as("sd_gap_s"),
        round(col("sd") / col("mu"), 6).as("cv"),
        round((col("sd") - col("mu")) / (col("sd") + col("mu")), 6)
          .as("burstiness"))
      .orderBy("event_type")
  }

  val oracleBurstiness: String =
    """WITH e AS (SELECT user_id, event_type, event_id,
      |  make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
      |g AS (SELECT event_type,
      |    epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id, event_type
      |                                    ORDER BY ts, event_id)) AS gap_s
      |  FROM e),
      |gg AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL)
      |SELECT event_type, count(*) AS n_gaps,
      |  round(avg(gap_s), 4) AS mean_gap_s,
      |  round(stddev_samp(gap_s), 4) AS sd_gap_s,
      |  round(stddev_samp(gap_s) / avg(gap_s), 6) AS cv,
      |  round((stddev_samp(gap_s) - avg(gap_s))
      |      / (stddev_samp(gap_s) + avg(gap_s)), 6) AS burstiness
      |FROM gg GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------- STL strength
  /** Seasonal/trend STRENGTH (`q_stl_strength`) — the one-number summary
    * of [[qStlDecompose]]'s full decomposition (Hyndman's F_s/F_t,
    * multiplicative form): F_s = max(0, 1 − Var(R)/Var(S·R)) over the
    * detrended series and F_t = max(0, 1 − Var(R)/Var(T·R)) over the
    * deseasonalized one. The gate a forecasting pipeline checks before
    * choosing a seasonal model at all.
    *
    * Determinism: per-day ratios are rounded to 6dp (the qStlDecompose
    * grain) BEFORE the variance folds, and every variance folds over
    * the day-sorted array (the sorted-fold discipline) — the daily
    * frame is calendar-bounded, so the collected arrays are tiny at
    * any corpus size.
    */
  def qStlStrength(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val ma = Window.orderBy("day").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend", avg(col("n")).over(ma))
      .withColumn("dow", dayofweek(col("day")) - 1)
      .withColumn("ratio", col("n") / col("trend"))
    val seasonal = trended.groupBy("dow")
      .agg(collect_list(col("ratio")).as("ratios"))
      .select(col("dow"),
        round(aggregate(array_sort(col("ratios")), lit(0.0d),
          (acc, x) => acc + x) / size(col("ratios")), 6).as("seasonal"))
    val parts = trended.join(broadcast(seasonal), "dow")
      .select(col("day"),
        round(col("n") / (col("trend") * col("seasonal")), 6).as("r"),
        round(col("n") / col("trend"), 6).as("d"),
        round(col("n") / col("seasonal"), 6).as("t"))
    // day-sorted variance folds: collect (day, v), sort, fold sum + sumsq
    def sortedVar(vc: String): Column = {
      val arr = array_sort(collect_list(struct(col("day"), col(vc).as("v"))))
      val n = size(arr).cast("double")
      val sm = aggregate(arr, lit(0.0d), (a, e) => a + e.getField("v"))
      val sq = aggregate(arr, lit(0.0d), (a, e) => a + e.getField("v") * e.getField("v"))
      (sq - sm * sm / n) / n
    }
    parts.agg(
        count(lit(1)).as("n_days"),
        sortedVar("r").as("var_r"),
        sortedVar("d").as("var_d"),
        sortedVar("t").as("var_t"))
      .select(col("n_days"),
        round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_d")), 6)
          .as("f_seasonal"),
        round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_t")), 6)
          .as("f_trend"),
        round(col("var_r"), 6).as("var_resid"))
  }

  val oracleStlStrength: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT day, n,
      |    avg(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
      |    dayofweek(day) AS dow
      |  FROM daily),
      |r AS (SELECT day, n, trend, dow, n / trend AS ratio FROM t),
      |se AS (SELECT dow,
      |  round(list_reduce(list_prepend(0.0::DOUBLE, list_sort(list(ratio))),
      |    (acc, x) -> acc + x) / count(ratio), 6) AS seasonal
      |  FROM r GROUP BY dow),
      |parts AS (SELECT r.day,
      |  round(r.n / (r.trend * se.seasonal), 6) AS rr,
      |  round(r.n / r.trend, 6) AS dd,
      |  round(r.n / se.seasonal, 6) AS tt
      |  FROM r JOIN se USING (dow)),
      |v AS (SELECT count(*) AS n_days,
      |  (list_reduce(list_prepend(0.0::DOUBLE, list(rr * rr ORDER BY day)), (acc, x) -> acc + x)
      |   - list_reduce(list_prepend(0.0::DOUBLE, list(rr ORDER BY day)), (acc, x) -> acc + x)
      |     * list_reduce(list_prepend(0.0::DOUBLE, list(rr ORDER BY day)), (acc, x) -> acc + x)
      |     / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS var_r,
      |  (list_reduce(list_prepend(0.0::DOUBLE, list(dd * dd ORDER BY day)), (acc, x) -> acc + x)
      |   - list_reduce(list_prepend(0.0::DOUBLE, list(dd ORDER BY day)), (acc, x) -> acc + x)
      |     * list_reduce(list_prepend(0.0::DOUBLE, list(dd ORDER BY day)), (acc, x) -> acc + x)
      |     / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS var_d,
      |  (list_reduce(list_prepend(0.0::DOUBLE, list(tt * tt ORDER BY day)), (acc, x) -> acc + x)
      |   - list_reduce(list_prepend(0.0::DOUBLE, list(tt ORDER BY day)), (acc, x) -> acc + x)
      |     * list_reduce(list_prepend(0.0::DOUBLE, list(tt ORDER BY day)), (acc, x) -> acc + x)
      |     / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS var_t
      |  FROM parts)
      |SELECT CAST(n_days AS BIGINT) AS n_days,
      |  round(greatest(0.0, 1.0 - var_r / var_d), 6) AS f_seasonal,
      |  round(greatest(0.0, 1.0 - var_r / var_t), 6) AS f_trend,
      |  round(var_r, 6) AS var_resid
      |FROM v""".stripMargin

  // ------------------------------------------------- Hurst exponent
  /** Block sizes for the [[qHurst]] R/S ladder — shared with the oracle. */
  private[graft] val HURST_MS = Seq(4, 8, 16)

  /** Rescaled-range Hurst exponent (`q_hurst`) of the daily event
    * volume — the long-memory diagnostic the rest of the time-series
    * family lacks: [[qAutocorr]] reads one lag, Hurst reads the decay
    * law (H≈0.5 random walk, H>0.5 persistent trends, H<0.5 mean
    * reversion). Classic R/S: for each block size m, split the day
    * series into ⌊n/m⌋ blocks, compute range(cumulative deviations)/
    * stddev per block, average per m, then OLS of ln(R/S) on ln(m).
    *
    * Scale/determinism: the stream reduces to the calendar-bounded day
    * frame FIRST; blocks are (day-rank ÷ m) groups of that frame; all
    * block folds (cumdev range, variance) run over day-sorted arrays
    * (collect_list + array_sort — the sorted-fold discipline), and the
    * per-m means and the OLS fold in block/size order on both engines.
    */
  def qHurst(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val ranked = daily
      .withColumn("rk", row_number().over(Window.orderBy("day")) - 1)
      .localCheckpoint() // calendar-bounded; re-read per block size
    val perM = HURST_MS.map { m =>
      val byBlk = Window.partitionBy("blk")
      val wb = Window.partitionBy("blk").orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // per-row cumulative deviation from EXACT integer prefix sums:
      // cumdev_k = cum_k − k·(ls/m) — one multiply + subtract per row,
      // bit-identical cross-engine (no sequential float accumulation)
      val blocks = ranked
        .withColumn("blk", floor(col("rk") / m))
        .withColumn("bn", count(lit(1)).over(byBlk))
        .filter(col("bn") === m)
        .withColumn("ls", sum("n").over(byBlk))
        .withColumn("k", row_number().over(Window.partitionBy("blk").orderBy("rk")))
        .withColumn("cum", sum("n").over(wb))
        .withColumn("cumdev",
          col("cum").cast("double") - col("k").cast("double")
            * (col("ls").cast("double") / m))
        .groupBy("blk")
        .agg(max("cumdev").as("mx"), min("cumdev").as("mn"),
          sum(col("n") * col("n")).as("s2"), max("ls").as("ls"))
        // sd from exact integer moments: sd² = (Σv² − ls²/m)/m
        .withColumn("sd", sqrt((col("s2").cast("double")
          - col("ls").cast("double") * col("ls").cast("double") / m) / m))
        .withColumn("rng", greatest(col("mx"), lit(0.0)) - least(col("mn"), lit(0.0)))
        .filter(col("sd") > 0)
      blocks
        .agg(count(lit(1)).as("n_blocks"),
          aggregate(array_sort(collect_list(struct(col("blk"),
            (col("rng") / col("sd")).as("rs")))), lit(0.0d),
            (a, e) => a + e.getField("rs")).as("rs_sum"))
        .select(lit(m).as("m"), col("n_blocks"),
          // nullif guard: a block size longer than the calendar has no
          // complete blocks — null propagates and the pts filter drops it
          (col("rs_sum") / when(col("n_blocks") =!= 0, col("n_blocks")))
            .as("rs_mean"))
    }.reduce(_ unionByName _)
    // OLS of ln(rs_mean) on ln(m), folded in m order over the ≤|MS| rows
    val pts = perM.filter(col("rs_mean").isNotNull)
      .select(col("m"), col("n_blocks"), col("rs_mean"),
        log(col("m").cast("double")).as("x"), log(col("rs_mean")).as("y"))
    def fold(f: Column => Column): Column =
      aggregate(array_sort(collect_list(struct(col("m"), col("x"), col("y")))),
        lit(0.0d), (a, e) => a + f(e))
    val fit = pts.agg(
        count(lit(1)).cast("double").as("np"),
        fold(e => e.getField("x")).as("sx"),
        fold(e => e.getField("y")).as("sy"),
        fold(e => e.getField("x") * e.getField("y")).as("sxy"),
        fold(e => e.getField("x") * e.getField("x")).as("sxx"))
      // degenerate-fit guard (r11 ADVICE class): with < 2 surviving
      // block sizes the OLS denominator is 0 — Spark's Divide yields
      // NULL but DuckDB's IEEE ops yield NaN/Inf; when()/nullif() pin
      // both engines to NULL
      .select(round((col("sxy") - col("sx") * col("sy") / col("np"))
        / when(col("sxx") =!= col("sx") * col("sx") / col("np"),
            col("sxx") - col("sx") * col("sx") / col("np")), 6).as("hurst"))
    pts.select(col("m").cast("long").as("m"), col("n_blocks"),
        round(col("rs_mean"), 6).as("rs_mean"))
      .crossJoin(broadcast(fit))
      .orderBy("m")
  }

  val oracleHurst: String = {
    val perM = HURST_MS.map { m =>
      s"""(SELECT $m AS m, count(*) AS n_blocks,
         |  list_reduce(list_prepend(0.0::DOUBLE, list(rs ORDER BY blk)),
         |    (a, v) -> a + v) / count(*) AS rs_mean
         | FROM (
         |  SELECT blk,
         |    (greatest(max(cumdev), 0.0) - least(min(cumdev), 0.0))
         |      / sqrt((CAST(max(s2) AS DOUBLE)
         |          - CAST(max(ls) AS DOUBLE) * CAST(max(ls) AS DOUBLE) / $m.0) / $m.0) AS rs
         |  FROM (
         |    SELECT blk,
         |      CAST(cum AS DOUBLE) - CAST(k AS DOUBLE) * (CAST(ls AS DOUBLE) / $m.0) AS cumdev,
         |      s2, ls
         |    FROM (
         |      SELECT blk, rk, n,
         |        sum(n) OVER (PARTITION BY blk) AS ls,
         |        sum(n * n) OVER (PARTITION BY blk) AS s2,
         |        count(*) OVER (PARTITION BY blk) AS bn,
         |        row_number() OVER (PARTITION BY blk ORDER BY rk) AS k,
         |        sum(n) OVER (PARTITION BY blk ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM (SELECT floor(rk / $m) AS blk, rk, n FROM ranked))
         |    WHERE bn = $m)
         |  GROUP BY blk
         |  HAVING sqrt((CAST(max(s2) AS DOUBLE)
         |      - CAST(max(ls) AS DOUBLE) * CAST(max(ls) AS DOUBLE) / $m.0) / $m.0) > 0)
         | HAVING count(*) > 0)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) AS day,
       |    count(*) AS n
       |  FROM events GROUP BY 1),
       |ranked AS (
       |  SELECT row_number() OVER (ORDER BY day) - 1 AS rk, n FROM daily),
       |per_m AS ($perM),
       |pts AS (SELECT m, n_blocks, rs_mean,
       |  ln(CAST(m AS DOUBLE)) AS x, ln(rs_mean) AS y FROM per_m),
       |fit AS (SELECT
       |  CAST(count(*) AS DOUBLE) AS np,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY m)), (a, v) -> a + v) AS sx,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(y ORDER BY m)), (a, v) -> a + v) AS sy,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(x * y ORDER BY m)), (a, v) -> a + v) AS sxy,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(x * x ORDER BY m)), (a, v) -> a + v) AS sxx
       |  FROM pts),
       |h AS (SELECT round((sxy - sx * sy / np) / nullif(sxx - sx * sx / np, 0), 6) AS hurst FROM fit)
       |SELECT CAST(m AS BIGINT) AS m, CAST(n_blocks AS BIGINT) AS n_blocks,
       |  round(rs_mean, 6) AS rs_mean, hurst
       |FROM pts, h ORDER BY m""".stripMargin
  }

  // ----------------------------------------------------------- periodogram
  /** Candidate cycle lengths (hours) probed by `q_periodogram`: intra-day
    * half-cycle, the daily cycle, the weekly cycle. */
  private val PGRAM_PERIODS = Seq(12, 24, 168)

  /** cos/sin lookup tables in integer MICROS, computed once on the driver
    * and injected VERBATIM into both engines (the S-curve-t50 literal
    * pin) — per-row trig never runs in either engine, so libm cannot
    * split them. */
  private def pgramCos(p: Int): Seq[Long] =
    (0 until p).map(j => Math.round(Math.cos(2 * Math.PI * j / p) * 1e6))
  private def pgramSin(p: Int): Seq[Long] =
    (0 until p).map(j => Math.round(Math.sin(2 * Math.PI * j / p) * 1e6))

  /** Fixed-frequency periodogram (`q_periodogram`): for each candidate
    * period p, the fraction of hourly event-volume variance explained by
    * a sinusoid of period p — the R-squared of regressing the hourly
    * counts on [cos(2*pi*t/p), sin(2*pi*t/p)], solved from the 2x2 normal
    * equations in closed form (the `q_ols_multi` algebra with trig
    * literals as the regressors). The seasonality-DETECTION gauge next to
    * `q_seasonal_profile`'s known-period profile: it answers "WHICH cycle
    * dominates this stream" before a profile at that cycle is worth
    * building.
    *
    * Scale shape: ONE map-side-combinable groupBy collapses the event
    * stream to the bounded hourly frame (|hours| rows, time-span-
    * proportional, NOT volume-proportional); each candidate period is a
    * bounded aggregate over that frame with cos/sin as element_at into
    * driver-computed integer-micros literal tables. All sufficient
    * moments are exact integer sums (DECIMAL); the closed form runs on
    * doubles cast from them through identical trees in both engines. The
    * dominant flag comes from a broadcast 1-row max — no window over an
    * unpartitioned frame.
    */
  def qPeriodogram(s: SparkSession, dir: String): DataFrame = {
    // FLOOR-division hour bucket (Spark's `div` truncates toward zero,
    // DuckDB's `//` floors — they differ on pre-1970 negative micros;
    // subtracting pmod first makes the dividend exactly divisible, where
    // truncation and floor agree in both engines)
    val hourly = events(s, dir)
      .select(expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000L))" +
        " div 3600000000L").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("x"))
      .localCheckpoint() // bounded; three period probes share one scan
    val d38 = "decimal(38,0)"
    val perPeriod = PGRAM_PERIODS.map { p =>
      // pmod, not %: a negative hr under `%` yields a non-positive index
      // — Spark element_at throws / counts from the end while DuckDB's
      // list index returns NULL (the r12 ADVICE engine-split); pmod keeps
      // both engines in [1, p]
      val t = hourly.select(col("x"),
        element_at(typedLit(pgramCos(p)), pmod(col("hr"), lit(p)).cast("int") + 1).as("c"),
        element_at(typedLit(pgramSin(p)), pmod(col("hr"), lit(p)).cast("int") + 1).as("s"))
      val m = t.agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col("c")).cast(d38).as("s1"),
        sum(col("s")).cast(d38).as("s2"),
        sum(col("x")).cast(d38).as("sy"),
        sum((col("c") * col("c")).cast(d38)).as("s11"),
        sum((col("s") * col("s")).cast(d38)).as("s22"),
        sum((col("c") * col("s")).cast(d38)).as("s12"),
        sum((col("c") * col("x")).cast(d38)).as("s1y"),
        sum((col("s") * col("x")).cast(d38)).as("s2y"),
        sum((col("x") * col("x")).cast(d38)).as("syy"))
      m.select(lit(p).as("period_hours"), col("n").cast("long").as("n_hours"),
        (col("n") * col("s11") - col("s1") * col("s1")).cast("double").as("c11"),
        (col("n") * col("s22") - col("s2") * col("s2")).cast("double").as("c22"),
        (col("n") * col("s12") - col("s1") * col("s2")).cast("double").as("c12"),
        (col("n") * col("s1y") - col("s1") * col("sy")).cast("double").as("c1y"),
        (col("n") * col("s2y") - col("s2") * col("sy")).cast("double").as("c2y"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("cyy"))
       .select(col("period_hours"), col("n_hours"),
        (round(((col("c22") * col("c1y") - col("c12") * col("c2y")) * col("c1y")
          + (col("c11") * col("c2y") - col("c12") * col("c1y")) * col("c2y"))
          / nullif((col("c11") * col("c22") - col("c12") * col("c12")) * col("cyy"),
            lit(0.0)), 6) + lit(0.0)).as("var_explained"))
    }
    val all = perPeriod.reduce(_.unionByName(_))
    val best = all.agg(max("var_explained").as("best_r2"))
    all.crossJoin(broadcast(best)) // bounded: |periods| x 1
      .select(col("period_hours"), col("n_hours"), col("var_explained"),
        (col("var_explained") === col("best_r2")).as("dominant"))
      .orderBy("period_hours")
  }

  val oraclePeriodogram: String = {
    val probes = PGRAM_PERIODS.map { p =>
      val cosL = pgramCos(p).mkString("[", ", ", "]")
      val sinL = pgramSin(p).mkString("[", ", ", "]")
      s"""SELECT $p AS period_hours, n_hours, var_explained FROM (
         |  SELECT CAST(n AS BIGINT) AS n_hours,
         |    round((((c22 * c1y - c12 * c2y) * c1y) + ((c11 * c2y - c12 * c1y) * c2y))
         |      / nullif((c11 * c22 - c12 * c12) * cyy, 0.0), 6) + 0.0 AS var_explained
         |  FROM (
         |    SELECT n,
         |      CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
         |      CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
         |      CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
         |      CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
         |      CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
         |      CAST(n * syy - sy * sy AS DOUBLE) AS cyy
         |    FROM (
         |      SELECT CAST(count(*) AS HUGEINT) AS n,
         |        CAST(sum(c) AS HUGEINT) AS s1, CAST(sum(s) AS HUGEINT) AS s2,
         |        CAST(sum(x) AS HUGEINT) AS sy,
         |        CAST(sum(c * c) AS HUGEINT) AS s11, CAST(sum(s * s) AS HUGEINT) AS s22,
         |        CAST(sum(c * s) AS HUGEINT) AS s12, CAST(sum(c * x) AS HUGEINT) AS s1y,
         |        CAST(sum(s * x) AS HUGEINT) AS s2y, CAST(sum(x * x) AS HUGEINT) AS syy
         |      FROM (
         |        SELECT x,
         |          CAST(($cosL)[CAST(((hr % $p) + $p) % $p AS INT) + 1] AS BIGINT) AS c,
         |          CAST(($sinL)[CAST(((hr % $p) + $p) % $p AS INT) + 1] AS BIGINT) AS s
         |        FROM hourly))))""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH hourly AS MATERIALIZED (
       |  SELECT epoch_ns(ts) // 1000 // 3600000000 AS hr, count(*) AS x
       |  FROM events GROUP BY 1),
       |probes AS (
       |$probes)
       |SELECT period_hours, n_hours, var_explained,
       |  var_explained = (SELECT max(var_explained) FROM probes) AS dominant
       |FROM probes ORDER BY period_hours""".stripMargin
  }
}
