package graft.operators

import graft.Tables
import graft.functions.HashFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, heuristic language ID, n-gram stats.
  *
  * All scoring is rational arithmetic on integer counts (no
  * transcendentals) so Spark and DuckDB produce bit-identical doubles.
  * Scale: each query is a single narrow projection + one aggregation —
  * embarrassingly parallel over document splits.
  */
object TextAnalysis {

  private val TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"
  private[graft] val STOPWORDS = Seq("the", "a", "or", "and", "of")

  /** Token counting: whitespace words + BPE-ish regex token runs. */
  def qTextTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      regexp_count(col("text"), lit(TOKEN_RE)).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_calc"))
      .orderBy("doc_id")

  val oracleTokens: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  CAST(len(regexp_extract_all(text, '$TOKEN_RE')) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length / punctuation / stopword signals composed
    * into one deterministic [0,1] score.
    */
  def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val words  = split(col("text"), " ")
    val nWords = size(words).cast("double")
    val nChars = length(col("text")).cast("double")
    val noSpace = length(regexp_replace(col("text"), " ", "")).cast("double")
    val punct  = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double")
    val stopList = STOPWORDS.map(w => s"'$w'").mkString("(", ",", ")")
    val nStop = size(expr(s"filter(split(text, ' '), w -> w IN $stopList)")).cast("double")
    val punctRatio = punct / nChars
    val stopRatio  = nStop / nWords
    val lenSignal  = least(nWords / 100.0, lit(1.0))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(words).cast("long").as("n_words"),
      round(noSpace / nWords, 4).as("mean_word_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stop_ratio"),
      round(lit(0.5) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio) + lit(0.2) * lenSignal, 6).as("quality"))
      .orderBy("doc_id")
  }

  val oracleQuality: String = {
    val stopList = STOPWORDS.map(w => s"'$w'").mkString("(", ",", ")")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  round(length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')), 4) AS mean_word_len,
       |  round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text), 6) AS punct_ratio,
       |  round(len(list_filter(string_split(text, ' '), w -> w IN $stopList))::DOUBLE / len(string_split(text, ' ')), 6) AS stop_ratio,
       |  round(0.5 * (len(list_filter(string_split(text, ' '), w -> w IN $stopList))::DOUBLE / len(string_split(text, ' ')))
       |      + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
       |      + 0.2 * least(len(string_split(text, ' ')) / 100.0, 1.0), 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Heuristic language ID: marker-lexicon hit counts per language,
    * deterministic priority-ordered argmax; reported as a confusion
    * summary against the labeled `lang` column.
    */
  private val lexicons = Seq(
    "en" -> Seq("the", "a", "or"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "y"),
    "fr" -> Seq("le", "les", "et"))

  def qTextLangid(s: SparkSession, dir: String): DataFrame = {
    val scores = lexicons.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString("(", ",", ")")
      l -> expr(s"size(filter(split(text, ' '), w -> w IN $list))")
    }
    // priority argmax: first lexicon (in declaration order) hitting the max wins
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred2 = scores.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (l, sc))      => Some(when(sc === maxScore && maxScore > 0, lit(l)))
      case (Some(c), (l, sc))   => Some(c.when(sc === maxScore && maxScore > 0, lit(l)))
    }.get.otherwise(lit("unk"))
    Tables.documents(s, dir)
      .select(col("lang"), pred2.as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val oracleLangid: String = {
    val scoreSql = lexicons.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString("(", ",", ")")
      l -> s"len(list_filter(string_split(text, ' '), w -> w IN $list))"
    }
    val maxExpr = s"greatest(${scoreSql.map(_._2).mkString(", ")})"
    val whenChain = scoreSql.map { case (l, sc) =>
      s"WHEN $sc = m AND m > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (SELECT lang, $maxExpr AS m, text FROM documents)
       |SELECT lang, CASE $whenChain ELSE 'unk' END AS predicted, count(*) AS n
       |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Rabin–Karp-style rolling-hash document fingerprint: a polynomial
    * fold `h = (h·B + h60(word)) mod P` over the word sequence —
    * ORDER-sensitive, unlike the set-based `q_dedup_fingerprint`
    * (reordered words change this hash but not that one). One projection,
    * no shuffle; the per-word hash and the fold are identical in both
    * engines (all arithmetic < 2^37, exact in int64).
    */
  private[graft] val RH_P = 2147483647L // 2^31 - 1
  private[graft] val RH_B = 31L

  /** The rolling-hash column for a words-array column (shared with the
    * algebraic property spec, which pins h(a⧺b) = h(a)·B^|b| + h(b)
    * mod P — the identity that makes chunked/streaming fingerprinting
    * composable). */
  private[graft] def rollingHash(words: Column): Column =
    aggregate(
      transform(words, w => HashFns.h60(w) % RH_P),
      lit(0L),
      (acc, x) => (acc * RH_B + x) % RH_P)

  def qTextRollingHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      rollingHash(split(col("text"), " ")).as("rhash"))
      .orderBy("doc_id")

  val oracleRollingHash: String =
    s"""SELECT doc_id, list_reduce(
       |  list_transform(string_split(text, ' '), w -> ${HashFns.h60Sql("w")} % $RH_P),
       |  (acc, x) -> (acc * $RH_B + x) % $RH_P) AS rhash
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Top-20 word bigrams by frequency (multiplicity-preserving). Words
    * materialized before the gram lambda (HashFns.shinglesFromWords
    * rationale) — multiplicity preserved, so no array_distinct here.
    */
  def qTextNgrams(s: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    val bigrams = when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("w"))
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bigram"))
      .limit(20)
  }

  val oracleNgrams: String =
    """WITH b AS (
      |  SELECT unnest(CASE WHEN len(string_split(text, ' ')) >= 2
      |    THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
      |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])
      |    ELSE [] END) AS bigram
      |  FROM documents)
      |SELECT bigram, count(*) AS n FROM b GROUP BY 1
      |ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  /** N-gram novelty vs a reference corpus (`q_ngram_novelty`): what
    * fraction of each source's distinct-per-doc word trigrams does the
    * reference slice (source `src0`) NOT already contain — the
    * freshness gauge a pipeline runs before paying to ingest a new
    * source (near-zero novelty ⇒ the source is re-crawl/mirror
    * material), the set-containment cousin of the dedup family's
    * pairwise measures.
    *
    * Scale shape: trigrams travel as h60 HASHES across the join, so the
    * vocabulary check shuffles 8-byte keys (at 100 TB the reference
    * vocabulary is a distinct hash-agg that AQE broadcasts when small
    * and hash-joins when not — an equality join either way, never
    * pairwise). The hash itself runs as a CODEGEN projection on the
    * exploded gram column, NOT inside the trigram lambda — HOF lambdas
    * evaluate interpreted per element (the segmentTable lesson, 6×
    * there; ~4× measured here), while post-explode the same arithmetic
    * whole-stage-compiles. Per-source novelty is a ratio of EXACT
    * integer sums (one division at the end), so no
    * float-accumulation-order hazard exists between engines.
    */
  /** Distinct word trigrams of a MATERIALIZED words-array attribute
    * (callers must pass an attribute, never an inline split — see the
    * CSE note on [[qNgramNovelty]]). Shared with the streaming novelty
    * scorer. */
  private[graft] def trigramArray(w: Column): Column =
    array_distinct(when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ",
          element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
      .otherwise(array().cast("array<string>")))

  /** Train the reference-vocabulary bloom — the persisted ARTIFACT form
    * of [[qNgramNovelty]]'s reference side (distinct trigram h60s folded
    * into one bloom filter, ~9.6 bits/key at 1% fp), for scoring streams
    * or later batches without re-reading the reference corpus. False
    * negatives are impossible, so a 0-novelty verdict is exact; fp only
    * UNDER-reports novelty by ~1%. */
  def trainNoveltyBloom(s: SparkSession, refDocs: DataFrame): Array[Byte] = {
    graft.functions.BloomFns.register(s)
    refDocs
      .select(split(col("text"), " ").as("w"))
      .select(explode(trigramArray(col("w"))).as("gram"))
      .select(graft.functions.HashFns.h60(col("gram")).as("g")).distinct()
      .createOrReplaceTempView("graft_novelty_ref_g")
    s.sql("SELECT graft_bloom_agg(g) FROM graft_novelty_ref_g")
      .head().getAs[Array[Byte]](0)
  }

  def qNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val NOVELTY_REF = "src0"
    // `w` MUST be a materialized attribute, never an inline split: HOF
    // lambdas evaluate interpreted with NO common-subexpression
    // elimination, so an inlined split(text) re-splits the document per
    // element_at reference (O(len²) per doc — measured 4–11 s at sf0.1
    // for this corpus vs ~1 s attribute-form; the
    // HashFns.shinglesFromWords rationale). The hash then runs as a
    // codegen projection on the exploded gram column.
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), explode(trigramArray(col("w"))).as("gram"))
      .select(col("doc_id"), col("source"),
        graft.functions.HashFns.h60(col("gram")).as("g"))
    val refVocab = docs.filter(col("source") === NOVELTY_REF)
      .select("g").distinct()
    docs.filter(col("source") =!= NOVELTY_REF)
      .join(refVocab.withColumn("seen", lit(1)), Seq("g"), "left")
      .groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("total_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("unseen_grams"))
      .select(col("source"), col("n_docs"), col("total_grams"), col("unseen_grams"),
        round(col("unseen_grams") / col("total_grams"), 6).as("novelty"))
      .orderBy("source")
  }

  val oracleNgramNovelty: String =
    s"""WITH w AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |t AS (
       |  SELECT doc_id, source, unnest(list_distinct(
       |    CASE WHEN len(ws) >= 3
       |      THEN list_transform(generate_series(1, len(ws) - 2),
       |        i -> ${graft.functions.HashFns.h60Sql("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")})
       |      ELSE [] END)) AS g
       |  FROM w),
       |ref AS (SELECT DISTINCT g FROM t WHERE source = 'src0')
       |SELECT t.source, count(DISTINCT t.doc_id) AS n_docs,
       |  count(*) AS total_grams,
       |  CAST(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unseen_grams,
       |  round(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS novelty
       |FROM t LEFT JOIN ref ON t.g = ref.g
       |WHERE t.source <> 'src0'
       |GROUP BY t.source ORDER BY t.source""".stripMargin

  // ----------------------------------------------------------- bpe apply
  /** Fixed BPE-style merge table — stands for the trained tokenizer
    * vocabulary (training happens ONCE on a sample; the 100 TB job is
    * APPLYING the merges corpus-wide, which is what this operator
    * models). The pairs are the corpus's measured top bigrams, so the
    * merges actually fire. In production the table is a broadcast
    * artifact; here it is literals mirrored in the oracle.
    */
  private[graft] val BPE_MERGES =
    Seq(("table", "hash"), ("part", "filter"), ("customer", "join"))

  // The positional merge pass below relies on pairs never interacting:
  // with a != b, a match at i cannot invalidate or enable one at i+1
  // (that would need b == a), so greedy left-to-right == all matches.
  // require here, not in the pass: the table is the contract.
  require(BPE_MERGES.forall { case (a, b) => a != b },
    "self-pairs (a,a) need sequential fold semantics")

  /** One merge pass as a POSITIONAL transform, O(len) per document:
    * position i becomes the merged token when (t[i], t[i+1]) is the
    * pair, is dropped (null, filtered) when consumed as the pair's
    * right element, and passes through otherwise. The r6 first cut was
    * a string-accumulator fold (the only state list_reduce supports) at
    * O(len^2) character copying per pass - ~6 s at sf0.1 and fatal on
    * book-length documents; this shape is linear and the DuckDB mirror
    * stays a transliteration (generate_series + CASE + list_filter).
    */
  private[operators] def bpeMergePass(tokens: Column, a: String, b: String): Column = {
    val n = size(tokens)
    val mapped = transform(sequence(lit(1), n), i =>
      when(i < n && element_at(tokens, i) === a && element_at(tokens, i + 1) === b,
        lit(a + "_" + b))
        .when(i > lit(1) && element_at(tokens, i - 1) === a && element_at(tokens, i) === b,
          lit(null).cast("string"))
        .otherwise(element_at(tokens, i)))
    filter(mapped, x => x.isNotNull)
  }

  /** [[bpeMergePass]] with the pair as COLUMNS instead of literals — the
    * trained-merge path, where the pair comes from a broadcast 1-row
    * argmax frame rather than a compile-time table. Same positional
    * O(len) semantics; callers must guarantee a != b (the trainer
    * filters self-pairs out of its candidates).
    */
  private def bpeMergePassCol(tokens: Column, a: Column, b: Column): Column = {
    val n = size(tokens)
    val mapped = transform(sequence(lit(1), n), i =>
      when(i < n && element_at(tokens, i) === a && element_at(tokens, i + 1) === b,
        concat(a, lit("_"), b))
        .when(i > lit(1) && element_at(tokens, i - 1) === a && element_at(tokens, i) === b,
          lit(null).cast("string"))
        .otherwise(element_at(tokens, i)))
    filter(mapped, x => x.isNotNull)
  }

  /** Adjacent-pair structs of a token array (multiplicity-preserving). */
  private def adjacentPairs(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("pa"), element_at(t, i + 1).as("pb"))))
      .otherwise(array().cast("array<struct<pa:string,pb:string>>"))

  private[graft] val BPE_TRAIN_STEPS = 4

  /** TRAIN the BPE merge table (`q_bpe_train`) — the other half of
    * `q_tokenize_bpe` (which applies a fixed table): BPE_TRAIN_STEPS
    * greedy rounds of count-all-adjacent-pairs → deterministic argmax
    * (count DESC, then lexicographic — integer counts, so cross-engine
    * exact) → merge that pair corpus-wide with the positional O(len)
    * pass, re-counting on the MERGED arrays so later rounds can extend
    * earlier merges (true BPE). Self-pairs are excluded (the positional
    * pass's non-interaction contract).
    *
    * Each round is one pair-count aggregate (map-side combinable) +
    * a TakeOrdered(1) argmax whose SINGLE row is collected and
    * re-broadcast as literals — the only driver-side data is one
    * (pair, count) row per round; at 100 TB each round is one corpus
    * scan, and production trains on a sample then applies corpus-wide
    * via `q_tokenize_bpe`'s path. The argmax scan of round k is also
    * what materializes round k's token cache, so round k−1's cache is
    * unpersisted right after it (never more than two cached corpora
    * live; the last is released before returning — the output is the
    * collected literal table (step, pair_a, pair_b, n_pair), so nothing
    * lazy still references them).
    */
  def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    var toks = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("t")).cache()
    var prev: Option[DataFrame] = None
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to BPE_TRAIN_STEPS) {
      val best = toks
        .select(explode(adjacentPairs(col("t"))).as("p"))
        .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .filter(col("pa") =!= col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("n_pair"))
        .orderBy(desc("n_pair"), col("pa"), col("pb"))
        .limit(1)
        .collect()(0)
      prev.foreach(_.unpersist(false)) // this round's cache is now materialized
      prev = Some(toks)
      val (pa, pb) = (best.getString(0), best.getString(1))
      learned += ((step, pa, pb, best.getLong(2)))
      if (step < BPE_TRAIN_STEPS)
        toks = toks.select(bpeMergePassCol(col("t"), lit(pa), lit(pb)).as("t")).cache()
    }
    toks.unpersist(false)
    import s.implicits._
    learned.toSeq.toDF("step", "pair_a", "pair_b", "n_pair").orderBy("step")
  }

  val oracleBpeTrain: String = {
    def mergeColSql(toks: String): String =
      s"""list_filter(list_transform(generate_series(1, len($toks)), i ->
         | CASE WHEN i < len($toks) AND $toks[i] = pa AND $toks[i+1] = pb THEN pa || '_' || pb
         |      WHEN i > 1 AND $toks[i-1] = pa AND $toks[i] = pb THEN NULL
         |      ELSE $toks[i] END), x -> x IS NOT NULL)""".stripMargin.replace("\n", " ")
    val stages = (1 to BPE_TRAIN_STEPS).map { k =>
      s"""p$k AS (
         |  SELECT t[i] AS pa, t[i+1] AS pb, count(*) AS n_pair
         |  FROM (SELECT unnest(generate_series(1, len(t) - 1)) AS i, t FROM d${k - 1})
         |  WHERE t[i] <> t[i+1] GROUP BY 1, 2),
         |b$k AS (SELECT pa, pb, n_pair FROM p$k ORDER BY n_pair DESC, pa, pb LIMIT 1),
         |d$k AS (SELECT ${mergeColSql("t")} AS t FROM d${k - 1}, b$k)""".stripMargin
    }.mkString(",\n")
    val out = (1 to BPE_TRAIN_STEPS).map(k =>
      s"SELECT CAST($k AS INT) AS step, pa AS pair_a, pb AS pair_b, n_pair FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""WITH d0 AS (SELECT string_split(text, ' ') AS t FROM documents),
       |$stages
       |$out
       |ORDER BY step""".stripMargin
  }

  /** Apply the merge table (`q_tokenize_bpe`): BPE_MERGES passes, each a
    * pure projection (no shuffle — the corpus tokenization pass is
    * embarrassingly parallel), each stage's token array MATERIALIZED
    * before the next pass (HOF-no-CSE rule). Per-language report:
    * tokens before/after and the realized compression, oracle-pinned —
    * the positional arithmetic is deterministic and identical in both
    * engines.
    */
  def qTokenizeBpe(s: SparkSession, dir: String): DataFrame = {
    val start = Tables.documents(s, dir)
      .select(col("lang"), split(col("text"), " ").as("t0"))
      .withColumn("n_before", size(col("t0")).cast("long"))
    val end = BPE_MERGES.zipWithIndex.foldLeft(start) {
      case (df, ((a, b), i)) =>
        df.withColumn(s"t${i + 1}", bpeMergePass(col(s"t$i"), a, b))
    }
    end
      .withColumn("n_after", size(col(s"t${BPE_MERGES.size}")).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_before").as("tokens_before"),
        sum("n_after").as("tokens_after"))
      .select(col("lang"), col("n_docs"), col("tokens_before"), col("tokens_after"),
        round(col("tokens_after").cast("double") / col("tokens_before"), 6).as("compression"))
      .orderBy("lang")
  }

  val oracleTokenizeBpe: String = {
    def mergeSql(toks: String, a: String, b: String): String =
      s"""list_filter(list_transform(generate_series(1, len($toks)), i ->
         | CASE WHEN i < len($toks) AND $toks[i] = '$a' AND $toks[i+1] = '$b' THEN '${a}_$b'
         |      WHEN i > 1 AND $toks[i-1] = '$a' AND $toks[i] = '$b' THEN NULL
         |      ELSE $toks[i] END), x -> x IS NOT NULL)""".stripMargin.replace("\n", " ")
    val stages = BPE_MERGES.zipWithIndex.map { case ((a, b), i) =>
      s"d${i + 1} AS (SELECT lang, n_before, ${mergeSql(s"t$i", a, b)} AS t${i + 1} FROM d$i)"
    }.mkString(",\n")
    s"""WITH d0 AS (
       |  SELECT lang, string_split(text, ' ') AS t0,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_before
       |  FROM documents),
       |$stages
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_before) AS BIGINT) AS tokens_before,
       |  CAST(sum(len(t${BPE_MERGES.size})) AS BIGINT) AS tokens_after,
       |  round(sum(len(t${BPE_MERGES.size}))::DOUBLE / sum(n_before), 6) AS compression
       |FROM d${BPE_MERGES.size} GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Collocation extraction — bigrams whose observed frequency beats
    * independence (PMI-style LIFT, kept rational: lift =
    * N·c(xy) / (c(x)·c(y)) — log-free so the score is bit-identical
    * cross-engine; ranking is log-invariant because log is monotone).
    * The corpus-analysis op behind phrase mining / tokenizer-merge
    * candidates. Plan: two hash aggs over the token/bigram streams
    * (map-side combinable), two equality joins of the bigram frame
    * against the vocabulary-sized unigram counts (AQE broadcasts the
    * smaller side when it fits; both key on single words so skew maps
    * to stopwords, which the min-count filter has already bounded),
    * and the bigram total via a 1-row broadcast. MIN_PAIR_COUNT keeps
    * noise pairs (c(xy)=1 ⇒ huge lift for two rare words) out.
    */
  private[graft] val MIN_PAIR_COUNT = 5

  def qTextCollocations(s: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    val bigrams = when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    val words = Tables.documents(s, dir).select(split(col("text"), " ").as("w"))
    val uni = words.select(explode(w).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c_w"))
    val big = words.select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= MIN_PAIR_COUNT)
      .withColumn("first", split(col("bigram"), " ")(0))
      .withColumn("second", split(col("bigram"), " ")(1))
    val total = words.select(explode(bigrams).as("b")).agg(count(lit(1)).as("n_total"))
    big
      .join(uni.select(col("word").as("first"), col("c_w").as("c_x")), Seq("first"))
      .join(uni.select(col("word").as("second"), col("c_w").as("c_y")), Seq("second"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round((col("n_total").cast("double") * col("c_xy").cast("double")) /
          (col("c_x").cast("double") * col("c_y").cast("double")), 6).as("lift"))
      .orderBy(desc("lift"), col("bigram"))
      .limit(20)
  }

  val oracleTextCollocations: String =
    s"""WITH wd AS (SELECT string_split(text, ' ') AS w FROM documents),
       |uni AS (SELECT word, count(*) AS c_w FROM (SELECT unnest(w) AS word FROM wd) GROUP BY word),
       |bs AS (
       |  SELECT unnest(CASE WHEN len(w) >= 2
       |    THEN list_transform(generate_series(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1])
       |    ELSE [] END) AS bigram
       |  FROM wd),
       |n AS (SELECT count(*) AS n_total FROM bs),
       |big AS (
       |  SELECT bigram, count(*) AS c_xy FROM bs GROUP BY bigram
       |  HAVING count(*) >= $MIN_PAIR_COUNT)
       |SELECT b.bigram, b.c_xy, ux.c_w AS c_x, uy.c_w AS c_y,
       |  round((n.n_total::DOUBLE * b.c_xy::DOUBLE) / (ux.c_w::DOUBLE * uy.c_w::DOUBLE), 6) AS lift
       |FROM big b
       |JOIN uni ux ON ux.word = string_split(b.bigram, ' ')[1]
       |JOIN uni uy ON uy.word = string_split(b.bigram, ' ')[2], n
       |ORDER BY lift DESC, b.bigram LIMIT 20""".stripMargin

  /** Corpus-self bigram-LM fluency score (`q_text_lm_score`) — the
    * LM-quality filter (CCNet-style) computed WITHOUT an external
    * model: score(doc) = mean over its bigram occurrences of the
    * corpus MLE conditional probability c(xy)/c(x). Fluent text built
    * from common continuations scores high; shuffled/garbled text
    * scores near the unigram floor — the standard cheap fluency
    * signal next to `q_text_quality`'s surface ratios. Rational
    * arithmetic only (no log): cross-engine identical after 6dp
    * rounding of the per-doc mean.
    *
    * Plan: one bigram explode, two corpus-count hash aggs, two
    * equality joins keyed on bigram/first-word (stopword skew on the
    * c(x) join is AQE-splittable; both count frames are
    * vocabulary-sized and broadcast when they fit), one final per-doc
    * mean. Docs with <2 words have no bigrams and drop out (inner
    * join semantics, mirrored).
    */
  def qTextLmScore(s: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    val bigrams = when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
    val docsW = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val bg = docsW.select(col("doc_id"), explode(bigrams).as("bigram"))
      .withColumn("x", split(col("bigram"), " ")(0))
    val uni = docsW.select(explode(w).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c_x"))
    val big = bg.groupBy("bigram").agg(count(lit(1)).as("c_xy"))
    bg.join(big, Seq("bigram"))
      .join(uni.withColumnRenamed("word", "x"), Seq("x"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("c_xy").cast("double") / col("c_x")), 6).as("lm_score"))
      .orderBy("doc_id")
  }

  val oracleTextLmScore: String =
    """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS x FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(w) >= 2
      |      THEN list_transform(generate_series(1, len(w) - 1),
      |        i -> w[i] || ' ' || w[i+1])
      |      ELSE [] END) AS bigram
      |    FROM wd)),
      |uni AS (SELECT word, count(*) AS c_x FROM (SELECT unnest(w) AS word FROM wd) GROUP BY word),
      |big AS (SELECT bigram, count(*) AS c_xy FROM bg GROUP BY bigram)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |  round(avg(big.c_xy * 1.0 / uni.c_x), 6) AS lm_score
      |FROM bg JOIN big USING (bigram) JOIN uni ON uni.word = bg.x
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  /** Inverted index over the corpus vocabulary: term → document
    * frequency, total term frequency, and the head of the posting list.
    * The retrieval-side primitive (BM25/keyword search, decontamination
    * probes) a curation stack builds next to its embeddings index.
    *
    * Scale shape: per-(term, doc) term frequencies from one hash
    * aggregate over the exploded words (map-side combinable, and the
    * shuffle key is the COMPOSITE (term, doc_id) — a stopword's rows
    * spread over all partitions); the posting-list HEAD comes from the
    * bounded [[graft.functions.MinKAggregator]] — O(head) state per
    * group per task, map-side combined — NOT a `row_number` window per
    * term, which would sort a stopword's entire O(|docs|) posting stream
    * in one task at 100 TB (the r5 verdict's last scale-killer). Emitted
    * as a comma-joined string (engine-portable, hash-stable).
    */
  private val POSTINGS_HEAD = 5
  private val INDEX_TOP = 20

  def qInvertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedIndex(Tables.documents(s, dir))

  private[graft] def invertedIndex(docs: DataFrame): DataFrame = {
    val minK = udaf(new graft.functions.MinKAggregator(POSTINGS_HEAD))
    docs
      .select(explode(split(col("text"), " ")).as("term"), col("doc_id"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"),
        minK(col("doc_id")).as("heads"))
      .select(col("term"), col("df"), col("tf_total"),
        concat_ws(",", col("heads").cast("array<string>")).as("postings_head"))
      .orderBy(desc("df"), col("term"))
      .limit(INDEX_TOP)
  }

  val oracleInvertedIndex: String =
    s"""WITH w AS (
       |  SELECT unnest(string_split(text, ' ')) AS term, doc_id FROM documents),
       |td AS (SELECT term, doc_id, count(*) AS tf FROM w GROUP BY term, doc_id),
       |r AS (
       |  SELECT term, doc_id, tf,
       |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM td)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
       |  array_to_string(list_transform(list_sort(list(doc_id) FILTER (WHERE rn <= $POSTINGS_HEAD)), x -> CAST(x AS VARCHAR)), ',') AS postings_head
       |FROM r GROUP BY term ORDER BY df DESC, term LIMIT $INDEX_TOP""".stripMargin

  /** Per-document DISTINCTIVE terms — tf·idf with a rational idf:
    * score = tf/df (the corpus-size factor N is constant across every
    * row, so dropping it changes no ranking and keeps the arithmetic
    * log-free → bit-identical across engines). Top-3 terms per doc,
    * ties broken lexicographically.
    *
    * Scale shape: one hash agg to (term, doc) tf; df as a plain
    * map-side-combinable `groupBy(term).count()` joined back on term —
    * NOT `count() OVER (PARTITION BY term)`, which would carry a
    * stopword's entire O(|docs|) posting stream into one window task at
    * 100 TB. The df frame is vocabulary-sized (term, df) pairs — AQE
    * broadcasts it when small; when it shuffles, hot join keys are
    * AQE-skew-splittable, which a window partition never is. The only
    * remaining window partitions by doc_id — bounded by document length.
    */
  private val TFIDF_TOP = 3

  def qTfidfTop(s: SparkSession, dir: String): DataFrame =
    tfidfTop(Tables.documents(s, dir))

  private[graft] def tfidfTop(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val td = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfByTerm = td.groupBy("term").agg(count(lit(1)).as("df"))
    val withDf = td.join(dfByTerm, "term")
    val score = col("tf").cast("double") / col("df")
    withDf
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(score.desc, col("term"))))
      .filter(col("rank") <= TFIDF_TOP)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), round(score, 6).as("score"))
      .orderBy("doc_id", "rank")
  }

  val oracleTfidfTop: String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |td AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
       |d AS (SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM td),
       |r AS (
       |  SELECT doc_id, term, tf, df,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tf * 1.0 / df DESC, term) AS rank
       |  FROM d)
       |SELECT doc_id, rank, term, tf, df, round(tf * 1.0 / df, 6) AS score
       |FROM r WHERE rank <= $TFIDF_TOP ORDER BY doc_id, rank""".stripMargin

  /** Gopher-style intra-document repetition signals — the quality gates
    * real curation pipelines run alongside [[qTextQuality]]: distinct-word
    * ratio, top-word frequency fraction, and duplicated-bigram fraction
    * (1 − distinct bigrams / total bigrams). Boilerplate and degenerate
    * generations score high on the last two.
    *
    * Scale shape: distinct-word and distinct-bigram counts are pure
    * projections (array ops on the words array, no shuffle); only the
    * top-word count needs distributed counting — explode → (doc, word)
    * count → per-doc max, two map-side-combinable aggregates, linear in
    * corpus size (the per-doc scalars ride along as grouping keys, which
    * adds no cardinality: doc_id determines them).
    */
  private[graft] def repetitionSignals(docs: DataFrame): DataFrame = {
    // The scalars MUST be materialized in their own projection below the
    // explode: `ExtractGenerator` leaves non-generator expressions in the
    // Project ABOVE the Generate, so putting them in the same select as
    // the explode re-evaluates each O(W) array expression once per
    // exploded word — O(W²) work per document (the bigram builder's
    // element_at(split(text), i) lambda gets no subexpression
    // elimination, making it O(W²) on its own, so O(W³) combined; ~180 s
    // at sf0.1 vs ~3 s in this shape).
    val scalars = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        col("w"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        size(HashFns.shinglesFromWords(col("w"), 2)).cast("long").as("n_distinct_bigrams"))
    val perWord = scalars.select(
      col("doc_id"), col("n_words"), col("n_distinct"), col("n_distinct_bigrams"),
      explode(col("w")).as("word"))
    perWord
      .groupBy("doc_id", "n_words", "n_distinct", "n_distinct_bigrams", "word")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n_words", "n_distinct", "n_distinct_bigrams")
      .agg(max("cnt").as("top_cnt"))
      .select(
        col("doc_id"),
        col("n_words"),
        round(col("n_distinct") / col("n_words"), 6).as("distinct_word_ratio"),
        round(col("top_cnt") / col("n_words"), 6).as("top_word_frac"),
        round(when(col("n_words") >= 2,
          lit(1.0) - col("n_distinct_bigrams") / (col("n_words") - 1))
          .otherwise(0.0), 6).as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  def qTextRepetition(s: SparkSession, dir: String): DataFrame =
    repetitionSignals(Tables.documents(s, dir))

  val oracleRepetition: String = {
    val bigrams = HashFns.wordShinglesNSql("text", 2)
    s"""WITH w AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |    CAST(len($bigrams) AS BIGINT) AS n_distinct_bigrams,
       |    unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_words, n_distinct, n_distinct_bigrams, word, count(*) AS cnt
       |  FROM w GROUP BY doc_id, n_words, n_distinct, n_distinct_bigrams, word),
       |t AS (
       |  SELECT doc_id, n_words, n_distinct, n_distinct_bigrams, max(cnt) AS top_cnt
       |  FROM c GROUP BY doc_id, n_words, n_distinct, n_distinct_bigrams)
       |SELECT doc_id, n_words,
       |  round(n_distinct::DOUBLE / n_words, 6) AS distinct_word_ratio,
       |  round(top_cnt::DOUBLE / n_words, 6) AS top_word_frac,
       |  round(CASE WHEN n_words >= 2
       |    THEN 1.0 - n_distinct_bigrams::DOUBLE / (n_words - 1)
       |    ELSE 0.0 END, 6) AS dup_bigram_frac
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ winnowing
  /** Winnowing (MOSS-style) parameters: hashes of WIN_K-word grams,
    * minimum taken over sliding windows of WIN_W gram hashes. The
    * guarantee: any shared contiguous run of ≥ WIN_W + WIN_K - 1 words
    * between two documents yields at least one shared fingerprint,
    * while only ~2/(WIN_W+1) of gram hashes are kept — position-robust
    * local fingerprints at a fraction of the shingle volume.
    */
  private[graft] val WIN_K = 4
  private[graft] val WIN_W = 5

  /** Gram-hash sequence for a MATERIALIZED words-array attribute:
    * h60 of each k-word gram, order- and multiplicity-preserving
    * (unlike [[HashFns.shinglesFromWords]], which dedups — winnowing
    * needs positions). Callers must materialize `words` AND the result
    * in their own projections (the HOF-no-CSE rule: an inline array
    * expression is re-evaluated by every element_at of a downstream
    * lambda).
    */
  private[graft] def gramHashes(words: Column, k: Int): Column =
    when(size(words) >= k,
      transform(sequence(lit(0), size(words) - k),
        i => HashFns.h60(concat_ws(" ", (1 to k).map(j => element_at(words, i + j)): _*))))
      .otherwise(array().cast("array<long>"))

  /** Winnowed fingerprint set from a MATERIALIZED gram-hash attribute:
    * the distinct window minima (window = w consecutive gram hashes);
    * docs with fewer than w grams keep their single global minimum so
    * short documents still fingerprint. Per-window work is O(w) via
    * element_at on the materialized attribute — O(n·w) per doc total,
    * a pure projection (no shuffle).
    */
  private[graft] def winnowFromGrams(gh: Column, w: Int): Column =
    array_distinct(
      when(size(gh) >= w,
        transform(sequence(lit(1), size(gh) - (w - 1)),
          i => array_min(transform(sequence(lit(0), lit(w - 1)), j => element_at(gh, i + j)))))
        .otherwise(when(size(gh) > 0, array(array_min(gh)))
          .otherwise(array().cast("array<long>"))))

  /** DuckDB fragments mirroring [[gramHashes]] / [[winnowFromGrams]]. */
  private[graft] def gramHashesSql(wExpr: String, k: Int): String = {
    val gram = (0 until k).map(j => s"$wExpr[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($wExpr) >= $k
       | THEN list_transform(generate_series(1, len($wExpr) - ${k - 1}), i -> ${HashFns.h60Sql(gram)})
       | ELSE [] END""".stripMargin.replace("\n", " ")
  }

  private[graft] def winnowSql(ghExpr: String, w: Int): String =
    s"""CASE WHEN len($ghExpr) >= $w
       | THEN list_distinct(list_transform(generate_series(1, len($ghExpr) - ${w - 1}),
       |   i -> list_min(list_transform(generate_series(0, ${w - 1}), j -> $ghExpr[i+j]))))
       | WHEN len($ghExpr) > 0 THEN [list_min($ghExpr)]
       | ELSE [] END""".stripMargin.replace("\n", " ")

  /** Per-document winnowed fingerprints (`q_text_winnow`): gram count,
    * fingerprint count, and the full sorted fingerprint set (pinned in
    * the oracle — the winnow arithmetic is h60-based, so both engines
    * compute identical sets). The density column gauges the ~2/(w+1)
    * expected keep rate. One projection, no shuffle.
    */
  def qTextWinnow(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("gh", gramHashes(col("w"), WIN_K))
      .withColumn("fps", winnowFromGrams(col("gh"), WIN_W))
      .select(
        col("doc_id"),
        size(col("gh")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        when(size(col("gh")) > 0,
          round(size(col("fps")).cast("double") / size(col("gh")), 6))
          .otherwise(0.0).as("density"),
        concat_ws(",", transform(array_sort(col("fps")), x => x.cast("string"))).as("fps"))
      .orderBy("doc_id")

  val oracleTextWinnow: String = {
    val gh = gramHashesSql("w", WIN_K)
    val fps = winnowSql("gh", WIN_W)
    s"""WITH wdoc AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       | g AS (SELECT doc_id, $gh AS gh FROM wdoc),
       | f AS (SELECT doc_id, gh, $fps AS fps FROM g)
       |SELECT doc_id,
       |  CAST(len(gh) AS BIGINT) AS n_grams,
       |  CAST(len(fps) AS BIGINT) AS n_fp,
       |  CASE WHEN len(gh) > 0 THEN round(len(fps)::DOUBLE / len(gh), 6) ELSE 0.0 END AS density,
       |  array_to_string(list_sort(fps), ',') AS fps
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Count-min sketch geometry: d=4 md5-slice rows, w=8192 counters.
    * Per-query guarantee: exact ≤ est ≤ exact + ceil(e·N/w) w.p.
    * ≥ 1−e^−4; widen `w` with corpus size (state is d·w longs per task
    * regardless of N). */
  private[graft] val CMS_D = 4
  private[graft] val CMS_W = 8192

  /** Heavy hitters via count-min sketch, gauged against exact counts —
    * the frequency member of the sketch family (HLL++ distincts, GK
    * quantiles, bloom membership, CMS frequencies).
    *
    * Plan (r13 shape): the sketch is built DECLARATIVELY as sparse
    * (row, bucket) counts — each token explodes into its CMS_D md5-slice
    * buckets and one codegen hash-agg counts them (map-side combined, so
    * the shuffle carries at most d·w = 32k rows). The top-10 terms then
    * probe the bucket frame with an equi-join + min(c); a sparse count
    * equals the dense grid cell exactly (absent bucket = 0, and every
    * probed bucket contains at least its own term), so `est_n` matches
    * the dense-grid sketch bit-for-bit. The exact top-10 branch is the
    * gauge, exactly like `q_sketch_distinct`'s exact branch. Because the
    * hash rows are md5 slices (no JVM-private seed), the DuckDB oracle
    * REBUILDS the identical sketch and pins `est_n` exactly, not just
    * the verdict. The typed dense-grid
    * [[graft.functions.CountMinAggregator]] remains the STREAMING-side
    * kernel (CountMinSpec-covered); this batch path no longer uses it.
    */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    // r13: the sketch is built DECLARATIVELY as sparse (row, bucket)
    // counts — one codegen hash-agg — instead of the typed dense-array
    // CountMinAggregator (non-codegen per-row update + d·w-long buffer
    // serialization between partial and merge; the q_join_size_est
    // lesson, measured ~10× there and one 3.2 s job here at sf0.1).
    // A sparse count equals the dense grid cell exactly (absent bucket
    // = 0, and every probed bucket contains at least its own term), so
    // est_n is unchanged; the CountMinAggregator itself remains the
    // streaming-side kernel, spec-covered by CountMinSpec.
    def slices(c: Column): Column = posexplode(array((0 until CMS_D).map(i =>
      conv(substring(md5(c), 1 + 7 * i, 7), 16, 10).cast("long") % CMS_W): _*))
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val buckets = toks
      .select(slices(col("tok")).as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
      .localCheckpoint() // read by the probe join AND the total
    // each token lands in exactly CMS_D buckets, so Σc = d·total (exact)
    val total = buckets.agg(expr(s"sum(c) div $CMS_D").as("total"))
    val topk = toks.groupBy(col("tok").as("term"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(desc("exact_n"), col("term"))
      .limit(10)
    val est = topk
      .select(col("term"), col("exact_n"), slices(col("term")).as(Seq("i", "bucket")))
      .join(buckets, Seq("i", "bucket"))
      .groupBy("term", "exact_n").agg(min("c").as("est_n"))
    est.crossJoin(broadcast(total))
      .select(col("term"), col("exact_n"), col("est_n"),
        (col("est_n") <= col("exact_n") + ceil(lit(math.E) * col("total") / CMS_W)).as("within_eps"))
      .orderBy(desc("exact_n"), col("term"))
  }

  val oracleHeavyHitters: String = {
    def slice(expr: String, i: Int): String =
      s"CAST(('0x' || substr(md5($expr), ${1 + 7 * i}, 7)) AS UBIGINT) % $CMS_W"
    val rowJoin = (0 until CMS_D).map { i =>
      s"""SELECT e.term, count(*) AS row_est
         | FROM exact e JOIN toks t ON ${slice("t.tok", i)} = ${slice("e.term", i)}
         | GROUP BY e.term""".stripMargin
    }.mkString("", "\n UNION ALL\n", "")
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       | exact AS (
       |  SELECT tok AS term, count(*) AS exact_n FROM toks GROUP BY tok
       |  ORDER BY exact_n DESC, term LIMIT 10),
       | n AS (SELECT count(*) AS total FROM toks),
       | rows_est AS (
       | $rowJoin),
       | est AS (SELECT term, min(row_est) AS est_n FROM rows_est GROUP BY term)
       |SELECT e.term, e.exact_n, est.est_n,
       |  est.est_n <= e.exact_n + ceil(2.718281828459045 * n.total / $CMS_W) AS within_eps
       |FROM exact e JOIN est USING (term), n
       |ORDER BY e.exact_n DESC, e.term""".stripMargin
  }

  // -------------------------------------------------------------- entropy

  /** Per-document word-entropy (`q_text_entropy`): H = −Σ p·ln p over the
    * doc's word distribution — low entropy flags repetitive/templated
    * text (the information-density quality signal next to the repetition
    * ratio). Two hash aggregates — (doc, word) counts, then the per-doc
    * entropy sum — both map-side combinable; the doc word total rides
    * along via a window over the (doc, word) frame bounded by doc
    * vocabulary. ln is libm on both engines; 6dp rounding at the edge
    * absorbs the last-ulp differences.
    */
  def qTextEntropy(s: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).cast("double").as("c"))
    val withN = wc.withColumn("n",
      sum("c").over(Window.partitionBy("doc_id")))
    withN
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_distinct_words"),
        round(sum(-(col("c") / col("n")) * log(col("c") / col("n"))), 6).as("entropy"))
      .orderBy("doc_id")
  }

  val oracleTextEntropy: String =
    """WITH wc AS (
      |  SELECT doc_id, word, count(*)::DOUBLE AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY doc_id, word),
      |wn AS (SELECT doc_id, word, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM wc)
      |SELECT doc_id, count(*) AS n_distinct_words,
      | round(sum(-(c / n) * ln(c / n)), 6) AS entropy
      |FROM wn GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- BM25 search

  /** BM25 hyperparameters (the Robertson/Sparck-Jones defaults) and the
    * fixed keyword query — literal TEXT so the identical doubles appear in
    * both engines' plans. */
  private val BM25_K1 = "1.2"
  private val BM25_B  = "0.75"
  private[graft] val BM25_QUERY = Seq("spark", "window", "merge")

  /** BM25 keyword retrieval (`q_bm25`): top-10 documents for a fixed
    * 3-term query — the scoring head a retrieval stack runs over the
    * inverted index (`q_inverted_index` builds the postings; this ranks).
    *
    * Scale shape: the token explode is filtered to the query terms
    * BEFORE any aggregation, so the per-(doc, term) frame is query-hit
    * sized, not corpus-vocabulary sized; df (|query terms| rows) and the
    * corpus stats (1 row) broadcast; the final top-k is a
    * TakeOrderedAndProject, never a global sort at 100 TB. The idf uses
    * ln — both engines' libm agree far beyond the 6dp output rounding,
    * and ORDER BY uses the rounded score with doc_id ties so the top-10
    * boundary is engine-stable.
    */
  def qBm25(s: SparkSession, dir: String): DataFrame =
    bm25Scores(s, dir)
      .orderBy(desc("score"), col("doc_id"))
      .limit(10)

  /** Full per-matching-doc BM25 score frame (6dp) — shared by the
    * top-10 query and the RRF hybrid-fusion ranker. */
  private[graft] def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val k1 = expr(BM25_K1); val b = expr(BM25_B)
    val docsW = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("double").as("dl"), col("w"))
    val toks = docsW
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(BM25_QUERY: _*))
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    val stats = docsW.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val dfq = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / col("avgdl")))).as("sc"))
      .groupBy("doc_id").agg(round(sum("sc"), 6).as("score"))
  }

  /** Shared BM25 CTE chain ending in `bmscore(doc_id, score)`. */
  private[graft] val bm25SqlCtes: String = {
    val terms = BM25_QUERY.map(t => s"'$t'").mkString("(", ",", ")")
    s"""d AS (SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl,
       |                  string_split(text, ' ') AS w FROM documents),
       |toks AS (SELECT doc_id, dl, unnest(w) AS term FROM d),
       |hits AS (SELECT doc_id, dl, term FROM toks WHERE term IN $terms),
       |ft AS (SELECT doc_id, term, count(*)::DOUBLE AS tf, any_value(dl) AS dl
       |       FROM hits GROUP BY doc_id, term),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM d),
       |dfq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM hits GROUP BY term),
       |bmscore AS (
       |  SELECT doc_id,
       |   round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |     * (tf * ($BM25_K1 + 1.0))
       |     / (tf + $BM25_K1 * (1.0 - $BM25_B + $BM25_B * dl / avgdl))), 6) AS score
       |  FROM ft JOIN dfq USING (term), stats
       |  GROUP BY doc_id)""".stripMargin
  }

  val oracleBm25: String =
    s"""WITH $bm25SqlCtes
       |SELECT doc_id, score FROM bmscore
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  // ----------------------------------------------------------- zipf slope

  /** Head size for the Zipf fit: the power-law regime lives in the head;
    * the tail is plateaued hapax noise that would bias the slope. */
  private[graft] val ZIPF_N = 100

  /** Zipf rank–frequency fit (`q_zipf_fit`) — the corpus-health gauge:
    * natural text follows freq ∝ rank^s with s ≈ −1; a much flatter
    * slope says template/boilerplate flooding, a much steeper one says
    * collapsed vocabulary (the generated-text smell). OLS of ln(freq)
    * on ln(rank) over the top-[[ZIPF_N]] terms, with r² as the
    * power-law goodness.
    *
    * Scale shape: ONE corpus-scale shuffle (the word count,
    * map-side-combinable); the head is TakeOrdered([[ZIPF_N]]), the
    * rank a row_number over that ≤[[ZIPF_N]]-row frame (bounded global
    * window, whitelisted), and the fit one fold to a 1-row frame. The
    * ln calls are the only libm surface; OLS sums amplify a 1-ulp
    * drift nowhere near the 6th decimal at n=100.
    */
  def qZipfFit(s: SparkSession, dir: String): DataFrame =
    zipfFitOf(Tables.documents(s, dir))

  private[graft] def zipfFitOf(docs: DataFrame): DataFrame = {
    val ranked = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).limit(ZIPF_N)
      .withColumn("r", row_number().over(
        Window.orderBy(desc("c"), col("w"))))
    val sums = ranked
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sx2") - col("sx") * col("sx"))
    sums.select(
      col("n").cast("long").as("n_terms"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
      round(
        ((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sx2") - col("sx") * col("sx")) *
            (col("n") * col("sy2") - col("sy") * col("sy"))), 6).as("r2"))
  }

  val oracleZipfFit: String =
    s"""WITH ranked AS (
       |  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
       |  FROM (SELECT w, count(*) AS c
       |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |        GROUP BY w)
       |  ORDER BY c DESC, w LIMIT $ZIPF_N),
       |pts AS (SELECT ln(r::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM ranked),
       |s AS (
       |  SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x*y) AS sxy, sum(x*x) AS sx2, sum(y*y) AS sy2
       |  FROM pts)
       |SELECT CAST(n AS BIGINT) AS n_terms,
       |  round((n*sxy - sx*sy) / (n*sx2 - sx*sx), 6) AS slope,
       |  round((sy - ((n*sxy - sx*sy) / (n*sx2 - sx*sx)) * sx) / n, 6) AS intercept,
       |  round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
       |    / ((n*sx2 - sx*sx) * (n*sy2 - sy*sy)), 6) AS r2
       |FROM s""".stripMargin

  // --------------------------------------------------- chi² term selection

  /** Global-count cutoff for χ² candidates — the standard min-df gate
    * feature selection applies before scoring (a word seen twice carries
    * no statistical signal and bloats the candidate frame). */
  private[graft] val CHI2_MIN_C = 5L
  private[graft] val CHI2_TOP   = 10

  /** χ² term–source association (`q_chi2_terms`) — the classic
    * feature-selection scan: for every (source, word) the 2×2
    * contingency χ² against the rest of the corpus, top-[[CHI2_TOP]]
    * OVER-represented words per source (observed > expected only — the
    * discriminative vocabulary of each source). The frequentist sibling
    * of [[graft.operators.Pipeline.qJsDivergence]] (which scores the
    * whole distribution, not individual terms).
    *
    * Scale shape: one token explode into a (source, word) hash agg;
    * word marginals are a groupBy joined back on word (aggregated
    * frames both sides); source marginals and the grand total are
    * broadcast. The only window partitions by source over the
    * candidate frame — bounded by the post-cutoff VOCABULARY, which
    * saturates sublinearly (Heaps' law), not by the corpus; the χ²
    * products run in doubles (the squared term overflows BIGINT long
    * before any real corpus ends).
    */
  def qChi2Terms(s: SparkSession, dir: String): DataFrame = {
    val sw = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
      .cache()
    val wt = sw.groupBy("word").agg(sum("c").as("wc"))
      .filter(col("wc") >= CHI2_MIN_C)
    val st = sw.groupBy("source").agg(sum("c").as("st"))
    val nn = sw.agg(sum("c").as("n")).select(col("n").cast("double").as("nd"))
    val cand = sw.join(wt, "word")
      .join(broadcast(st), "source")
      .crossJoin(broadcast(nn))
      .withColumn("a", col("c").cast("double"))
      .withColumn("wcd", col("wc").cast("double"))
      .withColumn("std", col("st").cast("double"))
      .withColumn("dif",
        col("a") * (col("nd") - col("std") - col("wcd") + col("a")) -
          (col("wcd") - col("a")) * (col("std") - col("a")))
      .filter(col("dif") > 0) // over-represented in this source only
      .withColumn("chi2",
        (col("nd") * col("dif") * col("dif")) /
          (col("wcd") * (col("nd") - col("wcd")) * col("std") *
            (col("nd") - col("std"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("chi2").desc, col("word"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= CHI2_TOP)
      .select(col("source"), col("rank").cast("long").as("rank"), col("word"),
        col("c"), col("wc"), round(col("chi2"), 4).as("chi2"))
      .orderBy("source", "rank")
  }

  val oracleChi2Terms: String =
    s"""WITH sw AS (
       |  SELECT source, word, count(*) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1, 2),
       |wt AS (SELECT word, CAST(sum(c) AS BIGINT) AS wc FROM sw GROUP BY word
       |       HAVING sum(c) >= $CHI2_MIN_C),
       |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS st FROM sw GROUP BY source),
       |nn AS (SELECT sum(c)::DOUBLE AS nd FROM sw),
       |cand AS (
       |  SELECT sw.source, sw.word, sw.c, wt.wc,
       |    sw.c::DOUBLE AS a, wt.wc::DOUBLE AS wcd, st.st::DOUBLE AS std, nn.nd,
       |    sw.c::DOUBLE * (nn.nd - st.st::DOUBLE - wt.wc::DOUBLE + sw.c::DOUBLE)
       |      - (wt.wc::DOUBLE - sw.c::DOUBLE) * (st.st::DOUBLE - sw.c::DOUBLE) AS dif
       |  FROM sw JOIN wt USING (word) JOIN st USING (source) CROSS JOIN nn),
       |scored AS (
       |  SELECT source, word, c, wc,
       |    (nd * dif * dif) / (wcd * (nd - wcd) * std * (nd - std)) AS chi2
       |  FROM cand WHERE dif > 0),
       |r AS (
       |  SELECT source, word, c, wc, chi2,
       |    row_number() OVER (PARTITION BY source ORDER BY chi2 DESC, word) AS rank
       |  FROM scored)
       |SELECT source, rank, word, c, wc, round(chi2, 4) AS chi2
       |FROM r WHERE rank <= $CHI2_TOP ORDER BY source, rank""".stripMargin

  // ------------------------------------------------------ vocab coverage
  /** Tokenizer-vocabulary size for the coverage gauge: the driver corpus
    * has ~31 distinct whitespace tokens, so a top-16 vocabulary leaves a
    * real OOV tail (a production V of 32k-plus would be vacuously
    * complete here; the PLAN is identical either way). */
  private[graft] val VOCAB_V = 16

  /** Per-source out-of-vocabulary rate against the corpus top-V
    * vocabulary — the gauge run before committing to a tokenizer vocab:
    * which sources will fragment into unknown tokens.
    *
    * Scale: ONE wide shuffle reduces raw tokens to the (source, token)
    * count frame; the corpus vocabulary re-aggregates THAT reduced frame
    * (|types| rows) and its top-V is a bounded TakeOrdered broadcast back
    * — the raw token stream is never shuffled twice, and no window
    * touches a data-proportional frame.
    */
  def qVocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("c"))
    val vocab = st.groupBy("tok").agg(sum("c").as("cc"))
      .orderBy(desc("cc"), col("tok"))
      .limit(VOCAB_V)
      .select(col("tok"), lit(1L).as("in_vocab"))
    st.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy("source")
      .agg(
        sum("c").as("n_toks"),
        count(lit(1)).as("n_types"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L))).as("oov_toks"),
        sum(when(col("in_vocab").isNull, lit(1L)).otherwise(lit(0L))).as("oov_types"),
        round(sum(when(col("in_vocab").isNull, col("c")).otherwise(lit(0L)))
          / sum("c").cast("double"), 6).as("oov_rate"))
      .orderBy("source")
  }

  val oracleVocabCoverage: String =
    s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |st AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
       |vocab AS (
       |  SELECT tok FROM (SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM st GROUP BY tok)
       |  ORDER BY cc DESC, tok LIMIT $VOCAB_V)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_toks, count(*) AS n_types,
       |  CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT) AS oov_toks,
       |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_types,
       |  round(CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT)
       |    / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE), 6) AS oov_rate
       |FROM st LEFT JOIN vocab v ON st.tok = v.tok
       |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------ prefix dedup
  private[graft] val PREFIX_LEN = 48

  /** Boilerplate-prefix clusters: documents sharing the same normalized
    * leading 48 characters (alnum-only). Catches templated headers /
    * mirrored page intros that full-document exact dedup misses when the
    * tails differ — the cheap first pass before shingle-level dedup.
    *
    * Scale: narrow projection to a fixed-width key, one count shuffle,
    * HAVING-style filter AFTER map-side partial aggregation. The keeper
    * id rides the same aggregate (min), so no second pass or window.
    */
  def qPrefixDup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        substring(regexp_replace(col("text"), "[^a-z0-9]", ""), 1, PREFIX_LEN).as("pfx"))
      .groupBy("pfx")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") > 1)
      .select(col("pfx"), col("n_docs"), col("keep_id"),
        (col("n_docs") - 1).as("n_dropped"))
      .orderBy(desc("n_docs"), col("pfx"))

  val oraclePrefixDup: String =
    s"""SELECT pfx, count(*) AS n_docs, min(doc_id) AS keep_id,
       |  count(*) - 1 AS n_dropped
       |FROM (SELECT doc_id,
       |        substr(regexp_replace(text, '[^a-z0-9]', '', 'g'), 1, $PREFIX_LEN) AS pfx
       |      FROM documents)
       |GROUP BY pfx HAVING count(*) > 1
       |ORDER BY n_docs DESC, pfx""".stripMargin

  // ------------------------------------------------ negative sampling
  private[graft] val NEG_TOP = 20

  /** Word2vec-style negative-sampling table: unigram counts smoothed by
    * the standard 3/4 power, normalized to a sampling distribution.
    *
    * Cross-engine exactness: `c^0.75` is computed as
    * `sqrt(c * sqrt(c))` — both sqrt calls are IEEE-correctly-rounded in
    * both engines, so the double is bit-identical — then rounded to
    * integer MICROS before the normalizing sum (BIGINT-exact; a raw
    * double sum would be order-dependent).
    *
    * Scale: token-count shuffle with map-side combine, then the top-N is
    * a bounded TakeOrdered; the normalizer is a 1-row broadcast over the
    * already-reduced |types| frame.
    */
  def qNegSampling(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("c"))
    val cd = col("c").cast("double")
    val weighted = counts.select(col("tok"), col("c"),
      round(sqrt(cd * sqrt(cd)) * 1e6).cast("long").as("w_micro"))
    val tot = weighted.agg(sum("w_micro").as("tot_micro"))
    weighted.crossJoin(broadcast(tot))
      .select(col("tok"), col("c"), col("w_micro"),
        round(col("w_micro") / col("tot_micro").cast("double"), 6).as("p_neg"))
      .orderBy(desc("w_micro"), col("tok"))
      .limit(NEG_TOP)
  }

  val oracleNegSampling: String =
    s"""WITH counts AS (
       |  SELECT tok, count(*) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |w AS (
       |  SELECT tok, c,
       |    CAST(round(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE))) * 1000000) AS BIGINT) AS w_micro
       |  FROM counts),
       |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tot_micro FROM w)
       |SELECT tok, c, w_micro,
       |  round(w_micro / CAST(tot_micro AS DOUBLE), 6) AS p_neg
       |FROM w, t
       |ORDER BY w_micro DESC, tok LIMIT $NEG_TOP""".stripMargin

  // ------------------------------------------------ corpus diversity
  /** Per-source lexical-diversity profile: type-token ratio, Simpson
    * concentration (unbiased `sum c(c-1) / N(N-1)`), Gini-Simpson and
    * inverse-Simpson ("effective vocabulary") — the corpus-mix dashboard
    * row that flags a source collapsing onto few tokens.
    *
    * All indices are ratios of exact BIGINT count-pair sums (the c(c-1)
    * products accumulate in decimal(38,0) so no scale overflows them);
    * doubles appear only at the 6dp output edge — no transcendentals, so
    * the hashes are engine-independent.
    *
    * Scale: raw tokens reduce once to (source, token) counts; every
    * index then aggregates that reduced frame. Same two-stage reduction
    * discipline as `q_vocab_coverage`.
    */
  def qCorpusDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(
        sum("c").as("n_toks"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("decimal(38,0)") * (col("c") - 1)).as("pairs"))
      .select(
        col("source"), col("n_toks"), col("n_types"),
        round(col("n_types") / col("n_toks").cast("double"), 6).as("ttr"),
        round(col("pairs").cast("double")
          / (col("n_toks").cast("double") * (col("n_toks") - 1).cast("double")), 6).as("simpson"),
        round(lit(1.0) - col("pairs").cast("double")
          / (col("n_toks").cast("double") * (col("n_toks") - 1).cast("double")), 6).as("gini_simpson"),
        round(col("n_toks").cast("double") * (col("n_toks") - 1).cast("double")
          / col("pairs").cast("double"), 4).as("inv_simpson"))
      .orderBy("source")

  val oracleCorpusDiversity: String =
    """WITH st AS (
      |  SELECT source, tok, count(*) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY source, tok),
      |agg AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_toks, count(*) AS n_types,
      |    CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) AS pairs
      |  FROM st GROUP BY source)
      |SELECT source, n_toks, n_types,
      |  round(n_types / CAST(n_toks AS DOUBLE), 6) AS ttr,
      |  round(CAST(pairs AS DOUBLE)
      |    / (CAST(n_toks AS DOUBLE) * CAST(n_toks - 1 AS DOUBLE)), 6) AS simpson,
      |  round(CAST(1.0 AS DOUBLE) - CAST(pairs AS DOUBLE)
      |    / (CAST(n_toks AS DOUBLE) * CAST(n_toks - 1 AS DOUBLE)), 6) AS gini_simpson,
      |  round(CAST(n_toks AS DOUBLE) * CAST(n_toks - 1 AS DOUBLE)
      |    / CAST(pairs AS DOUBLE), 4) AS inv_simpson
      |FROM agg ORDER BY source""".stripMargin

  // ------------------------------------------------- readability
  /** Per-source readability profile (`q_readability`) — the curation
    * gauge that separates listy/boilerplate sources from prose before a
    * quality filter sees them: words, sentences, vowel-group syllable
    * estimate, long-word share, and the Flesch reading-ease score
    * 206.835 − 1.015·(W/S) − 84.6·(Syl/W).
    *
    * Scale shape: pure per-document projection (regexp_count passes,
    * whole-stage codegen) into one enum-keyed aggregate — the
    * qTextQuality plan shape. All per-doc counts are exact integers;
    * the ratios are single double expressions over summed integers,
    * identical in both engines.
    */
  def qReadability(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir).select(col("source"),
      regexp_count(col("text"), lit("\\S+")).cast("long").as("w"),
      greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L)).as("sen"),
      regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("syl"),
      regexp_count(col("text"), lit("\\S{7,}")).cast("long").as("lw"))
    def d(c: String) = col(c).cast("double")
    per.groupBy("source").agg(
        count(lit(1)).as("docs"),
        sum("w").as("words"), sum("sen").as("sentences"),
        sum("syl").as("syllables"), sum("lw").as("long_words"))
      .select(col("source"), col("docs"),
        col("words"), col("sentences"), col("syllables"), col("long_words"),
        round(d("words") / d("sentences"), 4).as("avg_sentence_len"),
        round(d("syllables") / d("words"), 4).as("syllables_per_word"),
        round(d("long_words") / d("words"), 4).as("long_word_ratio"),
        round(lit(206.835) - lit(1.015) * (d("words") / d("sentences"))
          - lit(84.6) * (d("syllables") / d("words")), 4).as("flesch"))
      .orderBy("source")
  }

  val oracleReadability: String =
    """WITH per AS (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
      |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS sen,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl,
      |    CAST(len(regexp_extract_all(text, '\S{7,}')) AS BIGINT) AS lw
      |  FROM documents),
      |g AS (SELECT source, count(*) AS docs, sum(w) AS words, sum(sen) AS sentences,
      |  sum(syl) AS syllables, sum(lw) AS long_words
      |  FROM per GROUP BY source)
      |SELECT source, CAST(docs AS BIGINT) AS docs,
      |  CAST(words AS BIGINT) AS words, CAST(sentences AS BIGINT) AS sentences,
      |  CAST(syllables AS BIGINT) AS syllables, CAST(long_words AS BIGINT) AS long_words,
      |  round(CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE), 4) AS avg_sentence_len,
      |  round(CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE), 4) AS syllables_per_word,
      |  round(CAST(long_words AS DOUBLE) / CAST(words AS DOUBLE), 4) AS long_word_ratio,
      |  round(206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
      |    - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)), 4) AS flesch
      |FROM g ORDER BY source""".stripMargin

  // ------------------------------------------------- Heaps' law fit
  /** Prefix buckets for [[qHeapsFit]] — shared with the oracle. */
  private[graft] val HEAPS_BUCKETS = 10

  /** Heaps'-law vocabulary growth (`q_heaps_fit`): how fast does the
    * corpus keep yielding NEW terms? V(n) ≈ K·n^β — β near 1 means the
    * crawl is still discovering vocabulary (keep ingesting), β near 0
    * means saturation (more data buys repetition, not coverage). The
    * curve is measured on [[HEAPS_BUCKETS]] doc-id-ordered prefixes and
    * fitted by OLS on the log-log points.
    *
    * Scale shape: a term's contribution to EVERY prefix is determined
    * by its FIRST bucket alone, so one vocabulary-keyed min-bucket
    * aggregate (map-side combinable — the tf-idf df shape) replaces any
    * per-prefix distinct count; everything after runs on the
    * HEAPS_BUCKETS-row frame (cumulatives whitelisted-bounded, the OLS
    * sums folded in bucket order on both engines).
    */
  def qHeapsFit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val maxF = docs.agg((max("doc_id") + 1).as("maxp1"))
    val bucketed = docs.crossJoin(broadcast(maxF))
      .select(
        least(floor(col("doc_id") * HEAPS_BUCKETS / col("maxp1")),
          lit(HEAPS_BUCKETS - 1L)).cast("int").as("bucket"),
        col("text"), col("toks"))
    val firstBucket = bucketed
      .select(col("bucket"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(min("bucket").as("fb"))
      .groupBy("fb").agg(count(lit(1)).as("new_terms"))
    val tokCounts = bucketed.groupBy("bucket")
      .agg(sum("toks").as("toks"), count(lit(1)).as("docs"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = tokCounts
      .join(firstBucket, col("bucket") === col("fb"), "left")
      .select(col("bucket"), col("toks"), col("docs"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .select(col("bucket"),
        sum("toks").over(w).as("tokens_cum"),
        sum("docs").over(w).as("docs_cum"),
        sum("new_terms").over(w).as("vocab_cum"))
    // OLS over the log-log points, folded in bucket order
    val pts = cum.select(col("bucket"),
      log(col("tokens_cum").cast("double")).as("x"),
      log(col("vocab_cum").cast("double")).as("y"))
    def fold(f: Column => Column): Column =
      aggregate(array_sort(collect_list(struct(col("bucket"), col("x"), col("y")))),
        lit(0.0d), (a, e) => a + f(e))
    val fit = pts.agg(
        count(lit(1)).cast("double").as("np"),
        fold(e => e.getField("x")).as("sx"),
        fold(e => e.getField("y")).as("sy"),
        fold(e => e.getField("x") * e.getField("y")).as("sxy"),
        fold(e => e.getField("x") * e.getField("x")).as("sxx"))
      .select(col("np"),
        ((col("sxy") - col("sx") * col("sy") / col("np"))
          / (col("sxx") - col("sx") * col("sx") / col("np"))).as("beta"))
      .select(col("np"), col("beta"))
    // + 0.0 folds IEEE negative zero to positive zero: a saturated curve
    // (verbatim-copy amplification) yields beta = -0.0 in one engine and
    // 0.0 in the other, and the 6dp hash formats them differently
    cum.crossJoin(broadcast(fit.select((round(col("beta"), 6) + 0.0).as("beta"))))
      .select(col("bucket"), col("tokens_cum"), col("docs_cum"), col("vocab_cum"),
        col("beta"))
      .orderBy("bucket")
  }

  val oracleHeapsFit: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents),
       |mx AS (SELECT max(doc_id) + 1 AS maxp1 FROM docs),
       |bucketed AS (SELECT
       |  CAST(least(floor(doc_id * $HEAPS_BUCKETS / maxp1), ${HEAPS_BUCKETS - 1}) AS INT) AS bucket,
       |  text, toks FROM docs, mx),
       |fb AS (SELECT fb, count(*) AS new_terms FROM (
       |  SELECT term, min(bucket) AS fb
       |  FROM (SELECT bucket, unnest(string_split(text, ' ')) AS term FROM bucketed)
       |  GROUP BY term) GROUP BY fb),
       |tc AS (SELECT bucket, CAST(sum(toks) AS BIGINT) AS toks, count(*) AS docs
       |  FROM bucketed GROUP BY bucket),
       |cum AS (SELECT bucket,
       |  CAST(sum(toks) OVER wc AS BIGINT) AS tokens_cum,
       |  CAST(sum(docs) OVER wc AS BIGINT) AS docs_cum,
       |  CAST(sum(coalesce(new_terms, 0)) OVER wc AS BIGINT) AS vocab_cum
       |  FROM tc LEFT JOIN fb ON tc.bucket = fb.fb
       |  WINDOW wc AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)),
       |pts AS (SELECT bucket, ln(CAST(tokens_cum AS DOUBLE)) AS x,
       |  ln(CAST(vocab_cum AS DOUBLE)) AS y FROM cum),
       |fit AS (SELECT
       |  CAST(count(*) AS DOUBLE) AS np,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY bucket)), (a, v) -> a + v) AS sx,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(y ORDER BY bucket)), (a, v) -> a + v) AS sy,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(x * y ORDER BY bucket)), (a, v) -> a + v) AS sxy,
       |  list_reduce(list_prepend(0.0::DOUBLE, list(x * x ORDER BY bucket)), (a, v) -> a + v) AS sxx
       |  FROM pts),
       |beta AS (SELECT round((sxy - sx * sy / np) / (sxx - sx * sx / np), 6) + 0.0 AS beta FROM fit)
       |SELECT bucket, tokens_cum, docs_cum, vocab_cum, beta
       |FROM cum, beta ORDER BY bucket""".stripMargin

  // ----------------------------------------------------------------- nDCG
  /** Rank cutoff for `q_ndcg`. */
  private val NDCG_K = 10

  /** Discount table 1/log2(i+1) in integer MICROS, driver-computed and
    * injected verbatim into both engines — no libm log in either plan. */
  private def ndcgDisc: Seq[Long] =
    (1 to NDCG_K).map(i => Math.round(1e6 / (Math.log(i + 1.0) / Math.log(2.0))))

  /** nDCG@10 of the BM25 ranking (`q_ndcg`) — the evaluation rung the
    * retrieval family (BM25, RRF fusion, MMR) lacked: are the top-10
    * actually the most relevant? Graded relevance = number of DISTINCT
    * query terms the document contains (0..3, label-free and
    * reproducible), DCG with the standard 1/log2(pos+1) discounts as
    * driver-computed integer-micros literals, IDCG from the ideal
    * (relevance-sorted) ordering over ALL matching docs — nDCG < 1 means
    * BM25's length/tf weighting demoted some high-coverage doc.
    *
    * Determinism + scale: the ranking is `bm25Scores` (6dp scores,
    * doc_id tiebreak — stable cross-engine); positions come from a
    * row_number over the bounded top-K frame only (whitelisted global
    * window over ≤K rows, the zipf pattern); DCG/IDCG are exact integer
    * dot products rel·disc; the single nDCG division is one
    * double op off exact ints. Corpus-proportional work = the BM25 scan
    * itself plus one bounded TakeOrdered.
    */
  def qNdcg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rel = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isin(BM25_QUERY: _*))
      .select("doc_id", "term").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("rel"))
    val disc = typedLit(ndcgDisc)
    val top = bm25Scores(s, dir)
      .orderBy(desc("score"), col("doc_id")).limit(NDCG_K)
      .withColumn("pos", row_number().over( // bounded: <= K rows by construction
        Window.orderBy(desc("score"), col("doc_id"))))
    val dcg = top.join(rel, "doc_id") // rel-side is matched docs only; every top doc matches
      .select((col("rel") * element_at(disc, col("pos"))).as("term"))
      .agg(sum("term").as("dcg_micros"))
    val ideal = rel.orderBy(desc("rel"), col("doc_id")).limit(NDCG_K)
      .withColumn("pos", row_number().over(
        Window.orderBy(desc("rel"), col("doc_id"))))
      .select((col("rel") * element_at(disc, col("pos"))).as("term"))
      .agg(sum("term").as("idcg_micros"))
    val nRated = rel.agg(count(lit(1)).as("n_matching"))
    dcg.crossJoin(broadcast(ideal)).crossJoin(broadcast(nRated)) // 1x1x1 rows
      .select(col("n_matching"), col("dcg_micros"), col("idcg_micros"),
        (round(col("dcg_micros").cast("double") / col("idcg_micros").cast("double"), 6)
          + lit(0.0)).as("ndcg"))
  }

  val oracleNdcg: String = {
    val discL = ndcgDisc.mkString("[", ", ", "]")
    s"""WITH $bm25SqlCtes,
       |rel AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS rel FROM (
       |    SELECT DISTINCT doc_id, term FROM hits) GROUP BY doc_id),
       |top AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS pos
       |  FROM bmscore ORDER BY score DESC, doc_id LIMIT $NDCG_K),
       |dcg AS (
       |  SELECT CAST(sum(rel * CAST(($discL)[CAST(pos AS INT)] AS BIGINT)) AS BIGINT)
       |    AS dcg_micros
       |  FROM top JOIN rel USING (doc_id)),
       |ideal AS (
       |  SELECT CAST(sum(rel * CAST(($discL)[CAST(pos AS INT)] AS BIGINT)) AS BIGINT)
       |    AS idcg_micros
       |  FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
       |        FROM rel ORDER BY rel DESC, doc_id LIMIT $NDCG_K)),
       |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_matching FROM rel)
       |SELECT n_matching, dcg_micros, idcg_micros,
       |  round(CAST(dcg_micros AS DOUBLE) / CAST(idcg_micros AS DOUBLE), 6) + 0.0 AS ndcg
       |FROM dcg, ideal, nr""".stripMargin
  }
}
