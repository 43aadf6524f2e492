package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond parquet: schema-pinned CSV/JSON readers and
  * partitioned writers.
  *
  * Scale rules baked in:
  *  - Readers take an EXPLICIT schema. Schema inference reads the whole
  *    dataset before the query starts — a full extra pass at 100 TB. The
  *    schema is pinned from a sample or the catalog, never inferred per
  *    query.
  *  - `writePartitioned` lays data out hive-style (`col=value/` dirs) so
  *    later reads with a filter on the partition column prune directories
  *    at planning time (PartitionFilters in the scan, asserted in
  *    SourcesSpec) — the difference between scanning 100 TB and one
  *    partition of it.
  */
object Sources {

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST") // corrupt rows must fail loudly, not vanish
      .csv(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet write (partition pruning on read). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** ORC read/write — the other columnar interchange format (Hive-world
    * pipelines hand data over as ORC). Schema comes from the file footer
    * (self-describing, like parquet — no inference pass), and predicate
    * pushdown / column pruning work the same way; SourcesSpec asserts
    * the round-trip is binary-faithful for doubles, which CSV is not.
    */
  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Bucketed catalog-table write: pre-shuffles the data into `buckets`
    * hash buckets on `key` (sorted within each bucket) at WRITE time, so
    * every later equality join or aggregation on `key` between
    * same-bucketed tables runs with ZERO exchanges — the shuffle is paid
    * once at layout time instead of per query. This is the single
    * biggest repeated-join lever at 100 TB: a fact table joined nightly
    * against another fact on the same key should be bucketed on it
    * (bucket count sized so one bucket ≈ one task's worth of data).
    * Asserted shuffle-free in BucketedJoinSpec.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Small-file compaction: rewrite `src` as `files` output files at
    * `dest`. The small-files problem is THE silent scan killer at
    * 100 TB — a day of streaming micro-batches leaves thousands of
    * KB-sized files whose per-file open/footer cost dwarfs the read;
    * nightly compaction to ~128 MB–1 GB files restores scan throughput.
    * `repartition(files)` is a full shuffle by design: round-robin
    * rebalancing gives uniformly-sized outputs regardless of input
    * skew.
    */
  def compact(s: SparkSession, src: String, dest: String, files: Int): Unit =
    s.read.parquet(src).repartition(files).write.mode("overwrite").parquet(dest)

  /** Schema-evolution read: union the schemas of all files under
    * `path` (columns added over time come back null-padded for old
    * files). Off by default in Spark because footer-merging costs a
    * pass over file metadata — turn it on per-read where drift is
    * real, pin the merged schema in the catalog after.
    */
  def readMerged(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)

  /** PERMISSIVE read with a quarantine channel: malformed CSV lines land
    * in a `_corrupt_record` column instead of failing the job (the
    * FAILFAST twin above is for trusted writers; ingest from the wild
    * needs a dead-letter path). Returns (clean, quarantine): clean rows
    * with the corrupt column dropped, and the raw text of every
    * malformed line for the dead-letter sink. The parsed frame is
    * CACHED before splitting — Spark refuses plans whose scan
    * references ONLY the corrupt column (UNSUPPORTED_FEATURE.
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the cache also makes the
    * two branches share one parse of each split instead of re-reading.
    * Callers unpersist either branch when done (cheap: the cache holds
    * one ingest batch, the unit this API is called per).
    */
  def readCsvQuarantine(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = s.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache()
    val clean = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, quarantine)
  }

  // ------------------------------------------------------ roundtrip queries
  /** Orders → CSV → re-read → aggregate. The aggregate over the re-read
    * CSV must equal the oracle computed on the original parquet — an
    * end-to-end value-fidelity check of the CSV write+read path (integer
    * and string columns only; CSV is not a safe carrier for binary
    * doubles, which is itself the documented guidance).
    */
  def qSourceCsv(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-src-csv")
    try {
      val path = s"$tmp/orders_csv"
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val src = Tables.orders(s, dir).select(cols.map(col): _*)
      writeCsv(src, path)
      val agg = readCsv(s, path, src.schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("sum_key"),
          countDistinct("o_custkey").as("n_cust"))
        .orderBy("o_orderstatus")
      // tiny by construction (one row per status) — materialize so the
      // temp roundtrip files can be deleted deterministically
      localized(s, agg)
    } finally rmTree(tmp.toFile)
  }

  val oracleSourceCsv: String =
    """SELECT o_orderstatus, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      | count(DISTINCT o_custkey) AS n_cust
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Documents → JSONL → re-read → aggregate, exercising string escaping
    * through the JSON writer/parser pair (text survives byte-for-byte,
    * proven by md5-sum equality with the parquet-side oracle).
    */
  def qSourceJson(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-src-json")
    try {
      val path = s"$tmp/docs_json"
      val src = Tables.documents(s, dir).select("doc_id", "text", "lang")
      writeJsonl(src, path)
      val agg = readJsonl(s, path, src.schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).as("sum_chars"),
          min(md5(col("text"))).as("min_text_md5"))
        .orderBy("lang")
      localized(s, agg)
    } finally rmTree(tmp.toFile)
  }

  /** Lineitem → ORC → re-read → aggregate, including DOUBLE columns —
    * the value-fidelity case CSV cannot carry (`qSourceCsv` documents
    * that restriction; ORC is binary-faithful, so sums over re-read
    * doubles equal the parquet-side oracle bit-for-bit).
    */
  def qSourceOrc(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-src-orc")
    try {
      val path = s"$tmp/lineitem_orc"
      val src = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      writeOrc(src, path)
      val agg = readOrc(s, path)
        .groupBy("l_returnflag")
        // cents/centi-unit folds — the sf1 battery's double-sum lesson
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("l_quantity") * 100).cast("long")) / 100.0, 2)
            .as("sum_qty"),
          round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 2)
            .as("sum_price"),
          countDistinct("l_orderkey").as("n_orders"))
        .orderBy("l_returnflag")
      localized(s, agg)
    } finally rmTree(tmp.toFile)
  }

  val oracleSourceOrc: String =
    """SELECT l_returnflag, count(*) AS n,
      | round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_qty,
      | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_price,
      | count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Materialize a (tiny, bounded) result so upstream temp files can be
    * removed; the cardinality is fixed by the group-by key domain, never
    * by data volume. */
  private def localized(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.collect().toSeq
    s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), df.schema)
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  val oracleSourceJson: String =
    """SELECT lang, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      | min(md5(text)) AS min_text_md5
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Lineitem → Avro container files → re-read → aggregate. Carries a
    * long key, a string group, two DOUBLE measures and a TIMESTAMP
    * through [[AvroIO]]'s writer/reader pair (Avro long +
    * timestamp-micros — the same physical encoding spark-avro uses), so
    * equality with the parquet-side oracle proves bit-fidelity for every
    * column class the driver tables use. The min/max shipdate epoch-micros
    * columns pin the timestamp codec exactly (no string formatting in the
    * comparison path).
    */
  def qSourceAvro(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-src-avro")
    try {
      val path = s"$tmp/lineitem_avro"
      val src = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate")
      AvroIO.writeAvro(src, path)
      val back = AvroIO.readAvro(s, path, src.schema)
      val agg = back
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"),
          // NTZ → TZ cast is exact under the session's pinned UTC zone
          min(unix_micros(col("l_shipdate").cast("timestamp"))).as("min_ship_us"),
          max(unix_micros(col("l_shipdate").cast("timestamp"))).as("max_ship_us"),
          countDistinct("l_orderkey").as("n_orders"))
        .orderBy("l_returnflag")
      localized(s, agg)
    } finally rmTree(tmp.toFile)
  }

  val oracleSourceAvro: String =
    """SELECT l_returnflag, count(*) AS n,
      | CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
      | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
      | CAST(min(epoch_us(l_shipdate)) AS BIGINT) AS min_ship_us,
      | CAST(max(epoch_us(l_shipdate)) AS BIGINT) AS max_ship_us,
      | count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
