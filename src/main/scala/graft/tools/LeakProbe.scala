package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (dev-only): does leaked localCheckpoint block state from
  * earlier bench queries degrade later ones? Runs a checkpoint-heavy
  * prefix, reports persistent-RDD storage, times q_mannwhitney, then
  * unpersists everything and times it again.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${128 * 1024}")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runQ(name: String, times: Int): Unit = (1 to times).foreach { _ =>
      spark.catalog.clearCache()
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    }
    def storage(): Unit = {
      val info = spark.sparkContext.getRDDStorageInfo
      val mem = info.map(_.memSize).sum / 1e6
      val disk = info.map(_.diskSize).sum / 1e6
      println(f"persistent RDDs: ${spark.sparkContext.getPersistentRDDs.size} " +
        f"(storageInfo ${info.length}), mem ${mem}%.1f MB, disk ${disk}%.1f MB")
    }
    def timeMw(tag: String): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q_mannwhitney")(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag q_mannwhitney: ${ts.map(t => f"$t%.2f").mkString(", ")} s")
    }

    val heavy = Seq("q_dedup_clusters", "q_media_clusters", "q_graph_bfs",
      "q_closeness_sample", "q_hits", "q_pagerank", "q_dedup_winnow",
      "q_text_containment", "q_dedup_minhash_lsh", "q_embedding_pca")
    println("=== warm q_mannwhitney on fresh session ===")
    timeMw("fresh")
    heavy.foreach { q => runQ(q, 3); System.err.println(s"[leakprobe] ran $q x3") }
    storage()
    timeMw("after-heavy")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    storage()
    timeMw("after-unpersist")
    spark.stop()
  }
}
