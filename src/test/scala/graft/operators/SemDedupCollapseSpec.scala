package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The SemDeDup rep-collapse contract (the r12 sf10 catch — the
  * member-level within-cell self-join ran 1292 s / ~85× at 100× data):
  * on a corpus with exact-duplicate embeddings, the representative-level
  * pair scan plus member reconstruction
  * (n_dropped = members − groups + rep-drops) equals the naive
  * member-level SemDeDup verdict EXACTLY, while the pair join only ever
  * sees one row per distinct embedding.
  */
class SemDedupCollapseSpec extends AnyFunSpec with SparkTestBase {

  /** sf0.001 embeddings ×3 verbatim copies under shifted ids. */
  private def dupDir: java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-semdup").toFile
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    e.withColumn("cp", explode(sequence(lit(0L), lit(2L))))
      .withColumn("vec_id", col("vec_id") + col("cp") * off)
      .drop("cp")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  it("per-cell drop census equals the naive member-level SemDeDup on 3x copies") {
    val dir = dupDir.getAbsolutePath
    val got = Similarity.qDedupSemantic(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    // naive member-level replay (the pre-collapse shape), same session
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val off = e.agg(max("vec_id") + 1).head.getLong(0)
    val dups = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + off).as("vec_id"),
        transform(col("emb"), (v, i) =>
          v + when(i === 0, lit(0.05)).otherwise(lit(0.0))).as("emb"))
    val corpus = e.unionByName(dups)
    val cent = Similarity.trainedCentroidsFor(spark, dir)
    val assigned = Similarity.assignCells(spark, corpus, cent).cache()
    def cos(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
        (sqrt(expr(s"aggregate($a, 0D, (acc, v) -> acc + v * v)")) *
          sqrt(expr(s"aggregate($b, 0D, (acc, v) -> acc + v * v)")))
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("drop_id"),
        round(cos("a.emb", "b.emb"), 6).as("c"))
      .filter(col("c") >= 0.9)
    val dropped = pairs.select("drop_id").distinct()
    val want = assigned
      .join(dropped, col("vec_id") === col("drop_id"), "left")
      .groupBy("cell")
      .agg(count(lit(1)).as("m"), count(col("drop_id")).as("d"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assigned.unpersist()

    assert(got.keySet == want.keySet)
    got.foreach { case (cell, (m, d)) =>
      assert(want(cell) == ((m, d)), s"cell $cell: got ($m,$d) want ${want(cell)}")
    }
    // non-vacuous: with 3 copies of everything, most members must drop
    val (members, droppedN) = got.values.foldLeft((0L, 0L)) {
      case ((am, ad), (m, d)) => (am + m, ad + d)
    }
    assert(droppedN * 3 >= members * 2 - 3 * got.size,
      s"with 3 copies at least ~2/3 must drop: $droppedN of $members")
  }

  it("sweep counts equal the naive member-level sweep on 3x copies") {
    val dir = dupDir.getAbsolutePath
    val got = Similarity.qSemdedupSweep(spark, dir)
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val off = e.agg(max("vec_id") + 1).head.getLong(0)
    val dups = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + off).as("vec_id"),
        transform(col("emb"), (v, i) =>
          v + when(i === 0, lit(0.05)).otherwise(lit(0.0))).as("emb"))
    val corpus = e.unionByName(dups)
    val cent = Similarity.trainedCentroidsFor(spark, dir)
    val assigned = Similarity.assignCells(spark, corpus, cent).cache()
    def cos(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)") /
        (sqrt(expr(s"aggregate($a, 0D, (acc, v) -> acc + v * v)")) *
          sqrt(expr(s"aggregate($b, 0D, (acc, v) -> acc + v * v)")))
    val pairCos = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("drop_id"), round(cos("a.emb", "b.emb"), 6).as("c"))
    Seq(0.80, 0.90, 0.95, 0.99).foreach { tau =>
      val want = pairCos.filter(col("c") >= tau).select("drop_id").distinct().count()
      assert(got(tau) == want, s"tau=$tau: got ${got(tau)} want $want")
    }
    assigned.unpersist()
  }
}
