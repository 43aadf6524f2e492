package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** nprobe/recall sweep (`q_knn_nprobe`): one row per probe width, recall
  * monotone in nprobe, exhaustive probe (= IVF_K cells) is exact, and
  * the nprobe=2 row agrees with the single-setting gauge in
  * `q_knn_recall`.
  */
class KnnNprobeSpec extends AnyFunSpec with SparkTestBase {

  it("recall rises monotonically to 1.0 at the exhaustive probe") {
    val rows = Similarity.qKnnNprobe(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Similarity.NPROBES,
      "one row per swept nprobe, ascending")
    val recalls = rows.map(_.getDouble(2))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with nprobe: ${recalls.mkString(",")}")
    assert(recalls.last == 1.0,
      "probing all IVF_K cells IS brute force — recall must be exactly 1")
    assert(recalls.head > 0.0, "even nprobe=1 must find something")
  }

  it("the nprobe=2 row reproduces q_knn_recall's ivf gauge") {
    val sweep = Similarity.qKnnNprobe(spark, sfDir).collect()
      .find(_.getInt(0) == 2).get.getLong(1)
    val gauge = Similarity.qKnnRecall(spark, sfDir).collect()
      .find(_.getString(0) == "ivf").get.getLong(1)
    assert(sweep == gauge,
      s"sweep@nprobe=2 hits ($sweep) must equal the ivf gauge ($gauge)")
  }
}
