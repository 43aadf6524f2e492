package graft.operators

import graft.SparkTestBase
import org.scalatest.funspec.AnyFunSpec

/** `q_quality_probe`: the in-engine trained text-quality classifier
  * must actually learn its weak label — English docs (the stopword
  * lexicon's language) score above every other language — and stay
  * deterministic run to run.
  */
class QualityProbeSpec extends AnyFunSpec with SparkTestBase {

  it("learns the weak label: en mean score strictly tops every other language") {
    val rows = Pipeline.qQualityProbe(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows.contains("en") && rows.size >= 2, s"langs: ${rows.keySet}")
    val en = rows("en")
    rows.filterNot(_._1 == "en").foreach { case (l, m) =>
      assert(en > m, s"en=$en must beat $l=$m after ${Pipeline.QP_ITERS} GD steps")
    }
  }

  it("is deterministic across runs (6dp-rounded GD, integer-micros mean)") {
    val a = Pipeline.qQualityProbe(spark, sfDir).collect().toSeq
    val b = Pipeline.qQualityProbe(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
