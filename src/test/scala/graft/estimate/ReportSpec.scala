package graft.estimate

import org.scalatest.funsuite.AnyFunSuite

/** Result-analysis presentation layer (evaluate.py:17-106 analog):
  * confusion-matrix layout, classification-report math against
  * hand-computed sklearn values, bucket-error frame, and artifact
  * rendering/writing.
  */
class ReportSpec extends AnyFunSuite {

  // (true, pred) label pairs with a known confusion structure
  private val pairs = Seq(
    (0, 0), (0, 0), (0, 1),          // true 0: 2 right, 1 as 1
    (1, 1), (1, 0),                  // true 1: 1 right, 1 as 0
    (2, 2), (2, 2), (2, 2))          // true 2: all right

  test("confusion matrix rows=true cols=pred over the label union") {
    val (labels, m) = Report.confusion(pairs)
    assert(labels == Seq(0, 1, 2))
    assert(m == Seq(Seq(2, 1, 0), Seq(1, 1, 0), Seq(0, 0, 3)))
  }

  test("classification scores match hand-computed sklearn values") {
    val s = Report.classificationScores(pairs).map(x => x.label -> x).toMap
    // label 0: tp=2, pred 0 count=3 -> prec 2/3; true 0 count=3 -> rec 2/3
    assert(math.abs(s(0).precision - 2.0 / 3) < 1e-12)
    assert(math.abs(s(0).recall - 2.0 / 3) < 1e-12)
    assert(math.abs(s(0).f1 - 2.0 / 3) < 1e-12)
    assert(s(0).support == 3)
    // label 1: tp=1, pred 1 count=2 -> prec 0.5; true 1 count=2 -> rec 0.5
    assert(math.abs(s(1).precision - 0.5) < 1e-12)
    assert(math.abs(s(1).f1 - 0.5) < 1e-12)
    // label 2: perfect
    assert(s(2).precision == 1.0 && s(2).recall == 1.0 && s(2).f1 == 1.0)
  }

  test("zero-division labels score 0 like sklearn zero_division=0") {
    // label 5 appears only as a prediction: recall undefined -> 0
    val p = Seq((0, 5), (0, 0))
    val s = Report.classificationScores(p).map(x => x.label -> x).toMap
    assert(s(5).recall == 0.0 && s(5).f1 == 0.0 && s(5).support == 0)
  }

  test("mcc metrics agree with Metrics on accuracy/kappa") {
    val m = Report.mccMetrics(pairs).toMap
    assert(math.abs(m("accuracy") - 6.0 / 8) < 1e-12)
    assert(math.abs(m("kappa") -
      Metrics.cohenKappa(pairs.map { case (t, p) => (p, t) })) < 1e-12)
    // macro f1 = mean(2/3, 1/2, 1)
    assert(math.abs(m("f1 macro") - (2.0 / 3 + 0.5 + 1.0) / 3) < 1e-12)
    // weighted f1 = (3*2/3 + 2*1/2 + 3*1) / 8
    assert(math.abs(m("f1 weighted") - (3 * 2.0 / 3 + 2 * 0.5 + 3 * 1.0) / 8) < 1e-12)
  }

  test("result rows compute bucket / abs_err / err_ratio like evaluate_results") {
    val r = Report.ResultRow("q", trueSec = 8.0, predSec = 2.0)
    assert(r.bucket == 3)                 // round(log2(8))
    assert(r.absErr == 6.0)
    assert(r.errRatio == 4.0)             // true / pred
    val byB = Report.errorByBucket(Seq(r,
      Report.ResultRow("q2", 8.0, 4.0))) // same bucket, absErr 4, ratio 2
    assert(byB.size == 1)
    val (b, am, amed, rm, rmed) = byB.head
    assert(b == 3 && am == 5.0 && amed == 5.0 && rm == 3.0 && rmed == 3.0)
  }

  test("markdown artifact renders and writes every section") {
    val rows = (1 to 30).map { i =>
      val t = math.pow(2.0, i % 5)
      Report.ResultRow(s"q$i", t, t * (if (i % 7 == 0) 2.0 else 1.0))
    }
    val md = Report.renderMarkdown("test report", rows)
    for (section <- Seq("## Summary metrics", "## Confusion matrix",
      "## Classification report", "## Error by true bucket",
      "## Binary split", "macro avg", "weighted avg"))
      assert(md.contains(section), s"missing: $section")
    val path = java.nio.file.Files.createTempDirectory("report").toString + "/r.md"
    Report.write(path, "test report", rows)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(path)) == md)
  }
}
