// ScaleProbe lives in the default package (a scratch main), and named
// packages cannot reference the default package — so this spec sits
// beside it in the default package too.
import org.scalatest.funsuite.AnyFunSuite

/** The probe's arg gate: a typo'd section name must fail with the valid
  * list, not exit cleanly having run nothing (which reads as a
  * successful probe). Validation happens before any SparkSession is
  * built, so this is cheap to assert.
  */
class ScaleProbeSpec extends AnyFunSuite {
  test("a misspelled section name fails fast with the valid list") {
    val e = intercept[IllegalArgumentException] { ScaleProbe.main(Array("recal")) }
    assert(e.getMessage.contains("recal") && e.getMessage.contains("recall"),
      e.getMessage)
  }

  test("sectionNames covers every dispatch site") {
    // the source-level guard inside section(...) keeps the list in sync;
    // here we pin the externally documented names
    assert(ScaleProbe.sectionNames.toSet ===
      Set("dedup", "clusters", "lsh", "emblsh", "stream", "recall", "etl",
        "skew", "tenant", "layout", "sketch", "spans", "planner", "geo",
        "drift", "cdc", "sparse", "rest", "semantic", "classify", "curation",
        "ordering", "storeivf", "pqlog", "fresh", "wire", "storetext",
        "sharded", "recallc", "recallc2", "storehnsw", "topology",
        "maintain", "quanthnsw", "snaprestore", "quantmulti"))
  }
}
