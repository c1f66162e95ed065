package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The three oracle-checked must-be-EMPTY gates (q67 SimHash precision,
  * q88 ANN rescoring, q89 sketch error) pass as empty at the Verify scale
  * (sf0.01). Sketch error and LSH precision are SCALE-DEPENDENT — a
  * parameterization that holds at 500 docs can break at 5,000 — so this
  * spec runs the gates at sf0.1, the bench corpus, where a break would
  * otherwise hide below the bench. CurationGateSpec proves the gates can
  * fire (by poisoning); this spec proves the shipped parameters hold an
  * order of magnitude above the oracle corpus.
  */
class GateScaleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("GateScaleSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q67: SimHash precision gate stays empty at sf0.1") {
    assert(graft.queries.ExtensionQueries.q67_sketch_precision(spark, sf).isEmpty,
      "SimHash emitted a sub-threshold pair at sf0.1")
  }

  test("q88: ANN rescoring gate stays empty at sf0.1") {
    assert(graft.queries.CurationQueries.q88_ann_gate(spark, sf).isEmpty,
      "an ANN tier's claimed score failed the independent cosine recompute at sf0.1")
  }

  test("q89: sketch error gate stays empty at sf0.1") {
    assert(graft.queries.CurationQueries.q89_sketch_error_gate(spark, sf).isEmpty,
      "HLL/percentile sketch error exceeded the 5% bound vs the exact tier at sf0.1")
  }
}
