package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationQueries

/** The round-9 curation trio beyond their DuckDB oracles: q159 must FIND
  * a planted cross-split near-dup (the oracle only proves engine
  * equivalence — this proves the operator detects the contamination it
  * exists for), and the q160/q163 rollups must satisfy their structural
  * invariants on the real corpus.
  */
class CurationExtrasSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("CurationExtrasSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("split leakage: a planted train/test near-dup pair is detected " +
      "with its split labels") {
    import spark.implicits._
    // ids 0 (train) and 20 (test) — md5-bucket arithmetic, precomputed;
    // identical text => jaccard 1 pair crossing the split boundary
    val quote = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val docs = Seq(
      (0L, quote), (20L, quote),
      (1L, "completely different words live here one two three four"),
      (2L, "and a third unrelated document padding the corpus five six"))
      .toDF("doc_id", "text")
    val leaked = graft.ops.TextDedup.minhashLshPairs(docs,
        "doc_id", "text", n = 3, numHashes = 48, bands = 8, threshold = 0.5)
      .withColumn("split_a", graft.ops.Splits.split(col("id_a")))
      .withColumn("split_b", graft.ops.Splits.split(col("id_b")))
      .filter(col("split_a") =!= col("split_b"))
      .collect()
    assert(leaked.length == 1, s"expected exactly the planted pair, got " +
      s"${leaked.mkString(", ")}")
    val r = leaked.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 20L)
    assert(r.getString(3) == "train" && r.getString(4) == "test")
  }

  test("q159 on the corpus: every emitted pair crosses splits and clears " +
      "the jaccard threshold") {
    val rows = CurationQueries.q159_split_leakage(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getString(2) != r.getString(3),
        s"pair does not cross splits: $r")
      assert(r.getDouble(4) >= 0.5, s"sub-threshold pair leaked: $r")
    }
  }

  test("q160 budget curve: buckets bounded, cumulative sums consistent " +
      "best-bucket-down, totals equal the corpus") {
    val rows = CurationQueries.q160_budget_curve(spark, sf).collect()
    assert(rows.nonEmpty)
    // rows arrive ordered by q_bucket DESC; replay the prefix sums
    var cd = 0L; var ct = 0L
    rows.foreach { r =>
      val bucket = r.getLong(0)
      assert(bucket >= 0L && bucket <= 20L, s"bucket out of range: $r")
      cd += r.getLong(1); ct += r.getLong(2)
      assert(r.getLong(3) == cd && r.getLong(4) == ct,
        s"cumulative drifted from replayed prefix sum at $r")
    }
    val docs = graft.queries.Tables.documents(spark, sf)
    assert(cd == docs.count(), "cum_docs total != corpus size")
  }

  test("q163 dataset card: one row per source, ppm figures in range, " +
      "totals equal the corpus") {
    val rows = CurationQueries.q163_dataset_card(spark, sf).collect()
    val docs = graft.queries.Tables.documents(spark, sf)
    val nSources = docs.select("source").distinct().count()
    assert(rows.length.toLong == nSources, "not one row per source")
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L,
        s"dup_ppm out of range: $r")
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L,
        s"mean_quality_ppm out of range: $r")
      assert(r.getLong(3) >= 1L, s"a source with docs has no language: $r")
    }
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "per-source doc counts do not sum to the corpus")
  }
}
