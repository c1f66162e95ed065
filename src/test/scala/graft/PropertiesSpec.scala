package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedupe, Impute, Ledger}
import graft.pipeline.JobsPipeline
import graft.schema.Schemas.RawScrapedUrl

/** Property tests (SURVEY §5.4): idempotency, imputation interval
  * semantics, dedup bounds — over generated sighting batches. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest-scalacheck bridge
  * is not in the offline dependency cache), so failures are reproducible.
  */
class PropertiesSpec extends AnyFunSuite {

  /** Run `body` over `n` deterministic samples of `gen`. */
  private def forAll[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("PropertiesSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genRow: Gen[RawScrapedUrl] = for {
    kw <- Gen.oneOf("data scientist", "data engineer", "analyst")
    job <- Gen.chooseNum(1, 12).map(i => s"J$i")
    lo <- Gen.oneOf(11000, 15000, 20000, 30000)
    hi <- Gen.oneOf(15000, 20000, 30000, 50000)
  } yield RawScrapedUrl(kw, job, Some(lo), Some(hi),
    Date.valueOf("2022-10-08"), s"/hk/en/job-$job")

  private val genBatch: Gen[List[RawScrapedUrl]] =
    Gen.nonEmptyListOf(genRow).map(_.take(40))

  test("property: ingest is idempotent (ingest(b ++ b) == ingest(b))") {
    import spark.implicits._
    forAll(genBatch) { rows =>
      val once = JobsPipeline.ingest(Seq(rows.toDF())).collect().toSet
      val twice = JobsPipeline.ingest(Seq(rows.toDF(), rows.toDF())).collect().toSet
      assert(twice == once)
    }
  }

  test("property: imputed interval = [min of bands seen, max of bands seen]") {
    import spark.implicits._
    forAll(genBatch) { rows =>
      val got = JobsPipeline.imputeSalaries(rows.toDF())
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
      val expected = rows.groupBy(_.job_id).map { case (j, rs) =>
        j -> (rs.flatMap(_.salary_min).min, rs.flatMap(_.salary_max).max)
      }
      assert(got == expected)
    }
  }

  test("property: dedup output <= input rows and covers every key exactly once") {
    import spark.implicits._
    forAll(genBatch) { rows =>
      val df = rows.toDF()
      val deduped = Dedupe.arbitraryRowPerKey(df, Seq("job_id")).collect()
      assert(deduped.length <= rows.length)
      assert(deduped.map(_.getString(1)).toSet == rows.map(_.job_id).toSet)
      assert(deduped.map(_.getString(1)).distinct.length == deduped.length)
    }
  }

  test("property: newRowsOnly(a, a) is empty; upsert never loses keys") {
    import spark.implicits._
    forAll(genBatch) { rows =>
      val df = rows.toDF()
      assert(Ledger.newRowsOnly(df, df, Seq("job_id")).isEmpty)
      val half = rows.take(rows.length / 2)
      val merged = Ledger.upsertPreferExisting(half.toDF(), df, Seq("job_id"))
      assert(merged.select("job_id").collect().map(_.getString(0)).toSet ==
        rows.map(_.job_id).toSet)
    }
  }

  test("property: merge-update only fills all-null rows; others byte-identical") {
    import spark.implicits._
    val genTarget = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(1, 20).map(i => s"J$i")
      lo <- Gen.option(Gen.chooseNum(1, 100))
      hi <- Gen.option(Gen.chooseNum(1, 100))
    } yield (id, lo, hi)).map(_.distinctBy(_._1).take(20))
    forAll(genTarget) { t =>
      val target = t.toDF("job_id", "min_salary", "max_salary")
      val updates = t.map { case (id, _, _) => (id, 777, 888) }
        .toDF("job_id", "min_salary", "max_salary")
      val out = Impute.mergeUpdateWhenAllNull(target, updates, "job_id",
        Seq("min_salary", "max_salary"))
        .collect().map(r => r.getString(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Int]),
           Option(r.get(2)).map(_.asInstanceOf[Int]))).toMap
      t.foreach { case (id, lo, hi) =>
        if (lo.isEmpty && hi.isEmpty) assert(out(id) == (Some(777), Some(888)))
        else assert(out(id) == (lo, hi))
      }
    }
  }
}
