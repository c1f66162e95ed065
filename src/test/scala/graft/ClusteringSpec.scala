package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Clustering

/** Lloyd's over DataFrames: planted well-separated clusters must be
  * recovered exactly, the fused-assignment gate must hold on consistent
  * output and fire on a poisoned centroid set, and empty clusters must
  * survive a round (keep their previous centroid, not NaN out).
  */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ClusteringSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 3 planted centers in R^8, 40 points each, noise far below the
    * center separation — a clustering that misses these is wrong, not
    * unlucky. All arithmetic is id-derived (no RNG).
    */
  private def planted() = {
    import spark.implicits._
    val centers = Seq(
      Array(10.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 10, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 10, 0, 0, 0, 0, 0))
    (0L until 120L).map { id =>
      val c = centers((id % 3).toInt)
      val noise = 0.01 * ((id % 7).toDouble / 7.0)
      (id, c.map(_ + noise).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("planted well-separated clusters are recovered exactly") {
    val (assigned, cents) = Clustering.kMeans(
      planted(), "vec_id", "embedding", k = 3, iters = 5)
    assert(cents.length == 3)
    val byPlant = assigned.collect()
      .map(r => (r.getLong(0) % 3, r.getInt(1)))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    // each planted group lands in exactly one cluster…
    byPlant.foreach { case (p, cs) =>
      assert(cs.size == 1, s"planted group $p split across clusters $cs")
    }
    // …and the three groups land in three DISTINCT clusters
    assert(byPlant.values.flatten.toSet.size == 3,
      s"planted groups merged: $byPlant")
  }

  test("assignment gate: empty on consistent output, fires on a " +
      "poisoned centroid set") {
    val vecs = planted()
    val (assigned, cents) = Clustering.kMeans(
      vecs, "vec_id", "embedding", k = 3, iters = 5)
    assert(Clustering.assignmentGate(assigned, vecs, "vec_id",
      "embedding", cents).isEmpty, "gate fired on consistent assignments")
    // swap two centroids WITHOUT re-assigning: every affected vector's
    // emitted cluster now points at the wrong centroid
    val poisoned = Seq(cents(1), cents(0), cents(2))
    assert(!Clustering.assignmentGate(assigned, vecs, "vec_id",
      "embedding", poisoned).isEmpty,
      "gate must fire when assignments no longer minimize distance")
  }

  test("k exceeding distinct points: empty clusters keep their previous " +
      "centroid and every point still assigns") {
    import spark.implicits._
    val two = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val (assigned, cents) = Clustering.kMeans(
      two, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.length == 3)
    assert(cents.forall(_.forall(x => !x.isNaN)), "NaN centroid leaked")
    assert(assigned.count() == 4)
    assert(Clustering.assignmentGate(assigned, two, "vec_id",
      "embedding", cents).isEmpty)
  }
}
