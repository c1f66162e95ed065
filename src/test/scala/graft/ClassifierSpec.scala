package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NaiveBayes

/** The NB classifier beyond its DuckDB oracle: hand-computed smoothed
  * model values on a toy corpus (the oracle proves engine equivalence;
  * this proves the MATH — Laplace smoothing, unseen-token default,
  * prior — against numbers derived on paper), plus planted-signal
  * recovery on the real corpus.
  */
class ClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ClassifierSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed model: Laplace ratios, unseen-token default, and " +
      "prior fold to the exact paper values") {
    import spark.implicits._
    val train = Seq(("cat cat", 0L), ("dog", 1L)).toDF("t", "y")
    val (model, scal) = NaiveBayes.train(train, "t", "y")
    val m = model.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // counts: c0(cat)=2, c1(dog)=1; tot0=2, tot1=1, V=2
    // ratio(cat) = ln(1/3) - ln(3/4) = ln(4/9)
    // ratio(dog) = ln(2/3) - ln(1/4) = ln(8/3)
    assert(math.abs(m("cat") - math.log(4.0 / 9)) < 1e-12)
    assert(math.abs(m("dog") - math.log(8.0 / 3)) < 1e-12)
    val s = scal.collect()(0)
    // default = ln(1/3) - ln(1/4) = ln(4/3); prior = ln(1/1) = 0
    assert(math.abs(s.getDouble(0) - math.log(4.0 / 3)) < 1e-12)
    assert(s.getDouble(1) === 0.0)
    val test = Seq((1L, "cat dog bird"), (2L, "cat cat")).toDF("id", "t")
    val p = NaiveBayes.predict(test, "t", "id", model, scal)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: ln(4/9 * 8/3 * 4/3) = ln(128/81) > 0 -> class 1
    // doc 2: 2 ln(4/9) < 0 -> class 0
    assert(p(1L) === 1L && p(2L) === 0L)
  }

  test("planted signal on the real corpus: held-out accuracy is " +
      "perfect and both classes appear in the predictions") {
    val out = graft.queries.ClassifierQueries
      .q174_nb_classifier(spark, "/root/testdata/sf0.001").cache()
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("correct") === 0).count() === 0L,
      "marker margins are O(1) log-units; every held-out doc must score " +
        "on the planted side")
    assert(out.select("predicted").distinct().count() === 2L)
    out.unpersist()
  }

  test("state tier: count deltas fold additively into exactly train()'s " +
      "model — hand scalar values, unseen-token default routing, and a " +
      "two-batch fold equal to the one-shot train") {
    import spark.implicits._
    val b1 = Seq(("cat cat", 0L)).toDF("t", "y")
    val b2 = Seq(("dog", 1L)).toDF("t", "y")
    // the stored-state shape: per-batch deltas, folded by sum
    val folded = NaiveBayes.countDelta(b1, "t", "y")
      .unionByName(NaiveBayes.countDelta(b2, "t", "y"))
      .groupBy("tk").agg(sum("c0").as("c0"), sum("c1").as("c1"))
    val priors = NaiveBayes.priorDelta(b1, "y")
      .unionByName(NaiveBayes.priorDelta(b2, "y"))
      .agg(sum("n0").as("n0"), sum("n1").as("n1"))
    val (model, scal) = NaiveBayes.modelFromCounts(folded, priors)
    val s = scal.collect()(0)
    // same paper values as the train() test: default = ln(4/3), prior 0
    assert(math.abs(s.getDouble(0) - math.log(4.0 / 3)) < 1e-12)
    assert(s.getDouble(1) === 0.0)
    val test = Seq((1L, "cat dog bird"), (2L, "cat cat")).toDF("id", "t")
    val p = NaiveBayes.predictByKey(test, "t", "id", model, scal)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: UNSEEN 'bird' must route to the default ratio ln(4/3):
    //   ln(4/9 * 8/3 * 4/3) = ln(128/81) > 0 -> class 1; a model that
    //   dropped unseen tokens instead would still say 1 here, so doc 2
    //   pins the other side: 2 ln(4/9) < 0 -> class 0
    assert(p(1L) === 1L && p(2L) === 0L)
    // and the tk-keyed path agrees with train() doc-for-doc
    val (tm, ts) = NaiveBayes.train(b1.unionByName(b2), "t", "y")
    val viaTrain = NaiveBayes.predict(test, "t", "id", tm, ts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTrain === p)
  }

  test("state tier single-class guard: a fold holding only one class " +
      "fails loudly from modelFromCounts, same contract as train()") {
    import spark.implicits._
    val only1 = Seq(("dog barks", 1L)).toDF("t", "y")
    val (_, scal) = NaiveBayes.modelFromCounts(
      NaiveBayes.countDelta(only1, "t", "y")
        .groupBy("tk").agg(sum("c0").as("c0"), sum("c1").as("c1")),
      NaiveBayes.priorDelta(only1, "y"))
    val e = intercept[Throwable](scal.collect())
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("both classes"))))
  }

  test("REGRESSION (r11 single-class guard): training on a corpus with " +
      "only one class fails LOUDLY at first action instead of returning " +
      "an Infinity prior that silently degenerates every prediction") {
    import spark.implicits._
    val only1 = Seq(("dog barks", 1L), ("dog runs", 1L)).toDF("t", "y")
    val (_, scal) = NaiveBayes.train(only1, "t", "y")
    val e = intercept[Throwable](scal.collect())
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("both classes"),
      s"expected the assert_true message in the failure chain, got: $chain")
    val only0 = Seq(("cat", 0L)).toDF("t", "y")
    val e0 = intercept[Throwable](NaiveBayes.train(only0, "t", "y")._2.collect())
    assert(Iterator.iterate(e0)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("both classes"))))
  }
}
