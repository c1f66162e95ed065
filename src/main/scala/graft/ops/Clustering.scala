package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * tier a curation pipeline uses for cluster-balanced sampling and data
  * mixing (group a corpus by semantic neighborhood, then sample/weight
  * per cluster instead of per source).
  *
  * Execution shape (the 100 TB contract):
  *  - centroids are DRIVER state (k·dim doubles — bounded like the BPE
  *    merge table and the CC fixpoint's round counter), never a joined
  *    relation: assignment rides as ONE fused native expression
  *    ([[VectorExpressions.ArgMaxAffineDots]] — argmin ‖v−c‖² ⇔ argmax
  *    dot(v,c) − ‖c‖²/2 with the centroid dots folded into plan-time
  *    constants), so per-row work is one tight k×dim loop inside
  *    whole-stage codegen, no shuffle;
  *  - each iteration is one corpus scan + a (cluster, pos)-keyed partial
  *    aggregate — k·dim groups, map-side combined, so the exchange
  *    carries k·dim rows regardless of corpus size — + one bounded
  *    k·dim driver collect (the adjudicated driver-paced-fixpoint
  *    pattern: CC rounds, BPE merge rounds);
  *  - iterations are a fixed budget: total cost = iters scans.
  *
  * Determinism: init is the first k vectors in id order (no RNG); ties
  * in the argmin resolve to the largest index (ArgMaxAffineDots'
  * contract). Cross-partition mean sums are float-order-dependent, so
  * assignments are deterministic per plan but not oracle-exact across
  * engines — the queries over this operator are rows-only under an
  * assignment-consistency gate (q124), the q88/q115 pattern.
  */
object Clustering {

  /** Cluster assignment column for fixed centroids: argmin_j ‖v−c_j‖²
    * over `vecCol` (cast to array<double>), as the fused expression.
    */
  def assignTo(vecCol: Column, cents: Seq[Array[Double]]): Column =
    VectorExpressions.argMaxAffineDots(
      vecCol.cast("array<double>"), lit(0.0), lit(0),
      cents.toArray,
      Array.fill(cents.length)(Array(0.0)),
      cents.map(c => c.map(x => x * x).sum / 2).toArray)

  /** Lloyd's for `iters` rounds from the deterministic first-k-by-id
    * init. Returns (assignments (id, cluster), final centroids). Empty
    * clusters keep their previous centroid (mirrors the PQ codebook
    * trainer). `corpus` is scanned `iters + 2` times (init probe, iters
    * updates, final assignment) — callers at scale pass a cached or
    * materialized relation.
    */
  def kMeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5): (DataFrame, Seq[Array[Double]]) = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val vecs = corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0)
    val init: Seq[Array[Double]] = vecs.orderBy("id").limit(k)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray).toSeq
    if (init.isEmpty)
      return (vecs.select(col("id"), lit(0).as("cluster")).limit(0), Nil)

    var cents = init
    var round = 0
    while (round < iters) {
      // component-wise means per cluster: the exchange carries k·dim
      // partial rows, never corpus rows
      val means = vecs.select(assignTo(col("v"), cents).as("cluster"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg(col("x")).as("m"))
        .collect()
      val next = cents.map(_.clone()).toArray
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next.toIndexedSeq
      round += 1
    }
    (vecs.select(col("id"), assignTo(col("v"), cents).as("cluster")), cents)
  }

  /** The assignment-consistency violation relation (the q124 gate):
    * every emitted (id, cluster) must satisfy ‖v−c_cluster‖² ≤
    * min_j ‖v−c_j‖² + `eps`, with the distances recomputed through the
    * INDEPENDENT higher-order-function fold (different arithmetic path
    * than the fused encode — the q88 rescoring discipline). Empty ⇔ the
    * fused assignment really is the argmin.
    */
  def assignmentGate(assigned: DataFrame, vecs: DataFrame, idCol: String,
      vecCol: String, cents: Seq[Array[Double]],
      eps: Double = 1e-9): DataFrame = {
    def hofDist(c: Array[Double]): Column =
      aggregate(
        zip_with(col("v"), typedlit(c.toSeq),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
    val dists = array(cents.map(hofDist): _*)
    vecs.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0)
      .join(assigned, "id")
      .select(col("id"), col("cluster"),
        element_at(dists, col("cluster") + 1).as("d_assigned"),
        array_min(dists).as("d_min"))
      .filter(col("d_assigned") > col("d_min") + eps)
  }
}
