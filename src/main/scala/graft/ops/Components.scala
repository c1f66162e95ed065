package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * pairwise near-duplicate matches into DEDUP GROUPS (keep one doc per
  * component). Spark has no recursive CTE; the iteration lives in the
  * driver loop while every step stays a declarative shuffle-join + partial
  * aggregate, hash-partitioned by node id.
  *
  * Algorithm: deterministic min-label propagation. Every node starts
  * labeled with itself; each round takes the min of its own label and its
  * neighbors' labels; a fixpoint is a labeling constant on components, and
  * the minimum node id wins — so output is unique regardless of
  * partitioning or join order. Rounds needed = component diameter: tiny
  * for dedup clusters (near-cliques). Each round is ONE shuffle join +
  * map-side-combining min aggregate; `localCheckpoint` cuts the growing
  * lineage so round N's plan doesn't replay rounds 1..N−1. (At extreme
  * diameters the classic large-star/small-star variant drops rounds to
  * O(log n); the per-round plan shape below is the same one it needs.)
  */
object Components {

  /** Label every node with the smallest node id reachable from it.
    *
    * @param nodes single-column ("id") node set (singletons included)
    * @param edges ("id_a", "id_b") undirected edges
    * @return ("id", "component") — component = min id of the node's
    *         component; throws if not converged within maxIter (a wrong
    *         labeling must never pass silently)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy("src").agg(min("nl").as("nbr_min"))
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev"))
        .isEmpty
      // superseded generations' checkpoint blocks are reclaimed by the
      // ContextCleaner once unreferenced (Dataset.unpersist doesn't touch
      // localCheckpoint blocks); only the live generation is re-read
      labels = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the bound; raise maxIter")
    labels.withColumnRenamed("label", "component")
  }
}
