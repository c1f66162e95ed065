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
  * map-side-combining min aggregate; [[Materialize]] cuts the growing
  * lineage so round N's plan doesn't replay rounds 1..N−1 — tier chosen
  * by `spark.graft.checkpointMode` (localCheckpoint for local runs,
  * persist/reliable for executor-loss-tolerant cluster runs). (At extreme
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
    // Symmetrize with ONE pass over `edges` (explode of the two oriented
    // copies) instead of a self-union: a union reads the edge relation
    // twice, and `edges` is typically an UNMATERIALIZED pair-generation
    // pipeline (q56's prefix-filter verify, q103's standing LSH pairs) —
    // the union shape re-executed that whole pipeline once per branch.
    val sym = Materialize(
      edges.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")))
    // The identity initialization is a trivial projection of `nodes` —
    // not worth a materialization job of its own (round-16 measurement:
    // the loop's per-round checkpoint jobs, not the joins, bounded CC
    // wall time at test scale). Round 1 references it twice, so callers
    // whose node relation is itself expensive to recompute materialize
    // it before calling (quotientFold does).
    var labels = nodes.select(col("id"), col("id").as("label"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy("src").agg(min("nl").as("nbr_min"))
      // the change flag is computed IN the label pass, so convergence
      // detection is a filter over the just-materialized generation —
      // no per-round join of consecutive generations (at corpus scale
      // that join is a full extra shuffle per round)
      val next = Materialize(labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label")).as("_changed")))
      converged = next.filter(col("_changed")).isEmpty
      // reclaim the superseded generation now: unpersist frees
      // persist-mode blocks immediately; local/reliable checkpoint blocks
      // ignore it and are reclaimed by the ContextCleaner once unreferenced
      val prev = labels
      labels = next.select("id", "label")
      prev.unpersist(blocking = false)
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the bound; raise maxIter")
    labels.withColumnRenamed("label", "component")
  }

  /** Diameter-robust variant: the ALTERNATING large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond" — public literature). Where min-label propagation needs
    * diameter rounds, alternating stars converge in O(log n): large-star
    * hangs every strictly-larger neighbor off the neighborhood minimum,
    * small-star re-parents each node's smaller neighbors onto its minimum,
    * and the fixpoint is a star per component centered at the component
    * minimum. Each phase is ONE shuffle (a grouped min + a join back) plus
    * a dedup — the same per-round plan shape as [[connectedComponents]],
    * just fewer rounds on path-like graphs.
    *
    * Fixpoint detection compares (count, xxhash64-XOR) of successive edge
    * sets — one scalar row per round (XOR: order-independent and
    * overflow-free under ANSI, exact on these duplicate-free sets); a
    * 64-bit checksum collision standing in for set equality is ~2⁻⁶⁴ per
    * round and only risks a WRONG-EARLY stop with that probability — and
    * both star operators are monotone toward the fixpoint, so a collision
    * would have to pair an intermediate state with an identical
    * count+checksum, never silently mislabel a converged star.
    */
  def connectedComponentsAlternating(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 35): DataFrame = {
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        bit_xor(xxhash64(col("src"), col("dst")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src")
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val directed = e
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val mins = directed.groupBy("src").agg(min(col("dst")).as("m"))
      directed.join(mins, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(mins.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    var e = Materialize(edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())
    var sig = checksum(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = Materialize(smallStar(largeStar(e)))
      val nextSig = checksum(next)
      converged = nextSig == sig
      val prev = e
      e = next
      sig = nextSig
      prev.unpersist(blocking = false)
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"alternating CC did not converge in $maxIter rounds")
    // fixpoint edges are (node → component-min) stars; singletons label
    // themselves, and centers appear only on the dst side
    nodes.select(col("id"))
      .join(e.select(col("src").as("id"), col("dst").as("c")), Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("component"))
  }

  /** INCREMENTAL merge: fold a new batch's edges into a STANDING
    * component labeling without re-running CC over the corpus — the
    * daily-ingest shape at 100 TB, where the standing labels are a stored
    * table and only the day's quotient graph iterates.
    *
    * Standing endpoints collapse to their component ids, so the CC runs
    * on the QUOTIENT graph of (new nodes + touched components) — sized by
    * the day's edges, never the corpus. Because a component's id IS its
    * minimum member id, minima compose: the quotient fixpoint's labels
    * equal the full recompute's labels exactly (q103 oracle-checks this
    * equivalence end-to-end; IncrementalCCSpec pins it on random graphs).
    *
    * @param standing ("id", "component") fixpoint labels of the standing
    *                 corpus (component = min member id, the invariant
    *                 [[connectedComponents]] guarantees)
    * @param newNodes ("id") the new batch (disjoint from standing ids)
    * @param edges    ("id_a", "id_b") pairs touching the new batch
    *                 (new×new or new×standing; standing×standing edges
    *                 are legal and merge standing components)
    * @return ("id", "component") for standing ∪ new
    */
  def mergeIncremental(standing: DataFrame, newNodes: DataFrame,
      edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val (quotient, relabels) = quotientFold(standing, newNodes, edges, maxIter)
    val standingOut = standing.join(relabels, Seq("component"), "left")
      .select(col("id"), coalesce(col("relabel"), col("component")).as("component"))
    standingOut.unionByName(newLabels(newNodes, quotient))
  }

  /** DELTA form of [[mergeIncremental]]: only the label rows that CHANGE —
    * every new node's label plus the standing rows whose component was
    * merged into a smaller one. This is the generation a stored-state
    * ingest should WRITE: sized by the batch + touched components, never
    * the corpus. Because a component's label is its minimum member id,
    * labels only ever DECREASE, so the standing state folds with the
    * deltas by `min(component)` per id — no ordering metadata needed
    * (CorpusBuild.readState relies on exactly this).
    *
    * `mergeIncremental(s, n, e)` ≡ untouched rows of `s` ∪ this delta
    * (IncrementalCCSpec pins the equivalence on random graphs).
    */
  def mergeIncrementalDelta(standing: DataFrame, newNodes: DataFrame,
      edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val (quotient, relabels) = quotientFold(standing, newNodes, edges, maxIter)
    // relabels is small (touched components only) — the join back to the
    // standing labels is a broadcast-shaped scan, and only matching rows
    // (members of merged components) survive into the delta
    val standingChanged = standing.join(relabels, Seq("component"))
      .select(col("id"), col("relabel").as("component"))
    standingChanged.unionByName(newLabels(newNodes, quotient))
  }

  /** Shared quotient-CC core: collapse standing endpoints to component
    * ids, run CC on the quotient graph of new nodes + touched components,
    * return (quotient labels, the CHANGED component→relabel rows).
    */
  private def quotientFold(standing: DataFrame, newNodes: DataFrame,
      edges: DataFrame, maxIter: Int): (DataFrame, DataFrame) = {
    val sLab = standing.select(col("id").as("sid"), col("component").as("scomp"))
    // materialized: the quotient edges feed BOTH the node derivation
    // below and CC's symmetrized edge relation, and `edges` is typically
    // the whole incremental pair-generation pipeline (LSH bands + exact
    // verify) — without this it re-executes once per consumer. The
    // relation is pair-count-sized. `maybe`, so plan-only inspection
    // (eagerMaterialize=false) skips the checkpoint job — the CC loop
    // below still executes its own actions, so plan-only output is
    // best-effort for incremental-CC queries either way.
    val mapped = Materialize.maybe(edges
      .join(sLab.select(col("sid").as("id_a"), col("scomp").as("ca")),
        Seq("id_a"), "left")
      .join(sLab.select(col("sid").as("id_b"), col("scomp").as("cb")),
        Seq("id_b"), "left")
      .select(coalesce(col("ca"), col("id_a")).as("id_a"),
        coalesce(col("cb"), col("id_b")).as("id_b")))
    // materialized: CC's identity initialization is no longer its own
    // checkpoint, so round 1 reads the node relation twice — for this
    // distinct-union that would be two shuffles
    val qNodes = Materialize.maybe(newNodes.select(col("id"))
      .unionByName(mapped.select(col("id_a").as("id")))
      .unionByName(mapped.select(col("id_b").as("id")))
      .distinct())
    val quotient = connectedComponents(qNodes, mapped, maxIter)
    val relabels = quotient.select(col("id").as("component"),
        col("component").as("relabel"))
      .filter(col("relabel") =!= col("component"))
    (quotient, relabels)
  }

  private def newLabels(newNodes: DataFrame, quotient: DataFrame): DataFrame =
    newNodes.select(col("id"))
      .join(quotient.withColumnRenamed("component", "relabel"), Seq("id"), "left")
      .select(col("id"), coalesce(col("relabel"), col("id")).as("component"))
}
