package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Materialize

/** q187's per-document perplexity readout, computed once per (session,
  * corpus) and shared with its downstream consumers — the SharedAnn/
  * SharedPairs publish/serve billing discipline applied to the
  * bigram-LM tier:
  *
  *  - q187 always REBUILDS and republishes ([[publish]]), so a
  *    min-of-N bench bills the model build + scoring join to exactly
  *    one visible number;
  *  - the q201 source-reweighting rollup and the q190 curation
  *    matrix's perplexity column READ the pinned memo ([[serve]] —
  *    building only if q187 has not run this session), so their
  *    numbers price the |sources|-bounded rollup / the matrix join
  *    they exist to perform, not a second full model build over the
  *    corpus q187 just scored.
  *
  * The pinned relation is the per-doc READOUT (doc_id, n_pairs,
  * pplx_sum, avg_q6) — doc-count-sized, like the dedup cluster label
  * memo — which is what makes holding it for the session admissible
  * under [[Materialize.pin]]'s small-only contract. Keyed by sf dir so
  * different scales in one process cannot mix models. The stored-state
  * tiers (q196/q203) intentionally do NOT touch this memo: their whole
  * point is pricing the fold-serve path.
  */
private[queries] object SharedPplx {

  private val memo = new ConcurrentHashMap[(SparkSession, String), DataFrame]

  private def build(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.ops.BigramLm.scores(graft.ops.BigramLm.pairs(docs),
      graft.ops.BigramLm.bigramDelta(docs),
      graft.ops.BigramLm.unigramDelta(docs))
  }

  /** Always build, then publish (replacing and releasing any prior
    * generation) — q187's path.
    */
  def publish(s: SparkSession, d: String): DataFrame = {
    val fresh = Materialize.pin(Materialize(build(s, d)))
    val old = memo.put((s, d), fresh)
    if (old != null && (old ne fresh)) Materialize.unpinAndRelease(old)
    fresh
  }

  /** Read the published relation, building it only if this session has
    * not run q187 yet — the consumers' path.
    */
  def serve(s: SparkSession, d: String): DataFrame =
    memo.computeIfAbsent((s, d),
      _ => Materialize.pin(Materialize(build(s, d))))
}
