package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Materialize, Similarity}

/** The four approximate-similarity tier readouts, computed once per
  * (session, corpus) and shared between each tier's own query (q26 LSH
  * top-1, q32 IVF top-1, q109 IVF-PQ top-1, q53 embedding near-dup
  * pairs) and the q88 rescoring gate — the q56/q74/q97 train-once/
  * serve-many billing discipline applied to the ANN stack:
  *
  *  - each tier query always REBUILDS and republishes ([[publish]]), so
  *    a min-of-N bench bills that tier's full pipeline to exactly one
  *    visible number every attempt;
  *  - the gate READS the pinned memo ([[serve]] — building only if the
  *    tier has not run in this session), so q88's number prices the
  *    rescoring join it exists to perform, not four re-trained ANN
  *    pipelines it does not.
  *
  * The pinned relations are top-1/pair READOUTS — query-count-sized
  * (one row per query vector, or the thresholded pair set), never the
  * candidate-scale intermediates — which is what makes holding them for
  * the session admissible under [[Materialize.pin]]'s small-only
  * contract. Keyed by sf dir so different scales in one process cannot
  * mix tiers.
  */
private[graft] object SharedAnn {

  private val memo = new ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]

  private def build(s: SparkSession, d: String, tier: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    tier match {
      case "lsh" =>
        // dataPlanes: corpus-derived hyperplanes so the DuckDB oracle can
        // rederive the buckets and hash-check the tier (q26, r16)
        Similarity.lshCosineTopK(emb, "vec_id", "embedding", k = 1, dim = 64,
          dataPlanes = true)
      case "ivf" =>
        Similarity.ivfTopK(emb, "vec_id", "embedding", k = 1, dim = 64)
      case "ivfpq" =>
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 1, dim = 64)
      case "neardup" =>
        Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.3, dim = 64, dataPlanes = true)
      case "state_ivf" =>
        // the state-served tier (q155): search from the stored centroid
        // model — the memo holds only the top-1 readout, as above
        graft.pipeline.CorpusBuild.stateIvfTopK(s,
          TokenizerQueries.ensurePostingState(s, d), k = 1, nProbe = 2)
      case "state_ivf_curve" =>
        // the q167 recall-curve relation: all probe widths' top-1s from
        // ONE candidate-generation pass over the stored model; row count
        // ≤ widths × queries — memo-sized
        graft.pipeline.CorpusBuild.stateIvfCurve(s,
          TokenizerQueries.ensurePostingState(s, d))
      case other => throw new IllegalArgumentException(s"unknown tier $other")
    }
  }

  /** Always build, then publish (replacing and releasing any prior
    * generation) — the tier's own query takes this path.
    */
  def publish(s: SparkSession, d: String, tier: String): DataFrame = {
    val fresh = Materialize.pin(Materialize(build(s, d, tier)))
    val old = memo.put((s, d, tier), fresh)
    if (old != null && (old ne fresh)) Materialize.unpinAndRelease(old)
    fresh
  }

  /** Read the published relation, building it only if this session has
    * not run the tier yet — the gate's path.
    */
  def serve(s: SparkSession, d: String, tier: String): DataFrame =
    memo.computeIfAbsent((s, d, tier),
      _ => Materialize.pin(Materialize(build(s, d, tier))))
}
