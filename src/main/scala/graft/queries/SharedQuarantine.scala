package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Materialize

/** q178's quarantine-decode readout (the corrupt-PNG lake REALLY
  * decoded, per-doc `decode_ok` + image statistics), computed once per
  * (session, corpus) and shared with the release-card consumers — the
  * SharedAnn/SharedPairs/SharedPplx publish/serve billing discipline
  * applied to the media tier:
  *
  *  - q178 always REBUILDS and republishes ([[publish]]), so a
  *    min-of-N bench bills the encode→corrupt→decode pipeline to
  *    exactly one visible number;
  *  - the state-served release card (q206) READS the pinned memo
  *    ([[serve]] — building only if q178 has not run this session), so
  *    its media column prices a doc-count join, not a re-decoded lake.
  *
  * The pinned relation is the per-doc READOUT (one row per document,
  * seven integer columns) — doc-count-sized like the cluster-label and
  * perplexity memos, admissible under [[Materialize.pin]]'s small-only
  * contract. Keyed by sf dir so scales cannot mix. The in-query card
  * (q179) intentionally does NOT serve this memo: it is the tier whose
  * number prices the full composition.
  */
private[queries] object SharedQuarantine {

  private val memo = new ConcurrentHashMap[(SparkSession, String), DataFrame]

  private def build(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.tryDecodeImageStats(
        graft.multimodal.Multimodal.corruptedPngFromText(
          s, Tables.documents(s, d), "doc_id", "text"))
      .toDF()

  /** Always build, then publish (replacing and releasing any prior
    * generation) — q178's path.
    */
  def publish(s: SparkSession, d: String): DataFrame = {
    val fresh = Materialize.pin(Materialize(build(s, d)))
    val old = memo.put((s, d), fresh)
    if (old != null && (old ne fresh)) Materialize.unpinAndRelease(old)
    fresh
  }

  /** Read the published relation, building it only if this session has
    * not run q178 yet — the served card's path.
    */
  def serve(s: SparkSession, d: String): DataFrame =
    memo.computeIfAbsent((s, d),
      _ => Materialize.pin(Materialize(build(s, d))))
}
