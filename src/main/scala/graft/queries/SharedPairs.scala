package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** The modality-tagged near-duplicate PAIR relation shared between the
  * q165 cross-modal cluster builder and the q163 dataset card's
  * per-modality dup rollup — the q56/q74/q97 (and SharedAnn) publish/
  * serve billing discipline applied to the multimodal dedup stack:
  *
  *  - q165 always REBUILDS and republishes ([[publish]]) — a min-of-N
  *    bench bills the three decode→fingerprint→pair pipelines to
  *    exactly one visible number;
  *  - the card READS the pinned memo ([[serve]], building only if q165
  *    has not run this session), so q163's number prices its own
  *    |pairs|-sized rollup join, not three re-decoded media corpora.
  *
  * The pinned relation is the THRESHOLDED pair set (near-dup pairs
  * tagged text/image/audio) — far below corpus scale by construction,
  * which is what makes holding it for the session admissible under
  * [[Materialize.pin]]'s small-only contract.
  *
  * All three modalities key pairs by the shared document id (the media
  * harnesses synthesize image/audio payloads per document), so the
  * union is a single-id-space edge list ready for connected components.
  */
private[queries] object SharedPairs {

  private val memo = new ConcurrentHashMap[(SparkSession, String), DataFrame]

  private def build(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    val docs = Tables.documents(s, d)
    val text = graft.ops.TextDedup.minhashLshPairs(docs,
        "doc_id", "text", n = 3, numHashes = 48, bands = 8, threshold = 0.5)
      .select(col("id_a"), col("id_b"), lit("text").as("modality"))
    val image = Multimodal.dhashNearDupPairs(
        Multimodal.decodeImageDHash(
          Multimodal.imagesFromText(s, docs, "doc_id", "text")),
        maxDist = 3)
      .select(col("id_a"), col("id_b"), lit("image").as("modality"))
    val audio = Multimodal.bandedHammingPairs(
        Multimodal.decodeAudioFingerprint(
          Multimodal.wavFromText(s, docs, "doc_id", "text")).toDF(),
        "media_id", maxDist = 3)
      .select(col("id_a"), col("id_b"), lit("audio").as("modality"))
    text.unionByName(image).unionByName(audio)
  }

  /** Always build, then publish (replacing and releasing any prior
    * generation) — q165's path.
    */
  def publish(s: SparkSession, d: String): DataFrame = {
    val fresh = Materialize.pin(Materialize(build(s, d)))
    val old = memo.put((s, d), fresh)
    if (old != null && (old ne fresh)) Materialize.unpinAndRelease(old)
    fresh
  }

  /** Read the published relation, building it only if this session has
    * not run q165 yet — the card's path.
    */
  def serve(s: SparkSession, d: String): DataFrame =
    memo.computeIfAbsent((s, d),
      _ => Materialize.pin(Materialize(build(s, d))))
}
