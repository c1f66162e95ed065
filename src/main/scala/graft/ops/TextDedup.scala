package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deduplication operators for document corpora, exact → near-dup.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is a hash group-by — one shuffle on a 128-bit digest, with
  *    map-side partial aggregation;
  *  - MinHash+LSH avoids the O(n²) pair space entirely: signatures are
  *    computed per row (narrow), banded keys are exploded (×bands), and the
  *    only shuffle is a self-join on (band, band-hash) buckets whose
  *    candidate set is linear in the number of true near-dups;
  *  - SimHash gives a 64-bit sketch joined on 16-bit bands (Hamming ≤ k by
  *    pigeonhole: any pair within distance k collides on ≥1 of k+1 bands);
  *  - exact n-gram Jaccard is kept for block-scoped verification (and as
  *    the oracle-checkable reference implementation).
  *
  * All candidate generation uses codegen'd built-ins (xxhash64, transform,
  * explode) — no UDF in the hot path.
  */
object TextDedup {

  /** Exact duplicate groups by content digest: survivor = min id per digest.
    * (Digest-collision risk at 100 TB: md5 over normalized text; swap for
    * sha2-256 via `hashCol` if paranoia demands.)
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String,
      hashCol: Column => Column = md5): DataFrame =
    df.groupBy(hashCol(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact pairwise n-gram Jaccard within a blocking column (e.g. language):
    * the reference implementation for near-dup detection. O(block²) — use
    * only as verifier or on bounded blocks; LSH below is the scale path.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int, threshold: Double): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"), col(blockCol).as("block"),
      TextAnalysis.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.as("a")
    val b = sh.as("b")
    val jac = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
      size(array_union(col("a.sh"), col("b.sh"))).cast("double")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature: H independent permutations approximated by seeded
    * xxhash64 over each shingle; signature element i = min hash under seed i.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleCol, s => xxhash64(s, seed))))

  /** LSH banding: split the signature into `bands` groups and hash each
    * group; two docs sharing any banded hash become candidates.
    */
  def lshBandKeys(sigCol: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws("_", slice(sigCol, b * rows + 1, rows))).as("bucket"))
    }: _*)
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → bucket
    * self-join → exact-Jaccard verify ≥ threshold. Returns (id_a, id_b,
    * jaccard) candidate-verified pairs.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        TextAnalysis.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"), col("sh"),
        explode(lshBandKeys(col("sig"), numHashes, bands)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates.select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from token hashes, expressed with built-ins only:
    * bit i of the sketch is set when more than half the token hashes have
    * bit i set. The 64 bit-majorities are unrolled statically (shift amounts
    * must be literals) and OR-folded into one long.
    */
  def simhash64(textCol: Column): Column = {
    val hs = transform(TextAnalysis.tokens(textCol), t => xxhash64(t))
    val total = size(hs)
    (0 until 64).map { i =>
      val ones = size(filter(hs, h => shiftright(h, i).bitwiseAND(1L) === 1L))
      when(ones * 2 > total, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs within Hamming distance ≤ maxDist, using band
    * blocking (bands of 64/bands bits; by pigeonhole any pair within
    * distance bands-1 collides on ≥1 band) and bit_count(xor) verification.
    * Band width trades candidate volume for guaranteed distance: 8×8-bit
    * bands (default) guarantee ≤7; huge corpora should widen bands (4×16)
    * and accept ≤3, or add a second LSH round.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxDist <= bands - 1,
      s"$bands bands guarantee recall only for distance <= ${bands - 1}")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val sketched = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sk"))
    val bandStructs = array((0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        shiftright(col("sk"), bi * width).bitwiseAND(mask).as("bucket"))
    }: _*)
    val banded = sketched.select(col("id"), col("sk"), explode(bandStructs).as("bk"))
      .select(col("id"), col("sk"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }
}
