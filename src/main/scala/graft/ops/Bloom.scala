package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom-filter semi-join pruning.
  *
  * The classic distributed-join optimization: when a huge fact table is
  * semi-joined to a selective dimension subset, build a bloom filter over
  * the small side's keys, ship its bits to every fact-scan task, and drop
  * non-matching rows BEFORE they reach the shuffle (or even the join at
  * all). Spark's optimizer injects this itself in some shapes
  * (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator makes
  * the plan explicit and composable for the shapes the optimizer doesn't
  * catch — e.g. a reusable pre-computed filter applied across several
  * queries, or pruning before an expensive per-row transform rather than a
  * join.
  *
  * Correctness is exact: blooms have false positives but NO false
  * negatives, so `semiJoin` re-verifies the survivors with a real semi-join
  * — the bloom only cuts the volume entering it. At 1% fpp the shuffle
  * reads ~selectivity + 1% of the fact table instead of all of it.
  */
object Bloom {

  /** Bits per inserted key for ~1% false-positive probability with the
    * optimal hash count (m/n = 9.6, h = 7).
    */
  private val BitsPerKey = 10
  private val NumHashes = 7

  /** 64-bit finalizer (splitmix64) — decorrelates the two base hashes
    * derived from one xxhash64 key under double hashing.
    */
  private[ops] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[ops] def setBit(bits: Array[Long], idx: Int): Unit =
    bits(idx >>> 6) |= 1L << (idx & 63)

  private[ops] def getBit(bits: Array[Long], idx: Int): Boolean =
    (bits(idx >>> 6) & (1L << (idx & 63))) != 0L

  private[ops] def insert(bits: Array[Long], numBits: Int, key: Long): Unit = {
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    var h = h1
    while (i < NumHashes) {
      setBit(bits, java.lang.Long.remainderUnsigned(h, numBits).toInt)
      h += h2
      i += 1
    }
  }

  /** Static membership kernel, referenced from both interpreted eval and
    * generated code. bits are the little-endian longs of the filter bytes.
    * Malformed payloads (anything not produced by BloomBuild — reachable
    * through the public graft_bloom_contains SQL function) fail with a
    * clear message instead of a low-level arithmetic/index error.
    */
  def mightContain(bytes: Array[Byte], key: Long): Boolean = {
    require(bytes.length > 4 && (bytes.length - 4) % 8 == 0 &&
        ((bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8) | ((bytes(2) & 0xff) << 16) |
          ((bytes(3) & 0xff) << 24)) == (bytes.length - 4) * 8,
      s"not a graft bloom filter (${bytes.length} bytes; header/length mismatch)")
    val numBits = (bytes.length - 4) * 8
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    var h = h1
    while (i < NumHashes) {
      val idx = java.lang.Long.remainderUnsigned(h, numBits).toInt
      // byte layout: 4-byte header then bit idx at byte (idx>>>3)
      if ((bytes(4 + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  /** Bloom build over a LongType key column (hash arbitrary keys to long
    * with xxhash64 first). Partials are fixed-size bit arrays; merge is a
    * bitwise OR — the cheapest possible mergeable summary.
    */
  case class BloomBuild(
      child: Expression,
      numBits: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) insert(buf, numBits, v.asInstanceOf[Long])
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    /** Bytes: 4-byte little-endian bit count header, then the bit array in
      * byte order compatible with `mightContain`'s byte addressing.
      */
    override def eval(buf: Array[Long]): Any = toBytes(buf, numBits)

    override def serialize(buf: Array[Long]): Array[Byte] = toBytes(buf, numBits)

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = bb.getInt
      val out = new Array[Long](n / 64)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong; i += 1 }
      out
    }

    private def toBytes(buf: Array[Long], n: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(n)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
  }

  /** Codegen'd membership probe: stays inside WholeStageCodegen (the whole
    * point — this runs once per fact row). The filter bytes are typically a
    * foldable literal, evaluated once per task.
    */
  case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

    override def dataType: DataType = BooleanType

    override protected def nullSafeEval(bloom: Any, key: Any): Any =
      mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bloom, key) =>
        s"${ev.value} = graft.ops.Bloom.mightContain($bloom, $key);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def mightContainCol(bloomBytes: Array[Byte], key: Column): Column =
    ColumnShim.column(BloomMightContain(
      ColumnShim.expression(lit(bloomBytes)),
      ColumnShim.expression(xxhash64(key))))

  /** Build the filter over `small`'s key column. One aggregate job; the
    * result is a single bounded byte array (BitsPerKey bits per expected
    * key), safe to hold on the driver and embed as a literal — the same
    * bounded-summary-to-driver pattern as IVF centroid training.
    */
  def build(small: DataFrame, key: String, expectedKeys: Long): Array[Byte] = {
    val bits = math.max(64L, expectedKeys * BitsPerKey.toLong)
    // a single bit array tops out at ~2^31 bits (~214M keys at 10 bits/key,
    // a ~256 MB filter). Beyond that a flat bloom is the wrong tool — shard
    // by key range and probe the matching shard. Fail loudly rather than
    // silently wrapping to a tiny (fpp ≈ 1) filter.
    require(bits <= Int.MaxValue - 63,
      s"bloom for $expectedKeys keys needs $bits bits — exceeds a single " +
        "filter; shard the key space (or pre-partition) instead")
    val numBits = ((bits + 63) / 64 * 64).toInt
    val agg = ColumnShim.column(
      BloomBuild(ColumnShim.expression(xxhash64(col(key))), numBits)
        .toAggregateExpression())
    small.agg(agg.as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Exact semi-join of `big` on `bigKey` against `small`'s `smallKey`,
    * bloom-pruned: fact rows failing the membership probe never reach the
    * join. The closing semi-join removes the ~1% false positives, so the
    * result is exactly `big SEMI JOIN small`.
    */
  def semiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String): DataFrame = {
    // xxhash64 hashes IntegerType and LongType values DIFFERENTLY — the
    // build and probe sides must hash the same type or every true match
    // fails the probe. Widen integrals to long on both sides; anything
    // else must already match exactly.
    val bt = big.schema(bigKey).dataType
    val st = small.schema(smallKey).dataType
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    val (bigKeyCol, smallKeyCol) =
      if (integral.contains(bt) && integral.contains(st))
        (col(bigKey).cast("long"), col(smallKey).cast("long"))
      else if (bt == st) (col(bigKey), col(smallKey))
      else throw new IllegalArgumentException(
        s"bloom semiJoin key types must match: $bigKey is " +
          s"${bt.catalogString}, $smallKey is ${st.catalogString}")
    // no distinct() anywhere: bloom insertion and left_semi are both
    // duplicate-insensitive, and the count only sizes the filter (an
    // over-count just lowers the fpp)
    val keys = small.select(smallKeyCol.as(smallKey))
      .where(col(smallKey).isNotNull)
    val n = keys.count()
    val bloom = build(keys, smallKey, math.max(1L, n))
    big.filter(bigKeyCol.isNotNull && mightContainCol(bloom, bigKeyCol))
      .join(keys.withColumnRenamed(smallKey, "__graft_bloom_key"),
        bigKeyCol === col("__graft_bloom_key"), "left_semi")
  }
}
