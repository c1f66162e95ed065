package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native sketch expressions.
  *
  * The built-in formulation (nested `transform`/`filter` lambdas over
  * xxhash64) evaluates interpretively per element per hash function — at
  * sf0.1 that is ~10⁸ boxed lambda dispatches and dominated the dedup
  * benchmarks. These expressions do the same math in one tight JVM loop per
  * row: hash each element ONCE (xxhash64, seed 42 — identical to Spark's
  * xxhash64()), then derive the H permutation values with a SplitMix64 mix
  * (a public universal-hashing construction) instead of re-hashing the
  * string H times. CodegenFallback is deliberate: the per-row loop is the
  * hot path and is already compiled JVM code; fusing it into
  * WholeStageCodegen would buy nothing.
  */

/** MinHash signature: array<long> of length numHashes; element i is the
  * minimum over the input strings of mix_i(xxhash64(s)).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val base = XxHash64Function.hash(s, StringType, 42L)
      var i = 0
      while (i < numHashes) {
        var z = base + 0x9E3779B97F4A7C15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if (z < mins(i)) mins(i) = z
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash over an array of token strings: bit b is set when more than
  * half the tokens' hash values have bit b set. Two hash modes:
  *
  *  - default (crossEngine = false): 64-bit xxhash64 (seed 42) — the
  *    throughput mode, Spark-internal hashing;
  *  - crossEngine = true: the first 60 BITS of md5 (the same
  *    `conv(substr(md5(x), 1, 15), 16, 10)` head the q52 sampling tier
  *    pins), yielding a 60-bit signature — slower per token, but a
  *    SECOND ENGINE can recompute every signature bit, which is what
  *    lets the q20 near-dup tier be hash-checked by the DuckDB oracle
  *    instead of rows-only.
  */
case class SimHash64(child: Expression, crossEngine: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  private val bits = if (crossEngine) 60 else 64

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    val md = if (crossEngine) java.security.MessageDigest.getInstance("MD5")
             else null
    var j = 0
    while (j < n) {
      val h =
        if (crossEngine) {
          md.reset()
          val d = md.digest(arr.getUTF8String(j).getBytes)
          // first 15 hex nibbles == first 60 bits, the conv() head
          var v = 0L
          var k = 0
          while (k < 7) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
          (v << 4) | ((d(7) & 0xFFL) >>> 4)
        } else XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      var b = 0
      while (b < bits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var sk = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) * 2 > n) sk |= 1L << b
      b += 1
    }
    sk
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles from a token array: one pass, one output
  * string per window, first-occurrence order. Equivalent to
  * array_distinct(transform(sequence(...), i -> concat_ws(" ", slice(...))))
  * but without per-window lambda interpretation.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= total - n) {
      var s = arr.getUTF8String(i)
      var j = 1
      while (j < n) {
        s = org.apache.spark.unsafe.types.UTF8String.concat(
          s, org.apache.spark.unsafe.types.UTF8String.fromString(" "),
          arr.getUTF8String(i + j))
        j += 1
      }
      seen.add(s)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection size of two SORTED string arrays by linear merge — the
  * exact-verification kernel of the Jaccard near-dup tier. `array_intersect`
  * + `array_union` build two hash sets of UTF8Strings per candidate pair;
  * at ~80k surviving candidates per block that was the dominant q18 phase.
  * The merge does one pass of binary compares instead, and the union size
  * falls out for free (|A∪B| = |A|+|B|−|A∩B|, both inputs distinct).
  * Whole-stage codegen'd: the loop inlines into the verify projection.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  // analysis-time rejection of non-string arrays (the SQL surface exposes
  // this as graft_overlap — without this an int array would be misread as
  // UTF8String offsets at runtime)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // array<void> admits the untyped empty/all-null literal (array());
    // the merge's isNullAt guards never dereference such elements
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case ArrayType(org.apache.spark.sql.types.NullType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_overlap expects two array<string> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // null elements sort FIRST under sort_array's default ordering; mirror
  // array_intersect: null matches null (counted once — inputs are sets)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var o = 0
    while (i < nx && j < ny) {
      val an = x.isNullAt(i)
      val bn = y.isNullAt(j)
      val c =
        if (an && bn) 0
        else if (an) -1
        else if (bn) 1
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { o += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    o
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      val c = ctx.freshName("c")
      val an = ctx.freshName("an")
      val bn = ctx.freshName("bn")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $o = 0;
         |while ($i < $nx && $j < $ny) {
         |  boolean $an = $a.isNullAt($i);
         |  boolean $bn = $b.isNullAt($j);
         |  int $c = ($an && $bn) ? 0 : $an ? -1 : $bn ? 1
         |    : $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $o++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $o;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {
  def wordShingles(tokens: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(tokens), n))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSignature(ColumnShim.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  /** 60-bit md5-head SimHash — the oracle-repriceable mode (see
    * [[SimHash64]]).
    */
  def simhash60(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens),
      crossEngine = true))

  /** |a ∩ b| for two sorted, distinct array<string> columns. */
  def sortedOverlapCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedOverlapCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
