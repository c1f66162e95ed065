package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded top-k as a REAL aggregate (TypedImperativeAggregate) instead of
  * a window scan.
  *
  * `row_number().over(partitionBy(g).orderBy(score.desc))` shuffles EVERY
  * row of the input to its group's partition before ranking. This
  * aggregate keeps a k-bounded heap per group in the partial (map-side)
  * phase, so the shuffle carries at most k·partitions rows per group —
  * the difference between moving 100 TB and moving megabytes for a
  * "top 3 per key" question.
  *
  * Semantics match the deterministic window form exactly: order by
  * (score DESC, score2 DESC, id ASC); the result is array<struct<score
  * double, id bigint>> in rank order. The secondary score exists for
  * callers whose primary score is a truncated hash (q98 packs md5 nibbles
  * 1–13 into score and 14–26 into score2, so a selection tie needs a
  * 104-bit hash-prefix collision before the id ordering can diverge from
  * the full-hash window form); plain top-k callers pass score2 = 0.
  */
case class TopKByScore(
    scoreExpr: Expression,
    score2Expr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] {
  import TopKByScore.Buf

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val s2 = score2Expr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && s2 != null && i != null)
      buf.add(s.asInstanceOf[Double], s2.asInstanceOf[Double],
        i.asInstanceOf[Long], 1)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { b.foreachEntry(a.add); a }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.foreachDescending { (s, _, id) =>
      out(i) = InternalRow(s, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): Buf = Buf.fromBytes(k, bytes)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType),
      StructField("id", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(scoreExpr, score2Expr, idExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), score2Expr = newChildren(1),
      idExpr = newChildren(2))
}

object TopKByScore {

  /** Bounded top-k MULTISET buffer: a TreeMap of (score, score2, id) →
    * count ordered worst-first (smaller score, smaller score2, then larger
    * id — the inverse of rank order (score DESC, score2 DESC, id ASC)),
    * holding at most k total elements. Counted entries preserve
    * duplicate-row multiplicity exactly as a window row_number would.
    */
  final class Buf(k: Int) {
    private val ord = new java.util.Comparator[(Double, Double, Long)] {
      override def compare(a: (Double, Double, Long),
          b: (Double, Double, Long)): Int = {
        // primitive comparisons, NOT Double.compare: Spark SQL ordering has
        // -0.0 == 0.0 and the window oracle this aggregate is pinned to
        // must agree (scores are non-NaN by contract)
        val c1 = if (a._1 < b._1) -1 else if (a._1 > b._1) 1 else 0
        if (c1 != 0) return c1
        val c2 = if (a._2 < b._2) -1 else if (a._2 > b._2) 1 else 0
        if (c2 != 0) c2 else java.lang.Long.compare(b._3, a._3)
      }
    }
    private val map = new java.util.TreeMap[(Double, Double, Long), Int](ord)
    var size: Int = 0

    def add(score: Double, score2: Double, id: Long, n: Int): Unit = {
      val key = (score, score2, id)
      var toAdd = n
      // fill free room first
      var room = math.min(k - size, toAdd)
      while (room > 0) { insertOne(key); toAdd -= 1; room -= 1 }
      // then displace strictly-worse elements (compare stops at key itself)
      while (toAdd > 0 && !map.isEmpty && ord.compare(key, map.firstKey()) > 0) {
        removeOneWorst()
        insertOne(key)
        toAdd -= 1
      }
    }

    private def insertOne(key: (Double, Double, Long)): Unit = {
      map.merge(key, 1, (a, b) => a + b)
      size += 1
    }

    private def removeOneWorst(): Unit = {
      val e = map.firstEntry()
      if (e.getValue <= 1) map.remove(e.getKey)
      else map.put(e.getKey, e.getValue - 1)
      size -= 1
    }

    def foreachEntry(f: (Double, Double, Long, Int) => Unit): Unit =
      map.forEach((key, n) => f(key._1, key._2, key._3, n))

    /** Rank order: best first, duplicates expanded. */
    def foreachDescending(f: (Double, Double, Long) => Unit): Unit = {
      val it = map.descendingMap().entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        var i = 0
        while (i < e.getValue) {
          f(e.getKey._1, e.getKey._2, e.getKey._3); i += 1
        }
      }
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + map.size() * 28)
      bb.putInt(map.size())
      map.forEach { (key, n) =>
        bb.putDouble(key._1); bb.putDouble(key._2); bb.putLong(key._3)
        bb.putInt(n)
      }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(k: Int, bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buf(k)
      var i = 0
      while (i < n) {
        buf.add(bb.getDouble, bb.getDouble, bb.getLong, bb.getInt)
        i += 1
      }
      buf
    }
  }
}

object TopKAggregate {
  /** Column surface: top-k (score, id) pairs per group in rank order.
    * Score/id are cast here (double/long) — the expression evals raw values
    * and would ClassCastException on decimal or int inputs otherwise.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    topKByScore(score, org.apache.spark.sql.functions.lit(0.0), id, k)

  /** Two-level-score form: rank by (score DESC, score2 DESC, id ASC).
    * For hash-ordered selections whose primary score is a truncated hash
    * prefix — the secondary level carries the next hash window so ties
    * effectively never reach the id fallback.
    */
  def topKByScore(score: Column, score2: Column, id: Column, k: Int): Column =
    ColumnShim.column(
      TopKByScore(
        ColumnShim.expression(score.cast("double")),
        ColumnShim.expression(score2.cast("double")),
        ColumnShim.expression(id.cast("long")), k)
        .toAggregateExpression())
}
