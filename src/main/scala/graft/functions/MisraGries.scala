package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a real aggregate.
  *
  * The heavy-hitters question ("which values account for more than a 1/(k+1)
  * share of 100 TB of rows?") does not need a full groupBy-count of every
  * distinct value — a k-counter Misra-Gries summary answers it with bounded
  * state: any item whose true count exceeds n/(k+1) is GUARANTEED to be
  * present in the summary, and each reported count is an underestimate by at
  * most n/(k+1) (Misra & Gries 1982; merge rule and its preserved bound from
  * Agarwal et al., "Mergeable Summaries", PODS 2012). Partials are k-sized
  * per task regardless of input cardinality, so the shuffle carries
  * O(k × partitions) rows instead of one row per distinct value.
  *
  * The exact-tier contract used by the queries: MG candidates → exact
  * recount restricted to the ≤k candidates (a broadcast semi-join, not a
  * full group-by) → filter by the true threshold. Because the summary is a
  * guaranteed superset of the frequent items, the final result is EXACT and
  * deterministic — oracle-checkable against plain GROUP BY / HAVING.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesTopK.Buf] {
  import MisraGriesTopK.Buf

  require(k > 0, "k must be positive")

  // analysis-time check: the SQL surface (graft_frequent_items) passes the
  // raw child — a non-string column must be a clean analysis error, not an
  // executor-side ClassCastException
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_frequent_items expects a string item column, got " +
          child.dataType.catalogString + " (cast explicitly)")

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a.mergeIn(b); a }

  /** array<struct<item string, lb bigint>> in deterministic
    * (lb desc, item asc) order; lb is the MG lower-bound count.
    */
  override def eval(buf: Buf): Any = {
    val entries = buf.entries.sortBy { case (item, lb) => (-lb, item) }
    new GenericArrayData(entries.map { case (item, lb) =>
      InternalRow(UTF8String.fromString(item), lb)
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): Buf = Buf.fromBytes(k, bytes)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType),
      StructField("lb", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGriesTopK {

  /** k-counter Misra-Gries buffer. `add` is the classic update: bump a
    * tracked counter, claim a free slot, or decrement every counter by the
    * weight that cannot be seated (removing zeros). `mergeIn` is the
    * mergeable-summaries rule: sum counters pointwise, then if more than k
    * survive, subtract the (k+1)-th largest count from all and drop the
    * non-positive — the combined error stays ≤ n_total/(k+1).
    */
  final class Buf(k: Int) {
    private val counters = new java.util.HashMap[String, Long](k * 2)

    def add(item: String, w: Long): Unit = {
      val cur = counters.get(item)
      if (cur != 0L || counters.containsKey(item)) {
        counters.put(item, cur + w)
      } else if (counters.size < k) {
        counters.put(item, w)
      } else {
        // no free slot: decrement all by w (the unseated weight); in the
        // weighted case any remainder after a counter hits zero is dropped —
        // that only widens the underestimate, never breaks the bound
        decrementAll(w)
      }
    }

    private def decrementAll(by: Long): Unit = {
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - by
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }

    def mergeIn(other: Buf): Unit = {
      other.counters.forEach { (item, c) =>
        val cur = counters.get(item)
        counters.put(item, cur + c)
      }
      if (counters.size > k) {
        // (k+1)-th largest count, subtracted from every counter
        val counts = new Array[Long](counters.size)
        var i = 0
        val it = counters.values().iterator()
        while (it.hasNext) { counts(i) = it.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - (k + 1))
        decrementAll(cut)
      }
    }

    def entries: Seq[(String, Long)] = {
      val out = Seq.newBuilder[(String, Long)]
      counters.forEach((item, c) => out += ((item, c)))
      out.result()
    }

    def toBytes: Array[Byte] = {
      val items = entries.map { case (s, c) =>
        (s.getBytes(StandardCharsets.UTF_8), c)
      }
      val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
      bb.putInt(items.size)
      items.foreach { case (b, c) =>
        bb.putInt(b.length); bb.put(b); bb.putLong(c)
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
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        buf.add(new String(b, StandardCharsets.UTF_8), bb.getLong)
        i += 1
      }
      buf
    }
  }
}

object MisraGries {
  /** Column surface: the ≤k-entry frequent-items summary of a string
    * column, as array<struct<item, lb>> in (lb desc, item) order.
    */
  def frequentItems(item: Column, k: Int): Column =
    ColumnShim.column(
      MisraGriesTopK(ColumnShim.expression(item.cast("string")), k)
        .toAggregateExpression())
}
