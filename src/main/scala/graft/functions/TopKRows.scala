package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a PARTIAL-AGGREGABLE heap: each map task keeps a
  * k-bounded heap per group and partials merge heap-wise, so the shuffle
  * carries at most k rows per (group, map task) instead of every row —
  * the scale path for "top 3 per supplier" over a 100 TB fact table,
  * where the window formulation (`row_number` ≤ k) must sort and shuffle
  * the FULL table. Runs under `ObjectHashAggregateExec` with map-side
  * partials like any other aggregate.
  *
  * Row shape is (score DOUBLE, key1 BIGINT, key2 INT), ranked score DESC
  * then key1 ASC then key2 ASC — the q_topk_per_group contract; the
  * element struct generalizes by swapping the child list and ordering.
  * Output is the k best as a sorted array of structs (exploded to rows
  * by the caller — nested types never reach a query output).
  */
case class TopKRows(
    score: Expression,
    key1: Expression,
    key2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long, Int)]] {

  type Buf = mutable.ArrayBuffer[(Double, Long, Int)]

  // (a better-than b) under: score desc, key1 asc, key2 asc
  private def better(a: (Double, Long, Int), b: (Double, Long, Int)): Boolean =
    a._1 > b._1 || (a._1 == b._1 &&
      (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  override def children: Seq[Expression] = Seq(score, key1, key2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("key1", LongType),
    StructField("key2", IntegerType))), containsNull = false)

  override def createAggregationBuffer(): Buf = mutable.ArrayBuffer.empty

  /** Insert bounded: append, and only when over capacity drop the single
    * worst element (linear scan — k is small by contract). */
  private def insert(buf: Buf, e: (Double, Long, Int)): Buf = {
    buf += e
    if (buf.length > k) {
      var worst = 0
      var i = 1
      while (i < buf.length) {
        if (better(buf(worst), buf(i))) worst = i
        i += 1
      }
      buf.remove(worst)
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val a = key1.eval(input)
    val b = key2.eval(input)
    // NaN is skipped like null: `better` is false on every NaN compare,
    // so a NaN that entered the heap at index > 0 could never be chosen
    // as "worst" by insert's eviction scan — it would squat in a top-k
    // slot forever, displacing real rows. No-score rows don't rank.
    if (s == null || a == null || b == null ||
      java.lang.Double.isNaN(s.asInstanceOf[Double])) buf
    else insert(buf, (s.asInstanceOf[Double],
      a.asInstanceOf[Long], b.asInstanceOf[Int]))
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.sortWith(better).map { e =>
      new GenericInternalRow(Array[Any](e._1, e._2, e._3))
    }.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { e =>
      out.writeDouble(e._1); out.writeLong(e._2); out.writeInt(e._3)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf += ((in.readDouble(), in.readLong(), in.readInt()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(score = newChildren(0), key1 = newChildren(1), key2 = newChildren(2))
  override def prettyName: String = "top_k_rows"
}
