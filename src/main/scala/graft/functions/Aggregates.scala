package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — single-pass heavy hitters with HARD
  * bounded state, the sketch a 100 TB corpus scan needs when the exact
  * `groupBy(term).count` vocabulary (billions of keys) is itself the
  * bottleneck. Each partition keeps at most `capacity` counters (classic
  * decrement-on-overflow), partial sketches merge associatively
  * (Agarwal et al., "Mergeable Summaries": pointwise sum, then subtract
  * the (capacity+1)-th largest count and drop non-positives), and only
  * O(capacity) state ever crosses the shuffle.
  *
  * Guarantees (independent of row order / partitioning):
  *  - every item with true count > n/(capacity+1) is present;
  *  - each reported count is an UNDERcount by at most n/(capacity+1).
  * When the distinct-item count never exceeds `capacity`, no decrement
  * ever fires and the sketch is EXACT — that regime is what the DuckDB
  * oracle pins (q71); the bounded regime is property-tested.
  *
  * Output: array<struct<item string, cnt long>> sorted by (cnt desc,
  * item asc) — deterministic for the exact regime and for distinct
  * estimates; the caller slices its top-k. */
case class FrequentItemsAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // the incoming UTF8String may alias a reused row buffer — copy
      // before it becomes a map key
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < capacity) buf.update(key.copy(), 1L)
          else {
            // Misra-Gries step: no free counter -> everyone pays one
            val dead = buf.iterator.collect {
              case (k, 1L) => k }.toList
            buf.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives:
      // the mergeable-summaries reduction that preserves both guarantees
      val cut = buf.values.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      val dead = buf.iterator.collect {
        case (k, c) if c - cut <= 0 => k }.toList
      buf.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortInPlace()(new Ordering[(UTF8String, Long)] {
      def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2) // count desc
        if (c != 0) c else a._1.compareTo(b._1)    // item asc
      }
    })
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c) }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : FrequentItemsAgg = copy(child = newChild)
}

/** Deterministic per-group bottom-k-by-hash sample as a native
  * [[TypedImperativeAggregate]] — the distributed form of "give me k
  * uniform examples from every group" (per-source spot-check corpora,
  * per-cluster exemplars, per-label eval slices). Items are ranked by the
  * portable 60-bit md5 hash of `salt + ":" + value` (exactly
  * [[graft.operators.Curate.sampleHash]], so samples are consistent with
  * the hash-sampling family and mirrorable in oracle SQL), and each
  * group keeps the k smallest — a consistent bottom-k sketch: uniform
  * over distinct values, reproducible across engines, partitionings, and
  * corpus growth (a kept item is only ever displaced by globally smaller
  * hashes, never by reordering).
  *
  * Why an aggregate and not a rank window: the window form shuffles EVERY
  * row to its group's partition before ranking; this sketch's map-side
  * partial is a bounded heap, so at most k items per group per partition
  * cross the wire — on a 100 TB corpus with thousands of groups that is
  * the difference between shuffling the corpus and shuffling kilobytes.
  * Output: array<string> of the k sampled items, hash-ascending (ties on
  * the rare equal hash break by item asc; duplicate values occupy
  * multiple slots — it is a row sample, not a distinct sample). */
case class BottomKSampleAgg(child: Expression, k: Int,
    salt: String = "graft",
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  // max-heap on (hash, item): head is the current WORST kept element
  private val ord: Ordering[(Long, UTF8String)] =
    new Ordering[(Long, UTF8String)] {
      def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  @transient private lazy val saltBytes =
    (salt + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def hash(item: UTF8String): Long = {
    val d = Md5Hash60.md.get()
    d.reset()
    d.update(saltBytes)
    d.update(item.getBytes)
    Md5Hash60.first60(d.digest())
  }

  private def insert(buf: mutable.PriorityQueue[(Long, UTF8String)],
                     h: Long, item: UTF8String): Unit =
    if (buf.size < k) buf.enqueue((h, item))
    else if (ord.lt((h, item), buf.head)) {
      buf.dequeue(); buf.enqueue((h, item))
    }

  override def createAggregationBuffer()
      : mutable.PriorityQueue[(Long, UTF8String)] =
    mutable.PriorityQueue.empty(ord)

  override def update(buf: mutable.PriorityQueue[(Long, UTF8String)],
                      input: InternalRow)
      : mutable.PriorityQueue[(Long, UTF8String)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val h = hash(item)
      // only copy off the reused row buffer when the item is actually kept
      if (buf.size < k || ord.lt((h, item), buf.head))
        insert(buf, h, item.copy())
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, UTF8String)],
                     other: mutable.PriorityQueue[(Long, UTF8String)])
      : mutable.PriorityQueue[(Long, UTF8String)] = {
    other.foreach { case (h, item) => insert(buf, h, item) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, UTF8String)]): Any = {
    // dequeueAll drains worst-first; reverse -> hash-ascending
    val drained: Seq[(Long, UTF8String)] = buf.clone().dequeueAll
    new GenericArrayData(drained.reverseIterator.map(_._2).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, UTF8String)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, item) =>
      val b = item.getBytes
      out.writeLong(h); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = mutable.PriorityQueue.empty(ord)
    var i = 0
    while (i < n) {
      val h = in.readLong()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      q.enqueue((h, UTF8String.fromBytes(b)))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : BottomKSampleAgg = copy(child = newChild)
}
