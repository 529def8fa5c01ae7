package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequency summary behind [[TopKFreq]]: the Misra–Gries heavy-hitters
  * sketch (a.k.a. frequent / lossy counting family), chosen over
  * SpaceSaving for its amortized O(1) update (each decrement round is
  * paid for by the increments that preceded it — no per-insert min
  * scan) and because it is MERGEABLE (Agarwal et al., "Mergeable
  * Summaries", PODS'12): two summaries combine by summing counters and
  * re-truncating to capacity, which is exactly the partial/final shape
  * Spark's aggregation needs.
  *
  * Guarantees, with n = items seen and c = capacity:
  *  - every reported count UNDERCOUNTS by at most `maxError`, and
  *    `maxError <= n / (c + 1)` (classic MG bound; merges preserve it).
  *  - any item with true frequency > n/(c+1) is present in the summary.
  *  - while the distinct-item count never exceeds the capacity, NO
  *    decrement ever happens: counts are EXACT and `maxError == 0` —
  *    the regime the oracle-backed query runs in.
  */
final class FreqSummary(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)
  /** Max possible undercount of any reported item (total decrements). */
  var maxError: Long = 0L

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item, 1L)
    else decrementAll(1L)
  }

  /** MG overflow step: new arrival + decrement-all-by-d cancels the
    * arrival and shrinks every stored counter; zeros are evicted. */
  private def decrementAll(d: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
    maxError += d
  }

  /** Mergeable-summaries combine: sum counters, then if over capacity
    * subtract the (capacity+1)-th largest count from everything (one
    * collective decrement round) so at most `capacity` survive. */
  def merge(other: FreqSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    maxError += other.maxError
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-capacity-1 ascending
      decrementAll(vals(vals.length - capacity - 1))
    }
  }

  /** Top `k` as (item, cnt), count desc then item asc — the total order
    * the DuckDB oracle's `ORDER BY cnt DESC, item LIMIT k` applies, so
    * boundary ties resolve identically in both engines. */
  def topK(k: Int): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    java.util.Arrays.sort(arr, (x: (String, Long), y: (String, Long)) => {
      val c = java.lang.Long.compare(y._2, x._2)
      if (c != 0) c else x._1.compareTo(y._1)
    })
    arr.take(k)
  }
}

/** `graft_topk_freq(item, k, capacity)` — approximate top-k most
  * frequent strings as `array<struct<item:string, cnt:bigint>>`,
  * computed with one bounded-memory [[FreqSummary]] per partition and
  * merged, never a full groupBy: at 100 TB the exact token histogram is
  * itself a billion-row shuffle, while this is a map-side O(capacity)
  * state per partition and ONE tiny row out.
  *
  * A custom `TypedImperativeAggregate` rather than a composition
  * because an aggregate with algorithm-specific mutable state (hash map
  * + decrement rounds) is precisely the case built-in declarative
  * aggregates cannot express (SURVEY §4.2's escalation rule); Spark's
  * own `approx_percentile`/`count_min_sketch` use the same base class.
  * Unlike `count_min_sketch`, MG answers "WHICH items are frequent"
  * without a second pass over candidate items.
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"graft_topk_freq requires a string item column, got " +
        child.dataType.simpleString)
    else if (k < 1 || capacity < k) TypeCheckResult.TypeCheckFailure(
      s"graft_topk_freq requires 1 <= k <= capacity, got k=$k capacity=$capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqSummary = new FreqSummary(capacity)

  override def update(buffer: FreqSummary, input: InternalRow): FreqSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSummary, other: FreqSummary): FreqSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: FreqSummary): Any =
    new GenericArrayData(buffer.topK(k).map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    })

  override def serialize(buffer: FreqSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.maxError)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new FreqSummary(in.readInt())
    s.maxError = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      s.counts.put(new String(buf, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKFreq =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKFreq =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKFreq =
    copy(child = newChild)
  override def prettyName: String = "graft_topk_freq"
}
