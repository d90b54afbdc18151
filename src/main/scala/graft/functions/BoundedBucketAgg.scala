package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded per-bucket membership aggregate for candidate-pair generation:
 * collects AT MOST `cap + 1` (doc_id, aux) members per group while always
 * tracking the TRUE count and the TRUE minimum (doc_id, its aux) over all
 * members — so a bucket with `sz <= cap` yields its complete membership
 * (exact pair enumeration is recall-lossless there), and a bucket of any
 * size — a 10^8-page parked domain included — costs bounded memory and
 * still knows its star-edge anchor.
 *
 * Map-side partial aggregation applies (partials are themselves bounded),
 * so the bucket shuffle carries at most cap+1 entries per (mapper, key):
 * this replaces a checkpoint of the full bucket relation plus three joins
 * back to it (stats, small-bucket self-join, star join) with ONE shuffle.
 */
case class BoundedBucketAgg(
    docId: Expression,
    aux: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BucketBuffer] {

  override def children: Seq[Expression] = Seq(docId, aux)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_bucket"

  override val dataType: DataType = StructType(Seq(
    StructField("sz", LongType, nullable = false),
    StructField("mn", LongType, nullable = false),
    StructField("mn_aux", LongType, nullable = false),
    StructField("members", ArrayType(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("aux", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): BucketBuffer = new BucketBuffer(cap + 1)

  override def update(b: BucketBuffer, input: InternalRow): BucketBuffer = {
    val id = docId.eval(input).asInstanceOf[Long]
    val a = aux.eval(input) match { case null => 0L; case x => x.asInstanceOf[Long] }
    b.add(id, a)
    b
  }

  override def merge(b: BucketBuffer, o: BucketBuffer): BucketBuffer = { b.merge(o); b }

  override def eval(b: BucketBuffer): Any = {
    val members = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      members(i) = InternalRow(b.idAt(i), b.auxAt(i))
      i += 1
    }
    InternalRow(b.count, b.mnId, b.mnAux, new GenericArrayData(members))
  }

  /** Shuffle-only wire form (never persisted, producer and consumer are
    * this same class): the dominant partial is a SINGLETON — near-unique
    * bucket keys mean one buffer per input row on the map side — and its
    * member list is exactly [(mnId, mnAux)], so singletons serialize as a
    * 25-byte header (n = -1 sentinel) instead of repeating the member pair:
    * ~20% off the pipeline's one big shuffle. */
  override def serialize(b: BucketBuffer): Array[Byte] = {
    if (b.count == 1L && b.n == 1 && b.idAt(0) == b.mnId && b.auxAt(0) == b.mnAux) {
      val out = java.nio.ByteBuffer.allocate(8 * 2 + 1)
      out.put(SingletonTag); out.putLong(b.mnId); out.putLong(b.mnAux)
      return out.array()
    }
    val out = java.nio.ByteBuffer.allocate(1 + 8 * 3 + 4 + 16 * b.n)
    out.put(GeneralTag)
    out.putLong(b.count); out.putLong(b.mnId); out.putLong(b.mnAux)
    out.putInt(b.n)
    var i = 0
    while (i < b.n) { out.putLong(b.idAt(i)); out.putLong(b.auxAt(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): BucketBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new BucketBuffer(cap + 1)
    if (in.get() == SingletonTag) {
      b.count = 1L; b.mnId = in.getLong(); b.mnAux = in.getLong()
      b.n = 1; b.id0 = b.mnId; b.aux0 = b.mnAux
      return b
    }
    b.count = in.getLong(); b.mnId = in.getLong(); b.mnAux = in.getLong()
    val n = in.getInt()
    b.ensureFor(n)
    var i = 0
    while (i < n) {
      val id = in.getLong(); val aux = in.getLong()
      if (i == 0 && b.ids == null) { b.id0 = id; b.aux0 = aux }
      else { b.ids(i) = id; b.auxs(i) = aux }
      i += 1
    }
    b.n = n
    b
  }

  private val SingletonTag: Byte = 1
  private val GeneralTag: Byte = 0

  override def withNewMutableAggBufferOffset(o: Int): BoundedBucketAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedBucketAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(docId = newChildren(0), aux = newChildren(1))
}

/** Mutable buffer: true count + true min, member list truncated at `bound`.
  * Trimming only ever happens when count > bound, so membership is complete
  * exactly when the final count fits the bound.
  *
  * The FIRST member is inlined as plain fields and the member arrays are
  * allocated only at the second member (r7): with near-unique bucket keys
  * the map side allocates one buffer per input row and almost all of them
  * hold a single member, so the two eager arrays were two dead allocations
  * per corpus row — measured as the dominant share of the bucket-aggregate
  * stage's 46 s task-attributed GC at 699k docs (after the signature-kernel
  * scratch fix exposed it). Invariant: `ids == null` ⟺ n <= 1, and once
  * arrays exist the inlined member has been copied into slot 0. */
final class BucketBuffer(bound: Int) {
  var count: Long = 0L
  var mnId: Long = Long.MaxValue
  var mnAux: Long = 0L
  var n: Int = 0
  var id0: Long = 0L
  var aux0: Long = 0L
  var ids: Array[Long] = null
  var auxs: Array[Long] = null

  @inline def idAt(i: Int): Long = if (ids == null) id0 else ids(i)
  @inline def auxAt(i: Int): Long = if (ids == null) aux0 else auxs(i)

  /** Ensure capacity for `m` members, promoting the inlined first member
    * into slot 0 on the first allocation. */
  private[functions] def ensureFor(m: Int): Unit =
    if (m > 1) {
      if (ids == null) {
        val c = math.min(bound, math.max(m, 4))
        ids = new Array[Long](c)
        auxs = new Array[Long](c)
        if (n > 0) { ids(0) = id0; auxs(0) = aux0 }
      } else if (ids.length < m) {
        val c = math.min(bound, math.max(m, ids.length * 2))
        ids = java.util.Arrays.copyOf(ids, c)
        auxs = java.util.Arrays.copyOf(auxs, c)
      }
    }

  /** Append one member. The inline fields are used ONLY while `ids` is
    * null: a reduce-side buffer can have arrays pre-allocated (ensureFor
    * from merge) while still empty, and writing member 0 to the inline
    * fields then would make idAt(0) read the zeroed ids(0) instead —
    * the r7 first-cut of this class had exactly that bug (caught by the
    * DuckDB oracle as phantom doc_id-0 star edges). */
  @inline private def append(id: Long, aux: Long): Unit = {
    if (n == 0 && ids == null) { id0 = id; aux0 = aux }
    else { ensureFor(n + 1); ids(n) = id; auxs(n) = aux }
    n += 1
  }

  def add(id: Long, aux: Long): Unit = {
    count += 1
    if (id < mnId) { mnId = id; mnAux = aux }
    if (n < bound) append(id, aux)
  }

  def merge(o: BucketBuffer): Unit = {
    count += o.count
    if (o.mnId < mnId) { mnId = o.mnId; mnAux = o.mnAux }
    if (o.n > 0 && n < bound) ensureFor(math.min(bound, n + o.n))
    var i = 0
    while (i < o.n && n < bound) {
      append(o.idAt(i), o.auxAt(i))
      i += 1
    }
  }
}
