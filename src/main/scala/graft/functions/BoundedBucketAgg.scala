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
      members(i) = InternalRow(b.ids(i), b.auxs(i))
      i += 1
    }
    InternalRow(b.count, b.mnId, b.mnAux, new GenericArrayData(members))
  }

  override def serialize(b: BucketBuffer): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 * 3 + 4 + 16 * b.n)
    out.putLong(b.count); out.putLong(b.mnId); out.putLong(b.mnAux)
    out.putInt(b.n)
    var i = 0
    while (i < b.n) { out.putLong(b.ids(i)); out.putLong(b.auxs(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): BucketBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val b = new BucketBuffer(cap + 1)
    b.count = in.getLong(); b.mnId = in.getLong(); b.mnAux = in.getLong()
    b.n = in.getInt()
    var i = 0
    while (i < b.n) { b.ids(i) = in.getLong(); b.auxs(i) = in.getLong(); i += 1 }
    b
  }

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
  * exactly when the final count fits the bound. */
final class BucketBuffer(bound: Int) {
  var count: Long = 0L
  var mnId: Long = Long.MaxValue
  var mnAux: Long = 0L
  var n: Int = 0
  val ids = new Array[Long](bound)
  val auxs = new Array[Long](bound)

  def add(id: Long, aux: Long): Unit = {
    count += 1
    if (id < mnId) { mnId = id; mnAux = aux }
    if (n < bound) { ids(n) = id; auxs(n) = aux; n += 1 }
  }

  def merge(o: BucketBuffer): Unit = {
    count += o.count
    if (o.mnId < mnId) { mnId = o.mnId; mnAux = o.mnAux }
    var i = 0
    while (i < o.n && n < bound) {
      ids(n) = o.ids(i); auxs(n) = o.auxs(i); n += 1; i += 1
    }
  }
}
