package graft.agg

import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KLL quantile sketches (Karnin-Lang-Liberty, FOCS 2016) as native
  * TypedImperativeAggregates over the DataSketches library Spark
  * already ships for its own HLL functions — the documented swap-in
  * for [[graft.llm.Corpus.cardSketch]]'s exact value histogram at an
  * UNBOUNDED continuous column (Corpus.scala: the histogram is exact
  * only because n_chars is a bounded-cardinality integer; a
  * floating-point score column would grow the histogram with the
  * corpus, while a KLL sketch is a few KB at ANY row count with a
  * guaranteed normalized rank error ε(k) ≈ 2.446/k^0.9433 — ~1.65%
  * at the default k = 200).
  *
  * Two aggregates, mirroring Spark's own hll_sketch_agg /
  * hll_union_agg split so sketches can PERSIST as a binary column and
  * merge later without touching the rows again:
  *   - [[KllSketchAgg]]: double column → serialized sketch (binary);
  *   - [[KllMergeAgg]]: serialized-sketch column → merged serialized
  *     sketch (binary).
  * Both plan as ObjectHashAggregate with map-side partials; partials
  * ship as the sketch's own compact byte format.
  *
  * Determinism note (why the card queries built on this compare
  * against a TOLERANCE BAND, not a hash of the estimate): KLL
  * compaction keeps alternate items chosen by a random bit, so the
  * returned quantile VALUE may vary run to run and with merge order —
  * within the rank-error guarantee. The band oracle asserts the
  * guarantee, which IS the sketch's contract. */
case class KllSketchAgg(child: Expression, k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch]
  with ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"KLL k must sit in [8, 65535]: $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(b: KllFloatsSketch,
      input: InternalRow): KllFloatsSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double].toFloat)
    b
  }

  override def merge(a: KllFloatsSketch,
      b: KllFloatsSketch): KllFloatsSketch = { a.merge(b); a }

  override def eval(b: KllFloatsSketch): Any = b.toByteArray

  override def serialize(b: KllFloatsSketch): Array[Byte] =
    b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllSketchAgg = copy(child = c(0))
}

/** Merge a column of serialized KLL sketches ([[KllSketchAgg]]
  * output) into one — the card-time union over persisted per-shard
  * sketch rows. Null/empty inputs are skipped; `k` only seeds the
  * empty buffer (KLL merge adopts the SMALLEST k seen, per the
  * library's accuracy contract). */
case class KllMergeAgg(child: Expression, k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch] {

  require(k >= 8 && k <= 65535, s"KLL k must sit in [8, 65535]: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg needs a BINARY serialized-sketch column, " +
          s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(b: KllFloatsSketch,
      input: InternalRow): KllFloatsSketch = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (bytes.nonEmpty)
        b.merge(KllFloatsSketch.heapify(Memory.wrap(bytes)))
    }
    b
  }

  override def merge(a: KllFloatsSketch,
      b: KllFloatsSketch): KllFloatsSketch = { a.merge(b); a }

  override def eval(b: KllFloatsSketch): Any = b.toByteArray

  override def serialize(b: KllFloatsSketch): Array[Byte] =
    b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c(0))
}
