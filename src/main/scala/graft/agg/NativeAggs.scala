package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JsonShape

/** Length-prefixed UTF-8 string serde for aggregation buffers — the
  * shuffle format for the native aggregates below (no ExpressionEncoder
  * round-trip per partial). */
private[agg] object AggSerde {
  def writeStr(out: DataOutputStream, s: String): Unit =
    if (s == null) out.writeInt(-1)
    else {
      val b = s.getBytes(UTF_8); out.writeInt(b.length); out.write(b)
    }
  def readStr(in: DataInputStream): String = {
    val n = in.readInt()
    if (n < 0) null
    else {
      val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
    }
  }
}

/** `collect-kv` as a native Catalyst TypedImperativeAggregate
  * (trgx.clj:45 semantics: last write wins per key, null keys skipped).
  *
  * Plans as ObjectHashAggregate with map-side partials like the
  * Aggregator form it replaces, but updates read the input row directly
  * (no tuple encoder per row) and partials ship as a compact
  * length-prefixed byte buffer (no ExpressionEncoder serde per
  * partial) — the SURVEY §7 100 TB candidate. Output keys are sorted
  * and duplicate keys resolve by a commutative rule (see `resolve`) so
  * the map bytes — keys AND values — are deterministic across merge
  * orders. */
case class CollectKvAgg(keyExpr: Expression, valExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, String]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(keyExpr, valExpr)
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, StringType)
  override def prettyName: String = "collect_kv"

  override def createAggregationBuffer(): mutable.HashMap[String, String] =
    mutable.HashMap.empty

  // Duplicate-key resolution must be associative, commutative and
  // idempotent or the surviving VALUE depends on partition/merge order
  // (the scheduler), breaking this aggregate's determinism claim: keep
  // the UTF-8-binary-max value, non-null beating null. Registered
  // callers have unique keys per group, so this only pins down the
  // contract for future callers; the reference's last-wins (Clojure
  // `into {}`) has no defined "last" in a distributed fold anyway.
  private def resolve(a: String, b: String): String =
    if (a == null) b
    else if (b == null) a
    else if (UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) >= 0) a
    else b

  private def put(b: mutable.HashMap[String, String],
                  k: String, v: String): Unit =
    b.get(k) match {
      case Some(prev) => b.update(k, resolve(prev, v))
      case None       => b.update(k, v)
    }

  override def update(b: mutable.HashMap[String, String],
                      input: InternalRow): mutable.HashMap[String, String] = {
    val k = keyExpr.eval(input)
    if (k != null) {
      val v = valExpr.eval(input)
      put(b, k.toString, if (v == null) null else v.toString)
    }
    b
  }

  override def merge(a: mutable.HashMap[String, String],
                     b: mutable.HashMap[String, String]) = {
    b.foreach { case (k, v) => put(a, k, v) }
    a
  }

  override def eval(b: mutable.HashMap[String, String]): Any = {
    // sort keys in UTF8String binary (UTF-8 byte) order, not
    // java.lang.String's UTF-16 code-unit order — the two diverge on
    // supplementary-plane strings and the DuckDB oracle collates bytes
    val entries = b.toArray
      .map { case (k, v) => (UTF8String.fromString(k), v) }
      .sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1: Any)),
      new GenericArrayData(entries.map(e =>
        (if (e._2 == null) null else UTF8String.fromString(e._2)): Any)))
  }

  override def serialize(b: mutable.HashMap[String, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, v) =>
      AggSerde.writeStr(out, k); AggSerde.writeStr(out, v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = mutable.HashMap.empty[String, String]
    var n = in.readInt()
    while (n > 0) {
      b.update(AggSerde.readStr(in), AggSerde.readStr(in)); n -= 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): CollectKvAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CollectKvAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CollectKvAgg =
    copy(keyExpr = c(0), valExpr = c(1))
}

/** `collect-kvs` as a native TypedImperativeAggregate
  * (mlin/d_bolome_user_order.clj:42 semantics: multimap {k → set(v)},
  * null keys and null values skipped, values deduped and emitted
  * sorted so output is deterministic across merge orders).
  *
  * Replaces the last `functions.udaf` Aggregator on a registered path:
  * the typed form's per-row encoder serde plus its `Seq.contains`
  * linear dedup made a hot group (one key, V distinct values) O(V²);
  * the HashSet buffer here is O(1) per row and partials ship as one
  * compact length-prefixed buffer. */
case class CollectKvsAgg(keyExpr: Expression, valExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    mutable.HashMap[String, mutable.HashSet[String]]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(keyExpr, valExpr)
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, ArrayType(StringType, containsNull = false))
  override def prettyName: String = "collect_kvs"

  override def createAggregationBuffer() =
    mutable.HashMap.empty[String, mutable.HashSet[String]]

  override def update(b: mutable.HashMap[String, mutable.HashSet[String]],
                      input: InternalRow) = {
    val k = keyExpr.eval(input)
    if (k != null) {
      val v = valExpr.eval(input)
      if (v != null)
        b.getOrElseUpdate(k.toString, mutable.HashSet.empty) += v.toString
    }
    b
  }

  override def merge(a: mutable.HashMap[String, mutable.HashSet[String]],
                     b: mutable.HashMap[String, mutable.HashSet[String]]) = {
    b.foreach { case (k, vs) =>
      a.getOrElseUpdate(k, mutable.HashSet.empty) ++= vs
    }
    a
  }

  override def eval(
      b: mutable.HashMap[String, mutable.HashSet[String]]): Any = {
    // keys AND value arrays sort in UTF8String binary (UTF-8 byte)
    // order — the value order is observable output, and java.lang
    // .String's UTF-16 code-unit order diverges from the oracle's byte
    // collation on supplementary-plane strings
    val entries = b.toArray
      .map { case (k, vs) =>
        (UTF8String.fromString(k),
         vs.toArray.map(UTF8String.fromString).sorted)
      }
      .sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1: Any)),
      new GenericArrayData(entries.map(e =>
        new GenericArrayData(e._2.map(v => v: Any)): Any)))
  }

  override def serialize(
      b: mutable.HashMap[String, mutable.HashSet[String]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, vs) =>
      AggSerde.writeStr(out, k)
      out.writeInt(vs.size)
      vs.foreach(AggSerde.writeStr(out, _))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = mutable.HashMap.empty[String, mutable.HashSet[String]]
    var n = in.readInt()
    while (n > 0) {
      val k = AggSerde.readStr(in)
      var m = in.readInt()
      val set = mutable.HashSet.empty[String]
      while (m > 0) { set += AggSerde.readStr(in); m -= 1 }
      b.update(k, set)
      n -= 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): CollectKvsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CollectKvsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CollectKvsAgg =
    copy(keyExpr = c(0), valExpr = c(1))
}

/** String min/max as a native TypedImperativeAggregate.
  *
  * Spark's built-in `Min`/`Max` over StringType cannot use
  * HashAggregateExec (a string is not a mutable aggregation-buffer
  * field), so every `groupBy(k).agg(min(strCol))` plans as
  * SortAggregate — a full per-partition SORT of the input on BOTH the
  * partial and final sides. At corpus scale that is a sort of every
  * row just to keep one extreme per group. This form plans as
  * ObjectHashAggregate: hash-keyed groups, one retained UTF8String per
  * group, partials shipped as the raw bytes. Comparison is
  * UTF8String.compare — binary UTF-8 byte order, identical to the
  * built-in Min/Max string ordering and to DuckDB's default collation
  * (the [[CollectKvsAgg]] contract). Nulls are skipped like the
  * built-ins; an all-null group evaluates to null. The retained value
  * is `clone()`d on update: the input UTF8String aliases the reused
  * unsafe-row buffer and would be silently overwritten by the next
  * row otherwise.
  *
  * Input typing is a direct `checkInputDataTypes` override, deliberately
  * NOT ImplicitCastInputTypes: with the implicit cast, `graft_str_max` over
  * a numeric column would silently coerce and return the LEXICOGRAPHIC
  * extremum ('9' > '10') — a wrong answer masquerading as a result.
  * A non-string argument now fails at analysis time; callers who want
  * lexicographic semantics over numbers can say so with an explicit
  * cast. NullType stays accepted (a bare NULL literal evaluates to
  * NULL, matching the built-in max/min), so only genuinely-typed
  * non-string inputs are rejected. */
case class StrExtremumAgg(child: Expression, isMax: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StrExtremumAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${other.catalogString}" +
          " — cast explicitly if lexicographic semantics over " +
          "non-strings are intended")
    }
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = if (isMax) "str_max" else "str_min"

  override def createAggregationBuffer(): StrExtremumAgg.Buf =
    new StrExtremumAgg.Buf

  private def better(cur: UTF8String, cand: UTF8String): Boolean =
    if (cur == null) true
    else if (isMax) cand.compareTo(cur) > 0
    else cand.compareTo(cur) < 0

  override def update(b: StrExtremumAgg.Buf, row: InternalRow):
      StrExtremumAgg.Buf = {
    val v = child.eval(row).asInstanceOf[UTF8String]
    if (v != null && better(b.v, v)) b.v = v.clone()
    b
  }

  override def merge(a: StrExtremumAgg.Buf, b: StrExtremumAgg.Buf):
      StrExtremumAgg.Buf = {
    if (b.v != null && better(a.v, b.v)) a.v = b.v
    a
  }

  override def eval(b: StrExtremumAgg.Buf): Any = b.v

  override def serialize(b: StrExtremumAgg.Buf): Array[Byte] =
    if (b.v == null) Array.emptyByteArray
    else {
      val s = b.v.getBytes
      val out = new Array[Byte](s.length + 1)
      out(0) = 1
      System.arraycopy(s, 0, out, 1, s.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): StrExtremumAgg.Buf = {
    val b = new StrExtremumAgg.Buf
    if (bytes.nonEmpty)
      b.v = UTF8String.fromBytes(bytes, 1, bytes.length - 1)
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): StrExtremumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StrExtremumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): StrExtremumAgg = copy(child = c(0))
}

object StrExtremumAgg {
  /** Mutable single-value holder; null = no non-null input seen. */
  final class Buf { var v: UTF8String = null }
}

/** `tr-dimension-metrics` as a native TypedImperativeAggregate
  * (trgx.clj:72-79): fold (dimension-path, metric-map) rows into the
  * canonical pair-tree JSON. Buffer is `{path → metrics}` keyed by the
  * distinct dimension paths of the group (low cardinality), so partials
  * combine map-side and the shuffle carries one compact byte buffer per
  * group — same plan shape as the Aggregator form, minus the per-partial
  * encoder serde. Null metric values are dropped (Clojure nil pairs
  * vanish on JSON render); a row whose dimension PATH contains null is
  * skipped entirely (a null cannot render as a JSON key); rows sharing
  * a path merge their metric maps with the same commutative per-key
  * resolution as [[CollectKvAgg]], so the emitted JSON is independent
  * of partition/merge order. */
case class TrDimensionMetricsAgg(dimsExpr: Expression,
    metricsExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    mutable.HashMap[Seq[String], Map[String, String]]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(dimsExpr, metricsExpr)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), MapType(StringType, StringType))
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "tr_dimension_metrics"

  override def createAggregationBuffer() =
    mutable.HashMap.empty[Seq[String], Map[String, String]]

  // per-metric-key conflict resolution shared by update and merge —
  // commutative/idempotent (UTF-8-binary max, like CollectKvAgg), so
  // the surviving value cannot depend on partition/merge order
  private def mergeMetrics(a: Map[String, String],
                           b: Map[String, String]): Map[String, String] =
    b.foldLeft(a) { case (acc, (k, v)) =>
      acc.get(k) match {
        case Some(prev)
            if UTF8String.fromString(prev)
              .compareTo(UTF8String.fromString(v)) >= 0 => acc
        case _ => acc.updated(k, v)
      }
    }

  private def putPath(b: mutable.HashMap[Seq[String], Map[String, String]],
                      path: Seq[String],
                      metrics: Map[String, String]): Unit =
    b.update(path, b.get(path) match {
      case Some(prev) => mergeMetrics(prev, metrics)
      case None       => metrics
    })

  override def update(b: mutable.HashMap[Seq[String], Map[String, String]],
                      input: InternalRow) = {
    val d = dimsExpr.eval(input).asInstanceOf[ArrayData]
    // a path containing null is skipped: null cannot render as a JSON
    // key, and JsonShape would NPE on it at eval time
    if (d != null && (0 until d.numElements()).forall(!d.isNullAt(_))) {
      val path = (0 until d.numElements()).map(i =>
        d.getUTF8String(i).toString)
      val m = metricsExpr.eval(input).asInstanceOf[MapData]
      val metrics =
        if (m == null) Map.empty[String, String]
        else {
          val ks = m.keyArray(); val vs = m.valueArray()
          (0 until m.numElements()).flatMap { i =>
            if (vs.isNullAt(i)) None
            else Some(ks.getUTF8String(i).toString ->
              vs.getUTF8String(i).toString)
          }.toMap
        }
      putPath(b, path, metrics)
    }
    b
  }

  override def merge(a: mutable.HashMap[Seq[String], Map[String, String]],
                     b: mutable.HashMap[Seq[String], Map[String, String]]) = {
    b.foreach { case (p, m) => putPath(a, p, m) }
    a
  }

  override def eval(
      b: mutable.HashMap[Seq[String], Map[String, String]]): Any =
    UTF8String.fromString(JsonShape.pairTreeToJson(JsonShape.fromRows(
      b.toSeq.map { case (p, ms) => (p, ms.toSeq) })))

  override def serialize(
      b: mutable.HashMap[Seq[String], Map[String, String]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (path, ms) =>
      out.writeInt(path.size)
      path.foreach(AggSerde.writeStr(out, _))
      out.writeInt(ms.size)
      ms.foreach { case (k, v) =>
        AggSerde.writeStr(out, k); AggSerde.writeStr(out, v)
      }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = mutable.HashMap.empty[Seq[String], Map[String, String]]
    var n = in.readInt()
    while (n > 0) {
      val pn = in.readInt()
      val path = Seq.fill(pn)(AggSerde.readStr(in))
      val mn = in.readInt()
      val ms = Seq.fill(mn)(
        (AggSerde.readStr(in), AggSerde.readStr(in))).toMap
      b.update(path, ms)
      n -= 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TrDimensionMetricsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TrDimensionMetricsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TrDimensionMetricsAgg =
    copy(dimsExpr = c(0), metricsExpr = c(1))
}
