package graft.agg

import graft.core._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{AbstractDataType, TypeCollection}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst aggregate wrappers for the graft sketch kernels.
  *
  * Each sketch follows the monoid contract of the reference
  * (add / merge / serialize, SURVEY.md §0), which is exactly the
  * TypedImperativeAggregate lifecycle: createAggregationBuffer → per-partition
  * update → serialize → shuffle → merge → eval. Spark plans these through
  * ObjectHashAggregateExec with partial aggregation, so per-executor state is
  * O(groups × sketch size) — row-count independent — which is what makes the
  * design hold at 100 TB (SURVEY.md §7.4 item 9). Spill safety comes from the
  * sort-based fallback (spark.sql.objectHashAggregate.sortBased.fallbackThreshold).
  */
object StatsStruct {
  val schema: StructType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("min", DoubleType, nullable = false),
    StructField("max", DoubleType, nullable = false),
    StructField("m2", DoubleType, nullable = false),
    StructField("m3", DoubleType, nullable = false),
    StructField("m4", DoubleType, nullable = false),
    StructField("homogeneous", BooleanType, nullable = false),
    StructField("first_value", DoubleType, nullable = false)))

  def toRow(s: MomentsSketch): InternalRow = {
    val r = new GenericInternalRow(9)
    r.setLong(0, s.count); r.setDouble(1, s.sum)
    r.setDouble(2, s.minOrNaN); r.setDouble(3, s.maxOrNaN)
    r.setDouble(4, s.m2); r.setDouble(5, s.m3); r.setDouble(6, s.m4)
    r.setBoolean(7, s.homogeneous); r.setDouble(8, s.firstValue)
    r
  }

  def fromRow(r: InternalRow): MomentsSketch = {
    val s = new MomentsSketch
    s.count = r.getLong(0); s.sum = r.getDouble(1)
    val mn = r.getDouble(2); val mx = r.getDouble(3)
    s.min = if (java.lang.Double.isNaN(mn)) Double.MaxValue else mn
    s.max = if (java.lang.Double.isNaN(mx)) Double.NegativeInfinity else mx
    s.m2 = r.getDouble(4); s.m3 = r.getDouble(5); s.m4 = r.getDouble(6)
    s.homogeneous = r.getBoolean(7); s.firstValue = r.getDouble(8)
    s
  }
}

/** summary_stats(x[, count]) → moments struct (reference SummaryStats,
  * crick/stats.pyx; X1–X14 in SURVEY.md §2.3). */
case class SummaryStatsAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsSketch]
  with BinaryLike[Expression] with ImplicitCastInputTypes {

  def this(child: Expression) = this(child, Literal(1L))

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = StatsStruct.schema
  override def nullable: Boolean = false
  override def prettyName: String = "summary_stats"

  override def createAggregationBuffer(): MomentsSketch = new MomentsSketch

  override def update(buf: MomentsSketch, input: InternalRow): MomentsSketch = {
    val v = left.eval(input)
    if (v != null) {
      val w = right.eval(input)
      if (w != null) {
        val c = w.asInstanceOf[Long]
        if (c <= 0) throw new IllegalArgumentException("count must be > 0")
        buf.add(v.asInstanceOf[Double], c)
      }
    }
    buf
  }

  override def merge(b1: MomentsSketch, b2: MomentsSketch): MomentsSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: MomentsSketch): Any = StatsStruct.toRow(buf)
  override def serialize(buf: MomentsSketch): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): MomentsSketch = MomentsSketch.deserialize(b)

  override def withNewMutableAggBufferOffset(n: Int): SummaryStatsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SummaryStatsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SummaryStatsAgg =
    copy(left = l, right = r)
}

/** stats_merge_agg(stats_struct) → moments struct: re-aggregates stored
  * summary_stats structs (partial→final parity; reference merge X5). */
case class StatsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsSketch] with UnaryLike[Expression] {

  override def dataType: DataType = StatsStruct.schema
  override def nullable: Boolean = false
  override def prettyName: String = "stats_merge_agg"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // field types must match exactly (names are free) — a loose 9-field
      // check would defer the mismatch to a ClassCastException in executors
      case s: StructType if s.length == StatsStruct.schema.length &&
          s.fields.iterator.zip(StatsStruct.schema.fields.iterator)
            .forall { case (a, b) => a.dataType == b.dataType } =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"stats_merge_agg expects a summary_stats struct " +
          s"${StatsStruct.schema.simpleString}, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MomentsSketch = new MomentsSketch

  override def update(buf: MomentsSketch, input: InternalRow): MomentsSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(StatsStruct.fromRow(v.asInstanceOf[InternalRow]))
    buf
  }

  override def merge(b1: MomentsSketch, b2: MomentsSketch): MomentsSketch = {
    b1.merge(b2); b1
  }
  override def eval(buf: MomentsSketch): Any = StatsStruct.toRow(buf)
  override def serialize(buf: MomentsSketch): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): MomentsSketch = MomentsSketch.deserialize(b)
  override def withNewMutableAggBufferOffset(n: Int): StatsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StatsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): StatsMergeAgg =
    copy(child = c)
}

/** tdigest(x[, w][, compression]) → serialized t-digest sketch (BinaryType).
  * Reference TDigest construct/add/update (T1–T4, SURVEY.md §2.1). */
case class TDigestAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest]
  with TernaryLike[Expression] with ImplicitCastInputTypes {

  def this(child: Expression) = this(child, Literal(1.0), Literal(100.0))
  def this(child: Expression, weight: Expression) = this(child, weight, Literal(100.0))

  private lazy val compression: Double =
    third.eval().asInstanceOf[Number].doubleValue()

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tdigest"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "compression must be a constant")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TDigest = TDigest(compression)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = first.eval(input)
    if (v != null) {
      val w = second.eval(input)
      if (w != null) {
        val wd = w.asInstanceOf[Double]
        // reference contract: w must be finite and > 0 (tdigest.pyx:278-279)
        if (wd <= 0 || java.lang.Double.isInfinite(wd) || java.lang.Double.isNaN(wd))
          throw new IllegalArgumentException("weight must be finite and > 0")
        buf.add(v.asInstanceOf[Double], wd)
      }
    }
    buf
  }

  override def merge(b1: TDigest, b2: TDigest): TDigest = { b1.merge(b2); b1 }
  override def eval(buf: TDigest): Any = buf.serialize()
  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): TDigest = TDigest.deserialize(b)

  override def withNewMutableAggBufferOffset(n: Int): TDigestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TDigestAgg =
    copy(first = f, second = s, third = t)
}

/** Mutable holder so merge-aggregates can adopt parameters (compression,
  * capacity, key type) from the first sketch they see. */
final class TDigestHolder(var t: TDigest)

/** tdigest_merge_agg(sketch_col) → merged sketch: re-aggregates stored
  * t-digest sketch columns (reference merge T11). */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestHolder]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_merge_agg"

  override def createAggregationBuffer(): TDigestHolder = new TDigestHolder(null)

  override def update(buf: TDigestHolder, input: InternalRow): TDigestHolder = {
    val v = child.eval(input)
    if (v != null) {
      val other = TDigest.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf.t == null) buf.t = other // fresh object owned by the buffer
      else buf.t.merge(other)
    }
    buf
  }

  override def merge(b1: TDigestHolder, b2: TDigestHolder): TDigestHolder = {
    if (b2.t != null) {
      if (b1.t == null) b1.t = b2.t
      else b1.t.merge(b2.t)
    }
    b1
  }

  override def eval(buf: TDigestHolder): Any =
    if (buf.t == null) null else buf.t.serialize()
  override def serialize(buf: TDigestHolder): Array[Byte] =
    if (buf.t == null) Array.emptyByteArray else buf.t.serialize()
  override def deserialize(b: Array[Byte]): TDigestHolder =
    new TDigestHolder(if (b.isEmpty) null else TDigest.deserialize(b))

  override def withNewMutableAggBufferOffset(n: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TDigestMergeAgg =
    copy(child = c)
}

object SpaceSavingAgg {
  /** serialized-sketch key-type tag from the (implicitly cast) item type */
  def tagFor(dt: DataType): Byte = dt match {
    case LongType => SpaceSaving.TagLong
    case DoubleType => SpaceSaving.TagDouble
    case StringType => SpaceSaving.TagString
    case BinaryType => SpaceSaving.TagBinary
    case other => throw new IllegalArgumentException(s"unsupported item type $other")
  }
}

/** ss_topk_agg(item[, count][, capacity]) → serialized Space-Saving sketch.
  * Item dtypes mirror the reference's int64 / float64(bit-cast) / object
  * arms (space_saving.pyx:179-198) as Long / Double / String. */
case class SpaceSavingAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBase]
  with TernaryLike[Expression] with ImplicitCastInputTypes {

  def this(item: Expression) = this(item, Literal(1L), Literal(20))
  def this(item: Expression, count: Expression) = this(item, count, Literal(20))

  private lazy val capacity: Int = third.eval().asInstanceOf[Number].intValue()
  private lazy val tag: Byte = SpaceSavingAgg.tagFor(first.dataType)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, DoubleType, StringType, BinaryType), LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ss_topk_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "capacity must be a constant")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): SpaceSavingBase = {
    if (capacity <= 0) throw new IllegalArgumentException("capacity must be > 0")
    if (tag == SpaceSaving.TagString || tag == SpaceSaving.TagBinary)
      new SpaceSavingObj(capacity)
    else new SpaceSavingLong(capacity)
  }

  override def update(buf: SpaceSavingBase, input: InternalRow): SpaceSavingBase = {
    val v = first.eval(input)
    if (v != null) {
      val w = second.eval(input)
      if (w != null) {
        val c = w.asInstanceOf[Long]
        if (c <= 0) throw new IllegalArgumentException("count must be > 0")
        tag match {
          case SpaceSaving.TagLong =>
            buf.asInstanceOf[SpaceSavingLong].add(v.asInstanceOf[Long], c)
          case SpaceSaving.TagDouble =>
            buf.asInstanceOf[SpaceSavingLong]
              .add(SpaceSaving.doubleKey(v.asInstanceOf[Double]), c)
          case SpaceSaving.TagBinary =>
            buf.asInstanceOf[SpaceSavingObj]
              .add(SpaceSaving.binaryKey(v.asInstanceOf[Array[Byte]]), c)
          case _ =>
            buf.asInstanceOf[SpaceSavingObj].add(v.asInstanceOf[UTF8String].toString, c)
        }
      }
    }
    buf
  }

  override def merge(b1: SpaceSavingBase, b2: SpaceSavingBase): SpaceSavingBase = {
    (b1, b2) match {
      case (a: SpaceSavingLong, b: SpaceSavingLong) => a.merge(b)
      case (a: SpaceSavingObj, b: SpaceSavingObj) => a.merge(b)
      case _ => throw new IllegalStateException("mismatched space-saving buffers")
    }
    b1
  }

  override def eval(buf: SpaceSavingBase): Any = serialize(buf)
  override def serialize(buf: SpaceSavingBase): Array[Byte] = buf match {
    case a: SpaceSavingLong => a.serialize(tag)
    case a: SpaceSavingObj => a.serialize(tag)
  }
  override def deserialize(b: Array[Byte]): SpaceSavingBase = {
    val tag = SpaceSaving.deserializeTag(b)
    if (tag == SpaceSaving.TagString || tag == SpaceSaving.TagBinary)
      SpaceSaving.deserializeObj(b)
    else SpaceSaving.deserializeLong(b)
  }

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SpaceSavingAgg =
    copy(first = f, second = s, third = t)
}

/** exact_sum(x) → DoubleType: bit-reproducible distributed sum. The buffer
  * is a [[graft.core.ExactSum]] fixed-point superaccumulator, so the result
  * is the exact total rounded ONCE (ties to even) — identical bits for any
  * input order, partitioning, or merge tree, unlike the built-in `sum`
  * whose value drifts with fp addition order. Null for an empty/all-null
  * group, like stock sum. */
case class ExactSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExactSum]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "exact_sum"

  override def createAggregationBuffer(): ExactSum = new ExactSum

  override def update(buf: ExactSum, input: InternalRow): ExactSum = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: ExactSum, b2: ExactSum): ExactSum = {
    b1.merge(b2); b1
  }

  override def eval(buf: ExactSum): Any =
    if (buf.seen == 0L) null else buf.result()
  override def serialize(buf: ExactSum): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): ExactSum = ExactSum.deserialize(b)

  override def withNewMutableAggBufferOffset(n: Int): ExactSumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ExactSumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ExactSumAgg =
    copy(child = c)
}

/** Mutable Gram-moment buffer: per-dim sums + upper-triangle product
  * sums, as superaccumulators (`cells`, exact mode) or plain doubles
  * (`raw`). `d` is fixed by the first vector seen; exactly one of
  * cells/raw is non-null once initialized. */
final class GramBuffer(var d: Int, var n: Long, var cells: Array[ExactSum],
    var raw: Array[Double] = null)

/** gram_agg(vec) → one-pass exact second moments of a uniform-width
  * array<double> column: (n, terms[(i, −1, Σx_i) ++ (i, j≥i, Σx_i·x_j)]).
  *
  * The scan-side-explode formulation of the same moments generates
  * d(d+3)/2 structs PER ROW before the aggregation's map-side combine —
  * correct, but allocation-bound (measured 256 s for 500k×64-dim at
  * local[32]). This aggregate folds every term in place into a single
  * d(d+3)/2-cell ExactSum buffer per partition: no per-row allocation,
  * one buffer per partition ships through the shuffle, and every cell is
  * still a correctly-rounded function of the input multiset —
  * bit-identical results to the explode path under any partitioning.
  *
  * Vectors must share one width (ragged input → IllegalArgumentException;
  * nulls are skipped). Buffer size is d(d+3)/2 superaccumulators —
  * ~1–2 MB at d=64 — per PARTITION (global aggregate), not per group.
  *
  * `exact = false` swaps the superaccumulator cells for plain doubles:
  * the buffer shrinks ~16× (one double per cell — ~2.4 MB at d=768
  * instead of ~130 MB, which at 32 partitions is the difference between
  * 75 MB and 4 GB of aggregation state), at the cost of bit-exactness —
  * results then carry ordinary fp accumulation error (~1e-12 relative on
  * unit-scale embeddings) and can vary in the last ulps across
  * partitionings. Use it at encoder widths (d ≳ 128); the default stays
  * exact. */
case class GramAgg(
    child: Expression,
    exact: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("terms", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", DoubleType, nullable = false)))), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"

  private def nCells(d: Int): Int = d + d * (d + 1) / 2

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(-1, 0L, null)

  private def init(buf: GramBuffer, d: Int): Unit = {
    buf.d = d
    if (exact) buf.cells = Array.fill(nCells(d))(new ExactSum)
    else buf.raw = new Array[Double](nCells(d))
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      if (x.length > 0) {
        if (buf.d == -1) init(buf, x.length)
        require(x.length == buf.d,
          s"gram_agg: ragged vector widths (${x.length} vs ${buf.d})")
        val d = buf.d
        var i = 0
        var tri = d
        if (exact) {
          val cells = buf.cells
          while (i < d) {
            cells(i).add(x(i))
            var j = i
            while (j < d) { cells(tri).add(x(i) * x(j)); tri += 1; j += 1 }
            i += 1
          }
        } else {
          val raw = buf.raw
          while (i < d) {
            raw(i) += x(i)
            var j = i
            while (j < d) { raw(tri) += x(i) * x(j); tri += 1; j += 1 }
            i += 1
          }
        }
        buf.n += 1
      }
    }
    buf
  }

  override def merge(b1: GramBuffer, b2: GramBuffer): GramBuffer = {
    if (b2.d == -1) b1
    else if (b1.d == -1) b2
    else {
      require(b1.d == b2.d,
        s"gram_agg: ragged vector widths (${b1.d} vs ${b2.d})")
      var k = 0
      if (exact)
        while (k < b1.cells.length) { b1.cells(k).merge(b2.cells(k)); k += 1 }
      else
        while (k < b1.raw.length) { b1.raw(k) += b2.raw(k); k += 1 }
      b1.n += b2.n
      b1
    }
  }

  override def eval(buf: GramBuffer): Any = {
    val out = new GenericInternalRow(2)
    out.setLong(0, buf.n)
    if (buf.d == -1) {
      out.update(1, new GenericArrayData(Array.empty[Any]))
    } else {
      val d = buf.d
      def cell(k: Int): Double =
        if (exact) buf.cells(k).result() else buf.raw(k)
      val terms = new Array[Any](nCells(d))
      var i = 0
      while (i < d) {
        val r = new GenericInternalRow(3)
        r.setInt(0, i); r.setInt(1, -1)
        r.setDouble(2, cell(i))
        terms(i) = r
        i += 1
      }
      var tri = d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val r = new GenericInternalRow(3)
          r.setInt(0, i); r.setInt(1, j)
          r.setDouble(2, cell(tri))
          terms(tri) = r
          tri += 1; j += 1
        }
        i += 1
      }
      out.update(1, new GenericArrayData(terms))
    }
    out
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.d)
    if (buf.d != -1) {
      out.writeLong(buf.n)
      var k = 0
      if (exact) {
        while (k < buf.cells.length) {
          val b = buf.cells(k).serialize()
          out.writeInt(b.length); out.write(b)
          k += 1
        }
      } else {
        while (k < buf.raw.length) { out.writeDouble(buf.raw(k)); k += 1 }
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val d = in.readInt()
    if (d == -1) new GramBuffer(-1, 0L, null)
    else {
      val n = in.readLong()
      if (exact) {
        val cells = Array.tabulate(nCells(d)) { _ =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          ExactSum.deserialize(b)
        }
        new GramBuffer(d, n, cells)
      } else {
        val raw = Array.tabulate(nCells(d))(_ => in.readDouble())
        new GramBuffer(d, n, null, raw)
      }
    }
  }

  override def withNewMutableAggBufferOffset(n: Int): GramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): GramAgg =
    copy(child = c)
}

/** Mutable per-component exact-sum buffer: width fixed by the first
  * vector seen. */
final class VecSumBuffer(var d: Int, var n: Long, var cells: Array[ExactSum])

/** vec_exact_sum(vec) → array<double>: per-component bit-reproducible sums
  * of a uniform-width array<double> column.
  *
  * The d-separate-`exact_sum` formulation of the same reduction pays d
  * typed-imperative buffers, d serialization round-trips per partial, and
  * d expression evaluations of aggregate plumbing per row; this folds the
  * whole vector in place into ONE buffer per partition (d
  * superaccumulators, ~16 KB at d=64) — the gradient/centroid shape of
  * iterative fits. Each component is still correctly rounded, so results
  * are bit-identical to the d-aggregate path under any partitioning.
  *
  * Vectors must share one width (ragged input → IllegalArgumentException);
  * null rows are skipped; an empty/all-null group yields NULL. */
case class VecExactSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_exact_sum"

  override def createAggregationBuffer(): VecSumBuffer =
    new VecSumBuffer(-1, 0L, null)

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      if (buf.d == -1) {
        buf.d = x.length
        buf.cells = Array.fill(x.length)(new ExactSum)
      }
      require(x.length == buf.d,
        s"vec_exact_sum: ragged vector widths (${x.length} vs ${buf.d})")
      var i = 0
      while (i < buf.d) { buf.cells(i).add(x(i)); i += 1 }
      buf.n += 1
    }
    buf
  }

  override def merge(b1: VecSumBuffer, b2: VecSumBuffer): VecSumBuffer = {
    if (b2.d == -1) b1
    else if (b1.d == -1) b2
    else {
      require(b1.d == b2.d,
        s"vec_exact_sum: ragged vector widths (${b1.d} vs ${b2.d})")
      var k = 0
      while (k < b1.cells.length) { b1.cells(k).merge(b2.cells(k)); k += 1 }
      b1.n += b2.n
      b1
    }
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.d == -1) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.cells.map(_.result()))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.d)
    if (buf.d != -1) {
      out.writeLong(buf.n)
      var k = 0
      while (k < buf.cells.length) {
        val b = buf.cells(k).serialize()
        out.writeInt(b.length); out.write(b)
        k += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val d = in.readInt()
    if (d == -1) new VecSumBuffer(-1, 0L, null)
    else {
      val n = in.readLong()
      val cells = Array.tabulate(d) { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        ExactSum.deserialize(b)
      }
      new VecSumBuffer(d, n, cells)
    }
  }

  override def withNewMutableAggBufferOffset(n: Int): VecExactSumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecExactSumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): VecExactSumAgg =
    copy(child = c)
}

final class SSHolder(var tag: Byte, var s: SpaceSavingBase)

/** ss_merge_agg(sketch_col) → merged Space-Saving sketch (Cafaro merge S8). */
case class SpaceSavingMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SSHolder]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ss_merge_agg"

  override def createAggregationBuffer(): SSHolder = new SSHolder(-1, null)

  private def parse(b: Array[Byte]): (Byte, SpaceSavingBase) = {
    val tag = SpaceSaving.deserializeTag(b)
    val s: SpaceSavingBase =
      if (tag == SpaceSaving.TagString || tag == SpaceSaving.TagBinary)
        SpaceSaving.deserializeObj(b)
      else SpaceSaving.deserializeLong(b)
    (tag, s)
  }

  private def mergeInto(h: SSHolder, tag: Byte, other: SpaceSavingBase): Unit = {
    if (h.s == null) { h.tag = tag; h.s = other }
    else {
      require(h.tag == tag, "All arguments to merge must have same dtype")
      (h.s, other) match {
        case (a: SpaceSavingLong, b: SpaceSavingLong) => a.merge(b)
        case (a: SpaceSavingObj, b: SpaceSavingObj) => a.merge(b)
        case _ => throw new IllegalStateException("mismatched space-saving buffers")
      }
    }
  }

  override def update(buf: SSHolder, input: InternalRow): SSHolder = {
    val v = child.eval(input)
    if (v != null) {
      val (tag, s) = parse(v.asInstanceOf[Array[Byte]])
      mergeInto(buf, tag, s)
    }
    buf
  }

  override def merge(b1: SSHolder, b2: SSHolder): SSHolder = {
    if (b2.s != null) mergeInto(b1, b2.tag, b2.s)
    b1
  }

  override def eval(buf: SSHolder): Any =
    if (buf.s == null) null else serialize(buf)
  override def serialize(buf: SSHolder): Array[Byte] =
    if (buf.s == null) Array.emptyByteArray
    else buf.s match {
      case a: SpaceSavingLong => a.serialize(buf.tag)
      case a: SpaceSavingObj => a.serialize(buf.tag)
    }
  override def deserialize(b: Array[Byte]): SSHolder =
    if (b.isEmpty) new SSHolder(-1, null)
    else { val (t, s) = parse(b); new SSHolder(t, s) }

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): SpaceSavingMergeAgg =
    copy(child = c)
}
