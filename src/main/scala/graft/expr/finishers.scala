package graft.expr

import graft.core._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar finalizer expressions over serialized sketches (SURVEY.md §2 T5–T12,
  * S5–S6). These run post-aggregation on a handful of rows, so per-call
  * deserialization is cheap relative to the aggregation itself; the array
  * variants amortize one query-prep pass over all probes
  * (tdigest_stubs.c:560). */

/** tdigest_quantile(sketch, q) → double (T5, tdigest_stubs.c:483-516). */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_quantile"
  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
      .quantile(q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_quantiles(sketch, array<double>) → array<double> (T5 vectorized). */
case class TDigestQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_quantiles"
  override protected def nullSafeEval(sketch: Any, qs: Any): Any = {
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    val arr = qs.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(t.quantiles(arr))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_cdf(sketch, x) → double (T6, tdigest_stubs.c:355-407). */
case class TDigestCdf(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_cdf"
  override protected def nullSafeEval(sketch: Any, x: Any): Any =
    TDigest.deserialize(sketch.asInstanceOf[Array[Byte]]).cdf(x.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_cdfs(sketch, array<double>) → array<double>. */
case class TDigestCdfs(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_cdfs"
  override protected def nullSafeEval(sketch: Any, xs: Any): Any = {
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    new GenericArrayData(t.cdfs(xs.asInstanceOf[ArrayData].toDoubleArray()))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_histogram(sketch, bins) → struct(hist array<double>,
  * edges array<double>) (T7, tdigest.pyx:165-229). */
case class TDigestHistogram(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("hist", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("edges", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "tdigest_histogram"
  override protected def nullSafeEval(sketch: Any, bins: Any): Any = {
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    val nb = bins.asInstanceOf[Int]
    if (nb < 1) throw new IllegalArgumentException("bins must be >= 1")
    val edges = t.histogramEdges(nb)
    val hist = t.histogram(edges)
    val row = new GenericInternalRow(2)
    row.update(0, new GenericArrayData(hist))
    row.update(1, new GenericArrayData(edges))
    row
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_histogram_at(sketch, array<double> edges) → array<double> hist. */
case class TDigestHistogramAt(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_histogram_at"
  override protected def nullSafeEval(sketch: Any, edgesAny: Any): Any = {
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    val edges = edgesAny.asInstanceOf[ArrayData].toDoubleArray()
    require(edges.length >= 2, "need at least 2 edges")
    var i = 1
    while (i < edges.length) {
      require(edges(i) >= edges(i - 1), "bins must increase monotonically"); i += 1
    }
    new GenericArrayData(t.histogram(edges))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_scale(sketch, factor) → sketch (T12, tdigest_stubs.c:609-629). */
case class TDigestScale(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tdigest_scale"
  override protected def nullSafeEval(sketch: Any, factor: Any): Any = {
    val f = factor.asInstanceOf[Double]
    // reference contract (tdigest.pyx:326-340): factor must be finite and > 0
    if (f <= 0 || java.lang.Double.isNaN(f) || java.lang.Double.isInfinite(f))
      throw new IllegalArgumentException("factor must be finite and > 0")
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    t.scaleInPlace(f)
    t.serialize()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** tdigest_centroids(sketch) → array<struct<mean,weight>> (T10). */
case class TDigestCentroids(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("mean", DoubleType, nullable = false),
    StructField("weight", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "tdigest_centroids"
  override protected def nullSafeEval(sketch: Any): Any = {
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    t.flush()
    val out = new Array[Any](t.nCentroids)
    var i = 0
    while (i < t.nCentroids) {
      val r = new GenericInternalRow(2)
      r.setDouble(0, t.means(i)); r.setDouble(1, t.weights(i))
      out(i) = r
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** tdigest_size/min/max(sketch) → double (T8–T9). */
case class TDigestStat(child: Expression, stat: String)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"tdigest_$stat"
  override protected def nullSafeEval(sketch: Any): Any = {
    val t = TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
    stat match {
      case "size" => t.totalSize
      case "min" => t.minOrNaN
      case "max" => t.maxOrNaN
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SSTopK {
  def itemTypeFor(tag: Byte): DataType = tag match {
    case SpaceSaving.TagLong => LongType
    case SpaceSaving.TagDouble => DoubleType
    case SpaceSaving.TagBinary => BinaryType
    case _ => StringType
  }
}

/** ss_topk(sketch, k) → array<struct<item,count,error>> (S5,
  * space_saving.pyx:304-341). The item field type is fixed per function
  * variant (long/double/string), mirroring the reference's dtype arms. */
case class SSTopK(left: Expression, right: Expression, itemType: DataType)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", itemType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ss_topk"

  override protected def nullSafeEval(sketch: Any, kAny: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val k = kAny.asInstanceOf[Int]
    if (k < 0) throw new IllegalArgumentException("k must be >= 0")
    val tag = SpaceSaving.deserializeTag(bytes)
    val expected = SSTopK.itemTypeFor(tag)
    require(expected == itemType,
      s"sketch holds ${expected.simpleString} items; use the matching " +
        s"ss_topk variant (got ${itemType.simpleString})")
    val rows: Array[Any] = if (tag == SpaceSaving.TagString || tag == SpaceSaving.TagBinary) {
      val s = SpaceSaving.deserializeObj(bytes)
      s.topkSlots(k).map { i =>
        val r = new GenericInternalRow(3)
        if (itemType == BinaryType) r.update(0, SpaceSaving.keyToBinary(s.items(i)))
        else r.update(0, UTF8String.fromString(s.items(i)))
        r.setLong(1, s.counts(i)); r.setLong(2, s.errors(i))
        r: Any
      }
    } else {
      val s = SpaceSaving.deserializeLong(bytes)
      s.topkSlots(k).map { i =>
        val r = new GenericInternalRow(3)
        if (tag == SpaceSaving.TagDouble && itemType == DoubleType)
          r.setDouble(0, SpaceSaving.keyToDouble(s.items(i)))
        else if (itemType == DoubleType) r.setDouble(0, s.items(i).toDouble)
        else r.setLong(0, s.items(i))
        r.setLong(1, s.counts(i)); r.setLong(2, s.errors(i))
        r: Any
      }
    }
    new GenericArrayData(rows)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ss_capacity(sketch) → int: configured capacity (S7). */
case class SSCapacity(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ss_capacity"
  override protected def nullSafeEval(sketch: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    SpaceSaving.deserializeTag(bytes) // validates header
    java.nio.ByteBuffer.wrap(bytes, 1, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ss_size(sketch) → int: number of active counters (S7). */
case class SSSize(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ss_size"
  override protected def nullSafeEval(sketch: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val tag = SpaceSaving.deserializeTag(bytes)
    if (tag == SpaceSaving.TagString || tag == SpaceSaving.TagBinary)
      SpaceSaving.deserializeObj(bytes).size
    else SpaceSaving.deserializeLong(bytes).size
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
