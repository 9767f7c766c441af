package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._

import graft.core.KmvSketch

/** kmv_distinct(sketch) → double: distinct-count estimate (exact — the true
  * count — while the sketch holds fewer than k hashes). */
case class KmvDistinct(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"
  override protected def nullSafeEval(sketch: Any): Any =
    KmvSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).estimateDistinct
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** kmv_size(sketch) → int: retained hash count (= distinct count when < k). */
case class KmvSize(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "kmv_size"
  override protected def nullSafeEval(sketch: Any): Any =
    KmvSketch.deserialize(sketch.asInstanceOf[Array[Byte]]).size
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** kmv_set_ops(a, b) → struct<union_d, intersect_d, jaccard, union_se,
  * intersect_se, exact>: distinct-size estimates for the union and
  * intersection of the two sketched sets with standard errors (Beyer et
  * al. §4 ratio estimator; see [[KmvSketch.setOps]]). Exact — true counts,
  * zero se — while both sketches and their union are below capacity. */
case class KmvSetOpsExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("a_d", DoubleType, nullable = false),
    StructField("b_d", DoubleType, nullable = false),
    StructField("union_d", DoubleType, nullable = false),
    StructField("intersect_d", DoubleType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false),
    StructField("contain_a", DoubleType, nullable = false),
    StructField("contain_b", DoubleType, nullable = false),
    StructField("union_se", DoubleType, nullable = false),
    StructField("intersect_se", DoubleType, nullable = false),
    StructField("exact", BooleanType, nullable = false)))
  override def prettyName: String = "kmv_set_ops"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = KmvSketch.setOps(
      KmvSketch.deserialize(a.asInstanceOf[Array[Byte]]),
      KmvSketch.deserialize(b.asInstanceOf[Array[Byte]]))
    org.apache.spark.sql.catalyst.InternalRow(
      r.aD, r.bD, r.unionD, r.intersectD, r.jaccard, r.containA, r.containB,
      r.unionSe, r.intersectSe, r.exact)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** kmv_jaccard(a, b) → double: Jaccard similarity of the two sketched value
  * sets (exact when both sketches are exact and their union fits k). */
case class KmvJaccard(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.jaccard(
      KmvSketch.deserialize(a.asInstanceOf[Array[Byte]]),
      KmvSketch.deserialize(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
