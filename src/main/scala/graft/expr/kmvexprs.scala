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
