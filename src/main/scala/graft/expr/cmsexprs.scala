package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.{AbstractDataType, TypeCollection}
import org.apache.spark.sql.types._

import graft.agg.CmsKey
import graft.core.CountMin

/** cms_count(sketch, item) → long: the Count-Min point estimate for
  * `item` — an overestimate of the true count by at most εN w.h.p.
  * The item routes through the same key arms the aggregate used. */
case class CmsCount(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = {
    val itemType = right.dataType match {
      case FloatType | DoubleType | _: DecimalType => DoubleType
      case ByteType | ShortType | IntegerType | LongType => LongType
      case BinaryType => BinaryType
      case StringType => StringType
      case _ => TypeCollection(LongType, DoubleType, StringType, BinaryType)
    }
    Seq(BinaryType, itemType)
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_count"
  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    CountMin.deserialize(sketch.asInstanceOf[Array[Byte]])
      .estimate(CmsKey.ofAny(right.dataType, item))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cms_total(sketch) → long: total weight the sketch has absorbed. */
case class CmsTotal(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_total"
  override protected def nullSafeEval(sketch: Any): Any =
    CountMin.deserialize(sketch.asInstanceOf[Array[Byte]]).total
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
