package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(serializedBloom, hash64Key) → boolean.
  *
  * Membership probe against a driver-built `BloomFilter` shipped to
  * executors as part of the expression (a few MB for hundreds of millions
  * of keys at 1% fpp — task-broadcast like any literal). The filter is
  * deserialized ONCE per executor ((at)transient lazy), and the probe itself
  * is codegen'd to a direct `mightContainLong` call, so the hot path stays
  * inside whole-stage codegen with zero per-row allocation.
  *
  * The key must already be a 64-bit hash (e.g. `xxhash64(key)`) and the
  * filter must have been built by putting the SAME hash values — mirroring
  * Spark's own runtime-filter design (BloomFilterMightContain over
  * XxHash64), which keeps one code path for any key type.
  */
case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
