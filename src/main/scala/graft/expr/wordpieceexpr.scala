package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.WordpieceLm

/** wordpiece_segment(word) → array<string>: greedy longest-match-first
  * segmentation of a word under a fixed WordPiece vocabulary (see
  * [[WordpieceLm.segment]] for the exact contract — `##` continuation
  * prefix, whole-word `[UNK]` on any unmatched position). The vocabulary
  * rides the expression as an array (serializable, value-equal for plan
  * canonicalization) and materializes once per executor as a HashSet;
  * codegen calls the static kernel, so the expression stays inside
  * whole-stage codegen like [[UnigramSegmentExpr]].
  *
  * Scale: applied to word-TYPE tables only (vocabulary-sized) — the
  * corpus never runs the matcher (see [[graft.ops.Wordpiece]]). */
case class WordpieceSegmentExpr(vocab: Array[String], maxContentLen: Int,
    child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(maxContentLen >= 1, "maxContentLen must be >= 1")

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { s.add(vocab(i)); i += 1 }
    s
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_segment"

  override protected def nullSafeEval(input: Any): Any =
    WordpieceLm.segmentUtf8(input.asInstanceOf[UTF8String], table,
      maxContentLen)

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceVocab", table,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.core.WordpieceLm.segmentUtf8($c, $ref, " +
        s"$maxContentLen);")
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}
