package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.UnigramLm

/** unigram_segment(word) → array<string>: Viterbi segmentation of a word
  * under a fixed integer-scored piece table (see [[UnigramLm.segment]] for
  * the exact DP + tie-break contract). The table rides the expression as
  * parallel arrays (serializable, value-equal for plan canonicalization)
  * and materializes once per executor as a HashMap; codegen calls the
  * static kernel through a referenced object, so the expression stays
  * inside whole-stage codegen like [[BloomMightContain]].
  *
  * Scale: applied to word-TYPE tables only (vocabulary-sized) — the corpus
  * never runs the DP (see [[graft.ops.Unigram]]). */
case class UnigramSegmentExpr(pieces: Array[String], scores: Array[Long],
    maxPieceLen: Int, child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(pieces.length == scores.length,
    "pieces and scores must be parallel arrays")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  @transient private lazy val table
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(scores(i))); i += 1
    }
    m
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override protected def nullSafeEval(input: Any): Any =
    UnigramLm.segmentUtf8(input.asInstanceOf[UTF8String], table, maxPieceLen)

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.core.UnigramLm.segmentUtf8($c, $ref, $maxPieceLen);")
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}
