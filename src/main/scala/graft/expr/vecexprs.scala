package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{AbstractDataType, TypeCollection}
import org.apache.spark.sql.types._

/** Dense-vector expressions over ArrayType(Float|Double) embedding columns.
  *
  * Embedding similarity at 100 TB means billions of evals; these operate on
  * the columnar ArrayData primitive buffers directly (no boxing, no
  * per-element Catalyst dispatch) and accept float arrays natively so parquet
  * `list<float>` columns are not widened to double arrays row-by-row.
  */
object VecExprs {
  val vecType: AbstractDataType = TypeCollection(
    ArrayType(FloatType), ArrayType(DoubleType))

  /** Copy an ArrayData of float or double into a double[] without boxing. */
  def toDoubles(a: ArrayData, elem: DataType): Array[Double] = elem match {
    case FloatType =>
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i); i += 1 }
      out
    case _ => a.toDoubleArray()
  }

  @inline def dot(x: Array[Double], y: Array[Double]): Double = {
    require(x.length == y.length,
      s"vector length mismatch: ${x.length} vs ${y.length}")
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  @inline def norm(x: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  def cosine(x: Array[Double], y: Array[Double]): Double = {
    val nx = norm(x); val ny = norm(y)
    if (nx == 0.0 || ny == 0.0) 0.0 else dot(x, y) / (nx * ny)
  }

  /** Deterministic pseudo-random hyperplane component for SRP-LSH: a
    * symmetric uniform value in [-1, 1) derived from (seed, plane, dim). */
  @inline def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    val h = TextHash.avalanche(seed ^ (plane.toLong << 32) ^ (dim.toLong * 0x9e3779b97f4a7c15L))
    (h >> 11) * (1.0 / (1L << 52)) // 53-bit mantissa → [-1, 1)
  }
}

abstract class BinaryVecExpression extends BinaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(VecExprs.vecType, VecExprs.vecType)
  override def dataType: DataType = DoubleType
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  /** primitive ArrayData getter snippet for codegen (no boxing, no copy) */
  protected def getter(e: Expression, arr: String, i: String): String =
    if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"
  protected def compute(x: Array[Double], y: Array[Double]): Double
  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(
      VecExprs.toDoubles(a.asInstanceOf[ArrayData], elemType(left)),
      VecExprs.toDoubles(b.asInstanceOf[ArrayData], elemType(right)))
}

/** vec_dot(a, b) → double. Whole-stage-codegen'd primitive loop directly over
  * the columnar ArrayData — the billions-of-evals hot path for similarity
  * join/search stays inside Tungsten codegen with zero allocation. */
case class VecDot(left: Expression, right: Expression) extends BinaryVecExpression {
  override def prettyName: String = "vec_dot"
  override protected def compute(x: Array[Double], y: Array[Double]): Double =
    VecExprs.dot(x, y)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("vector length mismatch: " +
         |    $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** vec_cosine(a, b) → double in [-1, 1]; 0.0 when either vector is zero.
  * Single codegen'd loop computes dot and both norms together. */
case class VecCosine(left: Expression, right: Expression) extends BinaryVecExpression {
  override def prettyName: String = "vec_cosine"
  override protected def compute(x: Array[Double], y: Array[Double]): Double =
    VecExprs.cosine(x, y)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("vector length mismatch: " +
         |    $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xa = ${getter(left, a, i)};
         |  final double $xb = ${getter(right, b, i)};
         |  $s += $xa * $xb; $na += $xa * $xa; $nb += $xb * $xb;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $s / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** vec_norm(a) → double: L2 norm (codegen'd primitive loop). */
case class VecNorm(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(VecExprs.vecType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(a: Any): Any =
    VecExprs.norm(VecExprs.toDoubles(a.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType))
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { final double $x = $get; $s += $x * $x; }
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** srp_signature(vec, bits, seed) → long: signed-random-projection LSH
  * signature. bit b = sign(vec · H_b) for `bits` deterministic pseudo-random
  * hyperplanes H_b derived from the seed. Cosine-similar vectors collide with
  * probability 1 − θ/π per bit — the bucketing primitive for distributed
  * similarity join (band over the bits, shuffle on (band, band_bits)). */
case class SrpSignature(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(VecExprs.vecType, IntegerType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_signature"

  override protected def nullSafeEval(v: Any, bitsAny: Any, seedAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[Int]
    require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
    val seed = seedAny.asInstanceOf[Long]
    val x = VecExprs.toDoubles(v.asInstanceOf[ArrayData],
      first.dataType.asInstanceOf[ArrayType].elementType)
    var sig = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var d = 0
      while (d < x.length) { s += x(d) * VecExprs.planeComponent(seed, b, d); d += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** nearest_centroids(vec, centroids, nProbe) → array<int>: indices of the
  * nProbe nearest centroids by cosine distance, nearest first. `centroids`
  * must be foldable (an array<array<float|double>> literal — the IVF
  * codebook, broadcast inside the plan); it is decoded once per task, so
  * the per-row cost is one pass over the codebook. */
case class NearestCentroids(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(VecExprs.vecType, ArrayType(ArrayType(DoubleType)), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (super.checkInputDataTypes().isFailure) super.checkInputDataTypes()
    else if (!second.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "centroids must be a constant codebook")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  /** codebook rows normalized to unit length, decoded once */
  @transient private lazy val codebook: Array[Array[Double]] = {
    val arr = second.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      val v = arr.getArray(i).toDoubleArray()
      val n = VecExprs.norm(v)
      if (n == 0.0) v else v.map(_ / n)
    }
  }

  override protected def nullSafeEval(v: Any, centroidsAny: Any, kAny: Any): Any = {
    val nProbe = math.min(kAny.asInstanceOf[Int], codebook.length)
    require(nProbe >= 1, "nProbe must be >= 1")
    val x0 = VecExprs.toDoubles(v.asInstanceOf[ArrayData],
      first.dataType.asInstanceOf[ArrayType].elementType)
    val nx = VecExprs.norm(x0)
    val x = if (nx == 0.0) x0 else x0.map(_ / nx)
    // top-nProbe by cosine via insertion into small sorted arrays
    val bestIdx = new Array[Int](nProbe)
    val bestSim = Array.fill(nProbe)(Double.NegativeInfinity)
    var c = 0
    while (c < codebook.length) {
      val s = VecExprs.dot(x, codebook(c))
      if (s > bestSim(nProbe - 1)) {
        var j = nProbe - 1
        while (j > 0 && bestSim(j - 1) < s) {
          bestSim(j) = bestSim(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestSim(j) = s; bestIdx(j) = c
      }
      c += 1
    }
    // non-finite vectors (NaN dot everywhere) fill nothing: fall back to the
    // first nProbe indices so probes stay distinct instead of nProbe zeros
    if (bestSim(0) == Double.NegativeInfinity) {
      var j = 0
      while (j < nProbe) { bestIdx(j) = j; j += 1 }
    }
    new GenericArrayData(bestIdx.map(i => i: Any))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}
