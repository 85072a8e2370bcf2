package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels. Spark's higher-order functions (`aggregate`,
  * `transform`) are interpreted, and fully unrolled expression trees blow
  * past JIT method limits — a tight generated loop is the shape that stays
  * fast. All kernels accumulate sequentially from 0.0 (p1, then p2, …), the
  * same order as `list_reduce(list_prepend(0.0, …))` in the DuckDB oracle,
  * so doubles are bit-identical across engines.
  */

/** Dot product of two float-array columns, accumulated in double. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var k = 0
    while (k < n) {
      s += x.getFloat(k).toDouble * y.getFloat(k).toDouble
      k += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val k = ctx.freshName("k")
      s"""
        final int $n = Math.min($x.numElements(), $y.numElements());
        double $s = 0.0;
        for (int $k = 0; $k < $n; $k++) {
          $s += (double) $x.getFloat($k) * (double) $y.getFloat($k);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket id: nPlanes sign bits of plane·vec, planes
  * derived arithmetically — component(j, i) for 1-based dim index i is
  * (((j*73856093 + i*19349663) % 2001) - 1000) / 1000.0, identical to the
  * SQL oracle's derivation. */
case class LshBucket(child: Expression, nPlanes: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  private def bucketOf(v: ArrayData): Long = {
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var d = 0.0
      var k = 0
      while (k < n) {
        val i = k + 1L
        val c = (((j * 73856093L + i * 19349663L) % 2001L) - 1000L) / 1000.0
        d += c * v.getFloat(k).toDouble
        k += 1
      }
      if (d >= 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  override def nullSafeEval(a: Any): Any = bucketOf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
        final int $n = $v.numElements();
        long $bucket = 0L;
        for (int $j = 0; $j < $nPlanes; $j++) {
          double $d = 0.0;
          for (int $k = 0; $k < $n; $k++) {
            final long $i = $k + 1L;
            final double $c = ((($j * 73856093L + $i * 19349663L) % 2001L) - 1000L) / 1000.0;
            $d += $c * (double) $v.getFloat($k);
          }
          if ($d >= 0) $bucket += (1L << $j);
        }
        ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmin over k integer centroids for a quantized `array<long>` vector:
  * index of the centroid minimizing Σ_d (v_d − c_d)², ties → lowest index
  * (strict `<` while scanning ascending). Centroids are embedded in the
  * plan as a flat reference array — one expression node instead of the
  * k·dim-literal `when`-fold tree, which costs seconds of analysis per
  * k-means iteration and falls back to interpreted HOF eval. */
case class NearestCentroidLong(child: Expression, centroids: Seq[Seq[Long]])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val k = centroids.length
  private lazy val dim = if (centroids.isEmpty) 0 else centroids.head.length
  private lazy val flat: Array[Long] = centroids.flatten.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var best = Long.MaxValue
    var bestIdx = 0
    var j = 0
    while (j < k) {
      val off = j * dim
      var s = 0L
      var i = 0
      while (i < n) { val d = v.getLong(i) - flat(off + i); s += d * d; i += 1 }
      if (s < best) { best = s; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("cents", flat, "long[]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        final int $n = Math.min($v.numElements(), $dim);
        long $best = Long.MAX_VALUE;
        int $bestIdx = 0;
        for (int $j = 0; $j < $k; $j++) {
          final int $off = $j * $dim;
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            final long $d = $v.getLong($i) - $cents[$off + $i];
            $s += $d * $d;
          }
          if ($s < $best) { $best = $s; $bestIdx = $j; }
        }
        ${ev.value} = $bestIdx;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial fold over a long-array column:
  * h ← (h*31 + x) mod 1e9+7, seed 0 — the document-fingerprint kernel
  * (mirrors DuckDB list_reduce with a prepended 0 seed). */
case class PolyFold(child: Expression) extends UnaryExpression {

  private val P = 1000000007L

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var h = 0L
    var k = 0
    while (k < n) { h = (h * 31L + xs.getLong(k)) % P; k += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      s"""
        final int $n = $xs.numElements();
        long $h = 0L;
        for (int $k = 0; $k < $n; $k++) {
          $h = ($h * 31L + $xs.getLong($k)) % ${P}L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
