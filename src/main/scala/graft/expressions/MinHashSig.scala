package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd MinHash signature over a shingle-hash set column.
  *
  * For permutation i in [0, nPerm): sig[i] = min over shingle hashes h of
  * (a_i·h + b_i) mod P with a_i = 2i+1, b_i = (i·2654435761) mod P,
  * P = 1e9+7 — the same universal-hash family as ops.HashOps.permute, so
  * results are identical to the higher-order-function formulation and to
  * the DuckDB oracle's arithmetic.
  *
  * Inputs are reduced into [0, P) first (Math.floorMod), so arbitrary
  * longs fed through the registered SQL function `graft_minhash` cannot
  * overflow the a·h multiply — for ShingleHashSet output (already in
  * [0, P)) the reduction is the identity and results are unchanged.
  *
  * Why an Expression: `transform`+`array_min` higher-order functions fall
  * back to interpreted eval in Spark; this loop (nPerm × |shingles| fused
  * multiply-add-min, no allocation) runs inside whole-stage codegen —
  * the difference between an interpreted lambda dispatch per element and a
  * tight register loop at 100 TB.
  *
  * Null/empty input → null (docs with no shingles carry no signature).
  */
case class MinHashSig(child: Expression, nPerm: Int)
  extends UnaryExpression {

  private val P = 1000000007L
  private val MULT = 2654435761L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val hs = arr.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sig = new Array[Long](nPerm)
    var i = 0
    while (i < nPerm) {
      val a = 2L * i + 1L
      val b = (i * MULT) % P
      var m = Long.MaxValue
      var k = 0
      while (k < n) {
        val v = (a * Math.floorMod(hs.getLong(k), P) + b) % P
        if (v < m) m = v
        k += 1
      }
      sig(i) = m
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrClass = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
        final int $n = $hs.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        } else {
          long[] $sig = new long[$nPerm];
          for (int $i = 0; $i < $nPerm; $i++) {
            final long $a = 2L * $i + 1L;
            final long $b = ($i * ${MULT}L) % ${P}L;
            long $m = Long.MAX_VALUE;
            for (int $k = 0; $k < $n; $k++) {
              final long $v = ($a * java.lang.Math.floorMod($hs.getLong($k), ${P}L) + $b) % ${P}L;
              if ($v < $m) $m = $v;
            }
            $sig[$i] = $m;
          }
          ${ev.value} = new $arrClass($sig);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
