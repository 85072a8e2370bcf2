package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd perceptual-hash kernel for the multimodal stage. */
object MediaHashExprs {

  /** 64-bit average hash (aHash) over 64 evenly-spaced byte samples:
    * bit k = sample[k·n div 64] > integer mean of the 64 samples. The
    * declarative spelling of the same kernel
    * (transform → aggregate-mean → zip_with) evaluates INTERPRETED and,
    * after projection collapse, re-computes the mean sub-aggregate and
    * the sample transform inside every per-bit lambda — O(64² · |text|)
    * string walks per row (measured: 96 s for a 50-row fixture). This
    * one-pass kernel is the fix; the DuckDB oracle keeps the declarative
    * definition, so the fusion is oracle-proven equivalent. Bit 63 is
    * `1L << 63` = Long.MinValue — the same value the SQL side spells as
    * the explicit min-long literal (DuckDB's checked shift refuses
    * 1<<63). Empty input → 0 (callers filter n > 0). */
  def aHash64(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return 0L
    val samples = new Array[Long](64)
    var sum = 0L
    var k = 0
    while (k < 64) {
      val v = b(((k.toLong * n) / 64).toInt) & 0xffL
      samples(k) = v; sum += v; k += 1
    }
    val mean = sum / 64
    var h = 0L
    k = 0
    while (k < 64) { if (samples(k) > mean) h |= (1L << k); k += 1 }
    h
  }
}

/** Column expression: string → 64-bit aHash (see MediaHashExprs.aHash64). */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    MediaHashExprs.aHash64(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MediaHashExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.aHash64($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
