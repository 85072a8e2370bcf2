package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset aggregators (`Aggregator[IN, BUF, OUT]`) — the
  * case-class-Encoder counterpart of the expression-level
  * TypedImperativeAggregates in graft.expressions. State is integer-exact
  * so results are order-independent and oracle-comparable (a double-sum
  * aggregator would be run-dependent in its low bits). */
object TypedAggs {

  /** (cents, qty) running totals — both exact longs. */
  case class WAvgState(cents: Long, qty: Long)

  /** Exact average unit price in cents: sum(line cents) / sum(quantity),
    * rounded half-up at the very end (one double division of two exact
    * longs — deterministic in IEEE arithmetic, identical in DuckDB).
    * Input rows: (key, cents, qty). */
  object AvgUnitCents extends Aggregator[(String, Long, Long), WAvgState, Long] {
    override def zero: WAvgState = WAvgState(0L, 0L)
    override def reduce(b: WAvgState, a: (String, Long, Long)): WAvgState =
      WAvgState(b.cents + a._2, b.qty + a._3)
    override def merge(x: WAvgState, y: WAvgState): WAvgState =
      WAvgState(x.cents + y.cents, x.qty + y.qty)
    override def finish(b: WAvgState): Long =
      if (b.qty == 0L) 0L else Math.round(b.cents.toDouble / b.qty.toDouble)
    override def bufferEncoder: Encoder[WAvgState] = Encoders.product[WAvgState]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
