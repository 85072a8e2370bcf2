package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.StopwordCount

/** Auto-kernelization optimizer rule (injected via
  * [[graft.GraftExtensions]]): rewrites the interpreted higher-order
  * pattern `size(filter(arr, t -> t IN ('w1','w2',…)))` into the
  * codegen'd [[StopwordCount]] kernel.
  *
  * Why a Rule and not "just call the kernel": the kernel IS called by this
  * library's own operators (TextOps), but ad-hoc SQL written by users of
  * the engine naturally lands on the HOF form — and Spark's higher-order
  * functions are CodegenFallback, costing ~3µs/row of interpreted lambda
  * dispatch plus a broken codegen span. The rule makes the idiomatic SQL
  * get the kernel's generated loop automatically; at 100 TB that is the
  * difference between a membership-count scan at parquet speed and one
  * bottlenecked on per-row closure evaluation.
  *
  * Semantics guarded: only fires when the membership list is all string
  * literals (both the pre-optimization `In` and the post-OptimizeIn
  * `InSet` forms), the lambda variable is exactly the filter's element,
  * and `size` is in non-legacy mode — `size(NULL)=NULL` then, matching
  * the kernel's null-propagation; the result is cast back to `size`'s
  * IntegerType so the rewrite is type-invisible. */
object KernelizeStopwordCount extends Rule[LogicalPlan] {

  private def stringWords(list: Seq[Expression]): Option[Seq[String]] = {
    val ws = list.collect { case Literal(s: UTF8String, StringType) => s.toString }
    if (ws.length == list.length && ws.nonEmpty) Some(ws) else None
  }

  private def wordsOf(body: Expression, lv: NamedLambdaVariable): Option[Seq[String]] =
    body match {
      case In(v: NamedLambdaVariable, list) if v.exprId == lv.exprId =>
        stringWords(list)
      case InSet(v: NamedLambdaVariable, hset)
          if v.exprId == lv.exprId && hset.nonEmpty &&
            hset.forall(_.isInstanceOf[UTF8String]) =>
        // set order is irrelevant to the kernel's HashSet membership
        Some(hset.map(_.asInstanceOf[UTF8String].toString).toSeq)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayFilter(arg, LambdaFunction(body, Seq(lv: NamedLambdaVariable), _)), false)
        if arg.dataType.isInstanceOf[ArrayType] &&
          arg.dataType.asInstanceOf[ArrayType].elementType == StringType =>
      wordsOf(body, lv) match {
        case Some(words) => Cast(StopwordCount(arg, words), IntegerType)
        case None => s
      }
  }
}
