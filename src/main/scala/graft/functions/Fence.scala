package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import graft.functions.expressions.OptimizerFence

/** Column-level entry for [[expressions.OptimizerFence]]: `Fence(c)`
  * evaluates exactly like `c` but the optimizer will not inline, fold,
  * duplicate, or push predicates through its definition. Use on
  * expensive operator-output columns whose contract is "computed once,
  * then consumed as data". */
object Fence {
  def apply(c: Column): Column = column(OptimizerFence(expression(c)))
}
