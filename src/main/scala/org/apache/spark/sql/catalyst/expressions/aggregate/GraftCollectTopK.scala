package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Package-private bridge: Spark's `CollectTopK` (the bounded-priority-
 * queue top-k collector behind the pandas-API nsmallest/nlargest) is
 * `private[aggregate]`, so graft surfaces it through this accessor —
 * the standard extension-library pattern for reusing battle-tested
 * internal aggregates instead of reimplementing them.
 */
object GraftCollectTopK {
  def apply(child: Expression, num: Expression,
            reverse: Expression): CollectTopK =
    CollectTopK(child, CollectTopK.expressionToNum(num),
      CollectTopK.expressionToReverse(reverse))
}
