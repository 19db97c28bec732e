package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ⇄ Expression
  * converters (`classic.ExpressionUtils`), so graft's native expressions
  * can be wrapped into Columns DIRECTLY instead of smuggling their
  * configuration through `call_function` literals — the round-15 fix for
  * the argmax model's ~34 MB typedlit transient (r14 ADVICE). Lives in
  * the `org.apache.spark.sql` package solely for access; uses only the
  * public Spark distribution on the classpath.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
