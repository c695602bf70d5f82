package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Injects the engine's native expressions into a session's function
  * registry so plain SQL can call them:
  *
  *   spark.sql("SELECT cosine_sim(a.e, b.e) FROM ...")
  *
  * Wire-up (either):
  *   - spark.conf: `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - programmatic: `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      { exprs =>
        require(exprs.length == 2, "cosine_sim(arrayA, arrayB) takes 2 arguments")
        CosineSim(exprs.head, exprs(1))
      })
  )

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
