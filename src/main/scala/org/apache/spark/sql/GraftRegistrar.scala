package org.apache.spark.sql

import graft.expressions.GraftFunctions
import org.apache.spark.sql.classic.ClassicConversions._

/** Session-independent registration of the graft functions.
  *
  * The supported path is `spark.sql.extensions=graft.expressions
  * .GraftExtensions` (set by Verify/Bench/tests); this registrar is the
  * safety net for sessions built without it — `FunctionRegistry` is
  * `private[sql]`, hence the package placement. Idempotent; called from
  * `graft.Tables` so any declared query resolves in any session.
  *
  * Builders come from [[graft.expressions.GraftFunctions.builders]] —
  * the SAME table GraftExtensions injects, so the two registration
  * paths cannot drift (review r15: they had already diverged once,
  * silently dropping the PQ and sketch functions here).
  */
object GraftRegistrar {
  // register() is called from graft.Tables on EVERY table read. Guard on
  // the registry's OWN state (not a one-shot memo): registering only when
  // a function is absent kills the per-read "function replaced" WARN pair
  // while keeping the safety net self-healing — a later DROP TEMPORARY
  // FUNCTION or catalog reset makes the next table read re-register.
  // Known trade (adjudicated r14): if some OTHER code already bound these
  // exact names in a shared session, absence-guarding keeps the foreign
  // binding instead of replacing it. Acceptable because the graft_ prefix
  // is repo-private; revisit with a builder-identity compare if these
  // names are ever published.
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftFunctions.builders.foreach { case (name, exprClass, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      // registerFunction (not createOrReplaceTempFunction) so the
      // ExpressionInfo carries the implementing expression class — the
      // convenience wrapper would stamp the builder lambda's class into
      // DESCRIBE FUNCTION output (review r16)
      if (!reg.functionExists(id))
        reg.registerFunction(id,
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(exprClass, name),
          builder)
    }
  }
}
