package org.apache.spark.sql

import graft.expressions.{CosineSimilarity, Md5Prefix64}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions._

/** Session-independent registration of the graft functions.
  *
  * The supported path is `spark.sql.extensions=graft.expressions
  * .GraftExtensions` (set by Verify/Bench/tests); this registrar is the
  * safety net for sessions built without it — `FunctionRegistry` is
  * `private[sql]`, hence the package placement. Idempotent; called from
  * `graft.Tables` so any declared query resolves in any session.
  */
object GraftRegistrar {
  // register() is called from graft.Tables on EVERY table read; skip the
  // registry write (and its "function replaced" WARN per call) once this
  // session has the functions. Weak keys: a dropped session must not be
  // pinned by the guard set.
  private val done =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = done.synchronized {
    if (!done.contains(spark)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_md5h",
        (children: Seq[Expression]) =>
          Md5Prefix64(children(0), children(1).eval().asInstanceOf[Number].intValue()),
        "scala_udf")
      reg.createOrReplaceTempFunction("graft_cosine",
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)),
        "scala_udf")
      done.add(spark)
    }
  }
}
