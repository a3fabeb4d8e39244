package org.apache.spark.sql

import graft.expressions.{CosineSimilarity, Md5Prefix64, MinHash, PqDists, PqEncode, ShingleHashes}
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
    def ensure(name: String)(builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    ensure("graft_md5h")(children =>
      Md5Prefix64(children(0), children(1).eval().asInstanceOf[Number].intValue()))
    ensure("graft_cosine")(children =>
      CosineSimilarity(children(0), children(1)))
    // the full GraftExtensions scalar set (r15 review fix: the PQ queries
    // resolve graft_pq_dists/graft_pq_encode via call_function, so a
    // session without the extensions config needs them here too — the
    // registrar's whole reason to exist)
    ensure("graft_shingles")(children => ShingleHashes(children(0)))
    ensure("graft_minhash")(children => MinHash(children(0),
      children(1).eval().asInstanceOf[Number].longValue(),
      children(2).eval().asInstanceOf[Number].longValue()))
    ensure("graft_pq_dists")(children => PqDists(children(0), children(1)))
    ensure("graft_pq_encode")(children => PqEncode(children(0), children(1)))
    // sketch surface (same builders as GraftExtensions; q_sketch_* are
    // declared queries and must resolve here too)
    ensure("graft_bloom_agg") { children =>
      def asLong(e: Expression): Expression = e.dataType match {
        case org.apache.spark.sql.types.LongType => e
        case _ => org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.LongType)
      }
      children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, asLong(n))
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, asLong(n), asLong(b))
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(xxhash64(col)[, estimatedItems[, numBits]])")
      }
    }
    ensure("graft_bloom_contains")(children =>
      graft.expressions.BloomQuery(children(0), children(1)))
    ensure("graft_cms_query")(children =>
      graft.expressions.CmsQuery(children(0), children(1)))
    ensure("graft_bloom_union_agg")(children =>
      graft.expressions.BloomUnionAgg(children(0)))
    ensure("graft_cms_union_agg")(children =>
      graft.expressions.CmsUnionAgg(children(0)))
  }
}
