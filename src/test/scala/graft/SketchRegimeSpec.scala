package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regeneration tripwire for the sketch oracles (r14, judge item 3).
  *
  * Several sketch queries state EXACT values in their DuckDB oracles, valid
  * only while the driver-generated testdata sits inside each sketch's
  * provably-exact regime. If the driver regenerates testdata with a larger
  * key domain, those oracles flip to hard hash-compare failures that read
  * as engine bugs. This spec computes the ACTUAL margins from the loaded
  * tables and fails loudly — "testdata left the sketch's exact regime;
  * regenerate oracle" — so drift is caught in `sbt test` before the
  * driver's gate ever sees a mismatch. (Mirrors what the r13 bloom and r14
  * HLL contract-boolean conversions did for the user-cardinality axis:
  * those oracles now hold at ANY scale, so the remaining regime-bound
  * surface is the event_type domain plus the HLL set-mode envelope that
  * SemanticsSpec's tight 2% assertion leans on.)
  */
class SketchRegimeSpec extends SparkSpec {

  /** Empty = the events table is inside every regime the sketch oracles
    * and tight spec envelopes assume. Each message names the oracle it
    * protects and the measured margin. */
  private def violations(events: DataFrame): Seq[String] = {
    val row = events
      .agg(count_distinct(col("event_type")).as("types"),
           count_distinct(col("user_id")).as("users"))
      .head()
    val types = row.getLong(0)
    val users = row.getLong(1)
    val out = Seq.newBuilder[String]
    // q_sketch_topk lists ALL event types through approx_top_k(…, k=5):
    // a 6th type makes the oracle's full GROUP BY return more rows than
    // the sketch's top-5 — a row-count mismatch, not an estimate error.
    if (types > 5)
      out += s"q_sketch_topk: $types distinct event_type values exceed " +
        "k=5 — testdata left the sketch's exact regime; regenerate oracle"
    // q_sketch_cms / q_sketch_rollup state approx_n == exact_n, provable
    // only while the domain is far below the 20k-wide CMS rows (min over
    // 5 depth rows ⇒ a key overcounts only if it collides in EVERY row;
    // ≤64 keys keeps that probability < 1e-15).
    if (types > 64)
      out += s"q_sketch_cms/q_sketch_rollup: $types distinct event_type " +
        "values — the collision-free CMS regime (≤64 keys) is no longer " +
        "provable; regenerate oracle"
    // SemanticsSpec holds the HLL estimates to 2% (≈2.5σ at lgK=14); that
    // is guaranteed only while the sketch stays in exact set mode, whose
    // lgK=14 ceiling is 1,536 coupons. sf0.1 ships 1,500 distinct users —
    // 36 under the ceiling — so regeneration drift lands here first.
    if (users > 1536)
      out += s"q_sketch_hll: $users distinct user_id values left the " +
        "lgK=14 exact set mode (ceiling 1,536) — the oracle's contract " +
        "booleans still hold, but SemanticsSpec's 2% envelope needs " +
        "re-adjudication; regenerate expectations"
    out.result()
  }

  test("testdata stays inside every sketch-oracle exact regime at all SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { sf =>
      val v = violations(Tables.events(spark, sf))
      assert(v.isEmpty, s"$sf:\n${v.mkString("\n")}")
    }
  }

  test("bloom capacity and decimal-double-cast margins hold at all SFs") {
    // Two more regimes the r14 sf1-equivalent rehearsal measured breaking
    // at 10x (92/94 value-exact there; PLANS.md appendix):
    // 1. q_sketch_bloom sizes its filter for 100k items; the 10x slice's
    //    150k distinct custkeys push the non-member FP rate to ~9%,
    //    correctly breaching the 1% contract. Testdata must stay far
    //    under capacity for the literal-TRUE oracle to be provable.
    // 2. dsum6-style exact decimal sums cast to double are correctly
    //    rounded by Spark (BigDecimal) at any magnitude, but DuckDB's
    //    int128-based conversion can be off by the last ULP once
    //    sum x 1e6 exceeds 2^53 — measured as a 1-ULP q_agg_multi
    //    sum_charge diff at the 10x slice (sum 5.2e10). The gate SFs
    //    must keep headline sums below that edge.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { sf =>
      val nKeys = Tables.orders(spark, sf)
        .agg(count_distinct(col("o_custkey"))).head().getLong(0)
      assert(nKeys <= 50000,
        s"$sf: $nKeys distinct custkeys near the 100k bloom capacity — " +
          "testdata left q_sketch_bloom's provably-under-1%-FP regime; " +
          "resize the filter or regenerate oracle")
      // the compared values are PER-GROUP sums (q_agg_multi groups by
      // returnflag x linestatus); the largest group is the binding one
      val charge = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
                 (lit(1.0) + col("l_tax"))).as("c"))
        .agg(max(col("c"))).head().getDouble(0)
      assert(charge * 1e6 < math.pow(2, 53),
        f"$sf: max per-group sum_charge=$charge%.0f x 1e6 crosses 2^53 — " +
          "DuckDB's decimal->double cast stops being correctly rounded " +
          "there and the q_agg_multi oracle hash-compare breaks on the " +
          "last ULP (measured at the 10x slice)")
    }
  }

  test("a 10x-users regeneration trips the HLL set-mode tripwire") {
    import spark.implicits._
    // synthetic stand-in for a regenerated sf0.1: same 5 types, 15,000
    // distinct users (10x the current 1,500)
    val synthetic = spark.range(150000)
      .select(concat(lit("t"), (col("id") % 5)).as("event_type"),
              (col("id") % 15000).cast("string").as("user_id"))
    val v = violations(synthetic)
    assert(v.exists(_.contains("left the lgK=14 exact set mode")),
      s"expected the HLL set-mode tripwire to fire, got: $v")
    assert(!v.exists(_.contains("q_sketch_topk")), "types stayed in regime")
  }

  test("a widened event_type domain trips the top-k and CMS tripwires") {
    val synthetic = spark.range(10000)
      .select(concat(lit("t"), (col("id") % 80)).as("event_type"),
              (col("id") % 100).cast("string").as("user_id"))
    val v = violations(synthetic)
    assert(v.exists(_.contains("q_sketch_topk")), s"top-k tripwire: $v")
    assert(v.exists(_.contains("q_sketch_cms")), s"CMS tripwire: $v")
  }
}
