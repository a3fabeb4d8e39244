package graft

import graft.operators.{Bucketing, SaltedJoin}
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("RangeJoin bin boundaries: end-exclusive, replication covers bin spans") {
    import graft.operators.RangeJoin
    import spark.implicits._
    // binSeconds = 600 → bins are epoch-aligned [k·600, (k+1)·600).
    // i_aligned spans exactly one bin; i_span straddles a bin edge, so its
    // interval row must replicate into both bins to catch p_bin1.
    val iv = Seq(
      ("i_aligned", "2024-01-01 00:10:00", "2024-01-01 00:20:00"),
      ("i_span",    "2024-01-01 00:05:00", "2024-01-01 00:15:00"))
      .toDF("iv_id", "s", "e")
      .select(col("iv_id"), col("s").cast("timestamp").as("start_ts"),
              col("e").cast("timestamp").as("end_ts"))
    val pts = Seq(
      ("p_start", "2024-01-01 00:10:00"),  // == start: inclusive
      ("p_last",  "2024-01-01 00:19:59"),  // last second inside i_aligned
      ("p_end",   "2024-01-01 00:20:00"),  // == end: EXCLUSIVE, no match
      ("p_bin1",  "2024-01-01 00:14:00"),  // 2nd bin of i_span (+ i_aligned)
      ("p_out",   "2024-01-01 00:04:59"))  // before both
      .toDF("ev_id", "t")
      .select(col("ev_id"), col("t").cast("timestamp").as("ev_ts"))
    val got = RangeJoin(iv, pts, col("start_ts"), col("end_ts"), col("ev_ts"), 600)
      .select("iv_id", "ev_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("i_aligned", "p_start"), ("i_aligned", "p_last"), ("i_aligned", "p_bin1"),
      ("i_span", "p_start"), ("i_span", "p_bin1")))
  }

  test("SaltedJoin equals the plain join (content-deterministic salting)") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    val salted = SaltedJoin(orders, customer, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    assert(salted.sameElements(plain))
  }

  test("partitioned layout prunes directories before IO") {
    val path = tmpDir("part-layout") + "/events_by_type"
    Bucketing.writePartitioned(
      Tables.events(spark, sf0001).select("event_id", "value", "event_type"),
      path, "event_type")
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("event_type=")).sorted
    assert(dirs.length === 5, s"one dir per type: ${dirs.mkString(",")}")
    val q = spark.read.parquet(path).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning:\n$scan")
    assert(q.count() === Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count())
  }

  test("bucketed join runs without Exchange or Sort (co-located)") {
    // in-memory catalog resets per JVM but table locations persist on disk
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 4)
    // At test scale the planner prefers broadcast; force the SMJ path the
    // plan would take on two 100 TB sides to show buckets cover the join.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
             !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
