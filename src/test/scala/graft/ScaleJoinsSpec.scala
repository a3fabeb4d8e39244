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

  test("AQE splits a skewed band-bucket join partition (the Dedup scale claim)") {
    // Dedup.scala's scale argument says "skewed buckets are split by
    // AQE" — this pins it as a machine check instead of a comment. Shape:
    // the streaming near-dup admission join (bandKeys(probe) equi-joined
    // against bandKeys(corpus)) where the corpus has one pathological
    // band bucket (4,000 identical docs → 4 hot (band, bk) keys holding
    // half the corpus's band rows). Thresholds are scaled to test data —
    // at production sizes the DEFAULTS (256 MB threshold, 5x median) fire
    // on the same plan shape.
    import spark.implicits._
    val hot = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val corpus = ((1 to 4000).map(i => (i.toLong, hot)) ++
      (1 to 4000).map { i =>
        (10000L + i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
      }).toDF("doc_id", "text")
    val probes = ((1 to 10).map(i => (90000L + i, hot)) ++
      (1 to 40).map { i =>
        (91000L + i, s"p${i}a p${i}b p${i}c p${i}d p${i}e p${i}f")
      }).toDF("doc_id", "text")
    // skew splits re-read the hot reduce partition at MAPPER granularity,
    // so the map side needs several tasks (a 1-partition local relation
    // would leave AQE nothing to split — a real scan always has many)
    val cb = graft.queries.Dedup.bandKeys(
      corpus.repartition(8), "doc_id", "text").as("c")
    val pb = graft.queries.Dedup.bandKeys(
      probes.repartition(8), "doc_id", "text").as("p")
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // probe side would broadcast
      // 4 reduce partitions (the suite default) would land the 4 hot keys
      // in most partitions and drag the MEDIAN up to the skew — with 64,
      // hot keys isolate and the median reflects the healthy buckets
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // sized against COMPRESSED shuffle bytes (the sizes AQE sees): the
      // hot partition's repetitive (band, bk, doc_id) rows compress hard
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // sum(c.doc_id) keeps the corpus doc id flowing through the join:
      // column pruning would otherwise shuffle only the CONSTANT (band,
      // bk) pair for the hot bucket, which compresses to ~nothing and
      // hides the skew from AQE's (compressed) size stats
      val j = pb.join(cb,
          col("p.band") === col("c.band") && col("p.bk") === col("c.bk"))
        .groupBy(col("p.doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("c.doc_id")).as("s"))
      val rows = j.collect()
      // semantics unaffected by the split: every hot probe matches all
      // 4,000 hot corpus docs in each of its 4 bands
      assert(rows.filter(_.getLong(0) <= 90010L).forall(_.getLong(1) === 16000L))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true):\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
