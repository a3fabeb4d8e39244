package graft

/** Temporary exploration spec — delete before commit. */
class ScratchSpec extends SparkSpec {
  test("explore sketch builtins") {
    val df = spark.sql(
      "SELECT approx_top_k(m, 3, 100) AS tk FROM VALUES ('a'),('a'),('b'),('c'),('a'),('b') AS t(m)")
    df.printSchema()
    df.show(false)
    val acc = spark.sql(
      """SELECT approx_top_k_estimate(approx_top_k_combine(collect_sketches), 3) AS tk FROM (
        |  SELECT approx_top_k_accumulate(m, 100) AS s FROM VALUES ('a'),('a'),('b') AS t(m)
        |  UNION ALL
        |  SELECT approx_top_k_accumulate(m, 100) AS s FROM VALUES ('c'),('a'),('b') AS t(m)
        |) agg_sketches(collect_sketches)""".stripMargin)
    acc.printSchema(); acc.show(false)
    val th = spark.sql(
      """SELECT theta_sketch_estimate(theta_intersection(a, b)) AS est FROM (
        |  SELECT (SELECT theta_sketch_agg(x) FROM range(0, 100) t(x)) AS a,
        |         (SELECT theta_sketch_agg(x) FROM range(50, 200) t(x)) AS b
        |)""".stripMargin)
    th.printSchema(); th.show(false)
    val kll = spark.sql(
      "SELECT kll_sketch_get_quantile_double(kll_merge_agg_double(s), 0.5) AS med FROM (" +
        "SELECT kll_sketch_agg_double(CAST(x AS DOUBLE)) AS s FROM range(0, 1000) t(x) GROUP BY x % 4)")
    kll.printSchema(); kll.show(false)
    import org.apache.spark.sql.{Column, functions => F}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
    val src = spark.range(0, 50).select(F.col("id"))
    val bf = src.agg(column(new BloomFilterAggregate(
      expression(F.xxhash64(F.col("id"))), 100L, 10000L).toAggregateExpression()).as("bf"))
    bf.printSchema()
    println("bloom bytes: " + bf.head().getAs[Array[Byte]](0).length)
    val probe = spark.range(0, 100).crossJoin(bf)
      .filter(column(BloomFilterMightContain(expression(F.col("bf")),
        expression(F.xxhash64(F.col("id"))))))
    println("bloom hits: " + probe.count())
    val cms = spark.sql(
      "SELECT count_min_sketch(m, 0.001d, 0.99d, 42) AS s FROM VALUES ('a'),('a'),('b') AS t(m)")
    cms.printSchema()
    val bytes = cms.head().getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    println("cms a=" + sk.estimateCount("a".getBytes("UTF-8")) +
      " b=" + sk.estimateCount("b".getBytes("UTF-8")) +
      " asStr=" + sk.estimateCount("a"))
  }
}
