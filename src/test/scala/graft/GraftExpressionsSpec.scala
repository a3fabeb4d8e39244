package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** Native expressions must be value-identical to the built-in
  * compositions they replace — that identity is what keeps the DuckDB
  * oracle matching bit-for-bit. */
class GraftExpressionsSpec extends SparkSpec {

  test("graft_md5h(s, n) equals conv(substring(md5(s),1,n),16,10)") {
    import spark.implicits._
    val samples = Seq("key", "", "a b c", "héllo wörld", "☃ snow",
      "the quick brown fox", "0123456789abcdef" * 8)
    val df = samples.toDF("s")
    for (n <- Seq(1, 7, 15)) {
      val rows = df.select(
        call_function("graft_md5h", col("s"), lit(n)).as("native"),
        conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("chain"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"n=$n"))
    }
  }

  test("graft_cosine equals the unrolled element_at composition, bit-exact") {
    val e = Tables.embeddings(spark, sf0001).limit(200)
    val pairs = e.as("a").crossJoin(e.as("b")).limit(500)
      .select(VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("native"),
              VectorOps.cosineUnrolled(col("a.embedding"), col("b.embedding")).as("unrolled"))
      .collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("expressions are SQL-callable via the extensions registry") {
    val r = spark.sql(
      "SELECT graft_md5h('key', 7) AS h, graft_cosine(array(1.0f,0.0f), array(1.0f,0.0f)) AS c")
      .head()
    assert(r.getLong(0) === 63365304L)
    assert(r.getDouble(1) === 1.0)
  }

  test("null inputs propagate null") {
    val r = spark.sql(
      "SELECT graft_md5h(CAST(NULL AS STRING), 7), graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0f))")
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
