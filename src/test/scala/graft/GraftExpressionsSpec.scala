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

  test("graft_unorm: NFC composes, NFD decomposes, ASCII is the no-copy identity") {
    import spark.implicits._
    val composed = "Café Résumé"       // U+00E9
    val decomposed = "Café Résumé"  // e + U+0301
    val df = Seq(
      (1L, composed), (2L, decomposed), (3L, "plain ascii text"), (4L, null)
    ).toDF("id", "s")
    val rows = df.select(col("id"),
        call_function("graft_unorm", col("s"), lit("NFC")).as("nfc"),
        call_function("graft_unorm", col("s"), lit("NFD")).as("nfd"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(rows(1L)._1 === Some(composed) && rows(2L)._1 === Some(composed),
      "NFC maps both spellings to the composed form")
    assert(rows(1L)._2 === Some(decomposed) && rows(2L)._2 === Some(decomposed),
      "NFD maps both spellings to the decomposed form")
    assert(rows(3L) === ((Some("plain ascii text"), Some("plain ascii text"))))
    assert(rows(4L) === ((None, None)), "null propagates")
    // the q_dedup_unicode canonicalization: byte-disjoint variants meet
    // at ONE canonical digest — the property the planted pairs rely on
    val canon = (c: org.apache.spark.sql.Column) =>
      lower(regexp_replace(trim(call_function("graft_unorm", c, lit("NFC"))),
        " +", " "))
    val fps = Seq((1L, s"$composed  BODY x "), (2L, s"$decomposed body X"))
      .toDF("id", "s").select(md5(canon(col("s"))).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size === 1, "case/space/encoding variants share one digest")
    // an invalid form is a loud declaration-time error, not silent NFC
    val err = intercept[Exception] {
      df.select(call_function("graft_unorm", col("s"), lit("NFKC"))).collect()
    }
    assert(err.getMessage.contains("NFC"), s"named error, got: ${err.getMessage}")
    // a non-string child fails at ANALYSIS (checkInputDataTypes), not as
    // a per-task ClassCastException retried 4x (review r18)
    val typeErr = intercept[Exception] {
      df.select(call_function("graft_unorm", col("id"), lit("NFC"))).collect()
    }
    assert(typeErr.getMessage.toLowerCase.contains("string"),
      s"analysis-time type error, got: ${typeErr.getMessage}")
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

  test("graft_cosine double-array path equals the unrolled composition, bit-exact") {
    // array<double> inputs (quantized codebooks) dispatch to computeD;
    // must stay bit-identical to the unrolled chain like the float path
    val e = Tables.embeddings(spark, sf0001).limit(200)
      .select(col("vec_id"), transform(col("embedding"),
        v => floor(v.cast("double") * 1e6 + 0.5) / 1e6).as("q"))
    val pairs = e.as("a").crossJoin(e.as("b")).limit(500)
      .select(VectorOps.cosine(col("a.q"), col("b.q")).as("native"),
              VectorOps.cosineUnrolled(col("a.q"), col("b.q")).as("unrolled"))
      .collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("graft_pq_dists equals the unrolled per-subspace element_at chains, bit-exact") {
    def subdistUnrolled(v: org.apache.spark.sql.Column,
                        c: org.apache.spark.sql.Column, j: Int) =
      (1 to 8).map { k =>
        val d = element_at(v, 8 * j + k).cast("double") -
                element_at(c, 8 * j + k).cast("double")
        d * d
      }.reduce(_ + _)
    val e = Tables.embeddings(spark, sf0001).limit(100)
    val rows = e.as("a").crossJoin(e.as("b")).limit(400)
      .select(Seq(call_function("graft_pq_dists",
                col("a.embedding"), col("b.embedding")).as("fused")) ++
        (0 until 8).map(j =>
          subdistUnrolled(col("a.embedding"), col("b.embedding"), j).as(s"u$j")): _*)
      .collect()
    rows.foreach { r =>
      val fused = r.getSeq[Double](0)
      assert(fused.length === 8)
      (0 until 8).foreach { j =>
        assert(java.lang.Double.doubleToLongBits(fused(j)) ===
               java.lang.Double.doubleToLongBits(r.getDouble(j + 1)),
          s"subspace $j: ${fused(j)} vs ${r.getDouble(j + 1)}")
      }
    }
  }

  test("graft_shingles equals the two-transform chain; graft_minhash equals array_min∘transform") {
    import spark.implicits._
    val P = 1000000007L
    def hex7(c: org.apache.spark.sql.Column) = call_function("graft_md5h", c, lit(7))
    val samples = Seq("the quick brown fox jumps", "a b", "", "x", "a  b c d", // double space
      "héllo wörld snow melt", "one two three")
    val df = samples.toDF("text")
      .withColumn("th", transform(split(col("text"), " "), t => hex7(t)))
      .withColumn("chain",
        when(size(col("th")) >= 3,
          transform(sequence(lit(1), size(col("th")) - 2),
            i => ((element_at(col("th"), i) * 65599L +
                   element_at(col("th"), i + 1)) % P * 65599L +
                  element_at(col("th"), i + 2)) % P))
        .otherwise(array().cast("array<bigint>")))
      .withColumn("fused", call_function("graft_shingles", col("text")))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("fused")) ===
             r.getSeq[Long](r.fieldIndex("chain")), r.getString(0))
    }
    val mh = df.select(
        call_function("graft_minhash", col("fused"), lit(7L), lit(101L)).as("fusedMin"),
        array_min(transform(col("chain"), h => (lit(7L) * h + lit(101L)) % P)).as("chainMin"))
      .collect()
    mh.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("graft_spanhashes: k=3 IS graft_shingles; k=8 equals the interpreted fold") {
    import spark.implicits._
    val P = 1000000007L
    def hex7(c: org.apache.spark.sql.Column) = call_function("graft_md5h", c, lit(7))
    val samples = Seq("the quick brown fox jumps over seven lazy dogs today",
      "a b", "", "x", "a  b c d e f g h",  // double space → empty token kept
      "héllo wörld snow melt ice rain sun moon", "exactly eight tokens one two three four five")
    val df = samples.toDF("text")
      .withColumn("th", transform(split(col("text"), " "), t => hex7(t)))
      // the pre-expression q_dedup_spans formulation, kept as the spec
      // mirror: slice+aggregate fold per window
      .withColumn("chain",
        when(size(col("th")) >= 8,
          transform(sequence(lit(1), size(col("th")) - 7),
            i => aggregate(slice(col("th"), i, lit(8)), lit(0L),
                   (a, h) => (a * 65599L + h) % P)))
        .otherwise(array().cast("array<bigint>")))
      .withColumn("span8", call_function("graft_spanhashes", col("text"), lit(8)))
      .withColumn("span3", call_function("graft_spanhashes", col("text"), lit(3)))
      .withColumn("sh", call_function("graft_shingles", col("text")))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("span8")) ===
             r.getSeq[Long](r.fieldIndex("chain")), s"k=8: ${r.getString(0)}")
      assert(r.getSeq[Long](r.fieldIndex("span3")) ===
             r.getSeq[Long](r.fieldIndex("sh")),
        s"k=3 must reproduce the shingle identity: ${r.getString(0)}")
    }
    // NULL text → empty array (the graft_shingles contract), never null
    val n = spark.sql("SELECT graft_spanhashes(CAST(NULL AS STRING), 8) AS s").head()
    assert(!n.isNullAt(0) && n.getSeq[Long](0).isEmpty)
  }

  test("graft_segments equals the interpreted transform/slice/array_join chain") {
    import spark.implicits._
    val df = Seq(
      "a b c d e f g h i j",            // 10 tokens → segments of 8 + 2
      "one two three",                   // under one segment
      "x",                               // single token
      "",                                // empty text → ONE empty segment
      (1 to 16).map(i => s"t$i").mkString(" "), // exact multiple
      "a  b")                            // double space → empty middle token
      .toDF("text")
      .withColumn("ws", split(col("text"), " "))
    val rows = df.select(
      call_function("graft_segments", col("text"), lit(8)).as("fused"),
      expr("transform(sequence(0, cast(ceil(size(ws)/8.0) as int) - 1)," +
        " i -> array_join(slice(ws, i*8+1, 8), ' '))").as("chain"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
    // k is honored: width 3 over 7 tokens → 3 segments
    val segs3 = spark.sql("SELECT graft_segments('a b c d e f g', 3)")
      .head().getSeq[String](0)
    assert(segs3 === Seq("a b c", "d e f", "g"))
  }

  test("graft_subwords: greedy longest-match, whole-word UNK, long-word and null edges") {
    import graft.expressions.SubwordStats
    def stats(text: String): Seq[Long] =
      spark.sql(s"SELECT graft_subwords('$text')").head().getSeq[Long](0)
    // greedy longest-match picks 'sort' (4) over 's' at position 0
    assert(stats("sort") === Seq(1L, 1L, 0L))
    // 'table' → ta + ble; 'customer' → cus + tom + er
    assert(stats("table customer") === Seq(2L, 5L, 0L))
    // single chars only: 'agg' → a+g+g
    assert(stats("agg") === Seq(1L, 3L, 0L))
    // 'dup' fails at 'p' (no single 'p'): the WHOLE word is one [UNK],
    // not d+u+partial credit — WordPiece semantics
    assert(stats("dup") === Seq(1L, 1L, 1L))
    assert(stats("part the") === Seq(2L, 2L, 1L), "part is UNK, the is 1 piece")
    // a word past MAX_WORD chars is [UNK] outright even if segmentable
    val long = "a" * (SubwordStats.MAX_WORD + 1)
    assert(stats(long) === Seq(1L, 1L, 1L))
    assert(stats("a" * SubwordStats.MAX_WORD) ===
      Seq(1L, SubwordStats.MAX_WORD.toLong, 0L), "at the cap it still segments")
    // empty text splits to one empty word: 0 subwords, not OOV
    assert(stats("") === Seq(1L, 0L, 0L))
    // NULL → the documented zero triple
    val n = spark.sql("SELECT graft_subwords(CAST(NULL AS STRING))")
      .head().getSeq[Long](0)
    assert(n === Seq(0L, 0L, 0L))
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

  test("graft_bloom_agg all three arities; graft_bloom_contains hits every inserted key") {
    import spark.implicits._
    (1L to 500L).toDF("k").createOrReplaceTempView("bloom_keys")
    try {
      for (agg <- Seq(
          "graft_bloom_agg(xxhash64(k))",
          "graft_bloom_agg(xxhash64(k), 1000)",
          "graft_bloom_agg(xxhash64(k), 1000, 8000)")) {
        val hits = spark.sql(
          s"""SELECT sum(cast(graft_bloom_contains(b.bf, xxhash64(p.k)) AS LONG))
             |FROM bloom_keys p, (SELECT $agg AS bf FROM bloom_keys) b""".stripMargin)
          .head().getLong(0)
        assert(hits === 500L, s"$agg: false negatives")
      }
      // disjoint probes against the tightly-sized 3-arg filter: FP bounded
      val fp = spark.sql(
        """SELECT sum(cast(graft_bloom_contains(b.bf, xxhash64(p.k + 100000)) AS LONG))
          |FROM bloom_keys p,
          |     (SELECT graft_bloom_agg(xxhash64(k), 1000, 8000) AS bf FROM bloom_keys) b"""
          .stripMargin).head().getLong(0)
      assert(fp <= 25L, s"false-positive count $fp of 500") // ~3% expected at m/n=16
      assert(spark.sql(
        "SELECT graft_bloom_contains(CAST(NULL AS BINARY), 1L)").head().isNullAt(0))
    } finally spark.catalog.dropTempView("bloom_keys")
  }

  test("graft_cms_query matches exact counts per probe type; null propagates") {
    import spark.implicits._
    // skewed long/int/string domains so estimates are distinguishable
    val df = (1 to 1000).map(i => (i % 7L, i % 7, s"key${i % 7}"))
      .toDF("l", "i", "s")
    df.createOrReplaceTempView("cms_in")
    try {
      // one sketch per type, probed for every domain value — the same
      // deserialized-sketch cache path a broadcast CV sketch exercises
      // (one instance, many rows)
      val r = spark.sql(
        """SELECT p.l,
          |  graft_cms_query(b.skl, p.l) AS nl,
          |  graft_cms_query(b.ski, cast(p.l AS INT)) AS ni,
          |  graft_cms_query(b.sks, concat('key', p.l)) AS ns
          |FROM (SELECT DISTINCT l FROM cms_in) p,
          |     (SELECT count_min_sketch(l, 0.0001d, 0.99d, 7) AS skl,
          |             count_min_sketch(i, 0.0001d, 0.99d, 7) AS ski,
          |             count_min_sketch(s, 0.0001d, 0.99d, 7) AS sks
          |      FROM cms_in) b""".stripMargin).collect()
      assert(r.length === 7)
      r.foreach { row =>
        val exact = if (row.getLong(0) == 0) 142L else 143L // 1000 = 7*142+6
        assert(row.getLong(1) === exact, s"long probe, key ${row.getLong(0)}")
        assert(row.getLong(2) === exact, s"int probe, key ${row.getLong(0)}")
        assert(row.getLong(3) === exact, s"string probe, key ${row.getLong(0)}")
      }
      assert(spark.sql(
        "SELECT graft_cms_query(CAST(NULL AS BINARY), 'x')").head().isNullAt(0))
    } finally spark.catalog.dropTempView("cms_in")
  }

  test("graft_bloom_union_agg / graft_cms_union_agg merge serialized partials") {
    import spark.implicits._
    // two disjoint halves, sketched per group with identical sizing
    (1L to 1000L).map(k => (if (k <= 500) "a" else "b", k))
      .toDF("g", "k").createOrReplaceTempView("union_in")
    try {
      // bloom: union of per-group filters must contain BOTH halves
      val hits = spark.sql(
        """SELECT sum(cast(graft_bloom_contains(m.bf, xxhash64(p.k)) AS LONG))
          |FROM union_in p,
          |     (SELECT graft_bloom_union_agg(bf) AS bf FROM (
          |        SELECT g, graft_bloom_agg(xxhash64(k), 1000, 8000) AS bf
          |        FROM union_in GROUP BY g)) m""".stripMargin).head().getLong(0)
      assert(hits === 1000L, "union bloom lost members of a partial")
      // cms: union of per-group sketches == the single-pass global sketch
      val r = spark.sql(
        """SELECT graft_cms_query(u.sk, 'lo') AS lo_u, graft_cms_query(u.sk, 'hi') AS hi_u,
          |       graft_cms_query(g.sk, 'lo') AS lo_g, graft_cms_query(g.sk, 'hi') AS hi_g
          |FROM (SELECT graft_cms_union_agg(sk) AS sk FROM (
          |        SELECT g, count_min_sketch(CASE WHEN k <= 500 THEN 'lo' ELSE 'hi' END,
          |                                   0.001d, 0.99d, 11) AS sk
          |        FROM union_in GROUP BY g)) u,
          |     (SELECT count_min_sketch(CASE WHEN k <= 500 THEN 'lo' ELSE 'hi' END,
          |                              0.001d, 0.99d, 11) AS sk FROM union_in) g"""
          .stripMargin).head()
      assert(r.getLong(0) === r.getLong(2) && r.getLong(1) === r.getLong(3),
        "merged CMS must equal the single-pass sketch (cellwise addition)")
      assert(r.getLong(0) === 500L && r.getLong(1) === 500L)
      // empty input → NULL, like the builtin aggregates
      assert(spark.sql(
        "SELECT graft_bloom_union_agg(bf) FROM (SELECT CAST(NULL AS BINARY) AS bf) WHERE false")
        .head().isNullAt(0))
      // incompatible partial sizings fail loudly, not silently wrong
      val e = intercept[Exception] {
        spark.sql(
          """SELECT graft_bloom_union_agg(bf) FROM (
            |  SELECT graft_bloom_agg(xxhash64(k), 1000, 8000) AS bf FROM union_in WHERE g = 'a'
            |  UNION ALL
            |  SELECT graft_bloom_agg(xxhash64(k), 500, 2000) AS bf FROM union_in WHERE g = 'b')"""
            .stripMargin).collect()
      }
      assert(e.getMessage != null)
      // non-binary child is an analysis error
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_cms_union_agg(k) FROM union_in").collect()
      }
    } finally spark.catalog.dropTempView("union_in")
  }

  test("graft_cosine / graft_pq_dists reject mixed or non-numeric array pairs at analysis time") {
    import org.apache.spark.sql.AnalysisException
    // mixed float/double pair: previously passed analysis and read
    // misaligned ArrayData silently (ADVICE r14)
    intercept[AnalysisException] {
      spark.sql("""SELECT graft_cosine(array(CAST(1.0 AS FLOAT)),
                     array(CAST(1.0 AS DOUBLE)))""").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT graft_cosine(array('a'), array('b'))").collect()
    }
    intercept[AnalysisException] {
      spark.sql("""SELECT graft_pq_dists(array(CAST(1.0 AS FLOAT)),
                     array(CAST(1.0 AS DOUBLE)))""").collect()
    }
    // both-float and both-double still resolve
    assert(spark.sql("""SELECT graft_cosine(array(CAST(1.0 AS FLOAT)),
      array(CAST(1.0 AS FLOAT)))""").head().getDouble(0) === 1.0)
    assert(spark.sql("""SELECT graft_cosine(array(CAST(1.0 AS DOUBLE)),
      array(CAST(1.0 AS DOUBLE)))""").head().getDouble(0) === 1.0)
  }

  test("graft_pq_dists enforces the 64-dim contract at runtime") {
    val e = intercept[Exception] {
      spark.sql("""SELECT graft_pq_dists(array(CAST(1.0 AS FLOAT)),
                     array(CAST(1.0 AS FLOAT)))""").collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMsg(e).contains("64"),
      s"expected the 64-dim contract named in the error, got: ${rootMsg(e)}")
  }

  test("graft_pq_encode equals the crossJoin+argmin two-stage encode, bit-exact") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cents = emb.filter(col("vec_id") <= 15)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    // the two-stage form the expression replaced (q_similarity_pq pre-r15):
    // per-(vector, centroid) integer argmin keys, min per subspace, % 16
    def subdist(ds: org.apache.spark.sql.Column, j: Int) = element_at(ds, j + 1)
    val keyed = emb.crossJoin(broadcast(cents))
      .withColumn("ds", call_function("graft_pq_dists", col("embedding"), col("cent_emb")))
      .select(Seq(col("vec_id")) ++ (0 until 8).map(j =>
        (floor(round(subdist(col("ds"), j), 6) * 1e6 + 0.5).cast("long") * 16 +
         col("cent_id")).as(s"k$j")): _*)
    val twoStage = keyed.groupBy("vec_id")
      .agg(min(col("k0")).as("k0"), (1 until 8).map(j => min(col(s"k$j")).as(s"k$j")): _*)
      .select(Seq(col("vec_id")) ++ (0 until 8).map(j => (col(s"k$j") % 16).as(s"c$j")): _*)
      .orderBy("vec_id").collect()
    val mapOnly = graft.queries.Similarity
      .pqCodes(emb, col("embedding"), cents, Seq(col("vec_id")))
      .orderBy("vec_id").collect()
    assert(mapOnly.length === twoStage.length)
    mapOnly.zip(twoStage).foreach { case (a, b) => assert(a === b) }
    // empty codebook is a loud error, not silent garbage
    val err = intercept[Exception] {
      graft.queries.Similarity.pqCodes(
        emb, col("embedding"), cents.filter(col("cent_id") < 0),
        Seq(col("vec_id"))).collect()
    }
    assert(err.toString.nonEmpty)
  }

  test("graft_ivf_assign equals the crossJoin+max_by assignment, bit-exact") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cents = emb.filter(col("vec_id") <= 15)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    // float path, with every optional payload column carried: the
    // map-only form must reproduce the aggregation's winner AND its
    // cent_vec/cos_cent fields row for row
    val agg = graft.queries.Similarity
      .ivfAssignment(emb, cents, keepCentEmb = true, keepCos = true)
      .select("vec_id", "cluster", "cent_vec", "cos_cent")
      .orderBy("vec_id").collect()
    val native = graft.queries.Similarity
      .ivfAssignment(emb, cents, keepCentEmb = true, keepCos = true,
        mapOnly = true)
      .select("vec_id", "cluster", "cent_vec", "cos_cent")
      .orderBy("vec_id").collect()
    assert(native.length === agg.length && native.length > 0)
    native.zip(agg).foreach { case (a, b) => assert(a === b) }
    // double path (the trained-assignment layout): quantized vectors
    val qemb = emb.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        v => floor(v.cast("double") * 1e6 + 0.5) / 1e6).as("embedding"))
    val qcents = qemb.filter(col("vec_id") <= 15)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val aggD = graft.queries.Similarity.ivfAssignment(qemb, qcents)
      .select("vec_id", "cluster").orderBy("vec_id").collect()
    val natD = graft.queries.Similarity
      .ivfAssignment(qemb, qcents, mapOnly = true)
      .select("vec_id", "cluster").orderBy("vec_id").collect()
    assert(natD.length === aggD.length && natD.length > 0)
    natD.zip(aggD).foreach { case (a, b) => assert(a === b) }
    // empty codebook is a loud error, not silent garbage
    val err = intercept[Exception] {
      graft.queries.Similarity.ivfAssignment(
        emb, cents.filter(col("cent_id") < 0), mapOnly = true).collect()
    }
    assert(err.toString.nonEmpty)
  }

  test("registrar self-heals the FULL function surface after registry drops") {
    // r15 review fix: the safety-net registrar covered only
    // graft_md5h/graft_cosine, so PQ and sketch queries failed to resolve
    // in sessions without the extensions config. Simulate that session
    // state by dropping every graft function from the registry, then run
    // declared queries end to end — graft.Tables must re-register the
    // whole surface on its next read.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    Seq("graft_md5h", "graft_cosine", "graft_shingles", "graft_spanhashes",
        "graft_minhash", "graft_pq_dists", "graft_pq_encode", "graft_bloom_agg",
        "graft_bloom_contains", "graft_cms_query", "graft_bloom_union_agg",
        "graft_cms_union_agg")
      .foreach(n => reg.dropFunction(FunctionIdentifier(n)))
    assert(SparkEntry.queries("q_similarity_pq")(spark, "/root/testdata/sf0.001")
      .count() === 10, "PQ query must resolve via the registrar alone")
    assert(SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.001")
      .count() > 0, "minhash query must resolve via the registrar alone")
    assert(SparkEntry.queries("q_dedup_spans")(spark, "/root/testdata/sf0.001")
      .count() > 0, "span query must resolve via the registrar alone")
    assert(SparkEntry.queries("q_sketch_bloom")(spark, "/root/testdata/sf0.001")
      .count() > 0, "bloom sketch query must resolve via the registrar alone")
  }

  test("DESCRIBE FUNCTION points at the implementing expression class (r16 advice)") {
    // the shared builder table once registered every function's
    // ExpressionInfo with classOf[GraftExtensions], degrading catalog
    // metadata — each entry must carry its real expression class
    def describedClass(fn: String): String =
      spark.sql(s"DESCRIBE FUNCTION $fn").collect()
        .map(_.getString(0)).find(_.startsWith("Class:"))
        .map(_.stripPrefix("Class:").trim).getOrElse("")
    assert(describedClass("graft_md5h") ===
      classOf[graft.expressions.Md5Prefix64].getName)
    assert(describedClass("graft_pq_encode") ===
      classOf[graft.expressions.PqEncode].getName)
    assert(describedClass("graft_cosine") ===
      classOf[graft.expressions.CosineSimilarity].getName)
  }

  test("sketch probes reject wrong types at analysis time") {
    import org.apache.spark.sql.AnalysisException
    // non-binary sketch child
    intercept[AnalysisException] {
      spark.sql("SELECT graft_cms_query('not a sketch', 'x')").collect()
    }
    // unsupported probe type (double)
    intercept[AnalysisException] {
      spark.sql("SELECT graft_cms_query(CAST(NULL AS BINARY), 1.5d)").collect()
    }
    // bloom probe must be the xxhash64 long, not a string
    intercept[AnalysisException] {
      spark.sql("SELECT graft_bloom_contains(CAST(NULL AS BINARY), 'raw')").collect()
    }
  }
}
