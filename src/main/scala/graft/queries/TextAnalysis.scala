package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NS text-analysis operators over the `documents` table: token statistics,
  * BPE-ish regex tokenization, quality scoring, marker-based language ID,
  * document fingerprinting (md5 + polynomial rolling hash), and
  * binary-column handling.
  *
  * All computations are narrow (per-row, no shuffle except the declared
  * aggregations), so at 100 TB they run as a single map stage over the
  * parquet scan with only `doc_id`+`text` read (column pruning). Hashing is
  * built from md5 + integer arithmetic so the DuckDB oracle reproduces every
  * bit: `hex7(md5(x))` < 2^28, keeping all downstream products inside
  * exact 64-bit range on both engines.
  *
  * Reference capability analog: PipelineDB continuous views run arbitrary
  * scalar SQL over stream rows (reference README.md:66); these are the
  * scalar pipelines a training-data ingest would run per document.
  */
object TextAnalysis {

  type Qf = (SparkSession, String) => DataFrame

  /** First 7 hex digits of md5 as a long (< 2^28): cross-engine-exact.
    * Backed by the native fused expression (graft.expressions.Md5Prefix64)
    * — value-identical to conv(substring(md5(c),1,7),16,10) without
    * materializing the hex string. */
  def hex7(c: Column): Column = call_function("graft_md5h", c, lit(7))

  private val toks = split(col("text"), " ")

  // Marker-token sets per language (vocabulary-derived; a real language-ID
  // model would use char n-gram profiles — the *operator shape* is the same:
  // argmax over per-class token-hit scores with a deterministic tie-break).
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "fast"),
    "de" -> Seq("window", "group", "batch"),
    "es" -> Seq("table", "row", "line"),
    "fr" -> Seq("query", "filter", "join"),
    "zh" -> Seq("vector", "hash", "stream"))

  private def markerScore(tk: Column, words: Seq[String]): Column =
    size(filter(tk, t => t.isInCollection(words))).cast("long")

  /** Per-language score columns off a STAGED token array (see the staging
    * note on q_text_tokens — every per-row scalar pipeline aliases the
    * split once and derives from the alias). */
  private def langScores(tk: Column): Seq[(String, Column)] =
    markers.map { case (l, ws) => l -> markerScore(tk, ws) }

  /** argmax with first-language tie-break over score columns — pass the
    * ALIASED score columns, not raw expressions, so the CASE chain's many
    * references don't re-expand the scoring work per row. */
  private def langPred(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, sc), rest) =>
      when(sc === best, lit(l)).otherwise(rest)
    }
  }

  /** Hashed-linear quality classifier projection for ANY (id, text)
    * frame — the body of q_quality_classifier, factored like
    * Dedup.bandKeys: it is a pure stateless per-row map (feature hash +
    * integer dot product + logistic link, no shuffle), so it applies
    * UNCHANGED to a streaming DataFrame — the continuous quality gate in
    * front of an ingest pipeline (StreamingStateSpec proves batch
    * parity). Output: (id, n_tok, w_sum, prob, keep); caller orders. */
  def qualityClassify(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        aggregate(transform(col("tk"),
            t => (hex7(t) * 2654435761L) % 2000001L - 1000000L),
          lit(0L), (a, w) => a + w).as("w_sum"))
      .select(col("doc_id"), col("n_tok"), col("w_sum"),
        graft.Q.r4(lit(1.0) / (lit(1.0) +
          exp(-(col("w_sum").cast("double") / (col("n_tok") * 1e5)))))
          .as("prob"))
      .withColumn("keep", (col("prob") > 0.5).cast("int"))

  /** The packing prefix-sum shared by q_seq_pack (word counts) and
    * Pipeline's q_seq_pack_subword (subword counts): per-language running
    * total of `countCol` over doc order, bin = offset div budget. The
    * sequential dependency is inherent to packing; the partition key is
    * the scale lever — at 100 TB pack per (lang, shard) to bound any one
    * window partition (change it HERE, both packers follow). */
  private[queries] def seqPack(perDoc: DataFrame, countCol: String,
                               budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perDoc
      .withColumn("__cum", coalesce(sum(col(countCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div $budget")) // exact long division
      .drop("__cum")
      .orderBy("doc_id")
  }

  val queries: Map[String, Qf] = Map(
    // Token counting: whitespace tokens + a BPE-ish regex tokenizer.
    // STAGING PATTERN (all per-row scalar pipelines here): alias the
    // split ONCE in a first projection and derive every stat from the
    // alias — naming each stat off the raw `toks` expression re-evaluated
    // the split per stat per row (this query planned 4 split( sites; the
    // optimizer never un-duplicates a non-cheap expression, it only
    // declines to collapse the staged form).
    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), toks.as("tk"))
        .select(col("doc_id"),
                size(col("tk")).cast("long").as("n_tokens"),
                size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
                round(aggregate(col("tk"), lit(0L), (a, t) => a + length(t))
                        .cast("double") / size(col("tk")), 4).as("mean_tok_len"),
                size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
                  .cast("long").as("n_bpe"))
        .orderBy("doc_id")),

    // SURVEY §2 key: token counts over documents.text (split→explode→
    // count) — the canonical text-analysis pipeline shape.
    "q_text_analysis" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("token"))),

    // Global term frequency: the one shuffle here carries only
    // (token, partial count) pairs — map-side combine keeps it tiny.
    "q_text_topterms" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(toks).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(100)),

    // Quality scoring: stopword ratio, short-token ratio, mean length,
    // composite score. Ratios are double divisions evaluated in the same
    // order on both engines → bit-identical before the final round.
    "q_text_quality" -> ((s, d) => {
      // staged (see q_text_tokens): raw integer components once per row,
      // then ratios off the aliases — the single-projection form planned
      // 11 split( sites. Same doubles: the divisions are computed from the
      // identical integers in the identical order.
      val n = col("n").cast("double")
      val stopRatio = col("n_stop").cast("double") / n
      val shortRatio = col("n_short").cast("double") / n
      // graft.Q.r4, not round(): these are ratios of small integers, which
      // land exactly on 4-decimal half-way points where Spark and DuckDB
      // round() disagree (observed at sf0.1)
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"),
                size(col("tk")).as("n"),
                markerScore(col("tk"), Seq("the", "a", "of", "and", "in")).as("n_stop"),
                size(filter(col("tk"), t => length(t) <= 3)).as("n_short"),
                aggregate(col("tk"), lit(0L), (a, t) => a + length(t)).as("len_sum"))
        .select(col("doc_id"),
                col("n").cast("long").as("n_tokens"),
                graft.Q.r4(stopRatio).as("stop_ratio"),
                graft.Q.r4(shortRatio).as("short_ratio"),
                graft.Q.r4(col("len_sum").cast("double") / n).as("mean_len"),
                graft.Q.r4(lit(1.0) - lit(0.5) * stopRatio - lit(0.3) * shortRatio)
                  .as("quality"))
        .orderBy("doc_id")
    }),

    // Corpus-LM quality score (the CCNet-style filter signal, approximated
    // at the unigram level): per-document mean log-probability of its
    // tokens under the corpus's own unigram distribution — low scores
    // flag gibberish/rare-token documents, high scores flag boilerplate.
    // Two aggregations (token counts, then per-doc mean) plus one join of
    // the token stream against the unigram table; the join key is the
    // token, so at 100 TB the unigram table is orders of magnitude
    // smaller than the corpus and AQE broadcasts it when it fits (here it
    // does). Cross-engine determinism: each token's logp is rounded to 4
    // decimals FIRST (same ln → same double on both engines, as q_tfidf
    // already relies on), then summed exactly as decimals, so the
    // per-doc mean is order-independent.
    "q_unigram_logprob" -> ((s, d) => {
      // tok is consumed twice (count agg + join probe) but deliberately NOT
      // cached: unlike q_dedup_ngram's md5-dense shingles, a split+explode
      // recompute is cheaper than materializing the full token stream
      // (measured 633 ms uncached vs 687 ms cached floor at sf0.1).
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("token"))
      val cnt = tok.groupBy("token").agg(count(lit(1)).as("tf"))
      val tot = cnt.agg(sum(col("tf")).as("n_total"))
      tok.join(cnt, "token")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
                round(log(col("tf").cast("double") / col("n_total")), 4).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
             graft.Q.davg4(col("lp")).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // Language ID: argmax of per-language marker scores, ties broken by the
    // fixed language order (greatest + first-match CASE).
    "q_lang_id" -> ((s, d) => {
      // staged (see q_text_tokens): split once, score each language once,
      // then the argmax CASE chain references the score ALIASES — the
      // single-projection form re-expanded every score inside the CASE
      // (35 split( sites in the physical plan).
      val aliased = markers.map { case (l, _) => l -> col(s"s_$l") }
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("tk"))
        .select(Seq(col("doc_id")) ++
                langScores(col("tk")).map { case (l, sc) => sc.as(s"s_$l") }: _*)
        .select(Seq(col("doc_id")) ++ aliased.map(_._2) :+
                langPred(aliased).as("lang_pred"): _*)
        .orderBy("doc_id")
    }),

    // Fingerprinting: whole-doc md5, 5-token-prefix md5, and a polynomial
    // rolling hash over per-token hex7(md5) values mod 1e9+7 (all integer
    // arithmetic stays < 2^35 — exact on both engines).
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), toks.as("tk")) // staged, see q_text_tokens
        .select(col("doc_id"),
                md5(col("text")).as("fp_md5"),
                md5(array_join(slice(col("tk"), 1, 5), " ")).as("fp_prefix"),
                aggregate(transform(col("tk"), t => hex7(t)), lit(0L),
                          (a, h) => (a * 31L + h) % 1000000007L).as("fp_roll"))
        .orderBy("doc_id")),

    // PII scrubbing (training-data compliance pass): redact emails, phone
    // numbers and IPv4s with fixed-order regex rewrites, and count the
    // redactions. PII is planted deterministically from doc_id so the
    // redaction paths actually fire and hash-check. Narrow per-row map —
    // at 100 TB this is a single codegen'd stage over the pruned scan.
    "q_pii_scrub" -> ((s, d) => {
      val raw = concat(lit("u"), col("doc_id").cast("string"),
        lit("@ex.com call 555-0199 ip 10.0.0.1 :: "), col("text"))
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ipRe = "\\d+\\.\\d+\\.\\d+\\.\\d+"
      val phoneRe = "\\d{3}-\\d{4}"
      val nPii = (size(regexp_extract_all(raw, lit(emailRe), lit(0))) +
        size(regexp_extract_all(raw, lit(ipRe), lit(0))) +
        size(regexp_extract_all(raw, lit(phoneRe), lit(0)))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(raw,
            lit(emailRe), lit("[EMAIL]")),
            lit(ipRe), lit("[IP]")),
            lit(phoneRe), lit("[PHONE]")).as("scrubbed"),
          nPii.as("n_pii"))
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: flag documents containing any benchmark
    // phrase (here: the 5-token prefixes of a deterministic doc sample).
    // The phrase set is tiny → broadcast nested-loop substring probe, the
    // scale-correct shape for small benchmark suites; for large ones the
    // inverted n-gram index of q_dedup_ngram is the swap-in.
    // The sample window is PINNED to the first 5k doc ids (a no-op at
    // every driver SF): a benchmark suite is a fixed external artifact,
    // so the probe set must not grow with the corpus — the unpinned
    // `% 97` form made the broadcast side O(corpus) and the probe
    // O(corpus²/97), measured at scaling exponent 1.47 in the r14 10×
    // rehearsal (29.6× time for 10× docs; PLANS.md appendix) vs ~linear
    // pinned.
    "q_decontam" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs
        .filter(pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 5000)
        .select(array_join(slice(toks, 1, 5), " ").as("phrase")).distinct()
      docs.join(broadcast(bench), col("text").contains(col("phrase")), "left_semi")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    // Sequence packing (training-batch assembly): concatenate the token
    // stream in doc order and cut every BUDGET tokens — each document's
    // bin is its start offset div BUDGET, the concat-and-chunk semantics
    // of packed pretraining. Packing is per-language (the realistic
    // training-shard unit), so the prefix-sum window parallelizes across
    // languages; at 100 TB the same query packs per (lang, shard) to
    // bound any one window partition — the sequential dependency is
    // inherent to packing, the partition key is the scale lever.
    "q_seq_pack" -> ((s, d) =>
      seqPack(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                size(toks).cast("long").as("n_tokens")),
        "n_tokens", budget = 256)),

    // Repetition filter (Gopher-style quality rule): fraction of
    // duplicated 3-gram shingles within each document — natural-language
    // text repeats few trigrams; templated/boilerplate text repeats many.
    // Reuses the fused `graft_shingles` codegen expression, so the whole
    // query is one narrow map stage over the pruned scan.
    "q_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function("graft_shingles", col("text")).as("shs"))
        .select(col("doc_id"),
          size(col("shs")).cast("long").as("n_ngrams"),
          size(array_distinct(col("shs"))).cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_ngrams"), col("n_distinct"),
          // Q.r4: small-int ratio, exact half-boundary prone (see Q.r4 doc)
          when(col("n_ngrams") > 0,
            graft.Q.r4(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams")))
            .otherwise(lit(0.0)).as("dup_frac"))
        .withColumn("is_repetitive", (col("dup_frac") >= 0.01).cast("long"))
        .orderBy("doc_id")),

    // Hashed linear quality classifier (the fastText-shaped model behind
    // production corpus filters — CCNet's, GPT-3's): score = Σ_t w[h(t)]
    // / (n_tok·1e5), prob = σ(score), keep = prob > 0.5. Weights are a
    // deterministic pseudo-model — w[h] = ((h·2654435761) mod 2000001) −
    // 1e6 ∈ [−1e6, 1e6] — standing in for trained coefficients: the
    // OPERATOR is feature hashing + sparse dot product + logistic link,
    // identical under real weights (swap the arithmetic for a broadcast
    // weight-table lookup; the plan shape doesn't change). ONE narrow
    // codegen'd map stage: the per-token fold runs inside `aggregate`
    // over the split array — no explode, no shuffle beyond the output
    // sort — so at 100 TB this is scan-bound like q_text_quality. w_sum
    // is integer-exact (hex7 < 2^28, ·2654435761 < 2^60, |w|·n_tok <
    // 2^47); prob is rounded r4 after the only transcendental (exp).
    "q_quality_classifier" -> ((s, d) =>
      qualityClassify(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // The composed keep/drop pipeline a training-data ingest actually runs
    // over a raw corpus: language gate + length gate + repetition gate
    // (with the stopword quality score carried as a signal), then
    // exact-dedup survivor selection. Every per-document signal comes out
    // of ONE narrow map over the pruned (doc_id, text) scan — the gates
    // are free riders on the scan — and the only shuffle is the dedup
    // groupBy, whose partial min_by carries one candidate per fingerprint
    // per mapper. At 100 TB: scan-bound, one fingerprint-keyed exchange.
    "q_corpus_filter" -> ((s, d) => {
      // staged (see q_text_tokens): one split, one score per language, one
      // shingle scan; ratios/argmax off the aliases (the fused single
      // projection planned 11 split( sites)
      val aliased = markers.map { case (l, _) => l -> col(s"s_$l") }
      // materialize shingles once (q_repetition's two-step form): the
      // shingle scan is the dominant per-row cost, and CSE across the
      // three uses inside a `when` is not guaranteed
      val dupFrac = when(size(col("shs")) > 0,
        graft.Q.r4(lit(1.0) -
          size(array_distinct(col("shs"))).cast("double") / size(col("shs"))))
        .otherwise(lit(0.0))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), toks.as("tk"))
        .select(Seq(col("doc_id"), col("text"),
                size(col("tk")).as("n"),
                markerScore(col("tk"), Seq("the", "a", "of", "and", "in")).as("n_stop"),
                call_function("graft_shingles", col("text")).as("shs")) ++
                langScores(col("tk")).map { case (l, sc) => sc.as(s"s_$l") }: _*)
        .select(col("doc_id"), col("text"),
                col("n").cast("long").as("n_tokens"),
                graft.Q.r4(col("n_stop").cast("double") / col("n").cast("double"))
                  .as("stop_ratio"),
                langPred(aliased).as("lang_pred"),
                dupFrac.as("dup_frac"))
        .filter(col("lang_pred") === "en" && col("n_tokens") >= 5 &&
                col("dup_frac") < 0.5)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min_by(struct(col("doc_id"), col("n_tokens"),
                           col("stop_ratio"), col("dup_frac")),
                    col("doc_id")).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.n_tokens").as("n_tokens"),
                col("m.stop_ratio").as("stop_ratio"),
                col("m.dup_frac").as("dup_frac"))
        .orderBy("doc_id")
    }),

    // Multimodal plumbing demo on a real oracle-checkable path: treat text
    // as an opaque binary payload (the image/audio column pattern), compute
    // byte-level features. Real media decode lives in
    // graft.operators.Multimodal (stubbed decode, real Spark plumbing).
    "q_binary_cols" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
                octet_length(col("text")).cast("long").as("n_bytes"),
                ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
                base64(substring(col("text"), 1, 12).cast("binary")).as("head_b64"))
        .orderBy("doc_id"))
  )

  private def markerSql(words: Seq[String]): String =
    s"CAST(len(list_filter(string_split(text,' '), t -> t IN (${words.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"

  private val langScoreSql = markers.map { case (l, ws) => s"${markerSql(ws)} AS s_$l" }
  private val langCaseSql = {
    val m = s"greatest(${markers.map { case (l, _) => s"s_$l" }.mkString(",")})"
    "CASE " + markers.map { case (l, _) => s"WHEN s_$l = $m THEN '$l'" }.mkString(" ") +
      " ELSE 'und' END"
  }

  val oracle: Map[String, String] = Map(
    "q_text_tokens" ->
      """SELECT doc_id,
                CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
                round(CAST(list_sum(list_transform(string_split(text,' '), t -> length(t))) AS DOUBLE)
                      / len(string_split(text,' ')), 4) AS mean_tok_len,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id""",
    "q_text_analysis" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents)
         GROUP BY token ORDER BY token""",
    "q_text_topterms" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
         GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""",
    "q_text_quality" -> {
      val nSql = "len(string_split(text,' '))"
      val stopSql =
        s"CAST(${markerSql(Seq("the", "a", "of", "and", "in"))} AS DOUBLE) / $nSql"
      val shortSql =
        s"CAST(len(list_filter(string_split(text,' '), t -> length(t) <= 3)) AS DOUBLE) / $nSql"
      val meanSql =
        s"CAST(list_sum(list_transform(string_split(text,' '), t -> length(t))) AS DOUBLE) / $nSql"
      s"""SELECT doc_id,
                CAST($nSql AS BIGINT) AS n_tokens,
                ${graft.Q.r4Sql(stopSql)} AS stop_ratio,
                ${graft.Q.r4Sql(shortSql)} AS short_ratio,
                ${graft.Q.r4Sql(meanSql)} AS mean_len,
                ${graft.Q.r4Sql(s"1.0 - 0.5 * ($stopSql) - 0.3 * ($shortSql)")} AS quality
         FROM documents ORDER BY doc_id"""
    },
    // per-token logp rounded to 4 decimals before the exact decimal sum,
    // mirroring the Spark side's order-independent mean
    "q_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                      FROM documents),
            cnt AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
            tot AS (SELECT sum(tf) AS n_total FROM cnt)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(CAST(round(ln(CAST(tf AS DOUBLE) / n_total), 4)
                              AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_logp
         FROM tok JOIN cnt USING (token) CROSS JOIN tot
         GROUP BY doc_id ORDER BY doc_id""",
    "q_lang_id" ->
      s"""SELECT doc_id, ${markers.map { case (l, _) => s"s_$l" }.mkString(", ")}, $langCaseSql AS lang_pred
         FROM (SELECT doc_id, ${langScoreSql.mkString(", ")} FROM documents)
         ORDER BY doc_id""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5,
                md5(array_to_string(list_slice(string_split(text,' '), 1, 5), ' ')) AS fp_prefix,
                list_reduce(
                  list_concat([CAST(0 AS BIGINT)],
                    list_transform(string_split(text,' '),
                      t -> CAST(concat('0x', substr(md5(t),1,7)) AS BIGINT))),
                  (a, h) -> (a * 31 + h) % 1000000007) AS fp_roll
         FROM documents ORDER BY doc_id""",
    "q_pii_scrub" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(
                    concat('u', CAST(doc_id AS VARCHAR), '@ex.com call 555-0199 ip 10.0.0.1 :: ', text),
                    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                    '\d+\.\d+\.\d+\.\d+', '[IP]', 'g'),
                    '\d{3}-\d{4}', '[PHONE]', 'g') AS scrubbed,
                CAST(len(regexp_extract_all(concat('u', CAST(doc_id AS VARCHAR), '@ex.com call 555-0199 ip 10.0.0.1 :: ', text), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
                   + len(regexp_extract_all(concat('u', CAST(doc_id AS VARCHAR), '@ex.com call 555-0199 ip 10.0.0.1 :: ', text), '\d+\.\d+\.\d+\.\d+'))
                   + len(regexp_extract_all(concat('u', CAST(doc_id AS VARCHAR), '@ex.com call 555-0199 ip 10.0.0.1 :: ', text), '\d{3}-\d{4}')) AS BIGINT) AS n_pii
         FROM documents ORDER BY doc_id""",
    "q_decontam" ->
      """SELECT doc_id FROM documents d
         WHERE EXISTS (
           SELECT 1 FROM (
             SELECT DISTINCT array_to_string(list_slice(string_split(text,' '), 1, 5), ' ') AS phrase
             FROM documents WHERE doc_id % 97 = 0 AND doc_id < 5000) b
           WHERE contains(d.text, b.phrase))
         ORDER BY doc_id""",
    "q_binary_cols" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                CAST(ascii(substr(text,1,1)) AS BIGINT) AS first_byte,
                to_base64(encode(substr(text,1,12))) AS head_b64
         FROM documents ORDER BY doc_id""",
    "q_seq_pack" ->
      """SELECT doc_id, lang, n_tokens,
                CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  // 256 AS BIGINT) AS bin
         FROM (SELECT doc_id, lang,
                      CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
               FROM documents)
         ORDER BY doc_id""",
    "q_corpus_filter" -> {
      val nSql = "CAST(len(string_split(text,' ')) AS BIGINT)"
      val stopSql =
        s"CAST(${markerSql(Seq("the", "a", "of", "and", "in"))} AS DOUBLE) / len(string_split(text,' '))"
      val dupSql = graft.Q.r4Sql(
        "1.0 - CAST(len(list_distinct(shs)) AS DOUBLE) / len(shs)")
      s"""WITH base AS (SELECT doc_id, text, ${langScoreSql.mkString(", ")},
                               $nSql AS n_tokens,
                               ${graft.Q.r4Sql(stopSql)} AS stop_ratio
                        FROM documents),
            tok AS (SELECT doc_id, ${Dedup.thSql} AS th FROM documents),
            hs AS (SELECT doc_id, ${Dedup.shingleHashSql} AS shs FROM tok),
            rep AS (SELECT doc_id,
                           CASE WHEN len(shs) > 0 THEN $dupSql
                                ELSE 0.0 END AS dup_frac
                    FROM hs),
            scored AS (SELECT b.doc_id, b.text, b.n_tokens, b.stop_ratio,
                              $langCaseSql AS lang_pred, r.dup_frac
                       FROM base b JOIN rep r ON b.doc_id = r.doc_id),
            kept AS (SELECT * FROM scored
                     WHERE lang_pred = 'en' AND n_tokens >= 5
                       AND dup_frac < 0.5)
          SELECT doc_id, n_tokens, stop_ratio, dup_frac
          FROM (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                             ORDER BY doc_id) AS rn
                FROM kept)
          WHERE rn = 1 ORDER BY doc_id"""
    },
    "q_repetition" ->
      s"""WITH tok AS (SELECT doc_id, ${Dedup.thSql} AS th FROM documents),
            hs AS (SELECT doc_id, ${Dedup.shingleHashSql} AS shs FROM tok)
          SELECT doc_id,
                 CAST(len(shs) AS BIGINT) AS n_ngrams,
                 CAST(len(list_distinct(shs)) AS BIGINT) AS n_distinct,
                 CASE WHEN len(shs) > 0
                      THEN ${graft.Q.r4Sql("""1.0 - CAST(len(list_distinct(shs)) AS DOUBLE)
                                       / len(shs)""")}
                      ELSE 0.0 END AS dup_frac,
                 CAST(CASE WHEN len(shs) > 0 AND
                        ${graft.Q.r4Sql("""1.0 - CAST(len(list_distinct(shs)) AS DOUBLE)
                              / len(shs)""")} >= 0.01
                      THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
          FROM hs ORDER BY doc_id""",
    // integer-exact hashed dot product, r4 after the only transcendental;
    // list_sum promotes to HUGEINT in DuckDB — cast back to BIGINT
    "q_quality_classifier" ->
      s"""WITH w AS (SELECT doc_id,
                 CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
                 CAST(list_sum(list_transform(string_split(text,' '),
                   t -> ((CAST(concat('0x', substr(md5(t),1,7)) AS BIGINT)
                          * 2654435761) % 2000001) - 1000000)) AS BIGINT) AS w_sum
               FROM documents),
            p AS (SELECT doc_id, n_tok, w_sum,
                 ${graft.Q.r4Sql(
                   "1.0 / (1.0 + exp(-(CAST(w_sum AS DOUBLE) / (n_tok * 1e5))))")}
                   AS prob
               FROM w)
          SELECT doc_id, n_tok, w_sum, prob,
                 CAST(prob > 0.5 AS INT) AS keep
          FROM p ORDER BY doc_id"""
  )
}
