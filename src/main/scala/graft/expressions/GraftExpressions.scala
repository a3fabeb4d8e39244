package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hashing/similarity hot
  * paths, with `doGenCode` so they stay inside whole-stage codegen.
  *
  * Preference order from the design brief: compose built-ins → custom
  * Expression → custom plan. These two earn the Expression tier:
  *
  *  - `Md5Prefix64(s, nHex)` fuses `conv(substring(md5(s),1,n),16,10)`:
  *    the built-in chain materializes a 32-char hex UTF8String and parses
  *    it back; the fused form digests bytes and assembles the long
  *    directly (no intermediate allocation). Value-identical to the chain,
  *    so the DuckDB oracle (`CAST('0x'||substr(md5(x),1,n) AS BIGINT)`)
  *    still matches bit-for-bit.
  *  - `CosineSimilarity(a, b)` replaces a 3·dim-node unrolled expression
  *    tree with one pass over the two ArrayData buffers. Accumulation
  *    order (left-to-right per accumulator) matches both the unrolled
  *    form and DuckDB's list fold, so doubles stay bit-identical.
  *
  * Registered under `graft_md5h` / `graft_cosine` via
  * [[GraftExtensions]] (`spark.sql.extensions`) — the standard
  * SparkSessionExtensions injection point.
  */
object Md5Prefix64 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First `nHex` hex digits of md5(s) as a long (nHex ≤ 15). */
  def compute(s: UTF8String, nHex: Int): Long = {
    val digest = {
      val m = md.get(); m.reset(); m.digest(s.getBytes)
    }
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = digest(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}

case class Md5Prefix64(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex > 0 && nHex <= 15, s"nHex must be in [1,15], got $nHex")
  // input contract: StringType child (ExpectsInputTypes is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5h"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix64.compute(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5Prefix64.compute($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** NFC/NFD normalization over a UTF8String. Fast path (review r18):
    * `isFullAscii` is a pure byte scan over the UNDECODED buffer and
    * ASCII is normalized under every Unicode form, so the overwhelming
    * majority of a web corpus returns the input object with ZERO
    * allocation — no String decode, no Normalizer call. Non-ASCII rows
    * pay one decode + `isNormalized` scan, and only genuinely
    * denormalized text pays the normalize + re-encode. */
  def compute(s: UTF8String, nfd: Boolean): UTF8String = {
    if (s.isFullAscii) return s
    val form = if (nfd) java.text.Normalizer.Form.NFD
               else java.text.Normalizer.Form.NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** `graft_unorm(str, 'NFC'|'NFD')` — Unicode normalization as a native
  * codegen'd expression (r18). Spark ships no normalization function, and
  * a UDF would break whole-stage codegen in the canonicalization pass
  * that q_dedup_unicode runs over every document. The DuckDB oracle's
  * `nfc_normalize` implements the same Unicode standard, so canonical
  * forms agree byte-for-byte cross-engine (oracle-gated). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(form == "NFC" || form == "NFD",
    s"graft_unorm form must be NFC or NFD, got '$form'")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unorm"

  // analysis-time input check (review r18): without it a non-string
  // child passes analysis and every TASK dies in ClassCastException —
  // retried 4x before the job aborts — instead of one planner error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_unorm expects a STRING argument, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form == "NFD")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalize.compute($c, ${form == "NFD"})")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object CosineSimilarity {
  /** One-pass dot/norms over float arrays; accumulation order matches the
    * unrolled element_at chain and DuckDB's sequential list fold. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Double-array variant (quantized/trained codebooks are array<double>);
    * `element_at(arr, i).cast("double")` is a no-op on doubles, so this is
    * bit-identical to the unrolled chain on the same inputs. */
  def computeD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // input contract: two ArrayType(FloatType) or two ArrayType(DoubleType)
  // children (element type dispatched below; mixed pairs are unsupported)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // SQL-registered, so analysis must reject what eval can't handle: a
  // mixed float/double pair (or non-numeric elements) would otherwise
  // pass resolution and read misaligned ArrayData silently.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> or two array<double> " +
            s"arguments, got ${l.simpleString(3)} and ${r.simpleString(3)}")
    }

  private def isDoubleArr: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def fn: String = if (isDoubleArr) "computeD" else "compute"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isDoubleArr)
      CosineSimilarity.computeD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.CosineSimilarity.$fn($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  val P = 1000000007L

  /** Shared empty result (null-text case); ArrayData is immutable here. */
  val EMPTY: ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])

  /** 3-token shingle hashes of `s`: split on the single-space regex
    * (exactly Spark's `split(text, " ")` with limit −1, trailing empties
    * kept), hex7(md5) per token, rolling 65599-combine mod 1e9+7 —
    * value-identical to the transform/element_at chain in
    * queries/Dedup.shingled and to the DuckDB oracle's `range(1, len-1)`
    * formulation (<3 tokens → empty, like DuckDB's empty range). */
  def compute(s: UTF8String): ArrayData = {
    val toks = s.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = Md5Prefix64.compute(toks(i), 7); i += 1 }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = ((th(i) * 65599L + th(i + 1)) % P * 65599L + th(i + 2)) % P
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** k-token window hashes, stride 1 — [[compute]] generalized: folding
    * 0 → (a·65599 + h) mod P over tokens i..i+k−1 reproduces the 3-token
    * shingle chain exactly at k = 3 ((0·65599+h₀) = h₀ seeds the same
    * recurrence), so this is ONE identity family, not a second hash.
    * Tokens < k → empty array. Backs `graft_spanhashes` and the
    * q_dedup_spans window stage (n·k multiply-mods in a tight codegen'd
    * loop vs interpreted transform/aggregate/slice lambda trees). */
  def computeK(s: UTF8String, k: Int): ArrayData = {
    val toks = s.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = Md5Prefix64.compute(toks(i), 7); i += 1 }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var a = 0L
      var j = 0
      while (j < k) { a = (a * 65599L + th(i + j)) % P; j += 1 }
      out(i) = a
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** min((a·h + b) mod P) over a long array; Long.MinValue marks empty
    * (the caller's codegen turns it into SQL NULL, matching
    * `array_min(transform(…))` over an empty array). */
  def minhash(arr: ArrayData, a: Long, b: Long): Long = {
    val n = arr.numElements()
    if (n == 0) return Long.MinValue
    var m = Long.MaxValue
    var i = 0
    while (i < n) {
      val v = (a * arr.getLong(i) + b) % P
      if (v < m) m = v
      i += 1
    }
    m
  }
}

/** `graft_shingles(text)`: fused tokenize → per-token md5-prefix hash →
  * rolling shingle combine. Replaces two interpreted higher-order
  * `transform`s (per-element lambda interpretation + an md5 call each)
  * with one tight loop per row that stays inside whole-stage codegen.
  *
  * NULL text yields an EMPTY array (never null) — the same semantics as
  * the when/otherwise + transform chain it replaced, so a caller filtering
  * on `size(shingles)` sees no behavior change for null documents. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => ShingleHashes.EMPTY
      case s => ShingleHashes.compute(s.asInstanceOf[UTF8String])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code +
        code"""
        $javaType ${ev.value} = ${childGen.isNull}
          ? graft.expressions.ShingleHashes.EMPTY()
          : graft.expressions.ShingleHashes.compute(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_spanhashes(text, k)`: fused tokenize → per-token md5-prefix
  * hash → k-token overlapping window combine (stride 1) — the
  * [[ShingleHashes]] identity generalized to any window width; `k` must
  * be a positive foldable literal (window width is a query-shape
  * parameter, like graft_md5h's digit count). NULL text → EMPTY array,
  * same contract as graft_shingles. */
case class SpanHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"graft_spanhashes: window width must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_spanhashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => ShingleHashes.EMPTY
      case s => ShingleHashes.computeK(s.asInstanceOf[UTF8String], k)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code +
        code"""
        $javaType ${ev.value} = ${childGen.isNull}
          ? graft.expressions.ShingleHashes.EMPTY()
          : graft.expressions.ShingleHashes.computeK(${childGen.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

/** `graft_minhash(arr, a, b)`: fused `array_min(transform(arr, h →
  * (a·h+b) % P))`; NULL on an empty array exactly like array_min. */
case class MinHash(child: Expression, a: Long, b: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val v = ShingleHashes.minhash(input.asInstanceOf[ArrayData], a, b)
    if (v == Long.MinValue) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ShingleHashes.minhash($c, ${a}L, ${b}L);
      if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHash =
    copy(child = newChild)
}

object SegmentJoin {
  private val SPACE = UTF8String.fromString(" ")

  /** Non-overlapping k-token segments of a space-tokenized text, each
    * re-joined with single spaces — value-identical to
    * `transform(sequence(0, ceil(n/k)-1), i -> array_join(slice(ws,
    * i·k+1, k), ' '))` over `ws = split(text, ' ')` (and to the DuckDB
    * range/list_slice/array_to_string chain): split keeps trailing
    * empties (limit −1), so even "" yields ONE empty segment. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val toks = s.split(SPACE, -1)
    val n = toks.length
    val m = (n + k - 1) / k
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val from = i * k
      val len = math.min(k, n - from)
      val seg = new Array[UTF8String](len)
      System.arraycopy(toks, from, seg, 0, len)
      out(i) = UTF8String.concatWs(SPACE, seg: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_segments(text, k)`: fused tokenize → fixed-width k-token
  * segmentation → per-segment re-join, one codegen'd loop per row —
  * replaces q_dedup_lines' interpreted transform/sequence/slice/
  * array_join lambda tree. `k` must be a positive foldable literal
  * (segment width is a query-shape parameter, like graft_spanhashes'
  * window). NULL text → empty array. */
case class SegmentJoin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"graft_segments: segment width must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_segments"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => ShingleHashes.EMPTY
      case s => SegmentJoin.compute(s.asInstanceOf[UTF8String], k)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code +
        code"""
        $javaType ${ev.value} = ${childGen.isNull}
          ? graft.expressions.ShingleHashes.EMPTY()
          : graft.expressions.SegmentJoin.compute(${childGen.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SegmentJoin =
    copy(child = newChild)
}

object SubwordStats {
  /** Declaration-time merge-table vocabulary for the WordPiece SERVE path
    * (greedy longest-match segmentation — Wu et al. 2016 §3.1's decode
    * side; training the merges is out of scope, exactly as
    * q_quality_classifier's weights stand in for a trained model).
    * Multi-char pieces cover common stems/suffixes; single chars cover
    * the rest EXCEPT p/q/v/x/z, so words reaching those letters outside
    * a multi-char piece are OOV — real vocabularies have coverage holes,
    * and the OOV rate is the statistic mixture designers weight by. */
  val VOCAB: Array[String] = Array(
    "the", "da", "ta", "jo", "in", "ba", "tch", "sort", "sp", "ark",
    "str", "eam", "win", "dow", "val", "ue", "ve", "ctor", "qu", "ery",
    "fil", "ter", "gr", "oup", "mer", "ge", "ord", "er", "sc", "an",
    "sm", "all", "ble", "cus", "tom",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "r", "s", "t", "u", "w", "y")

  /** Shared (0, 0, 0) result for NULL text. */
  val ZERO: ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0L, 0L, 0L))

  /** VOCAB indexed by first char, each bucket LONGEST-FIRST: the greedy
    * step probes only pieces that can match at the position, and the
    * first startsWith hit IS the longest match — ~10x less per-row work
    * than scanning all pieces at every position (review r17). ASCII-only
    * index is lossless: VOCAB is ASCII, so a non-ASCII position matches
    * no piece either way. */
  private val byFirst: Array[Array[String]] = {
    val b = Array.fill(128)(List.empty[String])
    VOCAB.foreach { p => val c = p.charAt(0).toInt; b(c) = p :: b(c) }
    b.map(_.sortBy(-_.length).toArray)
  }

  /** Words longer than this are [UNK] outright (WordPiece's
    * max_input_chars_per_word rule) — ALSO the bound that lets the DuckDB
    * oracle mirror the greedy loop as a fixed-depth fold: each step
    * consumes ≥1 char, so MAX_WORD fold steps complete any non-UNK word. */
  val MAX_WORD = 24

  /** (n_words, n_subwords, n_oov) of a space-tokenized text under greedy
    * longest-match segmentation. Per word: repeatedly take the longest
    * VOCAB piece prefixing the remainder; a position with no match makes
    * the WHOLE word one [UNK] subword (WordPiece semantics, not partial
    * credit). ASCII contract (like every hash here): DuckDB len/substr
    * count codepoints, Java counts UTF-16 units — identical on ASCII. */
  def compute(s: UTF8String): ArrayData = {
    val words = s.toString.split(" ", -1)
    var nw = 0L; var ns = 0L; var no = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      nw += 1
      if (w.length > MAX_WORD) { ns += 1; no += 1 }
      else {
        var pos = 0; var cnt = 0L; var oov = false
        while (pos < w.length && !oov) {
          val c = w.charAt(pos).toInt
          var best = 0
          if (c < 128) {
            val cand = byFirst(c)
            var i = 0
            while (best == 0 && i < cand.length) {
              if (w.startsWith(cand(i), pos)) best = cand(i).length
              i += 1
            }
          }
          if (best == 0) oov = true
          else { pos += best; cnt += 1 }
        }
        if (oov) { ns += 1; no += 1 } else ns += cnt
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(nw, ns, no))
  }
}

/** `graft_subwords(text)`: (n_words, n_subwords, n_oov) under greedy
  * longest-match subword segmentation against the declaration-time
  * [[SubwordStats.VOCAB]] — one codegen'd loop per row (the interpreted
  * nested-lambda formulation would pay tokens × MAX_WORD × |VOCAB|
  * lambda dispatches per document). NULL text → [0, 0, 0]. */
case class SubwordStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_subwords"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => SubwordStats.ZERO
      case s => SubwordStats.compute(s.asInstanceOf[UTF8String])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code +
        code"""
        $javaType ${ev.value} = ${childGen.isNull}
          ? graft.expressions.SubwordStats.ZERO()
          : graft.expressions.SubwordStats.compute(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordStats =
    copy(child = newChild)
}

object PqDists {
  /** graft_pq_dists is SQL-registered for arbitrary use, so the 64-dim
    * contract is enforced here, not assumed (ADVICE r14): a short array
    * would otherwise read past numElements() into undefined memory. */
  private def checkDim(a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() < 64 || b.numElements() < 64)
      throw new IllegalArgumentException(
        s"graft_pq_dists requires 64-element vectors (8 subspaces x 8 dims), " +
          s"got ${a.numElements()} and ${b.numElements()}")

  /** Per-subspace squared-L2 distances for product quantization: 8
    * subspaces of 8 dims over two 64-dim float arrays. Each subspace
    * accumulates left-to-right, exactly like the unrolled 8-term
    * element_at chain it replaces (and the DuckDB oracle's explicit
    * `+` chain), so doubles stay bit-identical. */
  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    checkDim(a, b)
    val out = new Array[Double](8)
    var j = 0
    while (j < 8) {
      var d = 0.0
      var k = 8 * j
      val end = k + 8
      while (k < end) {
        val dlt = a.getFloat(k).toDouble - b.getFloat(k).toDouble
        d += dlt * dlt
        k += 1
      }
      out(j) = d
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Double-array variant (residual vectors are array<double>: float
    * casts minus float casts); identical accumulation order. */
  def computeD(a: ArrayData, b: ArrayData): ArrayData = {
    checkDim(a, b)
    val out = new Array[Double](8)
    var j = 0
    while (j < 8) {
      var d = 0.0
      var k = 8 * j
      val end = k + 8
      while (k < end) {
        val dlt = a.getDouble(k) - b.getDouble(k)
        d += dlt * dlt
        k += 1
      }
      out(j) = d
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_pq_dists(a, b)`: the 8 per-subspace squared-L2 distances of
  * two 64-dim float vectors as one array — collapses q_similarity_pq's
  * encode projection from eight ~45-node unrolled trees per codebook row
  * to eight `element_at` reads (the rounding/argmin-key arithmetic stays
  * in Spark's own functions, so cross-engine parity never depends on
  * re-implemented rounding). */
case class PqDists(left: Expression, right: Expression)
    extends BinaryExpression {
  // input contract: two ArrayType(FloatType) or two ArrayType(DoubleType)
  // children of ≥64 elements (the dim is ALSO checked at runtime inside
  // compute — analysis can't see array lengths)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_dists"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> or two array<double> " +
            s"arguments, got ${l.simpleString(3)} and ${r.simpleString(3)}")
    }

  private def isDoubleArr: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def fn: String = if (isDoubleArr) "computeD" else "compute"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isDoubleArr)
      PqDists.computeD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      PqDists.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.PqDists.$fn($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDists =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Spark's Round(d, 6), verbatim semantics: BigDecimal(d)
    * (shortest-decimal form) setScale HALF_UP — and, exactly like
    * Spark's RoundBase, NaN/Infinity pass through unchanged
    * (BigDecimal.valueOf would throw NumberFormatException on them,
    * which the replaced Round-based two-stage encode never did —
    * review r16). The encode keys below must stay bit-identical to the
    * floor/round chain the two-stage form computed with Spark's own
    * functions (and to the DuckDB oracle), so the rounding is
    * REPLICATED, not approximated. */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** The 8 PQ sub-codes of `vec` against a codebook of (cent_id,
    * cent_emb) structs, in one pass: per subspace j, the code is the
    * cent_id minimizing the integer key
    * floor(round(d_j, 6)·1e6 + 0.5)·16 + cent_id — exactly the
    * min(k_j) the former crossJoin+groupBy stage aggregated, with the
    * tie-break in the low bits. Keys are unique per centroid, so the
    * min is order-independent and the codebook array order is free. */
  def compute(vec: ArrayData, cents: ArrayData, isDouble: Boolean): ArrayData = {
    val nc = cents.numElements()
    if (nc == 0)
      throw new IllegalArgumentException("graft_pq_encode: empty codebook")
    if (vec.numElements() < 64)
      throw new IllegalArgumentException(
        s"graft_pq_encode requires 64-element vectors, got ${vec.numElements()}")
    val best = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i < nc) {
      if (cents.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pq_encode: null codebook entry at index $i")
      val row = cents.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1))
        throw new IllegalArgumentException(
          s"graft_pq_encode: null cent_id or cent_emb at index $i")
      val cid = row.getLong(0)
      // the argmin key packs cent_id into the low 4 bits
      // (key = dist·16 + cid); a cid outside [0, 16) would bleed into
      // the distance bits and silently corrupt the argmin (review r15)
      if (cid < 0 || cid > 15)
        throw new IllegalArgumentException(
          s"graft_pq_encode: cent_id $cid outside [0, 16) — the 4-bit " +
            "sub-code packing supports at most 16 sub-centroids")
      val cemb = row.getArray(1)
      if (cemb.numElements() < 64)
        throw new IllegalArgumentException(
          s"graft_pq_encode: centroid $cid has ${cemb.numElements()} dims, need 64")
      var j = 0
      while (j < 8) {
        var d = 0.0
        var k = 8 * j
        val end = k + 8
        if (isDouble) {
          while (k < end) {
            val dlt = vec.getDouble(k) - cemb.getDouble(k)
            d += dlt * dlt; k += 1
          }
        } else {
          while (k < end) {
            val dlt = vec.getFloat(k).toDouble - cemb.getFloat(k).toDouble
            d += dlt * dlt; k += 1
          }
        }
        val scaled = math.floor(round6(d) * 1e6 + 0.5)
        // NaN distance (a NaN embedding coordinate): Spark's
        // cast(NaN as long) is 0, so the replaced two-stage form keyed
        // this centroid at bare `cid` and still produced codes —
        // replicate rather than crash (review r16). Distances so large
        // that scaled·16 would overflow Long (≳5.8e11, i.e. garbage
        // input) flip keys negative and silently corrupt the argmin —
        // reject those loudly like the other contract checks.
        val key =
          if (scaled.isNaN) cid
          else if (scaled >= (Long.MaxValue / 16L).toDouble)
            throw new IllegalArgumentException(
              s"graft_pq_encode: subspace distance $d overflows the " +
                "argmin key (max representable ~5.8e11) — input vectors " +
                "are not sane embeddings")
          else scaled.toLong * 16L + cid
        if (key < best(j)) best(j) = key
        j += 1
      }
      i += 1
    }
    val codes = new Array[Long](8)
    var j = 0
    while (j < 8) { codes(j) = best(j) % 16L; j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}

/** `graft_pq_encode(vec, cents)`: map-only PQ encode — the 8 4-bit
  * sub-codes of a 64-dim vector against a broadcast codebook (an array
  * of `struct<cent_id: bigint, cent_emb: array<float|double>>` rows,
  * built with `collect_list` into ONE broadcast row). Replaces the
  * crossJoin(×16) → 8×min() aggregation encode stage of
  * q_similarity_pq/q_similarity_ivfpq with a single projection: no
  * fan-out, no encode shuffle — at 100 TB the encode becomes a pure
  * scan. Value-identical to that stage (same integer argmin keys,
  * same Round semantics), so the DuckDB oracle is unchanged. */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private def vecElem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (vecElem(left.dataType), right.dataType) match {
      case (Some(ve), ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType && vecElem(f1.dataType).contains(ve) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double>, " +
            "array<struct<cent_id: bigint, cent_emb: same-element-array>>), " +
            s"got ${left.dataType.simpleString(4)} and ${right.dataType.simpleString(4)}")
    }
  }

  private def isDoubleArr: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqEncode.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isDoubleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.PqEncode.compute($a, $b, $isDoubleArr)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object IvfAssign {
  /** Spark's Round(d, 6), verbatim — the [[PqEncode.round6]] contract
    * (shortest-decimal BigDecimal, HALF_UP, NaN/Inf pass through). */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** 1-based index into `cents` of the nearest-centroid winner by
    * (round6(cosine) DESC, cent_id ASC) — exactly the
    * `max_by(..., struct(round(cos, 6), -cent_id))` selection the
    * crossJoin(×16)+aggregation assignment computed: same native cosine
    * doubles, same Round semantics, and `java.lang.Double.compare` IS
    * the interpreted double ordering Spark's max_by uses (NaN greatest,
    * -0.0 < 0.0), so the winner is value-identical. Returning the INDEX
    * (not the id) lets callers read cent_id/cent_emb back with a
    * codegen'd element_at — no field packing, no id-range restriction. */
  def compute(vec: ArrayData, cents: ArrayData, isDouble: Boolean): Int = {
    val nc = cents.numElements()
    if (nc == 0)
      throw new IllegalArgumentException("graft_ivf_assign: empty codebook")
    var bestIdx = -1
    var bestCos = 0.0
    var bestCid = 0L
    var i = 0
    while (i < nc) {
      if (cents.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_ivf_assign: null codebook entry at index $i")
      val row = cents.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1))
        throw new IllegalArgumentException(
          s"graft_ivf_assign: null cent_id or cent_emb at index $i")
      val cid = row.getLong(0)
      val cemb = row.getArray(1)
      val cos = round6(
        if (isDouble) CosineSimilarity.computeD(vec, cemb)
        else CosineSimilarity.compute(vec, cemb))
      val cmp = if (bestIdx < 0) 1 else java.lang.Double.compare(cos, bestCos)
      if (cmp > 0 || (cmp == 0 && cid < bestCid)) {
        bestIdx = i; bestCos = cos; bestCid = cid
      }
      i += 1
    }
    bestIdx + 1
  }
}

/** `graft_ivf_assign(vec, cents)`: map-only nearest-centroid assignment
  * — the 1-based codebook index of the winner by (round(cosine, 6)
  * DESC, cent_id ASC) against a broadcast codebook (an array of
  * `struct<cent_id: bigint, cent_emb: array<float|double>>`, built with
  * `array_sort(collect_list(...))` into ONE broadcast row — the
  * [[PqEncode]] layout). Replaces the crossJoin(×16) → max_by
  * aggregation assignment of the IVF family with a single projection:
  * no ×16 row fan-out and, decisively at scale, NO full-corpus vec_id
  * exchange per Lloyd assignment — the pass becomes a pure scan.
  * Value-identical to that stage (same native cosine, same Round
  * semantics, same tie-break), so the DuckDB oracle is unchanged. */
case class IvfAssign(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ivf_assign"

  private def vecElem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (vecElem(left.dataType), right.dataType) match {
      case (Some(ve), ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType && vecElem(f1.dataType).contains(ve) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double>, array<struct<bigint, " +
            s"array<same element type>>>), got ${left.dataType.simpleString(3)} " +
            s"and ${right.dataType.simpleString(3)}")
    }
  }

  private def isDoubleArr: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IvfAssign.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isDoubleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.IvfAssign.compute($a, $b, $isDoubleArr)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfAssign =
    copy(left = newLeft, right = newRight)
}

/** THE one (name → builder) table for every graft function — consumed by
  * BOTH registration paths ([[GraftExtensions]] for
  * `spark.sql.extensions` sessions and `org.apache.spark.sql
  * .GraftRegistrar` for the session-independent safety net), so a
  * function added here is automatically available on both (review r15:
  * the two hand-kept copies had already diverged once, silently dropping
  * the PQ and sketch functions from the registrar). */
object GraftFunctions {
  // the sizing args must be BIGINT; SQL integer literals arrive as
  // INT, so coerce foldable ints instead of demanding an L suffix
  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case _ => org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
  }

  /** (name, implementing-expression class name, builder). The class name
    * feeds ExpressionInfo so DESCRIBE FUNCTION / catalog metadata points
    * at the real expression, not the extensions shim (review r16). */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_md5h", classOf[Md5Prefix64].getName, {
      case Seq(c, n) => Md5Prefix64(c, n.eval().asInstanceOf[Number].intValue())
      case _ => throw new IllegalArgumentException("graft_md5h(str, nHexDigits)")
    }),
    ("graft_shingles", classOf[ShingleHashes].getName, {
      case Seq(c) => ShingleHashes(c)
      case _ => throw new IllegalArgumentException("graft_shingles(text)")
    }),
    ("graft_spanhashes", classOf[SpanHashes].getName, {
      case Seq(c, k) => SpanHashes(c, k.eval().asInstanceOf[Number].intValue())
      case _ => throw new IllegalArgumentException("graft_spanhashes(text, k)")
    }),
    ("graft_segments", classOf[SegmentJoin].getName, {
      case Seq(c, k) => SegmentJoin(c, k.eval().asInstanceOf[Number].intValue())
      case _ => throw new IllegalArgumentException("graft_segments(text, k)")
    }),
    ("graft_subwords", classOf[SubwordStats].getName, {
      case Seq(c) => SubwordStats(c)
      case _ => throw new IllegalArgumentException("graft_subwords(text)")
    }),
    ("graft_unorm", classOf[UnicodeNormalize].getName, {
      case Seq(c, f) => UnicodeNormalize(c,
        String.valueOf(f.eval()))
      case _ => throw new IllegalArgumentException("graft_unorm(str, 'NFC'|'NFD')")
    }),
    ("graft_minhash", classOf[MinHash].getName, {
      case Seq(c, a, b) => MinHash(c,
        a.eval().asInstanceOf[Number].longValue(),
        b.eval().asInstanceOf[Number].longValue())
      case _ => throw new IllegalArgumentException("graft_minhash(arr, a, b)")
    }),
    ("graft_cosine", classOf[CosineSimilarity].getName, {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _ => throw new IllegalArgumentException("graft_cosine(a, b)")
    }),
    ("graft_pq_dists", classOf[PqDists].getName, {
      case Seq(a, b) => PqDists(a, b)
      case _ => throw new IllegalArgumentException("graft_pq_dists(a, b)")
    }),
    ("graft_pq_encode", classOf[PqEncode].getName, {
      case Seq(a, b) => PqEncode(a, b)
      case _ => throw new IllegalArgumentException("graft_pq_encode(vec, cents)")
    }),
    ("graft_ivf_assign", classOf[IvfAssign].getName, {
      case Seq(a, b) => IvfAssign(a, b)
      case _ => throw new IllegalArgumentException("graft_ivf_assign(vec, cents)")
    }),
    // PipelineDB bloom_agg parity on Spark's own bloom filter machinery:
    // BloomFilterAggregate/BloomFilterMightContain are the expressions
    // Spark's runtime join filters use, but this build registers neither
    // publicly. Contract: the value child is a LONG — hash the item with
    // xxhash64 on both the build and probe side, exactly as Spark's own
    // injected runtime filters do. (The analyzer wraps a bare
    // AggregateFunction in an AggregateExpression during resolution.)
    ("graft_bloom_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName, {
      case Seq(c) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
      case Seq(c, n) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          c, asLong(n))
      case Seq(c, n, b) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          c, asLong(n), asLong(b))
      case _ => throw new IllegalArgumentException(
        "graft_bloom_agg(xxhash64(col)[, estimatedItems[, numBits]])")
    }),
    // Probe side is our own BloomQuery (not Spark's might_contain, which
    // rejects non-constant sketches — it exists only for injected runtime
    // join filters): any binary column works, so per-group sketches in a
    // continuous view are probeable, PipelineDB's actual bloom_contains UX.
    ("graft_bloom_contains", classOf[BloomQuery].getName, {
      case Seq(bloom, value) => BloomQuery(bloom, value)
      case _ => throw new IllegalArgumentException(
        "graft_bloom_contains(bloom, xxhash64(col))")
    }),
    // PipelineDB freq_agg reader (the sketch side is the builtin
    // count_min_sketch aggregate)
    ("graft_cms_query", classOf[CmsQuery].getName, {
      case Seq(sketch, item) => CmsQuery(sketch, item)
      case _ => throw new IllegalArgumentException("graft_cms_query(sketch, item)")
    }),
    // PipelineDB bloom_union_agg / combine(freq_agg): union-aggregates
    // over SERIALIZED sketches — what lets per-window sketch partials
    // roll up without re-reading raw rows (see SketchExpressions.scala).
    ("graft_bloom_union_agg", classOf[BloomUnionAgg].getName, {
      case Seq(c) => BloomUnionAgg(c)
      case _ => throw new IllegalArgumentException(
        "graft_bloom_union_agg(bloom_binary)")
    }),
    ("graft_cms_union_agg", classOf[CmsUnionAgg].getName, {
      case Seq(c) => CmsUnionAgg(c)
      case _ => throw new IllegalArgumentException(
        "graft_cms_union_agg(cms_binary)")
    }))
}

/** `spark.sql.extensions=graft.expressions.GraftExtensions` injects the
  * function registry entries; usable from SQL and via
  * `functions.call_function` (including inside higher-order-function
  * lambdas). Builders come from [[GraftFunctions.builders]] — shared
  * with the session-independent registrar. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, exprClass, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(exprClass, name),
        builder))
    }
}
