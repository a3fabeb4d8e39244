package graft

import graft.expressions.Md5Prefix64
import graft.sources.ShardedLog
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5): offset codec round-trip, hash
  * range bounds, shard-slice partition coverage. Raw ScalaCheck (no
  * scalatestplus bridge in the offline dependency set). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val shardMapGen: Gen[Map[String, ShardedLog.ShardPos]] =
    Gen.mapOf(for {
      i <- Gen.choose(0, 9999)
      b <- Gen.choose(0L, Long.MaxValue / 2)
      n <- Gen.choose(0L, Long.MaxValue / 2)
    } yield s"shard-$i.log" -> ShardedLog.ShardPos(b, n))

  test("offset JSON round-trips for arbitrary shard maps") {
    check("offset-roundtrip", Prop.forAll(shardMapGen) { m =>
      ShardedLog.parseOffsetJson(ShardedLog.offsetJson(m)) == m
    })
  }

  test("record framing round-trips arbitrary payloads incl. tabs/newlines") {
    // the reference treats records as opaque bytes (kinesis_consumer.h:65-69);
    // escaped framing must survive any partition key / data content
    val sGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\t', '\n', '\r', '\\', '"', ' ', 'é')))
      .map(_.mkString)
    check("framing-roundtrip", Prop.forAll(sGen, sGen) { (pk, data) =>
      val dir = java.nio.file.Files.createTempDirectory("framing").toString
      ShardedLog.append(dir, 0, Seq((pk, data)))
      val f = new java.io.File(dir, "shard-0.log")
      val pos = ShardedLog.scanForward(f, 0L, Long.MaxValue)
      val line = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .stripSuffix("\n")
      // non-null pk ⇒ the first raw tab is always the field separator
      val tab = line.indexOf('\t')
      pos.recs == 1L && pos.bytes == f.length() && tab >= 0 &&
        ShardedLog.unescField(line.substring(0, tab)) == pk &&
        ShardedLog.unescField(line.substring(tab + 1)) == data
    })
  }

  test("md5 prefix hash stays within [0, 16^n) for any string") {
    check("md5h-range",
      Prop.forAll(Gen.asciiPrintableStr, Gen.choose(1, 15)) { (s, n) =>
        val h = Md5Prefix64.compute(UTF8String.fromString(s), n)
        h >= 0L && h < (1L << (4 * n))
      })
  }

  test("consecutive offset ranges partition the log: each record planned exactly once") {
    // Model of planInputPartitions over successive latestOffset values:
    // slices [prev, next) must tile [0, total) with no gap or overlap.
    val stepsGen = for {
      total <- Gen.choose(0L, 10000L)
      cuts <- Gen.listOf(Gen.choose(0L, total))
    } yield (total, (cuts :+ total).sorted)
    check("slice-coverage", Prop.forAll(stepsGen) { case (total, cuts) =>
      var prev = 0L
      var covered = 0L
      val monotone = cuts.forall { next =>
        val ok = next >= prev; covered += next - prev; prev = next; ok
      }
      monotone && covered == total
    })
  }
}
