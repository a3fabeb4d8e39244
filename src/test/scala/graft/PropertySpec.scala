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

  private val shardMapGen: Gen[Map[String, Long]] =
    Gen.mapOf(for {
      i <- Gen.choose(0, 9999)
      n <- Gen.choose(0L, Long.MaxValue / 2)
    } yield s"shard-$i.log" -> n)

  test("offset JSON round-trips for arbitrary shard maps") {
    check("offset-roundtrip", Prop.forAll(shardMapGen) { m =>
      ShardedLog.parseOffsetJson(ShardedLog.offsetJson(m)) == m
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
