package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Identifiers, ReplicationFilter}
import graft.functions.JsonNumber
import graft.operators.Similarity
import graft.streaming.IncrementalSync

/** Property-based invariants (ScalaCheck) over the pure layers. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, tests: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  test("JsonNumber.format round-trips every finite double") {
    check(Prop.forAll { (d: Double) =>
      d.isNaN || d.isInfinite || {
        val s = JsonNumber.format(d)
        // exact round-trip + serde notation (no Java 'E', always a marker)
        s.toDouble == d && !s.contains("E") && (s.contains(".") || s.contains("e"))
      }
    })
  }

  test("quoting always survives round-trip and never breaks out") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val ident = Identifiers.quoteIdent(s)
      val identOk = ident.head == '"' && ident.last == '"' &&
        ident.substring(1, ident.length - 1).replace("\"\"", "\"") == s
      val literal = Identifiers.quoteLiteral(s)
      val literalOk = !literal.substring(1, literal.length - 1)
        .replace("''", "").contains("'")
      identOk && literalOk
    })
  }

  test("filter fingerprints are order-insensitive and content-sensitive") {
    check(Prop.forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { xs =>
      val set = xs.map("db." + _).toSet
      val a = ReplicationFilter(includeTables = set)
      val b = ReplicationFilter(
        includeTables = scala.util.Random.shuffle(set.toList).toSet)
      a.fingerprint == b.fingerprint
    })
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { extra =>
      val base = ReplicationFilter(includeTables = Set("db.a"))
      val more = ReplicationFilter(includeTables = Set("db.a", s"db.x$extra"))
      base.fingerprint != more.fingerprint
    })
  }

  test("wraparound detection: only large backwards jumps trigger resync") {
    check(Prop.forAll(Gen.chooseNum(0L, 4000000000L), Gen.chooseNum(0L, 4000000000L)) {
      (oldW, newW) =>
        IncrementalSync.detectWraparound(oldW, newW) ==
          (oldW > newW && oldW - newW > IncrementalSync.WraparoundThreshold)
    })
  }

  test("multi-probe bucket sets are Hamming-correct and monotone in radius") {
    check(Prop.forAll(Gen.chooseNum(0L, 255L), Gen.chooseNum(0, 3)) { (bucket, r) =>
      val bits = 8
      val probes = Similarity.probeBuckets(bucket, bits, r).toSet
      val hammingOk = probes.forall(p => java.lang.Long.bitCount(p ^ bucket) <= r)
      val sizeOk = probes.size ==
        (0 to r).map(i => (0 until bits).combinations(i).size).sum
      val monotoneOk = r >= bits ||
        probes.subsetOf(Similarity.probeBuckets(bucket, bits, r + 1).toSet)
      hammingOk && sizeOk && monotoneOk
    }, tests = 100)
  }
}
