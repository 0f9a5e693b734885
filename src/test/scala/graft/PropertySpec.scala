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

  test("JsonNumber.format emits SHORTEST round-trip digits (JDK17 toString is not)") {
    // JDK-4511638: Double.toString on JDK 17 sometimes emits one digit
    // more than needed. serde_json/Ryū parity demands minimality: no
    // digit prefix one shorter may round-trip.
    def digitsOf(s: String): String =
      s.replace("-", "").replace(".", "").replaceAll("e.*", "")
        .dropWhile(_ == '0').reverse.dropWhile(_ == '0').reverse
    check(Prop.forAll { (d: Double) =>
      d.isNaN || d.isInfinite || d == 0.0 || {
        val digits = digitsOf(JsonNumber.format(d))
        digits.length <= 1 || {
          val full = new java.math.BigDecimal(java.lang.Double.toString(math.abs(d)))
          val shorter = full.round(new java.math.MathContext(digits.length - 1))
          shorter.doubleValue() != math.abs(d) // one digit fewer must NOT round-trip
        }
      }
    })
    // a concrete double whose JDK17 toString IS non-shortest (found by
    // bit-pattern scan): toString gives 17 digits, 16 round-trip
    val d = java.lang.Double.longBitsToDouble(-4340736438196967870L)
    // JDK 17 emits the 17-digit non-shortest form; JDK 19+ (JDK-4511638)
    // emits the shortest 16-digit form. Either way format() must shorten.
    assert(Set("-2.6814475343671142E18", "-2.681447534367114E18")
      .contains(java.lang.Double.toString(d)))
    assert(JsonNumber.format(d) == "-2.681447534367114e18") // shortest, serde notation
    assert(JsonNumber.format(d).toDouble == d)
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

  test("rolling shingle hash equals the per-window polynomial on arbitrary strings") {
    import graft.functions.RollingShingleHash
    def reference(bytes: Array[Byte], k: Int): Seq[Long] = {
      val kk = math.max(k, 1)
      val wins =
        if (bytes.length <= kk) Seq(bytes.toSeq)
        else bytes.sliding(kk).map(_.toSeq).toSeq
      wins.map(_.foldLeft(0L)((h, b) =>
        h * RollingShingleHash.B + ((b & 0xff) + 1)))
    }
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.chooseNum(1, 12)) { (s, k) =>
      val got = RollingShingleHash
        .hashes(org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
        .toLongArray.toSeq
      got == reference(s.getBytes("UTF-8"), k)
    }, tests = 200)
  }

  test("word n-gram span hashes equal hashing each split-built gram string") {
    import graft.functions.{RollingShingleHash, WordNgramHash}
    // reference: split on single spaces (split semantics: "" is one empty
    // word), join each n-window with ' ', hash the gram string's bytes
    // with the same polynomial
    def reference(norm: String, n: Int): Seq[Long] = {
      val words = norm.split(" ", -1).toSeq
      if (words.length < n) Seq.empty
      else words.sliding(n).map(_.mkString(" ").getBytes("UTF-8")
        .foldLeft(0L)((h, b) => h * RollingShingleHash.B + ((b & 0xff) + 1))).toSeq
    }
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val normGen = Gen.oneOf(
      Gen.const(""),
      Gen.nonEmptyListOf(wordGen).map(_.mkString(" ")))
    check(Prop.forAll(normGen, Gen.chooseNum(1, 5)) { (s, n) =>
      val got = WordNgramHash
        .hashes(org.apache.spark.unsafe.types.UTF8String.fromString(s), n)
        .toLongArray.toSeq
      got == reference(s, n)
    }, tests = 200)
  }
}
