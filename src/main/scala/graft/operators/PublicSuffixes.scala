package graft.operators

/** The public-suffix rule set behind [[Urls.registeredDomain]], loaded
  * from the bundled `graft/public_suffix_snapshot.dat` resource — a
  * curated offline snapshot in the upstream publicsuffix.org rule
  * syntax (`//` comments, `*.` wildcard rules, `!` exception rules), so
  * a production deployment can drop the verbatim upstream
  * `public_suffix_list.dat` in its place and this loader parses it
  * unchanged.
  *
  * What the matcher consumes — every rule shape the upstream list
  * publishes:
  *   - 2-label rules (`co.uk`, `github.io`)  → registered = last 3 labels;
  *   - 3-label rules (`k12.ca.us`, `act.edu.au`, `s3.amazonaws.com`)
  *     → registered = last 4 labels;
  *   - 4-label rules (`s3.eu-central-1.amazonaws.com`)
  *     → registered = last 5 labels;
  *   - TLD wildcards (`*.ck`) → any 2-label tail is a suffix,
  *     registered = last 3 labels;
  *   - wildcards under a 2-label base (`*.kawasaki.jp`) → any 3-label
  *     tail under the base is a suffix, registered = last 4 labels;
  *   - wildcards under a 3-label base (`*.compute.amazonaws.com`)
  *     → any 4-label tail under the base is a suffix, registered =
  *     last 5 labels;
  *   - exceptions at 2 labels (`!www.ck`) and 3 labels
  *     (`!city.kawasaki.jp`) → the host itself IS the registered
  *     domain (PSL: an exception rule beats every other match).
  * Single-label plain rules are the default (`*`) rule's behavior —
  * last two labels — and carry no information for the matcher, so
  * upstream's thousands of plain TLD entries are skipped by design and
  * counted in [[RuleSet.defaultTldRules]], NOT in
  * [[RuleSet.ignoredRules]] — the ignored count only flags rules the
  * matcher genuinely cannot honor (5-label-plus normals, wildcards
  * under a 4-label-plus base, deeper exceptions), so the coverage
  * signal stays meaningful on the full upstream list.
  *
  * The whole set is a few thousand short strings — driver-resident,
  * baked into plans as literal `isin` sets (Catalyst folds them to
  * hash-set membership): broadcast-sized by construction, per the
  * C4/Dolma provenance-pipeline precedent of shipping the PSL with the
  * job. */
object PublicSuffixes {

  /** A parsed rule list, classified by the shape the matcher consumes. */
  final case class RuleSet(suffixes2: Seq[String], suffixes3: Seq[String],
                           suffixes4: Seq[String], wildcardTlds: Seq[String],
                           wildcardBases2: Seq[String],
                           wildcardBases3: Seq[String],
                           exceptions2: Seq[String], exceptions3: Seq[String],
                           defaultTldRules: Int, ignoredRules: Int)

  /** Classify raw PSL lines (upstream syntax; `//` comments and blanks
    * tolerated) into the matcher's rule sets. Pure — unit-testable on
    * synthetic lists without touching the bundled resource. */
  def parse(lines: Iterator[String]): RuleSet = {
    val rules = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//")).toList
    def labels(r: String): Int = r.count(_ == '.') + 1
    def isPlain(r: String): Boolean = !r.startsWith("*") && !r.startsWith("!")
    val s2 = rules.filter(r => isPlain(r) && labels(r) == 2)
    val s3 = rules.filter(r => isPlain(r) && labels(r) == 3)
    val s4 = rules.filter(r => isPlain(r) && labels(r) == 4)
    val w1 = rules.filter(r => r.startsWith("*.") && labels(r) == 2).map(_.drop(2))
    val w2 = rules.filter(r => r.startsWith("*.") && labels(r) == 3).map(_.drop(2))
    val w3 = rules.filter(r => r.startsWith("*.") && labels(r) == 4).map(_.drop(2))
    val e2 = rules.filter(_.startsWith("!")).map(_.drop(1)).filter(labels(_) == 2)
    val e3 = rules.filter(_.startsWith("!")).map(_.drop(1)).filter(labels(_) == 3)
    val dflt = rules.count(r => isPlain(r) && labels(r) == 1)
    val ignored = rules.size - dflt - s2.size - s3.size - s4.size -
      w1.size - w2.size - w3.size - e2.size - e3.size
    RuleSet(s2, s3, s4, w1, w2, w3, e2, e3, dflt, ignored)
  }

  /** The bundled snapshot, parsed once. */
  val bundled: RuleSet = {
    val in = getClass.getClassLoader
      .getResourceAsStream("graft/public_suffix_snapshot.dat")
    require(in != null, "bundled resource graft/public_suffix_snapshot.dat is missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Two-label public suffixes (`co.uk` family + private-section hosts). */
  def suffixes2: Seq[String] = bundled.suffixes2

  /** Three-label public suffixes (`k12.ca.us` family). */
  def suffixes3: Seq[String] = bundled.suffixes3

  /** Four-label public suffixes (`s3.eu-central-1.amazonaws.com` family). */
  def suffixes4: Seq[String] = bundled.suffixes4

  /** TLDs under which EVERY 2-label tail is a public suffix (`*.ck`). */
  def wildcardTlds: Seq[String] = bundled.wildcardTlds

  /** 2-label wildcard bases (`*.kawasaki.jp` → base `kawasaki.jp`):
    * every 3-label tail under the base is a public suffix. */
  def wildcardBases2: Seq[String] = bundled.wildcardBases2

  /** 3-label wildcard bases (`*.compute.amazonaws.com`): every 4-label
    * tail under the base is a public suffix. */
  def wildcardBases3: Seq[String] = bundled.wildcardBases3

  /** 2-label exception hosts carved out of a wildcard (`!www.ck`): the
    * host itself is the registered domain. */
  def exceptions2: Seq[String] = bundled.exceptions2

  /** 3-label exception hosts (`!city.kawasaki.jp`). */
  def exceptions3: Seq[String] = bundled.exceptions3

  /** Plain single-label TLD rules in the bundle — skipped BY DESIGN
    * (they are the default rule's behavior), never counted as ignored. */
  def defaultTldRules: Int = bundled.defaultTldRules

  /** Rules present in the file but outside every supported shape —
    * surfaced so swapping in the full upstream list reports genuine
    * coverage gaps (if any) instead of silently narrowing. */
  def ignoredRules: Int = bundled.ignoredRules
}
