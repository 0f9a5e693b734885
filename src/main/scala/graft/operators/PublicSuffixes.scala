package graft.operators

/** The public-suffix rule set behind [[Urls.registeredDomain]], loaded
  * from the bundled `graft/public_suffix_snapshot.dat` resource — a
  * curated offline snapshot in the upstream publicsuffix.org rule
  * syntax (`//` comments, `*.` wildcard rules, `!` exception rules), so
  * a production deployment can drop the verbatim upstream
  * `public_suffix_list.dat` in its place and this loader parses it
  * unchanged.
  *
  * What the matcher consumes (everything else parses and is ignored,
  * loudly counted in [[ignoredRules]]):
  *   - 2-label rules (`co.uk`, `github.io`)  → registered = last 3 labels;
  *   - 3-label rules (`k12.ca.us`, `act.edu.au`, `s3.amazonaws.com`)
  *     → registered = last 4 labels;
  *   - TLD wildcards (`*.ck`) → any 2-label tail is a suffix,
  *     registered = last 3 labels;
  *   - their exceptions (`!www.ck`) → that host IS the registered domain.
  * Single-label rules are the default (`*`) rule's behavior — last two
  * labels — and carry no information for the matcher, so upstream's
  * thousands of plain TLD entries are skipped by design. The upstream
  * list's handful of deeper rules (4-label normals, wildcards under a
  * multi-label base such as `*.nom.br` or `*.kawasaki.jp`) are outside
  * the supported shapes; hosts under them group one label too coarse —
  * the documented fidelity bound of the snapshot matcher.
  *
  * The whole set is a few thousand short strings — driver-resident,
  * baked into plans as literal `isin` sets (Catalyst folds them to
  * hash-set membership): broadcast-sized by construction, per the
  * C4/Dolma provenance-pipeline precedent of shipping the PSL with the
  * job. */
object PublicSuffixes {

  /** Raw rule lines (comments/blank stripped), as bundled. */
  private val rules: Seq[String] = {
    val in = getClass.getClassLoader
      .getResourceAsStream("graft/public_suffix_snapshot.dat")
    require(in != null, "bundled resource graft/public_suffix_snapshot.dat is missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//")).toList
    finally src.close()
  }

  private def labels(r: String): Int = r.count(_ == '.') + 1

  /** Two-label public suffixes (`co.uk` family + private-section hosts). */
  val suffixes2: Seq[String] =
    rules.filter(r => !r.startsWith("*") && !r.startsWith("!") && labels(r) == 2)

  /** Three-label public suffixes (`k12.ca.us` family). */
  val suffixes3: Seq[String] =
    rules.filter(r => !r.startsWith("*") && !r.startsWith("!") && labels(r) == 3)

  /** TLDs under which EVERY 2-label tail is a public suffix (`*.ck`). */
  val wildcardTlds: Seq[String] =
    rules.filter(r => r.startsWith("*.") && labels(r) == 2).map(_.drop(2))

  /** Exception hosts carved out of a wildcard (`!www.ck`): the host
    * itself is the registered domain. */
  val exceptions2: Seq[String] =
    rules.filter(_.startsWith("!")).map(_.drop(1)).filter(labels(_) == 2)

  /** Rules present in the file but outside the supported shapes —
    * surfaced so swapping in the full upstream list reports its
    * coverage instead of silently narrowing. */
  val ignoredRules: Int =
    rules.size - suffixes2.size - suffixes3.size - wildcardTlds.size - exceptions2.size
}
