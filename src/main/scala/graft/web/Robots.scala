package graft.web

/** RFC 9309 (Robots Exclusion Protocol) parser and matcher — the
  * governance layer of the web-archive front door: before a crawl
  * corpus is trained on (or recrawled), every fetched URI is audited
  * against the site's robots.txt, and the politeness scheduler reads
  * the de-facto `Crawl-delay` extension.
  *
  * Implemented per the spec:
  *  - line grammar: `field: value` with `#` comments, blank-line
  *    tolerance, case-INSENSITIVE field names and agent tokens,
  *    case-SENSITIVE path patterns;
  *  - groups: consecutive `User-agent` lines share the following
  *    rules; a `User-agent` after rules opens a new group; ALL groups
  *    naming the chosen agent are combined (RFC 9309 §2.2.1);
  *  - group selection: exact product-token match, else the `*` group,
  *    else allow-all;
  *  - matching: rules are PREFIX matches over the path with `*`
  *    (any span) and a trailing `$` (end anchor) — a backtracking
  *    matcher, since greedy-first placement is wrong for anchored
  *    patterns like `*9$` against `909`;
  *  - precedence: the longest matching rule wins, measured in octets
  *    of the raw rule text (including `*`/`$`); on an allow/disallow
  *    tie of equal length, ALLOW wins (§2.2.2);
  *  - empty rule values (`Disallow:` with nothing) match nothing;
  *  - `Sitemap` lines are collected globally; unknown fields ignored.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  final case class Group(agents: Vector[String], rules: Vector[Rule],
      crawlDelay: Long)

  final case class RobotsTxt(groups: Vector[Group], sitemaps: Vector[String])

  def parse(text: String): RobotsTxt = {
    val groups = Vector.newBuilder[Group]
    val sitemaps = Vector.newBuilder[String]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay = 0L
    var inRules = false // rules seen since the last User-agent line
    var open = false // a group is being accumulated
    def close(): Unit = {
      if (open) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = 0L
      inRules = false; open = false
    }
    text.split("\n", -1).foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (inRules) close() // UA after rules starts a new group
              agents :+= value.toLowerCase
              open = true
            case "allow" | "disallow" if open =>
              inRules = true
              if (value.nonEmpty) rules :+= Rule(field == "allow", value)
            case "crawl-delay" if open =>
              inRules = true
              if (value.nonEmpty && value.forall(_.isDigit)) delay = value.toLong
            case "sitemap" =>
              if (value.nonEmpty) sitemaps += value
            case _ => () // unknown fields and rules before any UA: ignored
          }
        }
      }
    }
    close()
    RobotsTxt(groups.result(), sitemaps.result())
  }

  /** The rules in force for `agent`: all groups naming it exactly
    * (case-insensitive) combined, else all `*` groups combined, else
    * allow-all. Returns the matched group name and the merged view
    * (crawl delay = max across combined groups — the conservative
    * read).
    */
  def select(r: RobotsTxt, agent: String): (String, Group) = {
    val a = agent.toLowerCase
    val exact = r.groups.filter(_.agents.contains(a))
    val (name, gs) =
      if (exact.nonEmpty) (a, exact)
      else {
        val star = r.groups.filter(_.agents.contains("*"))
        ("*", star)
      }
    if (gs.isEmpty) (name, Group(Vector(name), Vector.empty, 0L))
    else (name, Group(Vector(name), gs.flatMap(_.rules),
      gs.map(_.crawlDelay).max))
  }

  /** Does `pattern` (with `*` spans and an optional trailing `$`
    * anchor) prefix-match `path`? Backtracking — correct for anchored
    * wildcards where greedy-first placement fails.
    */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    def walk(pi: Int, si: Int): Boolean =
      if (pi == p.length) !anchored || si == path.length
      else p.charAt(pi) match {
        case '*' => (si to path.length).exists(j => walk(pi + 1, j))
        case c => si < path.length && path.charAt(si) == c && walk(pi + 1, si + 1)
      }
    walk(0, 0)
  }

  /** Evaluate `path` against a (combined) group: (allowed, octets of
    * the winning rule — 0 when no rule matched, which means allowed).
    * Longest rule wins; allow beats disallow at equal length.
    */
  def decide(g: Group, path: String): (Boolean, Int) = {
    var bestAllow = -1
    var bestDisallow = -1
    g.rules.foreach { r =>
      if (matches(r.pattern, path)) {
        if (r.allow) bestAllow = math.max(bestAllow, r.pattern.length)
        else bestDisallow = math.max(bestDisallow, r.pattern.length)
      }
    }
    if (bestAllow < 0 && bestDisallow < 0) (true, 0)
    else if (bestAllow >= bestDisallow) (true, bestAllow)
    else (false, bestDisallow)
  }
}
