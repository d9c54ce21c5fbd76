package graft.functions

import java.util.Locale

/** robots.txt parsing and allow/disallow evaluation (RFC 9309, the
  * Robots Exclusion Protocol) — the crawl-compliance filter a web
  * corpus applies between frontier and fetch. Beyond the reference's
  * scope, so pinned against the analytic oracle replay (q328).
  *
  * Semantics implemented (the Google/RFC 9309 rules, which differ
  * from the 1994 draft in ways that change real-world verdicts):
  *  - groups are runs of `User-agent:` lines followed by rules; a
  *    `User-agent:` line after rules starts a new group; a group with
  *    several UA lines serves all of them;
  *  - group selection: among groups whose UA token is a
  *    case-insensitive PREFIX of the crawler's product token, the
  *    longest token wins and every group carrying it merges; the `*`
  *    groups apply only when nothing matches;
  *  - rule matching: a pattern matches path prefixes, `*` matches any
  *    run, a trailing `$` anchors at end-of-path; the MOST SPECIFIC
  *    (longest-pattern) matching rule decides, an allow/disallow tie
  *    at equal length resolves to allow; no matching rule = allowed;
  *  - empty `Disallow:` values are no rule at all (the classic
  *    allow-everything file); directive names are case-insensitive;
  *    `#` starts a comment anywhere on a line; CRLF and LF both end
  *    lines. Unknown directives are ignored.
  *
  * Scale model: robots files number in the domains (small corpus),
  * pages in the documents — so rules compile once per domain and ride
  * a broadcast closure into a per-row verdict; no shuffle, no
  * re-parse per page.
  */
object RobotsTxt {

  /** Compiled rule set for one crawler on one robots.txt: (pattern,
    * isAllow), kept in file order.
    */
  case class Rules(rules: Vector[(String, Boolean)]) extends Serializable

  private case class Group(agents: Vector[String],
                           rules: Vector[(String, Boolean)])

  private def parseGroups(txt: String): Vector[Group] = {
    val out = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(String, Boolean)]
    var inAgents = true
    def closeGroup(): Unit = {
      if (agents.nonEmpty) out += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty
    }
    for (raw <- txt.split("\r?\n")) {
      val noComment = { val h = raw.indexOf('#'); if (h >= 0) raw.take(h) else raw }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) closeGroup()
            inAgents = true
            agents :+= value.toLowerCase(Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            if (value.nonEmpty && agents.nonEmpty)
              rules :+= ((value, key == "allow"))
          case _ => inAgents = false // sitemap/crawl-delay/unknown
        }
      }
    }
    closeGroup()
    out.result()
  }

  /** Compile the rule set one crawler obeys from one robots.txt body.
    * `agent` is the crawler's product token (anything after `/` is
    * ignored for matching, per the RFC).
    */
  def rulesFor(txt: String, agent: String): Rules = {
    val token = agent.toLowerCase(Locale.ROOT).takeWhile(_ != '/')
    val groups = parseGroups(txt)
    val named = groups.filter(g =>
      g.agents.exists(a => a != "*" && token.startsWith(a)))
    if (named.nonEmpty) {
      val best = named.flatMap(_.agents)
        .filter(a => a != "*" && token.startsWith(a)).maxBy(_.length)
      Rules(groups.filter(_.agents.contains(best)).flatMap(_.rules))
    } else Rules(groups.filter(_.agents.contains("*")).flatMap(_.rules))
  }

  /** Does `pattern` match `path`? Prefix semantics; `*` any run; a
    * trailing `$` anchors the end.
    */
  private[functions] def ruleMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    def m(pi: Int, si: Int): Boolean =
      if (pi == pat.length) !anchored || si == path.length
      else if (pat.charAt(pi) == '*')
        (si to path.length).exists(s2 => m(pi + 1, s2))
      else si < path.length && path.charAt(si) == pat.charAt(pi) &&
        m(pi + 1, si + 1)
    m(0, 0)
  }

  /** Most-specific-match verdict: longest matching pattern decides,
    * allow wins length ties, no match allows.
    */
  def isAllowed(rules: Rules, path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for ((pat, allow) <- rules.rules if ruleMatches(pat, path)) {
      if (pat.length > bestLen || (pat.length == bestLen && allow)) {
        if (pat.length > bestLen) { bestLen = pat.length; bestAllow = allow }
        else bestAllow = true // tie: allow wins
      }
    }
    bestAllow
  }
}
