package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RobotsTxt._

/** Pins [[RobotsTxt]]: group selection, longest-match rule
  * resolution, wildcard/anchor patterns, and parse tolerance — RFC
  * 9309 semantics, each verdict hand-derived.
  */
class RobotsTxtSpec extends AnyFunSuite {

  private val Full =
    "# fixture\r\nUser-agent: other\r\nDisallow: /\r\n\r\n" +
      "User-agent: *\r\nDisallow: /docs/\r\n\r\n" +
      "User-agent: GraftBot\r\nUser-agent: graftbot-img\r\n" +
      "Disallow: /private/ # staff only\r\n" +
      "Allow: /private/pub*\r\n" +
      "Disallow: /*.tmp$\r\n" +
      "Allow: /docs/\r\nDisallow: /docs/4\r\n"

  test("group selection: named prefix match beats *; product version " +
    "after / is ignored; case-insensitive") {
    val r = rulesFor(Full, "graftbot/1.2")
    assert(r.rules.size === 5)
    assert(isAllowed(r, "/docs/12"))
    val fallback = rulesFor(Full, "unknownbot/9")
    assert(fallback.rules === Vector(("/docs/", false)))
    assert(!isAllowed(fallback, "/docs/12"))
    assert(isAllowed(fallback, "/private/doc1"))
  }

  test("second UA line serves the same group") {
    val r = rulesFor(Full, "graftbot-img/2.0")
    // graftbot-img is the LONGER matching token; same merged group
    assert(!isAllowed(r, "/private/doc1"))
  }

  test("longest-match decides; allow wins ties; no match allows") {
    val r = rulesFor(Full, "graftbot")
    assert(!isAllowed(r, "/docs/41")) // Disallow /docs/4 (7) > Allow /docs/ (6)
    assert(isAllowed(r, "/docs/51"))
    assert(!isAllowed(r, "/private/doc9")) // prefix disallow
    assert(isAllowed(r, "/private/pub9")) // longer wildcard allow overrides
    assert(isAllowed(r, "/elsewhere")) // no rule matches
    val tie = Rules(Vector(("/a/", false), ("/a/", true)))
    assert(isAllowed(tie, "/a/x"))
  }

  test("wildcard and $ anchor") {
    val r = rulesFor(Full, "graftbot")
    assert(!isAllowed(r, "/tmp/file9.tmp")) // /*.tmp$ matches
    assert(isAllowed(r, "/tmp/file9.tmp2")) // anchor: no match
    assert(ruleMatches("/*.tmp$", "/a/b/c.tmp"))
    assert(!ruleMatches("/*.tmp$", "/a/b/c.tmpx"))
    assert(ruleMatches("/a*b*c", "/aXXbYYc-and-more"))
  }

  test("parse tolerance: comments, CRLF, case-insensitive directives, " +
    "empty Disallow is no rule, unknown directives ignored") {
    val txt = "User-Agent: bot # inline\nDISALLOW:\nCrawl-delay: 5\n" +
      "disallow: /x\nSitemap: https://e/s.xml\n"
    val r = rulesFor(txt, "bot/1")
    assert(r.rules === Vector(("/x", false)))
    assert(isAllowed(r, "/y"))
    assert(!isAllowed(r, "/x/page"))
  }

  test("a User-agent line after rules starts a new group") {
    val txt = "User-agent: a\nDisallow: /only-a\n" +
      "User-agent: b\nDisallow: /only-b\n"
    assert(rulesFor(txt, "a").rules === Vector(("/only-a", false)))
    assert(rulesFor(txt, "b").rules === Vector(("/only-b", false)))
  }

  test("groups sharing the winning token merge") {
    val txt = "User-agent: bot\nDisallow: /one\n" +
      "User-agent: other\nDisallow: /\n" +
      "User-agent: bot\nDisallow: /two\n"
    val r = rulesFor(txt, "bot")
    assert(r.rules.toSet === Set(("/one", false), ("/two", false)))
  }
}
