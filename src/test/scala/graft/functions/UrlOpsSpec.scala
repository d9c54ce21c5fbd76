package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlOps._

/** Pins [[UrlOps]]: canonicalization rule-by-rule, registered-domain
  * suffix matching, and RFC 3986 §5.4 reference-resolution vectors
  * (the spec's own normal + abnormal examples).
  */
class UrlOpsSpec extends AnyFunSuite {

  test("scheme and host fold; default ports drop; explicit ports stay") {
    assert(canonicalize("HTTPS://WWW.Example.COM:443/a") ===
      Some("https://www.example.com/a"))
    assert(canonicalize("http://host.example:80/a") ===
      Some("http://host.example/a"))
    assert(canonicalize("http://host.example:8080/a") ===
      Some("http://host.example:8080/a"))
    assert(canonicalize("https://host.example:80/a") ===
      Some("https://host.example:80/a")) // 80 is not https's default
  }

  test("trailing host dot drops; empty path becomes /") {
    assert(canonicalize("http://example.com.") === Some("http://example.com/"))
  }

  test("dot segments resolve per RFC 3986 5.2.4") {
    assert(removeDotSegments("/a/b/c/./../../g") === "/a/g")
    assert(removeDotSegments("/mid/content=5/../6") === "/mid/6")
    assert(removeDotSegments("/../up/../x") === "/x")
    assert(removeDotSegments("/a/..") === "/")
  }

  test("percent normalization: unreserved decode, reserved hex uppercase, " +
    "malformed literal") {
    assert(percentNormalize("%7e%41%2f%zz%2") === "~A%2F%zz%2")
  }

  test("query: tracking params drop, rest sort by (key,value), " +
    "empty pairs vanish, fragment drops") {
    assert(canonicalize(
      "http://h.example/p?utm_source=x&b=2&&a=1&gclid=g&a=0&flag#frag") ===
      Some("http://h.example/p?a=0&a=1&b=2&flag"))
    assert(canonicalizeStats(
      "http://h.example/p?utm_source=x&b=2&gclid=g&a=1").map(t => (t._2, t._3))
      === Some((2, 2)))
  }

  test("unparsable input canonicalizes to None, never throws") {
    assert(canonicalize("www.example.com/no-scheme") === None)
    assert(canonicalize("not a url at all") === None)
    assert(canonicalize("") === None)
  }

  test("registered domain: longest public-suffix match") {
    assert(registeredDomain("www.example.co.uk") === "example.co.uk")
    assert(registeredDomain("a.b.example.com") === "example.com")
    assert(registeredDomain("example.com.cn") === "example.com.cn")
    assert(registeredDomain("user.github.io") === "user.github.io")
    assert(registeredDomain("deep.user.github.io") === "user.github.io")
  }

  test("registered domain: no-dot hosts, bare suffixes, IPs, unknown TLDs") {
    assert(registeredDomain("localhost") === "localhost")
    assert(registeredDomain("co.uk") === "co.uk")
    assert(registeredDomain("192.168.0.1") === "192.168.0.1")
    assert(registeredDomain("a.b.unknowntld") === "b.unknowntld")
  }

  test("SURT: host labels reverse, non-default port kept, key " +
    "lower-cased and scheme-free; unparsable is None") {
    assert(surt("https://WWW.Example.co.uk/A?b=1") ===
      Some("uk,co,example,www)/a?b=1"))
    assert(surt("https://host.example:8080/p") ===
      Some("example,host:8080)/p"))
    assert(surt("https://host.example:443/p") === Some("example,host)/p"))
    assert(surt("http://host.example.:80/") === Some("example,host)/"))
    assert(surt("no-scheme/path") === None)
  }

  private val Base = "http://a/b/c/d;p?q"

  test("RFC 3986 5.4.1 normal reference-resolution examples") {
    val cases = Seq(
      "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g",
      "//g" -> "http://g", "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y", "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/", ".." -> "http://a/b/",
      "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    cases.foreach { case (ref, want) =>
      assert(resolve(Base, ref) === Some(want), s"ref=$ref")
    }
  }

  test("RFC 3986 5.4.2 abnormal examples: .. above root clamps") {
    assert(resolve(Base, "../../../g") === Some("http://a/g"))
    assert(resolve(Base, "../../../../g") === Some("http://a/g"))
    assert(resolve(Base, "/./g") === Some("http://a/g"))
    assert(resolve(Base, "/../g") === Some("http://a/g"))
  }

  test("resolution: absolute refs pass through; fragments drop; " +
    "empty ref returns the base without fragment") {
    assert(resolve(Base, "https://other.example/x#top") ===
      Some("https://other.example/x"))
    assert(resolve(Base, "#top") === Some("http://a/b/c/d;p?q"))
    assert(resolve(Base, "g#s") === Some("http://a/b/c/g"))
  }
}
