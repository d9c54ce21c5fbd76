package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** URL canonicalization, registered-domain extraction, and RFC 3986
  * reference resolution — the web-pipeline scalar layer that sits
  * between WARC ingestion ([[graft.sources.WarcSource]]) and
  * URL-keyed dedup/aggregation. Beyond the reference's scope (its
  * scalar transforms stop at dates/numbers/emails,
  * `DataImportWorker.java` mapping layer), so pinned against the
  * analytic oracle replay (q326/q327) instead of reference behavior.
  *
  * Canonical form (the crawl-frontier/dedup key used by web corpora):
  *  1. scheme and host lower-cased; a trailing dot on the host drops;
  *  2. default ports drop (`http:80`, `https:443`); others stay;
  *  3. the path is percent-normalized (decode unreserved `%41`→`A`,
  *     `%7e`→`~`; other escapes keep but upper-case their hex) and
  *     dot-segments are removed (RFC 3986 §5.2.4); an empty path
  *     becomes `/`;
  *  4. the query splits on `&`, drops empty pairs and tracking keys
  *     (`utm_*`, `gclid`, `fbclid`, `msclkid`), percent-normalizes
  *     keys and values, and sorts pairs lexicographically by
  *     (key, value) — parameter order never distinguishes documents;
  *  5. the fragment drops.
  * Unparsable inputs (no `scheme://`) canonicalize to null rather
  * than throw — crawl data is hostile.
  *
  * Registered domain: longest public-suffix match against an embedded
  * SUBSET of the public-suffix list (the common gTLDs/ccTLDs plus the
  * multi-label suffixes that make naive last-two-labels extraction
  * wrong, e.g. `co.uk`); registered = one label + suffix. Hosts with
  * no dot, IP literals, and bare suffixes return themselves. The full
  * PSL is a data file swap, not a code change.
  *
  * Scale model: every function is a per-row scalar — no shuffle, no
  * state; the honest-UDF case (a tolerant parser does not compose
  * from builtin expressions), kept off the hot aggregation path by
  * canonicalizing once at ingest.
  */
object UrlOps {

  /** `(scheme, authority, path, query, fragment)`; query/fragment null
    * when absent, authority includes userinfo/host/port verbatim.
    */
  private[functions] case class Parsed(scheme: String, authority: String,
                                       path: String, query: String,
                                       fragment: String)

  private def split(url: String): Option[Parsed] = {
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r
    url match {
      case m(scheme, auth, path, query, frag) =>
        Some(Parsed(scheme, auth, path, query, frag))
      case _ => None
    }
  }

  private val Unreserved: Char => Boolean = c =>
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode `%XX` escapes of unreserved chars; upper-case the hex of
    * every other escape; leave malformed `%` literal.
    */
  private[functions] def percentNormalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h1 = Character.digit(s.charAt(i + 1), 16)
        val h2 = Character.digit(s.charAt(i + 2), 16)
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4) | h2
          if (Unreserved(v.toChar)) sb.append(v.toChar)
          else sb.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.size - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.size - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val slash = in.indexOf('/', from)
        val seg = if (slash < 0) in else in.substring(0, slash)
        out += seg
        in = if (slash < 0) "" else in.substring(slash)
      }
    }
    out.mkString
  }

  private val TrackingExact = Set("gclid", "fbclid", "msclkid")
  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingExact(key)

  /** `(canonical url, kept query params, dropped tracking params)`;
    * None for unparsable input.
    */
  def canonicalizeStats(url: String): Option[(String, Int, Int)] =
    split(url).map { p =>
      val scheme = p.scheme.toLowerCase(Locale.ROOT)
      // userinfo kept verbatim; host case-folded; trailing dot drops
      val (userinfo, hostPort) = {
        val at = p.authority.lastIndexOf('@')
        if (at >= 0) (p.authority.substring(0, at + 1),
          p.authority.substring(at + 1))
        else ("", p.authority)
      }
      val (host0, port) = {
        val colon = hostPort.lastIndexOf(':')
        val isPort = colon >= 0 &&
          hostPort.substring(colon + 1).forall(_.isDigit) &&
          colon > hostPort.lastIndexOf(']') // IPv6 literal safe
        if (isPort) (hostPort.substring(0, colon), hostPort.substring(colon + 1))
        else (hostPort, "")
      }
      val host = host0.toLowerCase(Locale.ROOT).stripSuffix(".")
      val keepPort = port.nonEmpty && port.toIntOption.exists { n =>
        !((scheme == "http" && n == 80) || (scheme == "https" && n == 443))
      }
      val path0 = removeDotSegments(percentNormalize(p.path))
      val path = if (path0.isEmpty) "/" else path0
      val pairs = Option(p.query).filter(_.nonEmpty).toSeq
        .flatMap(_.split("&", -1).toSeq).filter(_.nonEmpty)
        .map { kv =>
          val eq = kv.indexOf('=')
          if (eq < 0) (percentNormalize(kv), null: String)
          else (percentNormalize(kv.substring(0, eq)),
            percentNormalize(kv.substring(eq + 1)))
        }
      val (dropped, kept) = pairs.partition(kv => isTracking(kv._1))
      val sorted = kept.sortBy(kv => (kv._1, if (kv._2 == null) "" else kv._2))
      val qs =
        if (sorted.isEmpty) ""
        else sorted.map { case (k, v) => if (v == null) k else s"$k=$v" }
          .mkString("?", "&", "")
      (s"$scheme://$userinfo$host" +
        (if (keepPort) s":$port" else "") + path + qs,
        kept.size, dropped.size)
    }

  def canonicalize(url: String): Option[String] =
    canonicalizeStats(url).map(_._1)

  /** Embedded public-suffix subset: every single-label TLD the corpus
    * can produce plus the common multi-label suffixes. Longest match
    * wins, exactly the PSL algorithm.
    */
  private val Suffixes: Set[String] = Set(
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "ai", "dev", "app", "co",
    "de", "fr", "es", "it", "nl", "uk", "cn", "jp", "au", "br", "ru",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.cn", "org.cn", "net.cn", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "github.io")

  /** Registered (pay-level) domain of a host: one label plus its
    * longest matching public suffix; the host itself when no suffix
    * matches, the host has no dot, it is a bare suffix, or it is an
    * IPv4/IPv6 literal.
    */
  def registeredDomain(host0: String): String = {
    if (host0 == null) return null
    val host = host0.toLowerCase(Locale.ROOT).stripSuffix(".")
    if (!host.contains('.') || host.startsWith("[") ||
      host.forall(c => c.isDigit || c == '.')) return host
    val labels = host.split('.')
    // longest suffix (in labels) that is on the list, shorter than host
    var best = -1
    var i = 1
    while (i < labels.length) {
      val suffix = labels.drop(i).mkString(".")
      if (Suffixes(suffix) && best < 0) best = i
      i += 1
    }
    if (best < 0) labels.takeRight(2).mkString(".") // unknown TLD: last two
    else labels.drop(best - 1).mkString(".")
  }

  /** RFC 3986 §5.2 reference resolution (for outlink extraction):
    * absolute refs pass through canonical-free; `//` network-path,
    * absolute-path, relative-path merge, and bare `?query`/`#frag`
    * refs resolve against the base. Returns None when the base itself
    * is unparsable. Fragments are dropped (link-graph semantics).
    */
  def resolve(base: String, ref: String): Option[String] =
    split(base).flatMap { b =>
      val noFrag = { val h = ref.indexOf('#'); if (h >= 0) ref.take(h) else ref }
      if (noFrag.isEmpty) Some(s"${b.scheme}://${b.authority}${b.path}" +
        (if (b.query != null && b.query.nonEmpty) s"?${b.query}" else ""))
      else if (split(noFrag).isDefined) Some(noFrag)
      else if (noFrag.startsWith("//")) Some(s"${b.scheme}:$noFrag")
      else if (noFrag.startsWith("?"))
        Some(s"${b.scheme}://${b.authority}${b.path}$noFrag")
      else {
        val (refPath, refQuery) = {
          val q = noFrag.indexOf('?')
          if (q >= 0) (noFrag.take(q), noFrag.substring(q)) else (noFrag, "")
        }
        val merged =
          if (refPath.startsWith("/")) refPath
          else {
            val basePath = if (b.path.isEmpty) "/" else b.path
            basePath.substring(0, basePath.lastIndexOf('/') + 1) + refPath
          }
        Some(s"${b.scheme}://${b.authority}" +
          removeDotSegments(merged) + refQuery)
      }
    }

  /** SURT (Sort-friendly URI Reordering Transform) key of an absolute
    * URL — the Common Crawl / web-archive index key: host labels
    * reversed and comma-joined, the non-default port kept after a
    * colon, then `)` and the path+query, the whole key lower-cased
    * and scheme-free. `https://WWW.Example.co.uk/A?b=1` →
    * `uk,co,example,www)/a?b=1`. Canonicalize FIRST when equivalence
    * classes matter — SURT itself is a pure reordering. None on
    * unparsable input.
    */
  def surt(url: String): Option[String] =
    split(url).map { p =>
      val scheme = p.scheme.toLowerCase(Locale.ROOT)
      val at = p.authority.lastIndexOf('@')
      val hp = p.authority.substring(at + 1)
      val colon = hp.lastIndexOf(':')
      val isPort = colon >= 0 && hp.substring(colon + 1).forall(_.isDigit) &&
        colon > hp.lastIndexOf(']')
      val host = (if (isPort) hp.substring(0, colon) else hp)
        .toLowerCase(Locale.ROOT).stripSuffix(".")
      val port = if (isPort) hp.substring(colon + 1) else ""
      val keepPort = port.nonEmpty && port.toIntOption.exists { n =>
        !((scheme == "http" && n == 80) || (scheme == "https" && n == 443))
      }
      val key = host.split('.').reverse.mkString(",") +
        (if (keepPort) s":$port" else "") + ")" + p.path +
        (if (p.query != null && p.query.nonEmpty) s"?${p.query}" else "")
      key.toLowerCase(Locale.ROOT)
    }

  // ---- Spark faces --------------------------------------------------

  case class CanonStats(canonical: String, kept_params: Int,
                        dropped_params: Int)

  /** struct(canonical, kept_params, dropped_params); null on
    * unparsable input.
    */
  val canonicalizeStatsUdf: Column => Column = {
    val f = udf { url: String =>
      if (url == null) None
      else canonicalizeStats(url).map { case (c, k, d) => CanonStats(c, k, d) }
    }
    (c: Column) => f(c)
  }

  val canonicalizeUdf: Column => Column = {
    val f = udf { url: String =>
      if (url == null) None else canonicalize(url)
    }
    (c: Column) => f(c)
  }

  val registeredDomainUdf: Column => Column = {
    val f = udf { host: String => Option(registeredDomain(host)) }
    (c: Column) => f(c)
  }

  /** Host of a canonical/absolute URL (null when unparsable). */
  val hostUdf: Column => Column = {
    val f = udf { url: String =>
      if (url == null) None
      else split(url).map { p =>
        val at = p.authority.lastIndexOf('@')
        val hp = p.authority.substring(at + 1)
        val colon = hp.lastIndexOf(':')
        val isPort = colon >= 0 && hp.substring(colon + 1).forall(_.isDigit) &&
          colon > hp.lastIndexOf(']')
        (if (isPort) hp.substring(0, colon) else hp)
          .toLowerCase(Locale.ROOT).stripSuffix(".")
      }
    }
    (c: Column) => f(c)
  }

  val surtUdf: Column => Column = {
    val f = udf { url: String => if (url == null) None else surt(url) }
    (c: Column) => f(c)
  }

  val resolveUdf: (Column, Column) => Column = {
    val f = udf { (base: String, ref: String) =>
      if (base == null || ref == null) None else resolve(base, ref)
    }
    (b: Column, r: Column) => f(b, r)
  }
}
