package graft.sink

import java.io.{File, FileOutputStream}
import java.security.KeyStore
import java.security.cert.X509Certificate
import javax.net.ssl.{SSLContext, SSLSocket, TrustManager, X509TrustManager}

/** `createtruststore` mode (reference DbImport.java:745-746, delegating
  * to its utilities' createTrustStoreFile): connect to a TLS endpoint,
  * capture the certificate chain the server presents, and store it as a
  * JKS truststore that a JDBC driver can point at via
  * `javax.net.ssl.trustStore` — the bootstrap step for talking TLS to a
  * database with a self-signed or private-CA certificate.
  */
object TrustStore {

  /** `hostAndPort` may carry an explicit `host:port`; otherwise
    * `defaultPort` (the reference passes 443). A null/empty password
    * stores the keystore with an empty password, like the reference.
    *
    * IPv6: a bare v6 literal (`::1`, `2001:db8::1`) is taken WHOLE as
    * the host — a suffix only counts as a port when it is all digits
    * and the rest of the string has no other colon; the bracketed
    * `[v6]:port` syntax addresses a v6 host with an explicit port.
    */
  def createTrustStoreFile(hostAndPort: String, defaultPort: Int,
                           file: File, password: Array[Char]): Unit = {
    val (host, port) = splitHostPort(hostAndPort, defaultPort)
    val chain = fetchServerChain(host, port)
    require(chain.nonEmpty, s"no certificates presented by $host:$port")
    val ks = KeyStore.getInstance("JKS")
    ks.load(null, null)
    chain.zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"$host-$i", c)
    }
    Option(file.getParentFile).foreach(_.mkdirs())
    val out = new FileOutputStream(file)
    try ks.store(out, if (password == null) Array.emptyCharArray else password)
    finally out.close()
  }

  /** (host, port) from the endpoint spec — see Scaladoc on
    * [[createTrustStoreFile]] for the IPv6 rules.
    */
  private[sink] def splitHostPort(spec: String, defaultPort: Int): (String, Int) = {
    if (spec.startsWith("[")) {
      // bracketed v6: [addr] or [addr]:port
      val close = spec.indexOf(']')
      require(close > 0, s"unclosed '[' in endpoint: $spec")
      val host = spec.substring(1, close)
      val rest = spec.substring(close + 1)
      if (rest.isEmpty) (host, defaultPort)
      else {
        require(rest.startsWith(":") && rest.drop(1).forall(_.isDigit) &&
          rest.length > 1, s"invalid port suffix in endpoint: $spec")
        (host, rest.drop(1).toInt)
      }
    } else spec.lastIndexOf(':') match {
      case -1 => (spec, defaultPort)
      case ix =>
        val suffix = spec.substring(ix + 1)
        // only a digits-only suffix after the ONLY colon is a port —
        // anything else (::1, 2001:db8::1) is a bare v6 literal
        if (suffix.nonEmpty && suffix.forall(_.isDigit) &&
            spec.indexOf(':') == ix)
          (spec.substring(0, ix), suffix.toInt)
        else (spec, defaultPort)
    }
  }

  /** One TLS handshake with a chain-RECORDING trust manager. The capture
    * handshake accepts any chain — that is the point of the mode: the
    * captured chain becomes the trust anchor set the user then pins.
    */
  private def fetchServerChain(host: String, port: Int): Seq[X509Certificate] = {
    @volatile var captured: Seq[X509Certificate] = Seq.empty
    val recorder = new X509TrustManager {
      override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
      override def checkClientTrusted(chain: Array[X509Certificate],
                                      authType: String): Unit = ()
      override def checkServerTrusted(chain: Array[X509Certificate],
                                      authType: String): Unit =
        captured = chain.toSeq
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[TrustManager](recorder), new java.security.SecureRandom())
    val socket = ctx.getSocketFactory.createSocket(host, port).asInstanceOf[SSLSocket]
    try {
      socket.setSoTimeout(15000)
      socket.startHandshake()
    } finally socket.close()
    captured
  }
}
