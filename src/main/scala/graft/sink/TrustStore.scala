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
    */
  def createTrustStoreFile(hostAndPort: String, defaultPort: Int,
                           file: File, password: Array[Char]): Unit = {
    val (host, port) = hostAndPort.lastIndexOf(':') match {
      case -1 => (hostAndPort, defaultPort)
      case ix => (hostAndPort.substring(0, ix), hostAndPort.substring(ix + 1).toInt)
    }
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
