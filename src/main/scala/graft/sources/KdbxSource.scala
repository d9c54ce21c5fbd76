package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** KeePass 2 (.kdbx, format 3.1) source (reference
  * dataprovider/KdbxDataProvider.java:31-280, SURVEY §2.1): decrypt with
  * the password, iterate every entry in every group, each entry's
  * String key/value map = one row.
  *
  * Pure-JDK implementation of the public KDBX 3.1 container (KeePass
  * file-format spec): AES-KDF (N rounds of AES-ECB over the composite
  * key), AES-256-CBC payload, StreamStartBytes check, hashed block
  * stream, optional gzip, inner XML. Inner-stream protection
  * (Salsa20/ChaCha20 for Protected="True" values) is not implemented —
  * protected values surface as their raw text and kdbx4 (Argon2) files
  * are rejected with a clear error.
  */
object KdbxSource {

  private val Magic1 = 0x9AA2D903
  private val Magic2 = 0xB54BFB67

  private def sha256(b: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    b.foreach(md.update)
    md.digest()
  }

  private[sources] case class Header(cipherIv: Array[Byte], masterSeed: Array[Byte],
                                     transformSeed: Array[Byte], rounds: Long,
                                     streamStart: Array[Byte], gzip: Boolean,
                                     headerLen: Int)

  private def parseHeader(bytes: Array[Byte]): Header = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic1 && buf.getInt() == Magic2, "not a kdbx file")
    val version = buf.getInt()
    require((version >>> 16) == 3,
      s"unsupported kdbx version ${version >>> 16} (only 3.x; kdbx4 needs Argon2)")
    var iv: Array[Byte] = null
    var seed: Array[Byte] = null
    var tseed: Array[Byte] = null
    var rounds = 600000L
    var start: Array[Byte] = null
    var gz = false
    var done = false
    while (!done) {
      val id = buf.get()
      val len = buf.getShort() & 0xffff
      val data = new Array[Byte](len)
      buf.get(data)
      id match {
        case 0 => done = true
        case 3 => gz = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).getInt() == 1
        case 4 => seed = data
        case 5 => tseed = data
        case 6 => rounds = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).getLong()
        case 7 => iv = data
        case 9 => start = data
        case _ => // CipherID(2), ProtectedStreamKey(8), InnerRandomStreamID(10): unused
      }
    }
    Header(iv, seed, tseed, rounds, start, gz, buf.position())
  }

  private def deriveMasterKey(password: String, h: Header): Array[Byte] = {
    val composite = sha256(sha256(password.getBytes("UTF-8")))
    val aes = Cipher.getInstance("AES/ECB/NoPadding")
    aes.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(h.transformSeed, "AES"))
    var k = composite
    var i = 0L
    while (i < h.rounds) { k = aes.doFinal(k); i += 1 }
    sha256(h.masterSeed, sha256(k))
  }

  private def readHashedBlocks(data: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = new ByteArrayOutputStream()
    var done = false
    while (!done && buf.remaining() >= 40) {
      buf.getInt() // block index
      val hash = new Array[Byte](32)
      buf.get(hash)
      val len = buf.getInt()
      if (len == 0) done = true
      else {
        val block = new Array[Byte](len)
        buf.get(block)
        require(java.util.Arrays.equals(sha256(block), hash), "kdbx block hash mismatch")
        out.write(block)
      }
    }
    out.toByteArray
  }

  /** Decrypt a kdbx payload to the inner XML string. */
  private[sources] def decryptXml(bytes: Array[Byte], password: String): String = {
    val h = parseHeader(bytes)
    val key = deriveMasterKey(password, h)
    val aes = Cipher.getInstance("AES/CBC/PKCS5Padding")
    aes.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(h.cipherIv))
    val plain = aes.doFinal(bytes, h.headerLen, bytes.length - h.headerLen)
    require(plain.length >= h.streamStart.length &&
      java.util.Arrays.equals(plain.take(h.streamStart.length), h.streamStart),
      "wrong kdbx password (StreamStartBytes mismatch)")
    val blocks = readHashedBlocks(plain.drop(h.streamStart.length))
    val xml = if (h.gzip) {
      val g = new GZIPInputStream(new ByteArrayInputStream(blocks))
      val out = new ByteArrayOutputStream()
      val b = new Array[Byte](64 * 1024)
      var n = g.read(b)
      while (n >= 0) { out.write(b, 0, n); n = g.read(b) }
      out.toByteArray
    } else blocks
    new String(xml, "UTF-8")
  }

  /** Entries from the inner XML: every `<Entry>`'s `<String><Key>/<Value>`
    * pairs (all groups, any depth), like the reference's entry walk.
    */
  private[sources] def parseEntries(xml: String): Seq[Map[String, String]] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    var entry: scala.collection.mutable.LinkedHashMap[String, String] = null
    var inHistory = false
    var key: String = null
    var cur: String = null // "Key" | "Value" | null
    val text = new StringBuilder
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "History" => inHistory = true
        case "Entry" if !inHistory => entry = scala.collection.mutable.LinkedHashMap.empty
        case "Key" | "Value" if entry != null && !inHistory =>
          cur = r.getLocalName; text.clear()
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if cur != null => text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "History" => inHistory = false
        case "Key" if entry != null && !inHistory => key = text.toString; cur = null
        case "Value" if entry != null && key != null && !inHistory =>
          entry(key) = text.toString; key = null; cur = null
        case "Entry" if !inHistory && entry != null => out += entry.toMap; entry = null
        case _ =>
      }
      case _ =>
    } finally r.close()
    out.toSeq
  }

  /** One kdbx file per task (`binaryFile`), union-of-keys schema. */
  def read(spark: SparkSession, path: String, password: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    val parsed = files.rdd.flatMap(b => parseEntries(decryptXml(b, password)))
    parsed.cache()
    val cols = parsed.flatMap(_.keys).distinct().collect().sorted
    val schema = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    spark.createDataFrame(parsed.map(m => Row.fromSeq(cols.map(c => m.getOrElse(c, null)))), schema)
  }
}

/** Fixture-side kdbx 3.1 writer (deterministic seeds for tests). */
object KdbxWriter {

  private def sha256(b: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    b.foreach(md.update)
    md.digest()
  }

  def write(f: java.io.File, password: String,
            entries: Seq[Map[String, String]], rounds: Long = 6000): java.io.File = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val xml = {
      val es = entries.map { e =>
        e.map { case (k, v) =>
          s"<String><Key>${esc(k)}</Key><Value>${esc(v)}</Value></String>"
        }.mkString("<Entry>", "", "</Entry>")
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><KeePassFile><Root><Group><Name>Root</Name>$es</Group></Root></KeePassFile>"""
    }
    // deterministic "random" material derived from the content
    val masterSeed = sha256("seed".getBytes, xml.getBytes("UTF-8"))
    val transformSeed = sha256("tseed".getBytes, xml.getBytes("UTF-8"))
    val iv = sha256("iv".getBytes, xml.getBytes("UTF-8")).take(16)
    val streamStart = sha256("start".getBytes, xml.getBytes("UTF-8"))

    val gzipped = {
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos)
      g.write(xml.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    // hashed block stream: one block + terminator
    val blocks = {
      val b = ByteBuffer.allocate(4 + 32 + 4 + gzipped.length + 40)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0); b.put(sha256(gzipped)); b.putInt(gzipped.length); b.put(gzipped)
      b.putInt(1); b.put(new Array[Byte](32)); b.putInt(0)
      b.array()
    }
    val plain = streamStart ++ blocks

    val composite = sha256(sha256(password.getBytes("UTF-8")))
    val aesEcb = Cipher.getInstance("AES/ECB/NoPadding")
    aesEcb.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(transformSeed, "AES"))
    var k = composite
    (0L until rounds).foreach(_ => k = aesEcb.doFinal(k))
    val masterKey = sha256(masterSeed, sha256(k))
    val aes = Cipher.getInstance("AES/CBC/PKCS5Padding")
    aes.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(masterKey, "AES"), new IvParameterSpec(iv))
    val cipherText = aes.doFinal(plain)

    val out = new ByteArrayOutputStream()
    def le32(v: Int) = { val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); b.putInt(v); out.write(b.array()) }
    def field(id: Int, data: Array[Byte]): Unit = {
      out.write(id)
      val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(data.length.toShort); out.write(b.array()); out.write(data)
    }
    le32(0x9AA2D903); le32(0xB54BFB67.toInt); le32(0x00030001)
    field(3, { val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); b.putInt(1); b.array() }) // gzip
    field(4, masterSeed)
    field(5, transformSeed)
    field(6, { val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(rounds); b.array() })
    field(7, iv)
    field(9, streamStart)
    field(10, new Array[Byte](4)) // InnerRandomStreamID = 0 (none)
    field(0, "\r\n\r\n".getBytes)
    out.write(cipherText)
    val fos = new java.io.FileOutputStream(f)
    try fos.write(out.toByteArray) finally fos.close()
    f
  }
}
