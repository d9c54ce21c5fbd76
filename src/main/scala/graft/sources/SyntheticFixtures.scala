package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

/** Deterministic fixture-file generation for the source round-trip
  * queries: the driver-side analog of the reference's inline test
  * fixtures (SURVEY §5). Only used with tiny dimension tables; data flow
  * back in is fully distributed.
  */
object SyntheticFixtures {

  def dir(name: String): File = {
    val d = new File(new File(System.getProperty("java.io.tmpdir"), "graft_fixtures"), name)
    d.mkdirs()
    d
  }

  def writeText(f: File, content: String): File = {
    val out = new FileOutputStream(f)
    try out.write(content.getBytes(UTF_8)) finally out.close()
    f
  }

  def writeGz(f: File, content: String): File = {
    val out = new GZIPOutputStream(new FileOutputStream(f))
    try out.write(content.getBytes(UTF_8)) finally out.close()
    f
  }

  /** Single-entry uncompressed-deflate zip via java.util.zip. */
  def writeZip(f: File, entryName: String, content: String): File = {
    val out = new ZipOutputStream(new FileOutputStream(f))
    try {
      out.putNextEntry(new ZipEntry(entryName))
      out.write(content.getBytes(UTF_8))
      out.closeEntry()
    } finally out.close()
    f
  }

  /** Minimal ustar single-file tar.gz (header + 512-padded payload). */
  def writeTarGz(f: File, entryName: String, content: String): File = {
    val data = content.getBytes(UTF_8)
    val header = new Array[Byte](512)
    val name = entryName.getBytes("US-ASCII")
    System.arraycopy(name, 0, header, 0, math.min(name.length, 100))
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = ("%0" + (len - 1) + "o").format(v)
      System.arraycopy(s.getBytes("US-ASCII"), 0, header, off, len - 1)
    }
    octal(420, 100, 8) // mode 0644
    octal(0, 108, 8); octal(0, 116, 8)
    octal(data.length.toLong, 124, 12)
    octal(0, 136, 12)
    header(156) = '0'
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)
    val checksum = header.map(_ & 0xff).sum
    octal(checksum.toLong, 148, 7)
    header(155) = 0
    val out = new GZIPOutputStream(new FileOutputStream(f))
    try {
      out.write(header)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
      out.write(new Array[Byte](1024)) // end-of-archive blocks
    } finally out.close()
    f
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Minimal OOXML workbook with one sheet of inline-string cells —
    * enough structure for [[XlsxSource]] (and Excel itself).
    */
  def writeXlsx(f: File, sheetName: String, rows: Seq[Seq[String]]): File = {
    val sheetXml = {
      val body = rows.zipWithIndex.map { case (r, ri) =>
        val cells = r.zipWithIndex.map { case (v, ci) =>
          if (v == null) ""
          else s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""
    val out = new ZipOutputStream(new FileOutputStream(f))
    try {
      Seq("xl/workbook.xml" -> workbookXml, "xl/_rels/workbook.xml.rels" -> relsXml,
        "xl/worksheets/sheet1.xml" -> sheetXml).foreach { case (n, c) =>
        out.putNextEntry(new ZipEntry(n)); out.write(c.getBytes(UTF_8)); out.closeEntry()
      }
    } finally out.close()
    f
  }

  /** Minimal BIFF8 .xls inside a CFB container for [[XlsSource]]: one
    * sheet of LABEL (inline string) and NUMBER cells. The Workbook
    * stream is padded past the 4096-byte mini-stream cutoff so the
    * container needs only the regular FAT (the reader handles both).
    */
  def writeXls(f: File, sheetName: String, rows: Seq[Seq[String]],
               password: Option[String] = None,
               encryption: String = "rc4"): File = {
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = { var x = v; (0 until 4).foreach { _ => bos.write((x & 0xff).toInt); x >>= 8 } }
    def rec(id: Int, body: Array[Byte]): Unit = { w16(id); w16(body.length); bos.write(body) }
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    def bof(docType: Int) = le16(0x0600) ++ le16(docType) ++ le16(0x0DBB) ++
      le16(0x07CC) ++ le32(0x000000C1L) ++ le32(0x00000406L)
    // globals: BOF + BOUNDSHEET (offset patched later) + EOF
    rec(0x0809, bof(0x0005))
    val boundsheetAt = bos.size()
    val nameBytes = sheetName.getBytes("ISO-8859-1")
    rec(0x0085, le32(0) ++ le16(0) ++
      Array[Byte](nameBytes.length.toByte, 0) ++ nameBytes)
    rec(0x000A, Array.empty)
    val sheetBof = bos.size()
    rec(0x0809, bof(0x0010))
    rows.zipWithIndex.foreach { case (r, ri) =>
      r.zipWithIndex.foreach { case (v, ci) =>
        if (v != null) {
          val isNum = v.nonEmpty && v.matches("[+-]?\\d+(\\.\\d+)?")
          if (isNum) {
            val d = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v.toDouble).array()
            rec(0x0203, le16(ri) ++ le16(ci) ++ le16(0) ++ d)
          } else {
            val chars = v.getBytes("ISO-8859-1")
            rec(0x0204, le16(ri) ++ le16(ci) ++ le16(0) ++
              le16(chars.length) ++ Array[Byte](0) ++ chars)
          }
        }
      }
    }
    rec(0x000A, Array.empty)
    var stream = bos.toByteArray
    // patch the BOUNDSHEET sheet-BOF offset
    val patched = stream.clone()
    val off = le32(sheetBof.toLong)
    System.arraycopy(off, 0, patched, boundsheetAt + 4, 4)
    stream = patched
    password.foreach { pw =>
      // FILEPASS right after the globals BOF, then the variant's
      // whole-stream transform (XlsCrypto): standard RC4, RC4 CryptoAPI
      // (128- or 40-bit), or XOR obfuscation
      val (fpBody, encryptFn): (Array[Byte], Array[Byte] => Array[Byte]) =
        encryption match {
          case "rc4" =>
            val (body, salt) = XlsCrypto.filePassBody(pw)
            (body, XlsCrypto.encryptWorkbookStream(_, pw, salt))
          case "cryptoapi" | "cryptoapi40" =>
            val bits = if (encryption == "cryptoapi40") 40 else 128
            val (body, salt) = XlsCrypto.filePassBodyCryptoApi(pw, bits)
            (body, XlsCrypto.encryptWorkbookStreamCryptoApi(_, pw, salt, bits))
          case "xor" =>
            (XlsCrypto.filePassBodyXor(pw),
              XlsCrypto.encryptWorkbookStreamXor(_, pw))
          case other =>
            throw new IllegalArgumentException(s"unknown xls encryption: $other")
        }
      val fpRec = le16(0x002F) ++ le16(fpBody.length) ++ fpBody
      val firstEnd = 4 + ((stream(2) & 0xff) | ((stream(3) & 0xff) << 8))
      val spliced = stream.take(firstEnd) ++ fpRec ++ stream.drop(firstEnd)
      System.arraycopy(le32((sheetBof + fpRec.length).toLong), 0, spliced,
        boundsheetAt + fpRec.length + 4, 4)
      stream = encryptFn(spliced)
    }
    if (stream.length < 4096) stream = stream ++ new Array[Byte](4096 - stream.length)

    // --- CFB container: header + FAT sector(s) + directory + stream ---
    val sectorSize = 512
    val streamSectors = (stream.length + sectorSize - 1) / sectorSize
    val dirSectors = 1 // 4 entries of 128B
    val total = streamSectors + dirSectors // data sectors after the FAT
    val fatSectors = 1 // supports up to 128 sectors ≈ 64 KB streams
    require(total + fatSectors <= 128, "fixture too large for single-FAT layout")
    val out = new ByteArrayOutputStream()
    def h16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def h32(v: Long): Unit = { var x = v; (0 until 4).foreach { _ => out.write((x & 0xff).toInt); x >>= 8 } }
    // header
    h32(0xE011CFD0L); h32(0xE11AB1A1L)
    out.write(new Array[Byte](16)) // clsid
    h16(0x003E); h16(0x0003) // minor, major
    h16(0xFFFE) // byte order
    h16(9); h16(6) // sector 512, mini 64
    out.write(new Array[Byte](6))
    h32(0) // num dir sectors (v3: 0)
    h32(fatSectors.toLong)
    h32(1L + streamSectors) // first directory sector = after FAT+stream
    h32(0)
    h32(4096L) // mini cutoff
    h32(EndOfChainC); h32(0) // no mini FAT
    h32(EndOfChainC); h32(0) // no DIFAT beyond header
    h32(0L) // DIFAT[0] = FAT at sector 0
    (1 until 109).foreach(_ => h32(0xFFFFFFFFL))
    // FAT sector 0: [0]=FATSECT, stream chain at sectors 1..streamSectors,
    // directory chain after
    val fat = new ByteArrayOutputStream()
    def f32(v: Long): Unit = { var x = v; (0 until 4).foreach { _ => fat.write((x & 0xff).toInt); x >>= 8 } }
    f32(0xFFFFFFFDL) // sector 0 = FAT itself
    (1 to streamSectors).foreach { i =>
      f32(if (i == streamSectors) EndOfChainC else i + 1L)
    }
    f32(EndOfChainC) // single directory sector
    while (fat.size() < sectorSize) f32(0xFFFFFFFFL)
    out.write(fat.toByteArray)
    // stream sectors
    out.write(stream)
    out.write(new Array[Byte](streamSectors * sectorSize - stream.length))
    // directory: root + Workbook + 2 empty
    val dir = new ByteArrayOutputStream()
    def dirEntry(name: String, typ: Int, start: Long, size: Long): Unit = {
      val n = name.getBytes("UTF-16LE")
      val e = new Array[Byte](128)
      System.arraycopy(n, 0, e, 0, math.min(n.length, 62))
      e(64) = ((n.length + 2) & 0xff).toByte
      e(65) = (((n.length + 2) >>> 8) & 0xff).toByte
      e(66) = typ.toByte
      e(67) = 1 // black
      // sibling/child: -1 except root's child = 1
      def put32(o: Int, v: Long): Unit = { var x = v; (0 until 4).foreach { i => e(o + i) = (x & 0xff).toByte; x >>= 8 } }
      put32(68, 0xFFFFFFFFL); put32(72, 0xFFFFFFFFL)
      put32(76, if (typ == 5) 1L else 0xFFFFFFFFL)
      put32(116, start); put32(120, size)
      dir.write(e)
    }
    dirEntry("Root Entry", 5, EndOfChainC, 0)
    dirEntry("Workbook", 2, 1L, stream.length.toLong)
    dir.write(new Array[Byte](128 * 2))
    out.write(dir.toByteArray)
    val fos = new FileOutputStream(f)
    try fos.write(out.toByteArray) finally fos.close()
    f
  }

  private val EndOfChainC = 0xFFFFFFFEL

  /** Minimal ODS with one table of string/typed cells for [[OdsSource]]. */
  def writeOds(f: File, sheetName: String, rows: Seq[Seq[String]]): File = {
    val body = rows.map { r =>
      val cells = r.map {
        case null => """<table:table-cell/>"""
        case v =>
          s"""<table:table-cell office:value-type="string"><text:p>${xmlEscape(v)}</text:p></table:table-cell>"""
      }.mkString
      s"<table:table-row>$cells</table:table-row>"
    }.mkString
    val content =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<office:document-content
         | xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
         | xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
         | xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
         |<office:body><office:spreadsheet>
         |<table:table table:name="${xmlEscape(sheetName)}">$body</table:table>
         |</office:spreadsheet></office:body></office:document-content>""".stripMargin
    val out = new ZipOutputStream(new FileOutputStream(f))
    try {
      out.putNextEntry(new ZipEntry("content.xml"))
      out.write(content.getBytes(UTF_8))
      out.closeEntry()
    } finally out.close()
    f
  }

  /** Single stored entry zip encrypted with WinZip AES-256 (AE-1):
    * PBKDF2(1000) keys, AES-CTR (LE counter from 1), HMAC-SHA1 auth code
    * — readable by [[Compression.decompress]] and standard zip tools.
    * Salt derives deterministically from the content (fixtures only).
    */
  def writeZipAes256(f: File, entryName: String, content: String, password: String): File = {
    val data = content.getBytes(UTF_8)
    val salt = java.security.MessageDigest.getInstance("MD5")
      .digest(("salt:" + content).getBytes(UTF_8)) // 16 bytes
    val (aesKey, macKey, pv) = Compression.aesZipKeys(password, salt, 32)
    val cipher = Compression.aesCtr(aesKey, data)
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(macKey, "HmacSHA1"))
    val auth = mac.doFinal(cipher).take(10)
    val payload = salt ++ pv ++ cipher ++ auth
    val crc = { val c = new java.util.zip.CRC32(); c.update(data); c.getValue }
    val nameB = entryName.getBytes("US-ASCII")
    // extra field 0x9901: vendor version AE-1, "AE", strength 3, method 0
    val extra = Array[Byte](0x01.toByte, 0x99.toByte, 7, 0, 1, 0, 'A', 'E', 3, 0, 0)
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >>> 8) & 0xff).toInt)
      bos.write(((v >>> 16) & 0xff).toInt); bos.write(((v >>> 24) & 0xff).toInt)
    }
    w32(0x04034b50L); w16(51); w16(1); w16(99)
    w16(0); w16(0)
    w32(crc); w32(payload.length.toLong); w32(data.length.toLong)
    w16(nameB.length); w16(extra.length)
    bos.write(nameB); bos.write(extra); bos.write(payload)
    val out = new FileOutputStream(f)
    try out.write(bos.toByteArray) finally out.close()
    f
  }

  /** Single stored entry zip encrypted with traditional ZipCrypto
    * (PKWARE APPNOTE §6.1) — readable by [[Compression.decompress]] with
    * a password and by standard zip tools.
    */
  def writeZipCrypto(f: File, entryName: String, content: String, password: String): File = {
    val data = content.getBytes(UTF_8)
    val crc = { val c = new java.util.zip.CRC32(); c.update(data); c.getValue }
    // encrypt: 12-byte header (last byte = crc>>24 per spec) + payload
    val zc = new Compression.ZipCrypto(password.getBytes("US-ASCII"))
    val head = Array.tabulate[Byte](12)(i => if (i == 11) ((crc >>> 24) & 0xff).toByte else i.toByte)
    val cipher = zc.encrypt(head ++ data)
    val nameB = entryName.getBytes("US-ASCII")
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >>> 8) & 0xff).toInt)
      bos.write(((v >>> 16) & 0xff).toInt); bos.write(((v >>> 24) & 0xff).toInt)
    }
    w32(0x04034b50L); w16(20); w16(1 /* encrypted */); w16(0 /* stored */)
    w16(0); w16(0) // time, date
    w32(crc); w32(cipher.length.toLong); w32(data.length.toLong)
    w16(nameB.length); w16(0)
    bos.write(nameB); bos.write(cipher)
    val out = new FileOutputStream(f)
    try out.write(bos.toByteArray) finally out.close()
    f
  }
}
