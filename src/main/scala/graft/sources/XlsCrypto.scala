package graft.sources

import java.security.MessageDigest

/** BIFF8 "standard" RC4 workbook encryption (MS-XLS 2.3.6, public
  * spec; the reference reads these files through POI —
  * ExcelDataProvider.java works on any workbook POI opens). From-scratch
  * implementation:
  *
  *  - key schedule: `base = MD5(MD5(pw_utf16le)[0..5] ++ salt, ×16)[0..5]`,
  *    per-1024-byte-block RC4 key = `MD5(base ++ LE32(block))`;
  *  - the keystream covers the ENTIRE workbook stream (record headers
  *    included) but header bytes, the FILEPASS/BOF/InterfaceHdr/…
  *    record bodies, and BoundSheet8's lbPlyPos stay plaintext — their
  *    keystream bytes are discarded;
  *  - password check: RC4-decrypt the 32-byte verifier pair with block 0
  *    and compare `MD5(verifier)` to the decrypted verifier hash.
  */
object XlsCrypto {

  val FilePassSid = 0x002F

  /** Record bodies that are never encrypted (MS-XLS 2.2.10). */
  private val PlaintextSids = Set(
    0x0809, // BOF
    0x002F, // FILEPASS
    0x00E1, // INTERFACEHDR
    0x01A4, // USREXCL
    0x01A5, // FILELOCK
    0x0196, // RRDINFO
    0x0138) // RRDHEADREC

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  /** Minimal RC4. */
  final class Rc4(key: Array[Byte]) {
    private val s = Array.tabulate(256)(_.toByte)
    private var i = 0
    private var j = 0
    locally {
      var x = 0; var y = 0
      while (x < 256) {
        y = (y + s(x) + key(x % key.length)) & 0xff
        val t = s(x); s(x) = s(y); s(y) = t
        x += 1
      }
    }
    def next(): Int = {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      s((s(i) + s(j)) & 0xff) & 0xff
    }
    def crypt(data: Array[Byte]): Array[Byte] =
      data.map(b => (b ^ next()).toByte)
  }

  /** 5-byte key material from password + salt (MS-XLS 2.3.6.2). */
  def keyBase(password: String, salt: Array[Byte]): Array[Byte] = {
    val h0 = md5(password.getBytes("UTF-16LE")).take(5)
    val kd = new Array[Byte](16 * 21)
    (0 until 16).foreach { i =>
      System.arraycopy(h0, 0, kd, i * 21, 5)
      System.arraycopy(salt, 0, kd, i * 21 + 5, 16)
    }
    md5(kd).take(5)
  }

  /** Full 16-byte RC4 key for a 1024-byte block. */
  def blockKey(base5: Array[Byte], block: Int): Array[Byte] = {
    val le = Array[Byte]((block & 0xff).toByte, ((block >> 8) & 0xff).toByte,
      ((block >> 16) & 0xff).toByte, ((block >> 24) & 0xff).toByte)
    md5(base5, le)
  }

  /** Password check against the FILEPASS verifier pair (one continuous
    * block-0 keystream over verifier then hash).
    */
  def verifyPassword(base5: Array[Byte], encVerifier: Array[Byte],
                     encVerifierHash: Array[Byte]): Boolean = {
    val rc4 = new Rc4(blockKey(base5, 0))
    val verifier = rc4.crypt(encVerifier)
    val hash = rc4.crypt(encVerifierHash)
    md5(verifier).sameElements(hash)
  }

  /** Parsed FILEPASS (standard RC4 variant only). */
  case class FilePass(salt: Array[Byte], encVerifier: Array[Byte],
                      encVerifierHash: Array[Byte])

  private def u16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Locate FILEPASS among the first records of the globals substream. */
  def findFilePass(wb: Array[Byte]): Option[(Int, FilePass)] = {
    var o = 0
    var seen = 0
    while (o + 4 <= wb.length && seen < 8) {
      val id = u16(wb, o); val len = u16(wb, o + 2); val body = o + 4
      if (id == FilePassSid) {
        require(u16(wb, body) == 1,
          "XOR-obfuscated .xls not supported (wEncryptionType=0)")
        require(u16(wb, body + 2) == 1 && u16(wb, body + 4) == 1,
          "RC4 CryptoAPI .xls not supported (standard RC4 only)")
        return Some((o, FilePass(
          wb.slice(body + 6, body + 22),
          wb.slice(body + 22, body + 38),
          wb.slice(body + 38, body + 54))))
      }
      o = body + len; seen += 1
    }
    None
  }

  /** XOR the keystream over every encryptable byte range of `wb`
    * (shared by decrypt and the fixture-side encrypt — RC4 is an
    * involution under XOR). Keystream position == absolute stream
    * offset; rekey at every 1024-byte boundary; discarded for record
    * headers, [[PlaintextSids]] bodies, and BoundSheet8's 4-byte
    * lbPlyPos.
    */
  private def applyKeystream(wb: Array[Byte], base5: Array[Byte]): Array[Byte] = {
    val out = wb.clone()
    var rc4: Rc4 = null
    var block = -1
    def k(offset: Int): Int = {
      val b = offset / 1024
      if (b != block) { block = b; rc4 = new Rc4(blockKey(base5, b)) }
      rc4.next()
    }
    var o = 0
    while (o + 4 <= wb.length) {
      val id = u16(wb, o); val len = u16(wb, o + 2)
      k(o); k(o + 1); k(o + 2); k(o + 3) // header: discard keystream
      var p = o + 4
      val end = o + 4 + len
      val plainPrefix = if (id == 0x0085) 4 else 0 // BoundSheet8 lbPlyPos
      while (p < end && p < wb.length) {
        val ks = k(p)
        if (!PlaintextSids.contains(id) && p - (o + 4) >= plainPrefix)
          out(p) = (wb(p) ^ ks).toByte
        p += 1
      }
      o = end
    }
    out
  }

  /** Decrypt a workbook stream in place (FILEPASS stays, plaintext).
    * Throws IllegalArgumentException on a wrong password.
    */
  def decryptWorkbookStream(wb: Array[Byte], password: String): Array[Byte] = {
    val (_, fp) = findFilePass(wb).getOrElse(return wb)
    val base5 = keyBase(password, fp.salt)
    if (!verifyPassword(base5, fp.encVerifier, fp.encVerifierHash))
      throw new IllegalArgumentException("wrong .xls password")
    applyKeystream(wb, base5)
  }

  /** Fixture-side: encrypt a plaintext workbook stream that already
    * contains a FILEPASS record carrying `salt`/verifier pair.
    */
  private[sources] def encryptWorkbookStream(wb: Array[Byte], password: String,
                                             salt: Array[Byte]): Array[Byte] =
    applyKeystream(wb, keyBase(password, salt))

  /** Fixture-side FILEPASS body for `password` with a deterministic
    * salt/verifier derived from it.
    */
  private[sources] def filePassBody(password: String): (Array[Byte], Array[Byte]) = {
    val salt = md5(("salt:" + password).getBytes("UTF-8"))
    val verifier = md5(("verifier:" + password).getBytes("UTF-8"))
    val verifierHash = md5(verifier)
    val base5 = keyBase(password, salt)
    val rc4 = new Rc4(blockKey(base5, 0))
    val encVerifier = rc4.crypt(verifier)
    val encVerifierHash = rc4.crypt(verifierHash)
    val body = Array[Byte](1, 0, 1, 0, 1, 0) ++ salt ++ encVerifier ++ encVerifierHash
    (body, salt)
  }
}
