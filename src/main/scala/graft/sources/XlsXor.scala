package graft.sources

/** XOR obfuscation "Method 1" for BIFF8 workbooks — the
  * `wEncryptionType = 0` FILEPASS variant (MS-XLS §2.2.10 / §2.4.117,
  * MS-OFFCRYPTO §2.3.7; the reference reads these via POI,
  * ExcelDataProvider.java:488-568). Tables and pseudocode follow the
  * public specification: a 16-bit key and verifier derived from the
  * ANSI password, a 16-byte XOR array, and a per-record byte transform
  * whose array index is keyed to the record data's END offset so
  * CONTINUE spans stay aligned.
  *
  * Encrypt: `rotl8(plain ^ XorArray[i], 5)`; decrypt:
  * `rotl8(cipher, 3) ^ XorArray[i]` (an involution pair — rotl 3 undoes
  * rotl 5 mod 8). Fixtures in this repo are written and read by this
  * same implementation; the sandbox has no real XOR-obfuscated
  * workbooks to cross-check byte-for-byte, so the spec citation is the
  * authority for the layout and the spec-pinned unit tests pin the
  * derivations.
  */
object XlsXor {

  /** Password-length-indexed initial key codes (MS-OFFCRYPTO §2.3.7.2). */
  private val InitialCode = Array(
    0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE,
    0x313E, 0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A,
    0x4EC3)

  /** 15×7 bit-mix matrix (MS-OFFCRYPTO §2.3.7.2), row per password
    * position (last char first), column per bit.
    */
  private val XorMatrix = Array(
    0xAEFC, 0x4DD9, 0x9BB2, 0x2745, 0x4E8A, 0x9D14, 0x2A09,
    0x7B61, 0xF6C2, 0xFDA5, 0xEB6B, 0xC6F7, 0x9DCF, 0x2BBF,
    0x4563, 0x8AC6, 0x05AD, 0x0B5A, 0x16B4, 0x2D68, 0x5AD0,
    0x0375, 0x06EA, 0x0DD4, 0x1BA8, 0x3750, 0x6EA0, 0xDD40,
    0xD849, 0xA0B3, 0x5147, 0xA28E, 0x553D, 0xAA7A, 0x44D5,
    0x6F45, 0xDE8A, 0xAD35, 0x4A4B, 0x9496, 0x390D, 0x721A,
    0xEB23, 0xC667, 0x9CEF, 0x29FF, 0x53FE, 0xA7FC, 0x5FD9,
    0x47D3, 0x8FA6, 0x0F6D, 0x1EDA, 0x3DB4, 0x7B68, 0xF6D0,
    0xB861, 0x60E3, 0xC1C6, 0x93AD, 0x377B, 0x6EF6, 0xDDEC,
    0x45A0, 0x8B40, 0x06A1, 0x0D42, 0x1A84, 0x3508, 0x6A10,
    0xAA51, 0x4483, 0x8906, 0x022D, 0x045A, 0x08B4, 0x1168,
    0x76B4, 0xED68, 0xCAF1, 0x85C3, 0x1BA7, 0x374E, 0x6E9C,
    0x3730, 0x6E60, 0xDCC0, 0xA9A1, 0x4363, 0x86C6, 0x1DAD,
    0x3331, 0x6662, 0xCCC4, 0x89A9, 0x0373, 0x06E6, 0x0DCC,
    0x1021, 0x2042, 0x4084, 0x8108, 0x1231, 0x2462, 0x48C4)

  /** Pad bytes appended after the password in the XOR array
    * (MS-OFFCRYPTO §2.3.7.1).
    */
  private val PadArray = Array(0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9,
    0x80, 0x00, 0xBE, 0x0F, 0x00, 0xBF, 0x0F, 0x00).map(_.toByte)

  /** ANSI password bytes — the legacy scheme predates Unicode; ASCII
    * passwords (the practical case) map 1:1 under windows-1252.
    */
  private def ansi(password: String): Array[Byte] = {
    require(password.nonEmpty && password.length <= 15,
      s"XOR obfuscation passwords are 1..15 chars, got ${password.length}")
    password.getBytes("windows-1252")
  }

  /** 16-bit obfuscation key: fold each password bit (last char first,
    * 7 bits per char) through the matrix (CreateXorKey_Method1).
    */
  def createKey(password: String): Int = {
    val pw = ansi(password)
    var key = InitialCode(pw.length - 1)
    var current = XorMatrix.length - 1 // 0x68
    var i = pw.length - 1
    while (i >= 0) {
      var c = pw(i) & 0xff
      var j = 0
      while (j < 7) {
        if ((c & 0x40) != 0) key ^= XorMatrix(current)
        c <<= 1
        current -= 1
        j += 1
      }
      i -= 1
    }
    key & 0xffff
  }

  /** 16-bit password verifier: 15-bit rotate-accumulate over the
    * password bytes (last first) and length, xor 0xCE4B
    * (CreatePasswordVerifier_Method1).
    */
  def createVerifier(password: String): Int = {
    val pw = ansi(password)
    def rotl15(x: Int) = (((x & 0x4000) >> 14) | ((x << 1) & 0x7FFF)) & 0x7FFF
    var v = 0
    var i = pw.length - 1
    while (i >= 0) {
      v = rotl15(v) ^ (pw(i) & 0xff)
      i -= 1
    }
    ((rotl15(v) ^ pw.length ^ 0xCE4B) & 0xffff)
  }

  /** 16-byte XOR array: password ++ pad, each byte xored with the key's
    * alternating low/high byte then rotated left 2
    * (CreateXorArray_Method1).
    */
  def createXorArray(password: String): Array[Byte] = {
    val pw = ansi(password)
    val key = createKey(password)
    val arr = new Array[Byte](16)
    System.arraycopy(pw, 0, arr, 0, pw.length)
    var i = pw.length
    while (i < 16) { arr(i) = PadArray(i - pw.length); i += 1 }
    val keyLe = Array((key & 0xff).toByte, ((key >> 8) & 0xff).toByte)
    def rotl8(b: Int, n: Int) = (((b << n) | (b >>> (8 - n))) & 0xff)
    var ix = 0
    while (ix < 16) {
      arr(ix) = rotl8((arr(ix) ^ keyLe(ix & 1)) & 0xff, 2).toByte
      ix += 1
    }
    arr
  }

  /** One data byte, encrypt direction: `rotl8(plain ^ k, 5)`. */
  def encryptByte(plain: Int, k: Int): Int = {
    val x = (plain ^ k) & 0xff
    ((x << 5) | (x >>> 3)) & 0xff
  }

  /** One data byte, decrypt direction: `rotl8(cipher, 3) ^ k`. */
  def decryptByte(cipher: Int, k: Int): Int = {
    val x = ((cipher << 3) | ((cipher & 0xff) >>> 5)) & 0xff
    (x ^ k) & 0xff
  }
}
