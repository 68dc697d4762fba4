package graft.functions

/** Pure-Scala Keccak-256 (original Keccak padding 0x01, as used for
  * Ethereum event-signature topics — NOT NIST SHA3's 0x06 domain byte).
  * Implemented from the public Keccak specification (FIPS 202 §3 /
  * keccak.team reference): 25×64-bit state, rate 1088 bits, 24 rounds.
  * Referenced by the ABI-decode surface (SURVEY.md §2.2 P3: topic[0] =
  * keccak(eventSignature), ref `README.md:28-34`).
  */
object Keccak {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25, 39, 41, 45,
    15, 21, 8, 18, 2, 61, 56, 14)

  private val PIL: Array[Int] = {
    // pi lane permutation: dest index for each source index
    val p = new Array[Int](25)
    for (x <- 0 until 5; y <- 0 until 5)
      p(x + 5 * y) = y + 5 * ((2 * x + 3 * y) % 5)
    p
  }

  private def keccakF(a: Array[Long]): Unit = {
    var round = 0
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20); x += 1
      }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // rho + pi
      var i = 0
      while (i < 25) {
        b(PIL(i)) = java.lang.Long.rotateLeft(a(i), ROT(i)); i += 1
      }
      // chi
      var y = 0
      while (y < 5) {
        x = 0
        while (x < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^
            (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          x += 1
        }
        y += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** Keccak-256 digest of `msg`. */
  def hash256(msg: Array[Byte]): Array[Byte] = {
    val rate = 136 // bytes, for 256-bit output
    val state = new Array[Long](25)
    // pad: 0x01 …(zeros)… 0x80 (last byte OR'd)
    val padded = {
      val padLen = rate - (msg.length % rate)
      val out = java.util.Arrays.copyOf(msg, msg.length + padLen)
      out(msg.length) = 0x01.toByte
      out(out.length - 1) = (out(out.length - 1) | 0x80).toByte
      out
    }
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 0
        while (j < 8) {
          lane |= (padded(off + i * 8 + j) & 0xffL) << (8 * j); j += 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) { out(i * 8 + j) = (state(i) >>> (8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def hash256Hex(msg: Array[Byte]): String = {
    val d = hash256(msg)
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
