package graft.core

import java.security.SecureRandom
import java.util.UUID

/** Id generation, parity with the reference's `watermill.NewUUID` /
  * `NewShortUUID` / `NewULID` (reference: uuid.go:12,17,22). Driver-side
  * generators for constructing messages; in-plan ids use the `uuid()`
  * SQL function (codegen'd, per-row, nondeterministic-safe).
  */
object Ids {
  private val rng = new SecureRandom()
  private val CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  def newUuid(): String = UUID.randomUUID().toString

  /** 26-char Crockford-base32 ULID: 48-bit ms timestamp + 80-bit random.
    * Lexicographically sortable by creation time (uuid.go:22 semantics). */
  def newUlid(): String = newUlid(System.currentTimeMillis())

  def newUlid(timeMs: Long): String = {
    val sb = new StringBuilder(26)
    // 10 chars of time (48 bits, 5 bits per char => 50; top 2 bits zero)
    var t = timeMs
    val timeChars = new Array[Char](10)
    var i = 9
    while (i >= 0) { timeChars(i) = CROCKFORD((t & 31).toInt); t >>>= 5; i -= 1 }
    sb.appendAll(timeChars)
    // 16 chars of randomness (80 bits)
    val rnd = new Array[Byte](10)
    rng.nextBytes(rnd)
    var acc = 0L; var bits = 0
    rnd.foreach { b =>
      acc = (acc << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(CROCKFORD(((acc >>> bits) & 31).toInt)) }
    }
    sb.toString.take(26)
  }
}
