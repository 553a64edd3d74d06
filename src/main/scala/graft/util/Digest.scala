package graft.util

/** Minimal hex sha256 (no external deps). */
object Digest {
  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    b.foreach(x => sb.append(f"${x & 0xFF}%02x"))
    sb.toString
  }
}
