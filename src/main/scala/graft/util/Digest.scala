package graft.util

/** Minimal hex sha256 (no external deps). */
object Digest {
  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // allocation-free hex (called once per document in the index build;
    // a per-byte Formatter would dominate the digest itself)
    java.util.HexFormat.of().formatHex(b)
  }
}
