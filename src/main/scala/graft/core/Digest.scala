package graft.core

/** Shared digest helpers. md5hex is the ONE implementation behind the
  * batch hash chain (Cdc.hashChain) and its streaming twin
  * (Streams.hashChainStream): their bit-identity contract depends on
  * both sides hashing the same bytes the same way, so the encoding
  * lives here once rather than as per-operator copies that could
  * drift.
  */
object Digest {
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
