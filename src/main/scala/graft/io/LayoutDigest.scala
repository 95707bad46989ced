package graft.io

/** Collision-resistant name suffix for materialized layouts keyed by
  * source dir (first 16 hex of md5 over the full path). The previous
  * 32-bit `String.hashCode` suffix had a silent-wrong-data failure
  * class: a collision between two source dirs would make the memoized
  * tableExists/path check serve one dir's layout for the other
  * (round-9 ADVICE). 64 bits of md5 makes that a non-event, and the
  * digest is stable across JVMs, unlike hashCode's contract. */
private[io] object LayoutDigest {
  def apply(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
}
