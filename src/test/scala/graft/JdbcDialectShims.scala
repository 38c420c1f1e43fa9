package graft

/** Derby-callable shims for dialect functions Derby lacks, letting the
  * MySQL `hashExpr` template execute VERBATIM against the embedded Derby
  * harness (`CREATE FUNCTION … EXTERNAL NAME 'graft.JdbcDialectShims.…'`).
  * Each mimics the MySQL function it stands in for exactly (MD5 of the
  * UTF-8 bytes as lowercase hex; CONV base conversion), so a split proven
  * lossless here is the split a real MySQL would produce.
  */
object JdbcDialectShims {
  def md5(s: String): String = {
    if (s == null) return null
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
  }

  def conv(s: String, fromBase: Int, toBase: Int): java.lang.Long = {
    if (s == null) return null
    require(toBase == 10, "shim supports decimal output only")
    java.lang.Long.parseLong(s, fromBase)
  }
}
