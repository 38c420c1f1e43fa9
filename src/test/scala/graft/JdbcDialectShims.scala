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

  /** Postgres `('x' || <hex>)::bit(32)::BIGINT` semantics: the 'x' prefix
    * marks the rest as hex (Postgres's documented hex-to-bit idiom), the
    * bit(32) cast requires EXACTLY 32 bits (Postgres errors on a length
    * mismatch — mirrored by the require), and the BIGINT cast
    * zero-extends, so the result is the unsigned 32-bit value.
    */
  def pgHexBit32(s: String): java.lang.Long = {
    if (s == null) return null
    require(s.length == 9 && (s.charAt(0) == 'x' || s.charAt(0) == 'X'),
      s"bit(32) needs 'x' + exactly 8 hex chars, got '$s'")
    java.lang.Long.parseLong(s.substring(1), 16)
  }

  /** Rewrites the one Postgres-ONLY piece of syntax in a hash template —
    * the postfix cast chain `(expr)::bit(32)::BIGINT` — into a call to
    * the PGBIT32 shim, per the documented equivalence `x::t == CAST(x AS
    * t)`. No CREATE FUNCTION can teach Derby's parser a postfix cast, so
    * this is the minimal bridge that lets the REST of the template (the
    * 'x' concat, SUBSTR window, MD5 composition) execute verbatim.
    */
  def normalizePostgresBitCast(template: String): String = {
    val suffix = "::bit(32)::BIGINT"
    val idx = template.indexOf(suffix)
    require(idx > 0 && template.charAt(idx - 1) == ')',
      s"template has no parenthesized $suffix cast: $template")
    var depth = 0
    var i = idx - 1
    var start = -1
    while (start < 0 && i >= 0) {
      template.charAt(i) match {
        case ')' => depth += 1
        case '(' => depth -= 1; if (depth == 0) start = i
        case _   =>
      }
      i -= 1
    }
    require(start >= 0, s"unbalanced parens before $suffix: $template")
    template.substring(0, start) + "PGBIT32" +
      template.substring(start, idx) + template.substring(idx + suffix.length)
  }
}
