package graft.rdf

/** Unicode code point (= UTF-8 byte) string ordering.
  *
  * Every sort the RDFC-1.0 spec calls "code point order" (H1DQ nquads
  * sort, hash-map iteration, HNDQ path compares, final document sort —
  * reference `src/canon.rs:568-570,978,1057,1070,1142`) uses Rust
  * `String` ordering, which is UTF-8 byte order == code point order.
  * Java `String.compareTo` is UTF-16 code-unit order, which diverges
  * when a BMP char in [U+E000,U+FFFF] meets a supplementary char
  * (surrogates sort low in UTF-16 but supplementary code points are
  * the highest). Fix-up: remap the first differing code unit so that
  * surrogates compare above all BMP characters.
  */
object CodePointOrdering extends Ordering[String] {
  @inline private[rdf] def fix(c: Char): Int =
    if (c >= 0xE000) c - 0x800 else if (c >= 0xD800) c + 0x2000 else c

  override def compare(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    val n = if (la < lb) la else lb
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        return if (ca < 0xD800 && cb < 0xD800) ca - cb else fix(ca) - fix(cb)
      }
      i += 1
    }
    la - lb
  }
}
