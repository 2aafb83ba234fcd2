package graft.rdf

/** Canonical N-Quads serializer.
  *
  * Byte-exact against the reference's oxrdf `Quad::to_string()` output
  * as pinned by the W3C fixture `tests/rdfc10/test060-rdfc10.nq`
  * (escaping torture test) and used both for hashing (H1DQ,
  * `src/canon.rs:545`) and final document output (`src/canon.rs:1140-1147`).
  *
  * Rules (FIXTURES.md §3):
  *  - literal ECHARs: \b \t \n \f \r \" \\
  *  - all other C0 controls and U+007F: uppercase 4-hex `\uXXXX`
  *  - `'` NOT escaped; chars >= U+0020 (except `"` `\`) literal UTF-8
  *  - IRIs emitted raw (UCHAR decoding happened at parse time)
  *  - plain-literal xsd:string datatype suppressed
  *  - line = space-separated components, default graph omitted,
  *    terminated `" .\n"`.
  */
object NQuadsWriter {
  private val HEX = "0123456789ABCDEF".toCharArray

  def escapeLiteral(v: String, sb: StringBuilder): Unit = {
    var i = 0
    val n = v.length
    while (i < n) {
      val c = v.charAt(i)
      (c: @annotation.switch) match {
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case _ =>
          if (c < 0x20 || c == 0x7F) {
            sb.append("\\u")
            sb.append(HEX((c >> 12) & 0xF)).append(HEX((c >> 8) & 0xF))
            sb.append(HEX((c >> 4) & 0xF)).append(HEX(c & 0xF))
          } else sb.append(c)
      }
      i += 1
    }
  }

  def writeTerm(kind: Byte, value: String, dt: String, lang: String,
                sb: StringBuilder): Unit = kind match {
    case TermKind.Iri => sb.append('<').append(value).append('>')
    case TermKind.BNode => sb.append("_:").append(value)
    case TermKind.Literal =>
      sb.append('"'); escapeLiteral(value, sb); sb.append('"')
      if (lang != null && lang.nonEmpty) sb.append('@').append(lang)
      else if (dt != null && dt.nonEmpty && dt != Quad.XsdString)
        sb.append("^^<").append(dt).append('>')
    case TermKind.DefaultGraph => () // omitted
  }

  /** Quad string WITHOUT the `" .\n"` terminator (the sort key form,
    * matching oxrdf `to_string`). */
  def quadBody(q: Quad, sb: StringBuilder): StringBuilder = {
    writeTerm(q.sKind, q.s, "", "", sb)
    sb.append(' ')
    writeTerm(TermKind.Iri, q.p, "", "", sb)
    sb.append(' ')
    writeTerm(q.oKind, q.o, q.oDt, q.oLang, sb)
    if (q.gKind != TermKind.DefaultGraph) {
      sb.append(' ')
      writeTerm(q.gKind, q.g, "", "", sb)
    }
    sb
  }

  def quadBody(q: Quad): String = quadBody(q, new StringBuilder(96)).toString

  /** Full canonical statement line: body + `" .\n"`. */
  def statement(q: Quad): String =
    quadBody(q, new StringBuilder(96)).append(" .\n").toString

  /** Canonical N-Quads document: statements sorted in code point
    * order, concatenated (`src/canon.rs:1140-1147`). One shared
    * scratch builder — this runs once per graph inside the kernel. */
  def serializeDocument(quads: Iterable[Quad]): String = {
    val scratch = new StringBuilder(96)
    val lines = quads.iterator.map { q =>
      scratch.setLength(0)
      quadBody(q, scratch).append(" .\n").toString
    }.toArray
    sortConcat(lines)
  }

  /** [[serializeDocument]] fused with bnode relabeling: each line is
    * written with `sub`-substituted blank-node ids directly, so the
    * per-quad Quad COPIES of `Rdfc10.relabel` (up to three `copy()`
    * allocations per quad) never exist. Byte-identical to
    * `serializeDocument(relabel(quads, issued))` — the canonical
    * document of every graph flows through here, and the kernel is
    * allocation-bound at high core counts (BENCH/BASELINE.md §3). */
  def serializeRelabeled(quads: Iterable[Quad], sub: String => String): String = {
    val scratch = new StringBuilder(96)
    val lines = quads.iterator.map { q =>
      scratch.setLength(0)
      if (q.sKind == TermKind.BNode) scratch.append("_:").append(sub(q.s))
      else writeTerm(q.sKind, q.s, "", "", scratch)
      scratch.append(' ')
      writeTerm(TermKind.Iri, q.p, "", "", scratch)
      scratch.append(' ')
      if (q.oKind == TermKind.BNode) scratch.append("_:").append(sub(q.o))
      else writeTerm(q.oKind, q.o, q.oDt, q.oLang, scratch)
      if (q.gKind != TermKind.DefaultGraph) {
        scratch.append(' ')
        if (q.gKind == TermKind.BNode) scratch.append("_:").append(sub(q.g))
        else writeTerm(q.gKind, q.g, "", "", scratch)
      }
      scratch.append(" .\n").toString
    }.toArray
    sortConcat(lines)
  }

  private def sortConcat(lines: Array[String]): String = {
    java.util.Arrays.sort(lines, CodePointOrdering)
    var len = 0
    var i = 0
    while (i < lines.length) { len += lines(i).length; i += 1 }
    val sb = new java.lang.StringBuilder(len) // exact-size, no growth copies
    i = 0
    while (i < lines.length) { sb.append(lines(i)); i += 1 }
    sb.toString
  }
}
