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

  /** Shared per-thread line pool: document serialization runs once
    * per graph inside the single-threaded kernel, so pooled lines are
    * sorted by index and concatenated without a String per line. */
  private val poolLocal = new ThreadLocal[LinePool] {
    override def initialValue(): LinePool = new LinePool
  }

  /** Canonical N-Quads document: statements sorted in code point
    * order, concatenated (`src/canon.rs:1140-1147`). One shared
    * scratch builder — this runs once per graph inside the kernel. */
  def serializeDocument(quads: Iterable[Quad]): String =
    pooledSortConcat(quads) { (q, sb) =>
      quadBody(q, sb).append(" .\n")
      ()
    }

  /** [[serializeDocument]] fused with bnode relabeling: each line is
    * written with `sub`-substituted blank-node ids directly, so the
    * per-quad Quad COPIES of `Rdfc10.relabel` (up to three `copy()`
    * allocations per quad) never exist. Byte-identical to
    * `serializeDocument(relabel(quads, issued))` — the canonical
    * document of every graph flows through here, and the kernel is
    * allocation-bound at high core counts (BENCH/BASELINE.md §3). */
  def serializeRelabeled(quads: Iterable[Quad], sub: String => String): String =
    pooledSortConcat(quads) { (q, sb) =>
      if (q.sKind == TermKind.BNode) sb.append("_:").append(sub(q.s))
      else writeTerm(q.sKind, q.s, "", "", sb)
      sb.append(' ')
      writeTerm(TermKind.Iri, q.p, "", "", sb)
      sb.append(' ')
      if (q.oKind == TermKind.BNode) sb.append("_:").append(sub(q.o))
      else writeTerm(q.oKind, q.o, q.oDt, q.oLang, sb)
      if (q.gKind != TermKind.DefaultGraph) {
        sb.append(' ')
        if (q.gKind == TermKind.BNode) sb.append("_:").append(sub(q.g))
        else writeTerm(q.gKind, q.g, "", "", sb)
      }
      sb.append(" .\n")
      ()
    }

  /** Render one line per quad into the thread's char pool, sort the
    * line indices in code point order, concatenate into an exact-size
    * builder. Falls back to a String-per-line path for pathological
    * line counts (LinePool.MaxPooledLines) so a one-off mega-graph
    * cannot pin its high-water pool on the thread. */
  private def pooledSortConcat(quads: Iterable[Quad])
                              (write: (Quad, StringBuilder) => Unit): String = {
    val scratch = new StringBuilder(96)
    val it = quads.iterator
    val known = quads.knownSize
    if (known >= 0 && known <= LinePool.MaxPooledLines) {
      val pool = poolLocal.get()
      pool.reset()
      while (it.hasNext) {
        scratch.setLength(0)
        write(it.next(), scratch)
        pool.add(scratch)
      }
      val order = pool.sortedIndices()
      val sb = new java.lang.StringBuilder(pool.totalLength)
      var i = 0
      while (i < pool.n) {
        sb.append(pool.buf(order(i)), 0, pool.len(order(i)))
        i += 1
      }
      sb.toString
    } else {
      val lines = it.map { q =>
        scratch.setLength(0)
        write(q, scratch)
        scratch.toString
      }.toArray
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
}
