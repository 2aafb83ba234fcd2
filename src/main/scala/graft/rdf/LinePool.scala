package graft.rdf

/** Reusable pool of char-array lines + an index merge sort in code
  * point order — lets the canonicalization kernel sort and digest its
  * per-quad lines without materializing a String per line (the
  * per-line String + char[] pair was a leading slice of the kernel's
  * allocation churn, and the kernel is DRAM-bandwidth-bound at high
  * core counts — BENCH/BASELINE.md §3).
  *
  * Not thread-safe: intended to be held in a ThreadLocal (or one
  * single-threaded State). Buffers are retained across `reset()` as
  * reuse scratch; callers should fall back to a String path for
  * pathologically large line counts (see [[LinePool.MaxPooledLines]])
  * so a one-off mega-graph cannot pin its high-water footprint on the
  * thread forever.
  */
final class LinePool {
  private var bufs = new Array[Array[Char]](64)
  private var lens = new Array[Int](64)
  private var count = 0
  private var idx = new Array[Int](64)
  private var tmp = new Array[Int](64)

  def n: Int = count
  def buf(i: Int): Array[Char] = bufs(i)
  def len(i: Int): Int = lens(i)

  def reset(): Unit = count = 0

  /** Copy the builder's content into the next pooled line. */
  def add(sb: StringBuilder): Unit = {
    if (count == bufs.length) {
      bufs = java.util.Arrays.copyOf(bufs, bufs.length << 1)
      lens = java.util.Arrays.copyOf(lens, lens.length << 1)
    }
    val l = sb.length
    var b = bufs(count)
    if (b == null || b.length < l) {
      var cap = 64
      while (cap < l) cap <<= 1
      b = new Array[Char](cap)
      bufs(count) = b
    }
    sb.underlying.getChars(0, l, b, 0)
    lens(count) = l
    count += 1
  }

  /** Total chars across all pooled lines. */
  def totalLength: Int = {
    var s = 0
    var i = 0
    while (i < count) { s += lens(i); i += 1 }
    s
  }

  /** [[CodePointOrdering]] over two pooled lines. */
  private def cmp(i: Int, j: Int): Int = {
    val a = bufs(i); val la = lens(i)
    val b = bufs(j); val lb = lens(j)
    val n = if (la < lb) la else lb
    var k = 0
    while (k < n) {
      val ca = a(k)
      val cb = b(k)
      if (ca != cb) {
        return if (ca < 0xD800 && cb < 0xD800) ca - cb
        else CodePointOrdering.fix(ca) - CodePointOrdering.fix(cb)
      }
      k += 1
    }
    la - lb
  }

  /** Line indices [0, n) sorted by code point order (stable,
    * allocation-free iterative merge sort over reused int arrays).
    * The returned array is scratch: valid only until the next
    * `add`/`reset`, and may be longer than `n`. */
  def sortedIndices(): Array[Int] = {
    if (idx.length < count) {
      idx = new Array[Int](bufs.length)
      tmp = new Array[Int](bufs.length)
    }
    var i = 0
    while (i < count) { idx(i) = i; i += 1 }
    var src = idx
    var dst = tmp
    var width = 1
    while (width < count) {
      var lo = 0
      while (lo < count) {
        val mid = math.min(lo + width, count)
        val hi = math.min(lo + 2 * width, count)
        var a = lo
        var b = mid
        var o = lo
        while (a < mid && b < hi) {
          if (cmp(src(a), src(b)) <= 0) { dst(o) = src(a); a += 1 }
          else { dst(o) = src(b); b += 1 }
          o += 1
        }
        while (a < mid) { dst(o) = src(a); a += 1; o += 1 }
        while (b < hi) { dst(o) = src(b); b += 1; o += 1 }
        lo = hi
      }
      val t = src; src = dst; dst = t
      width <<= 1
    }
    src
  }
}

object LinePool {
  /** Above this many lines a caller should prefer a plain String path:
    * the pool's buffers are retained on the thread after use, and the
    * per-line saving no longer justifies pinning a mega-graph's
    * high-water footprint. */
  val MaxPooledLines = 16384
}
