package graft.canon

/** Structured trace logging replicating the reference's `YamlLayer`
  * (reference `src/logger.rs:4-123`):
  *
  *  - a SPAN has a name, an optional `message` attribute and an
  *    `indent` delta. Entering it prints `name:` at
  *    (parent base + delta), the message one level deeper, and sets
  *    the base indent for children to (parent base + delta + 1).
  *    Anonymous spans (empty name) print nothing but still indent.
  *  - an EVENT prints its message at (current span base + delta).
  *
  * With `YamlTraceLogger` the kernel emits the W3C RDFC-1.0 debug
  * trace YAML, diffable against the reference's golden traces
  * (`tests/rdfc10_supplement/{test024,test047,test054,test058}.log.yml`).
  */
trait TraceLogger {
  def isEnabled: Boolean
  def span[T](name: String, message: String = "", indent: Int = 0)(body: => T): T
  def event(indent: Int, msg: => String): Unit
  final def event(msg: => String): Unit = event(0, msg)
}

/** Zero-cost default: spans run their body, events evaluate nothing
  * (messages are by-name). */
object NoopTraceLogger extends TraceLogger {
  override def isEnabled: Boolean = false
  override def span[T](name: String, message: String, indent: Int)(body: => T): T = body
  override def event(indent: Int, msg: => String): Unit = ()
}

/** Accumulates the YAML trace in memory (one graph's canonicalization
  * is a bounded, single-threaded kernel run). indent width 2 matches
  * the goldens. */
final class YamlTraceLogger(indentWidth: Int = 2) extends TraceLogger {
  private val sb = new java.lang.StringBuilder(4096)
  private var base = 0

  override def isEnabled: Boolean = true

  override def span[T](name: String, message: String, indent: Int)(body: => T): T = {
    val parent = base
    val current = parent + indent
    if (name.nonEmpty) line(current, name + ":")
    if (message.nonEmpty) line(current + 1, message)
    base = current + 1
    try body finally base = parent
  }

  override def event(indent: Int, msg: => String): Unit = line(base + indent, msg)

  private def line(ind: Int, s: String): Unit = {
    var i = ind * indentWidth
    while (i > 0) { sb.append(' '); i -= 1 }
    sb.append(s).append('\n')
  }

  def result: String = sb.toString
}
