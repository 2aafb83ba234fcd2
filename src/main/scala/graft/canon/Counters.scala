package graft.canon

import scala.collection.mutable

/** HNDQ call budgets guarding super-polynomial (poison) inputs
  * (reference `src/counter.rs`). `add` is invoked on every entry to
  * Hash N-Degree Quads (reference `src/canon.rs:708`) and throws
  * [[HndqCallLimitExceededException]] past the budget.
  */
sealed trait HndqCallCounter {
  def add(identifier: String): Unit
  def sum: Int

  /** The reference's `{:?}` Debug rendering — lands in the ca.6
    * trace line (`hndq_call_counter:  {...}`). */
  def traceRepr: String
}

/** One global budget, default 4000 (reference `src/counter.rs:4,12-56`). */
final class SimpleHndqCallCounter(val limit: Int) extends HndqCallCounter {
  private var counter = 0
  override def add(identifier: String): Unit = {
    counter += 1
    if (counter > limit) throw new HndqCallLimitExceededException(limit)
  }
  override def sum: Int = counter
  override def traceRepr: String = s" { counter: $counter, limit: $limit }"
}

/** Per-blank-node budget (reference `src/counter.rs:58-114` — defined
  * there but never wired to the public API; we expose it through
  * `CanonOptions.perNodeCounter`). Operationally kinder on
  * multi-tenant graphs: one pathological bnode cluster exhausts its
  * own budget without starving the rest of the graph's headroom.
  * (The map is keyed per node, so the render is sorted for
  * determinism — the reference's HashMap Debug order is arbitrary.) */
final class PerNodeHndqCallCounter(val limit: Int) extends HndqCallCounter {
  private val counter = new mutable.HashMap[String, Int]
  override def add(identifier: String): Unit = {
    val c = counter.getOrElse(identifier, 0) + 1
    counter.put(identifier, c)
    if (c > limit) throw new HndqCallLimitExceededException(limit)
  }
  override def sum: Int = counter.valuesIterator.sum
  override def traceRepr: String = {
    val m = counter.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\": " + v }.mkString("{", ", ", "}")
    s" { counter: $m, limit: $limit, sum: $sum }"
  }
}
