package graft.tools

import graft.canon.CanonOptions
import graft.rdf.{Quad, TermKind}
import graft.spark.CanonEngine

import java.util.concurrent.atomic.AtomicInteger

/** Pure-JVM canonicalization-kernel throughput + ALLOCATION meter —
  * no Spark, no shuffle: a fixed thread pool drains a queue of
  * synthetic graphs through [[CanonEngine.canonicalizeOne]], and
  * per-thread allocated bytes (ThreadMXBean) divide out to bytes per
  * graph. The single-box eff(8→32) ceiling is DRAM bandwidth of this
  * kernel (BENCH/BASELINE.md §3), so bytes/graph is the number the
  * allocation work of round 5 must move; the whole-job gate stays
  * ScalingBench.
  *
  * Graphs mirror the bench corpus shape: a few bnodes sharing
  * first-degree hashes (to exercise HNDQ), IRI/literal terms of
  * realistic length.
  *
  * Usage: KernelBench [threads] [graphs] [bnodesPerGraph] [triplesPerBnode]
  */
object KernelBench {

  /** Deterministic graph: `nb` bnodes in a ring, each with `tpb`
    * attribute triples (distinct literals -> unique H1DQ) plus ring
    * edges bnode->bnode (shared structure -> HNDQ on symmetric
    * cases when tpb == 0; with attributes the hashes split, matching
    * the mostly-easy + occasionally-gossip mix of the KG corpus). */
  def graph(idx: Int, nb: Int, tpb: Int): Vector[Quad] = {
    val qs = Vector.newBuilder[Quad]
    var b = 0
    while (b < nb) {
      qs += Quad(TermKind.BNode, s"n$b", "http://example.org/vocab#next",
        TermKind.BNode, s"n${(b + 1) % nb}", "", "", TermKind.DefaultGraph, "")
      var t = 0
      while (t < tpb) {
        qs += Quad(TermKind.BNode, s"n$b", s"http://example.org/vocab#p$t",
          TermKind.Literal, s"value-$idx-$b-$t some literal payload text", "", "",
          TermKind.DefaultGraph, "")
        t += 1
      }
      qs += Quad(TermKind.Iri, s"http://example.org/repo/$idx",
        "http://example.org/vocab#member",
        TermKind.BNode, s"n$b", "", "", TermKind.DefaultGraph, "")
      b += 1
    }
    qs.result()
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // locale-safe f"%.3f" JSON
    val threads = args.lift(0).map(_.toInt).getOrElse(8)
    val nGraphs = args.lift(1).map(_.toInt).getOrElse(20000)
    val nb = args.lift(2).map(_.toInt).getOrElse(4)
    val tpb = args.lift(3).map(_.toInt).getOrElse(3)
    val graphs = (0 until nGraphs).map(i => graph(i, nb, tpb)).toArray

    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]

    def run(): (Double, Long, Long) = {
      val next = new AtomicInteger(0)
      val okCount = new AtomicInteger(0)
      val allocated = new java.util.concurrent.atomic.AtomicLong(0L)
      val t0 = System.nanoTime()
      val pool = (0 until threads).map { _ =>
        new Thread(() => {
          val before = tmx.getThreadAllocatedBytes(Thread.currentThread().getId)
          var i = next.getAndIncrement()
          while (i < nGraphs) {
            val r = CanonEngine.canonicalizeOne(s"g$i", graphs(i),
              CanonOptions.default, assumeDistinct = true)
            if (r.status == "ok") okCount.incrementAndGet()
            i = next.getAndIncrement()
          }
          allocated.addAndGet(
            tmx.getThreadAllocatedBytes(Thread.currentThread().getId) - before)
        })
      }
      pool.foreach(_.start())
      pool.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      require(okCount.get() == nGraphs, s"${okCount.get()}/$nGraphs ok")
      (wall, allocated.get(), okCount.get().toLong)
    }

    run() // warm-up (JIT)
    val trials = (1 to 3).map(_ => run())
    val (wall, alloc, _) = trials.minBy(_._1)
    println(f"""{"job":"kernel_bench","threads":$threads,"graphs":$nGraphs,"bnodes":$nb,"tpb":$tpb,"wall_sec":$wall%.3f,"graphs_per_sec":${nGraphs / wall}%.0f,"alloc_bytes_per_graph":${alloc / nGraphs}}""")
  }
}
