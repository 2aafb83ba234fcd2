package graft.canon

import graft.rdf.{CodePointOrdering, NQuadsWriter, Quad, TermKind}

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import scala.collection.mutable

/** Errors surfaced by canonicalization (reference `src/error.rs:4-22`;
  * Base16EncodingFailed / BlankNodeIdParseError cannot occur here). */
sealed abstract class CanonException(msg: String) extends RuntimeException(msg)
final class QuadsNotExistException
    extends CanonException("no quads for blank node identifier")
final class CanonicalIdentifierNotExistException
    extends CanonException("blank node has no issued canonical identifier")
final class HndqCallLimitExceededException(val limit: Int)
    extends CanonException(s"HNDQ call limit exceeded: $limit")

/** Options (reference `CanonicalizationOptions`, `src/api.rs:137-140`,
  * default call limit `src/counter.rs:4`; hash dispatch `src/lib.rs:87-102`). */
final case class CanonOptions(
    hndqCallLimit: Int = CanonOptions.DefaultHndqCallLimit,
    hashAlgorithm: String = "SHA-256"
)
object CanonOptions {
  val DefaultHndqCallLimit = 4000
  val default: CanonOptions = CanonOptions()
  val sha384: CanonOptions = CanonOptions(hashAlgorithm = "SHA-384")
}

/** 4.5 Issue Identifier algorithm state (reference `src/canon.rs:96-170`).
  *
  * Uses an insertion-ordered map, which is what the spec's "ordered
  * map" asks for. (The reference recovers issuance order by
  * lexicographically inverting a HashMap, `src/canon.rs:434-440`,
  * which equals insertion order only while < 11 temporary ids exist
  * in one HNDQ result; no W3C fixture exercises more. We follow the
  * spec; divergence documented.)
  */
final class IdentifierIssuer(val prefix: String) {
  private[canon] var counter: Int = 0
  private[canon] val issued = new mutable.LinkedHashMap[String, String]

  def get(existing: String): Option[String] = issued.get(existing)

  def issue(existing: String): String = issued.get(existing) match {
    case Some(id) => id
    case None =>
      val id = prefix + counter
      issued.put(existing, id)
      counter += 1
      id
  }

  /** Existing identifiers in issuance order. */
  def existingInIssuanceOrder: Iterator[String] = issued.keysIterator

  def copyOf(): IdentifierIssuer = {
    val c = new IdentifierIssuer(prefix)
    c.counter = counter
    c.issued ++= issued
    c
  }

  def toMap: Map[String, String] = issued.toMap
  def size: Int = issued.size
}

/** RDFC-1.0 canonicalization kernel (W3C spec §4.4-4.8).
  *
  * Spark-first layering: this object is pure single-graph Scala with
  * zero Spark dependencies; the distributed engine invokes it once
  * per graph inside `groupByKey(_.graph).flatMapGroups` because
  * blank-node state is graph-local and the algorithm is inherently
  * sequential per graph (issuer state threads through every step).
  * Semantics follow the reference kernel `canonicalize_core`
  * (`/root/reference/src/canon.rs:196-480`) and its subroutines; the
  * code is a fresh implementation against the spec with the
  * reference's observable quirks preserved (noted inline).
  */
object Rdfc10 {

  private def newDigest(alg: String) = MessageDigest.getInstance(alg)

  private val HEXL = "0123456789abcdef".toCharArray

  /** digest → lowercase hex (reference `src/canon.rs:188-191`). */
  private[canon] def hashHex(md: MessageDigest, data: String): String = {
    md.reset()
    val d = md.digest(data.getBytes(UTF_8))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEXL((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HEXL(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** 4.2 Canonicalization state. The mention list is built per bnode
    * POSITION — a quad with the same bnode as both subject and object
    * appears twice in that bnode's list, exactly like the reference's
    * three independent pushes (`src/canon.rs:44-76`); this shows up in
    * H1DQ input multiplicity and must be preserved.
    */
  /** package-private so the digest-pinned unit tests (ported from the
    * reference, `src/canon.rs:1158-1427`) can drive the internals. */
  private[canon] final class State(quads: IndexedSeq[Quad], opts: CanonOptions) {
    val mentions = new mutable.TreeMap[String, mutable.ArrayBuffer[Quad]]()(CodePointOrdering)
    val canonicalIssuer = new IdentifierIssuer("c14n")
    private val h1dqCache = new mutable.HashMap[String, String]
    private val md = newDigest(opts.hashAlgorithm)
    var hndqCalls: Int = 0

    quads.foreach { q =>
      if (q.subjectIsBNode) mentions.getOrElseUpdate(q.s, new mutable.ArrayBuffer[Quad]) += q
      if (q.objectIsBNode) mentions.getOrElseUpdate(q.o, new mutable.ArrayBuffer[Quad]) += q
      if (q.graphIsBNode) mentions.getOrElseUpdate(q.g, new mutable.ArrayBuffer[Quad]) += q
    }

    def hash(data: String): String = hashHex(md, data)

    /** 4.6 Hash First Degree Quads. Pure function of the (immutable
      * after construction) mention map, so memoized — the reference
      * recomputes it on every HRBN fallback (`src/canon.rs:635`);
      * results are identical, this is just faster.
      */
    def h1dq(refId: String): String =
      h1dqCache.getOrElseUpdate(refId, {
        val quadsFor = mentions.getOrElse(refId, throw new QuadsNotExistException)
        val lines = new Array[String](quadsFor.length)
        var i = 0
        while (i < quadsFor.length) {
          val q = quadsFor(i)
          // 3.1.1.1: reference bnode -> "a", any other bnode -> "z"
          val sb = new StringBuilder(96)
          val proj = q.copy(
            s = if (q.subjectIsBNode) (if (q.s == refId) "a" else "z") else q.s,
            o = if (q.objectIsBNode) (if (q.o == refId) "a" else "z") else q.o,
            g = if (q.graphIsBNode) (if (q.g == refId) "a" else "z") else q.g
          )
          lines(i) = NQuadsWriter.quadBody(proj, sb).append(" .\n").toString
          i += 1
        }
        java.util.Arrays.sort(lines, CodePointOrdering)
        hash(lines.mkString)
      })

    /** 4.7 Hash Related Blank Node (reference `src/canon.rs:602-654`). */
    def hrbn(related: String, quad: Quad, issuer: IdentifierIssuer,
             position: Char): String = {
      val sb = new StringBuilder(96)
      sb.append(position)
      if (position != 'g') sb.append('<').append(quad.p).append('>')
      canonicalIssuer.get(related) match {
        case Some(id) => sb.append("_:").append(id)
        case None =>
          issuer.get(related) match {
            case Some(id) => sb.append("_:").append(id)
            case None     => sb.append(h1dq(related))
          }
      }
      hash(sb.toString)
    }

    /** 4.8 Hash N-Degree Quads — the gossip path (reference
      * `src/canon.rs:686-1126`): relate neighbors via HRBN, group by
      * related hash in code point order, try every permutation of each
      * group greedily keeping the code-point-least path, prune a
      * permutation as soon as its partial path >= the chosen path
      * (branch-and-bound both before and after recursion), recurse into
      * bnodes the issuer copy has not seen. Global call budget guards
      * poison inputs (`src/counter.rs`, checked on entry).
      */
    def hndq(identifier: String,
             pathIssuer: IdentifierIssuer): (String, IdentifierIssuer) = {
      hndqCalls += 1
      if (hndqCalls > opts.hndqCallLimit)
        throw new HndqCallLimitExceededException(opts.hndqCallLimit)

      var issuer = pathIssuer.copyOf()

      // 1-3) Hn: related hash -> bnode list (duplicates per occurrence)
      val hn = new mutable.TreeMap[String, mutable.ArrayBuffer[String]]()(CodePointOrdering)
      val quadsFor = mentions.getOrElse(identifier, throw new QuadsNotExistException)
      quadsFor.foreach { q =>
        if (q.subjectIsBNode && q.s != identifier)
          hn.getOrElseUpdate(hrbn(q.s, q, issuer, 's'), new mutable.ArrayBuffer[String]) += q.s
        if (q.objectIsBNode && q.o != identifier)
          hn.getOrElseUpdate(hrbn(q.o, q, issuer, 'o'), new mutable.ArrayBuffer[String]) += q.o
        if (q.graphIsBNode && q.g != identifier)
          hn.getOrElseUpdate(hrbn(q.g, q, issuer, 'g'), new mutable.ArrayBuffer[String]) += q.g
      }

      // 4-5) fold each related-hash group into data to hash
      val dataToHash = new StringBuilder(256)
      hn.foreach { case (relatedHash, bnodeList) =>
        dataToHash.append(relatedHash)
        var chosenPath = ""
        var chosenIssuer: IdentifierIssuer = null

        // 5.4) distinct permutations only: duplicate bnode ids in the
        // list yield byte-identical paths, so enumerating repeats
        // (as itertools does) cannot change the minimum.
        val perms = bnodeList.toList.permutations
        permLoop(perms)

        def permLoop(perms: Iterator[List[String]]): Unit = {
          while (perms.hasNext) {
            val p = perms.next()
            var issuerCopy = issuer.copyOf()
            val pathSb = new StringBuilder(64)
            val recursionList = new mutable.ArrayBuffer[String]
            var pruned = false

            // 5.4.4
            val it = p.iterator
            while (!pruned && it.hasNext) {
              val related = it.next()
              canonicalIssuer.get(related) match {
                case Some(cid) => pathSb.append("_:").append(cid)
                case None =>
                  if (issuerCopy.get(related).isEmpty) recursionList += related
                  pathSb.append("_:").append(issuerCopy.issue(related))
              }
              if (chosenPath.nonEmpty && pathSb.length >= chosenPath.length &&
                  CodePointOrdering.compare(pathSb.toString, chosenPath) >= 0)
                pruned = true
            }

            // 5.4.5 recursion
            if (!pruned) {
              val rit = recursionList.iterator
              while (!pruned && rit.hasNext) {
                val related = rit.next()
                val (rHash, rIssuer) = hndq(related, issuerCopy)
                pathSb.append("_:").append(issuerCopy.issue(related))
                pathSb.append('<').append(rHash).append('>')
                issuerCopy = rIssuer
                if (chosenPath.nonEmpty && pathSb.length >= chosenPath.length &&
                    CodePointOrdering.compare(pathSb.toString, chosenPath) >= 0)
                  pruned = true
              }
            }

            // 5.4.6
            if (!pruned) {
              val path = pathSb.toString
              if (chosenPath.isEmpty || CodePointOrdering.compare(path, chosenPath) < 0) {
                chosenPath = path
                chosenIssuer = issuerCopy
              }
            }
          }
        }

        dataToHash.append(chosenPath)
        if (chosenIssuer != null) issuer = chosenIssuer // 5.6
      }

      (hash(dataToHash.toString), issuer)
    }
  }

  /** 4.4.3 Canonicalization Algorithm: input quads (set semantics
    * applied here, like oxrdf `Dataset`) → issued identifiers map in
    * issuance order. Reference: `src/canon.rs:196-480`.
    */
  def issue(inputQuads: Seq[Quad],
            opts: CanonOptions = CanonOptions.default): IssueResult = {
    val quads: IndexedSeq[Quad] = inputQuads.distinct.toIndexedSeq
    val state = new State(quads, opts)

    // 3) H1DQ for every mentioned bnode, grouped by hash
    val hashToBNodes = new mutable.TreeMap[String, mutable.ArrayBuffer[String]]()(CodePointOrdering)
    state.mentions.keysIterator.foreach { n =>
      hashToBNodes.getOrElseUpdate(state.h1dq(n), new mutable.ArrayBuffer[String]) += n
    }

    // 4) unique-hash shortcut: issue canonical ids immediately
    val shared = hashToBNodes.filter { case (_, ids) => ids.length > 1 }
    hashToBNodes.foreach { case (_, ids) =>
      if (ids.length == 1) state.canonicalIssuer.issue(ids(0))
    }

    // 5) shared hashes → HNDQ per unissued bnode
    shared.foreach { case (_, identifierList) =>
      val hashPathList = new mutable.ArrayBuffer[(String, IdentifierIssuer)]
      identifierList.foreach { n =>
        if (state.canonicalIssuer.get(n).isEmpty) {
          val temp = new IdentifierIssuer("b")
          temp.issue(n)
          hashPathList += state.hndq(n, temp)
        }
      }
      // 5.3) code point ordered by hash; stable like Rust sort()
      val sorted = hashPathList.sortBy(_._1)(CodePointOrdering)
      sorted.foreach { case (_, resultIssuer) =>
        // 5.3.1) replay temporary issuance order (see IdentifierIssuer note)
        resultIssuer.existingInIssuanceOrder.foreach(state.canonicalIssuer.issue)
      }
    }

    IssueResult(state.canonicalIssuer.toMap,
                state.canonicalIssuer.existingInIssuanceOrder.toVector,
                state.hndqCalls, quads)
  }

  final case class IssueResult(
      issuedMap: Map[String, String],
      issuanceOrder: Vector[String],
      hndqCalls: Int,
      dedupedQuads: IndexedSeq[Quad]
  )

  /** Substitute every bnode by its issued canonical id
    * (reference `relabel`, `src/api.rs:611-619,733-810`). */
  def relabel(quads: Seq[Quad], issued: Map[String, String]): Seq[Quad] = {
    def sub(label: String): String =
      issued.getOrElse(label, throw new CanonicalIdentifierNotExistException)
    quads.map { q =>
      var r = q
      if (q.subjectIsBNode) r = r.copy(s = sub(q.s))
      if (q.objectIsBNode) r = r.copy(o = sub(q.o))
      if (q.graphIsBNode) r = r.copy(g = sub(q.g))
      r
    }
  }

  /** Flagship entry point: canonical N-Quads document
    * (reference `canonicalize_with`, `src/api.rs:183-190`:
    * issue → relabel → serialize). */
  def canonicalize(inputQuads: Seq[Quad],
                   opts: CanonOptions = CanonOptions.default): String = {
    val res = issue(inputQuads, opts)
    NQuadsWriter.serializeDocument(relabel(res.dedupedQuads, res.issuedMap))
  }

  /** Graph (triples) variant: interpret as default-graph dataset;
    * output is canonical N-Triples (reference `src/api.rs:501-512`). */
  def canonicalizeGraph(triples: Seq[Quad],
                        opts: CanonOptions = CanonOptions.default): String =
    canonicalize(triples.map(t => t.copy(gKind = TermKind.DefaultGraph, g = "")), opts)

  /** Canonicalized dataset → quads sorted in code point order of their
    * serialized form (reference `sort`, `src/api.rs:859-863`). */
  def sortQuads(quads: Seq[Quad]): Seq[Quad] =
    quads.sortBy(NQuadsWriter.quadBody)(CodePointOrdering)
}
