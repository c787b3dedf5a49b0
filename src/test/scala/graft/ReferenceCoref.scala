package graft

import java.text.Normalizer

/**
 * Test oracle: sequential clean-room re-implementation of the reference's
 * within-document person coref semantics (/root/reference/src/
 * CorefBase.groovy:75-133,135-155,176-212 and WithinDocPerCoref.groovy:
 * 36-53), used to property-check the distributed implementation.
 *
 * Faithful pieces: normalization chain, sorted exact-match clustering,
 * adjacent-close pairwise merging with the containsKey skip (a key already
 * absorbed breaks later chains), firstname→fullname folding with the
 * count==1 rule. This lets tests assert both agreement (where semantics
 * coincide) and the DOCUMENTED deviation (our segment/CC merge is
 * transitive; the reference's mutation-order merge can break chains).
 */
object ReferenceCoref {

  def normalize(s: String): String = {
    var out = s.trim.toUpperCase
    out = Normalizer.normalize(out, Normalizer.Form.NFD)
      .replaceAll("\\p{InCombiningDiacriticalMarks}+", "")
    out = out.replaceAll("\\s+", " ")
    out = out.replaceAll("^[^A-Za-z0-9-]+", "").replaceAll("[^A-Za-z0-9-]+$", "")
    out.replaceAll("[\\^\"<>_]", " ")
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  /**
   * One document's mention texts → clusters keyed by surviving key, values
   * = member normalized texts (with multiplicity).
   * @param matchNumbers combineAdjacentClose match_numbers_exactly flag
   *                     (false for the person pass, true for org/loc)
   * @param firstnameMerge run combineFirstnameFullname (person/loc; the
   *                       org pass skips it — WithinDocOrgCoref.groovy:52)
   */
  def withinDocPerson(texts: Seq[String],
      matchNumbers: Boolean = false,
      firstnameMerge: Boolean = true): Map[String, Seq[String]] = {
    val normed = texts.map(normalize).filter(_.nonEmpty).sorted
    // combineByExactMatch over the sorted list (LinkedHashMap order = sorted)
    val clusters = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    normed.foreach(t => clusters(t) = clusters.getOrElse(t, Vector.empty) :+ t)

    // combineAdjacentClose: candidates over the ORIGINAL sorted key list,
    // merges applied afterwards with containsKey skip (CorefBase:180-211).
    val keys = clusters.keys.toVector
    val candidates = scala.collection.mutable.LinkedHashMap.empty[String, String]
    keys.sliding(2).foreach {
      case Vector(prev, curr) =>
        val digitsOk = !matchNumbers ||
          ("""\d+""".r.findAllIn(prev).toList == """\d+""".r.findAllIn(curr).toList)
        if (lev(prev, curr) <= 1 && digitsOk) candidates(curr) = prev
      case _ =>
    }
    candidates.foreach { case (nm1, nm2) =>
      if (clusters.contains(nm1) && clusters.contains(nm2)) {
        if (clusters(nm2).size > clusters(nm1).size) {
          clusters(nm2) = clusters(nm2) ++ clusters(nm1); clusters.remove(nm1)
        } else {
          clusters(nm1) = clusters(nm1) ++ clusters(nm2); clusters.remove(nm2)
        }
      }
    }

    // combineFirstnameFullname (CorefBase:95-133) over the mutated key order.
    if (!firstnameMerge) return clusters.toMap
    val ks = clusters.keys.toVector
    val firstNames = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val firstNamesFull = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last = ""
    var currFn: String = null
    ks.foreach { curr =>
      val minLen = math.min(curr.length, last.length)
      if (last.nonEmpty && minLen >= 2 && last == curr.substring(0, minLen)) {
        currFn = last
        firstNames(last) = 1
        firstNamesFull(last) = curr
      } else if (currFn != null) {
        val ml = math.min(curr.length, currFn.length)
        if (curr.substring(0, ml) == currFn) firstNames(currFn) += 1
      }
      last = curr
    }
    firstNames.foreach { case (fn, count) =>
      if (count == 1 && clusters.contains(fn) && clusters.contains(firstNamesFull(fn))) {
        val full = firstNamesFull(fn)
        clusters(full) = clusters(full) ++ clusters(fn)
        clusters.remove(fn)
      }
    }
    clusters.toMap
  }

  /** One across-doc "entity": normalized text + its within-doc mention count. */
  case class Ent(text: String, numMentions: Long)

  case class AcrossResult(
      merged: Seq[(String, Seq[Ent])],   // survivor text → members (strong, ≥ minNumDocs)
      untouchedStrong: Seq[Ent],         // members of dropped strong clusters
      weak: Seq[(String, Seq[Ent])])     // weak clusters (all merged)

  /**
   * Sequential across-doc person pass (AcrossDocPerCoref.groovy:31-118):
   * candidate split → sorted exact clusters → adjacentClose (numbers
   * matched) on strong → MIN_NUM_DOCS filter → merge, weak merged whole.
   */
  def acrossDocPerson(entities: Seq[Ent], minNumDocs: Int = 2): AcrossResult = {
    def isCandidate(name: String): Boolean = {
      val nTok = name.split("\\s+").count(_.nonEmpty)
      name.length >= 5 && nTok >= 2 && nTok <= 6 && name.matches("[A-Za-z.\\s]+")
    }
    val (strongL, weakL) = entities.partition(e => isCandidate(e.text))

    def exactClusters(es: Seq[Ent]) = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Ent]]
      es.sortBy(_.text).foreach(e => m(e.text) = m.getOrElse(e.text, Vector.empty) :+ e)
      m
    }
    val strong = exactClusters(strongL)
    val weak = exactClusters(weakL)

    // combineAdjacentClose with match_numbers_exactly = true.
    val keys = strong.keys.toVector
    val candidates = scala.collection.mutable.LinkedHashMap.empty[String, String]
    keys.sliding(2).foreach {
      case Vector(prev, curr) =>
        val digitsOk =
          """\d+""".r.findAllIn(prev).toList == """\d+""".r.findAllIn(curr).toList
        if (lev(prev, curr) <= 1 && digitsOk) candidates(curr) = prev
      case _ =>
    }
    candidates.foreach { case (nm1, nm2) =>
      if (strong.contains(nm1) && strong.contains(nm2)) {
        if (strong(nm2).size > strong(nm1).size) {
          strong(nm2) = strong(nm2) ++ strong(nm1); strong.remove(nm1)
        } else {
          strong(nm1) = strong(nm1) ++ strong(nm2); strong.remove(nm2)
        }
      }
    }

    val (kept, dropped) = strong.toSeq.partition(_._2.size >= minNumDocs)
    // mergeClusters survivor name: most common member text, first max in
    // member order (CorefBase.groovy:228-234).
    val merged = kept.map { case (_, members) =>
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      members.foreach(m => counts(m.text) = counts.getOrElse(m.text, 0) + 1)
      val survivor = counts.maxBy(_._2)._1 // LinkedHashMap: first max wins
      (survivor, members: Seq[Ent])
    }
    AcrossResult(merged, dropped.flatMap(_._2),
      weak.toSeq.map { case (k, ms) => (k, ms: Seq[Ent]) })
  }
}
