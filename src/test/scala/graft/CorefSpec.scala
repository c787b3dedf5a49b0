package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Coref, SocialNetwork, SortedNeighborhood}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains resolve transitively; separate components stay apart") {
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("src", "dst")
    val comps = ConnectedComponents.run(edges)
      .as[(String, String)].collect().toMap
    assert(comps("a") == "a" && comps("b") == "a" && comps("c") == "a")
    assert(comps("d") == "d" && comps("e") == "d")
  }

  test("cycle converges") {
    val edges = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val comps = ConnectedComponents.run(edges).as[(String, String)].collect().toMap
    assert(comps.values.toSet == Set("x"))
  }

  test("alternating == min-label on a mixed random graph (string keys)") {
    val rnd = new scala.util.Random(7)
    // 3 planted components over 60 nodes: a chain, a clique-ish blob,
    // random extra edges inside each — plus a self-loop-only vertex.
    val chain = (0 until 20).sliding(2).map(p => (f"a${p(0)}%02d", f"a${p(1)}%02d")).toSeq
    val blob = for (_ <- 0 until 40) yield
      (f"b${rnd.nextInt(20)}%02d", f"b${rnd.nextInt(20)}%02d")
    val ring = (0 until 20).map(i => (f"c$i%02d", f"c${(i + 1) % 20}%02d"))
    val edges = (chain ++ blob ++ ring ++ Seq(("lone", "lone")))
      .toDF("src", "dst")
    val exp = ConnectedComponents.run(edges, strict = true)
      .as[(String, String)].collect().toMap
    val got = ConnectedComponents.runAlternating(edges, strict = true)
      .as[(String, String)].collect().toMap
    assert(got == exp)
    assert(got("lone") == "lone")
  }

  test("alternating converges on a 256-path in O(log n) rounds where min-label cannot") {
    val edges = (0 until 255)
      .map(i => (f"p$i%03d", f"p${i + 1}%03d"))
      .toDF("src", "dst")
    val (labels, rounds) =
      ConnectedComponents.runAlternatingWithRounds(edges, strict = true)
    val comps = labels.as[(String, String)].collect()
    assert(comps.length == 256 && comps.forall(_._2 == "p000"))
    // Geometric contraction: a 256-diameter chain lands well under the
    // 20-round default (measured 5-8; the bound here is slack on purpose).
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
    // The same chain defeats min-label at its default budget: 25 rounds
    // < diameter 255, so strict correctly refuses.
    intercept[IllegalStateException] {
      ConnectedComponents.run(edges, strict = true)
    }
  }
}

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("adjacent pairs across partition boundaries are complete and exact") {
    val keys = scala.util.Random.shuffle((0 until 100).map(i => f"k$i%03d"))
      .toDF("key")
    val pairs = SortedNeighborhood.adjacentPairs(keys, numPartitions = 7)
      .as[(String, String)].collect().sorted
    val want = (0 until 99).map(i => (f"k$i%03d", f"k${i + 1}%03d"))
    assert(pairs.toSeq == want)
  }

  test("single partition and tiny inputs") {
    val pairs = Seq("b", "a").toDF("key")
    assert(SortedNeighborhood.adjacentPairs(pairs, 4)
      .as[(String, String)].collect().toSeq == Seq(("a", "b")))
    assert(SortedNeighborhood.adjacentPairs(Seq("only").toDF("key"), 4).count() == 0)
  }
}

class CorefSpec extends SparkSpec {
  import spark.implicits._

  /** (doc_id, mention_id, mention_type, text) fixture. */
  private def mentions(rows: (Long, Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "mention_id", "mention_type", "text")

  test("withinDoc person: exact + adjacent-close + firstname folding") {
    val m = mentions(
      (1L, 1L, "PERSON", "John Smith"),
      (1L, 2L, "PERSON", "john  smith "),   // same after normalization
      (1L, 3L, "PERSON", "Jon Smith"),      // levenshtein 1 from JOHN SMITH
      (1L, 4L, "PERSON", "John"),           // firstname of unique full name
      (1L, 5L, "PERSON", "Alice Jones"),
      (1L, 6L, "ORGANIZATION", "John Smith Inc"))
    val r = Coref.withinDoc(m, Coref.WithinDocParams.person)
    val ents = r.entities
      .select("entity_text", "num_mentions", "num_docs", "created_by")
      .as[(String, Long, Long, String)].collect().toSet
    assert(ents == Set(
      ("JOHN SMITH", 4L, 1L, "within_doc_person_coref"),
      ("ALICE JONES", 1L, 1L, "within_doc_person_coref")))
    // Every person mention assigned to exactly one entity.
    val assigned = r.assignment.as[(Long, Long)].collect()
    assert(assigned.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // sum(entity.num_mentions) == count(assigned mentions)
    val sumMentions = r.entities.agg(sum("num_mentions")).as[Long].head()
    assert(sumMentions == assigned.length)
  }

  test("withinDoc: survivor is the largest exact cluster when no fold applies") {
    val m = mentions(
      (2L, 10L, "PERSON", "BOB"),
      (2L, 11L, "PERSON", "BOB"),
      (2L, 12L, "PERSON", "BOB"),
      (2L, 13L, "PERSON", "BOO"))
    val r = Coref.withinDoc(m, Coref.WithinDocParams.person)
    val ents = r.entities.select("entity_text", "num_mentions")
      .as[(String, Long)].collect().toSet
    assert(ents == Set(("BOB", 4L)))
  }

  test("withinDoc org: digit-run guard blocks numeric mismatches") {
    val m = mentions(
      (3L, 20L, "ORGANIZATION", "UNIT 12"),
      (3L, 21L, "ORGANIZATION", "UNIT 13"),  // lev 1 but digits differ
      (3L, 22L, "ORGANIZATION", "ACME CO"),
      (3L, 23L, "ORGANIZATION", "ACME CQ"))  // lev 1, no digits
    val r = Coref.withinDoc(m, Coref.WithinDocParams.organization)
    val texts = r.entities.select("entity_text").as[String].collect().toSet
    assert(texts.contains("UNIT 12") && texts.contains("UNIT 13"))
    assert(texts.count(_.startsWith("ACME")) == 1)
  }

  test("acrossDoc person: strong merge + min-docs filter + weak retagging") {
    val m = mentions(
      (1L, 1L, "PERSON", "John Smith"),
      (2L, 2L, "PERSON", "John Smith"),
      (3L, 3L, "PERSON", "Jon Smith"),
      (1L, 4L, "PERSON", "Alice Jones"),   // 1 doc → below MIN_NUM_DOCS
      (2L, 5L, "PERSON", "Q"))             // weak (short, 1 token)
    val within = Coref.withinDoc(m, Coref.WithinDocParams.person)
    val r = Coref.acrossDoc(within.entities, Coref.AcrossDocParams.person)
    val ents = r.entities
      .select("entity_text", "created_by", "num_docs", "num_mentions")
      .as[(String, String, Long, Long)].collect().toSet
    assert(ents == Set(
      ("JOHN SMITH", "across_doc_person_coref", 3L, 3L),
      ("ALICE JONES", "within_doc_person_coref", 1L, 1L),
      ("Q", "weak_across_doc_person_coref", 1L, 1L)))
    // assignment covers every input entity exactly once
    assert(r.assignment.count() == within.entities.count())
  }

  test("acrossDoc: num_docs counts merged entities, not distinct documents") {
    // Two within-doc entities from the SAME doc merging across → num_docs 2
    // (reference semantics, SURVEY §7.4(3)).
    val within = Seq(
      (100L, 1L, "PERSON", "ANA MARIA", "within_doc_person_coref", 2L, 1L),
      (101L, 1L, "PERSON", "ANA MARIE", "within_doc_person_coref", 1L, 1L))
      .toDF("entity_id", "doc_id", "entity_type", "entity_text",
        "created_by", "num_mentions", "num_docs")
    val r = Coref.acrossDoc(within, Coref.AcrossDocParams.person)
    val ents = r.entities.select("entity_text", "num_docs", "num_mentions")
      .as[(String, Long, Long)].collect().toSet
    assert(ents == Set(("ANA MARIA", 2L, 3L)))
  }

  test("withinDocSimple: twitter normalization; global-id clustering") {
    val m = Seq(
      (1L, 1L, "DATE", "12 Enero", Option("g1")),
      (1L, 2L, "DATE", "12 enero", Option("g1")),   // same gid → one cluster
      (1L, 3L, "DATE", "13 enero", Option("g2")),
      (1L, 4L, "DATE", "sin gid", None))            // dropped in gid mode
      .toDF("doc_id", "mention_id", "mention_type", "text", "global_id")
    val byGid = Coref.withinDocSimple(m, "DATE", byGlobalId = true)
    val ents = byGid.entities.select("entity_text", "num_mentions", "created_by")
      .as[(String, Long, String)].collect().toSet
    assert(ents == Set(
      ("12 enero", 2L, "within_doc_date_coref"),
      ("13 enero", 1L, "within_doc_date_coref")))
    assert(byGid.assignment.count() == 3)

    val byText = Coref.withinDocSimple(m, "DATE", byGlobalId = false)
    // twitter normalization lowercases → "12 Enero"/"12 enero" merge too
    assert(byText.entities.count() == 3)
    assert(byText.assignment.count() == 4)
  }

  test("acrossDocSimple: exact clusters, min-docs filter, retag; no fuzzy") {
    val within = Seq(
      (1L, 1L, "DATE", "2005/01/12", "within_doc_date_coref", 2L, 1L),
      (2L, 2L, "DATE", "2005/01/12", "within_doc_date_coref", 1L, 1L),
      (3L, 3L, "DATE", "2005/01/13", "within_doc_date_coref", 1L, 1L))
      .toDF("entity_id", "doc_id", "entity_type", "entity_text",
        "created_by", "num_mentions", "num_docs")
    val r = Coref.acrossDocSimple(within, "DATE")
    val ents = r.entities.select("entity_text", "created_by", "num_docs", "num_mentions")
      .as[(String, String, Long, Long)].collect().toSet
    assert(ents == Set(
      ("2005/01/12", "across_doc_date_coref", 2L, 3L),
      // near-identical date NOT merged (no fuzzy pass in simple coref)
      ("2005/01/13", "within_doc_date_coref", 1L, 1L)))
    assert(r.assignment.count() == 3)
  }

  test("social network: distinct pairs per doc, num_docs weights, thresholds") {
    val m = mentions(
      (1L, 1L, "PERSON", "John Smith"), (1L, 2L, "PERSON", "Ana Diaz"),
      (1L, 3L, "PERSON", "Ana Diaz"),
      (2L, 4L, "PERSON", "John Smith"), (2L, 5L, "PERSON", "Ana Diaz"),
      (3L, 6L, "PERSON", "John Smith"), (3L, 7L, "PERSON", "Eve Adams"))
    val within = Coref.withinDoc(m, Coref.WithinDocParams.person)
    val across = Coref.acrossDoc(within.entities, Coref.AcrossDocParams.person)
    val finalAssign = within.assignment
      .withColumnRenamed("entity_id", "within_id")
      .join(across.assignment.withColumnRenamed("entity_id", "within_id"), "within_id")
      .select(col("mention_id"), col("new_entity_id").as("entity_id"))
    val edges = SocialNetwork.cooccurrenceEdges(
      finalAssign, m.select("mention_id", "doc_id"), across.entities)
    val withNames = edges
      .join(across.entities.select(col("entity_id").as("src_entity_id"),
        col("entity_text").as("src")), "src_entity_id")
      .join(across.entities.select(col("entity_id").as("dst_entity_id"),
        col("entity_text").as("dst")), "dst_entity_id")
      .select("src", "dst", "num_docs").as[(String, String, Long)]
      .collect().map { case (a, b, n) => (Set(a, b), n) }.toMap
    // JOHN SMITH + ANA DIAZ co-occur in docs 1 and 2; EVE ADAMS is
    // single-doc so never coref'd across (below MIN_NUM_DOCS → no edge).
    assert(withNames == Map(Set("JOHN SMITH", "ANA DIAZ") -> 2L))

    val (nodes, keptEdges) = SocialNetwork.thresholded(across.entities, edges)
    assert(nodes.select("entity_text").as[String].collect().toSet ==
      Set("JOHN SMITH", "ANA DIAZ"))
    assert(keptEdges.count() == 1)
  }

  test("documentEntityCounts: R27 materialized counts") {
    val m = mentions(
      (1L, 1L, "PERSON", "Ana"), (1L, 2L, "PERSON", "Ana"),
      (1L, 3L, "PERSON", "Bob"), (2L, 4L, "PERSON", "Ana"))
    val within = Coref.withinDoc(m, Coref.WithinDocParams.person)
    val counts = SocialNetwork.documentEntityCounts(
      within.assignment, m.select("mention_id", "doc_id"))
    val byDoc = counts.groupBy("doc_id").agg(sum("num_mentions").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 1L))
  }
}
