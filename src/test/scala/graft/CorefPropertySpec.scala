package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Coref

/**
 * Property comparison of the distributed within-doc person coref against
 * the sequential reference oracle (ReferenceCoref) on random corpora:
 *
 *  1. SUPERSET: every pair the reference merges, we merge (our transitive
 *     segment merge subsumes the reference's mutation-order pairwise merge).
 *  2. VALIDITY: every pair we merge is connected by a chain of sorted-
 *     adjacent close/prefix links (never an arbitrary merge).
 *  3. Conservation: every mention assigned exactly once; entity stats sum.
 */
class CorefPropertySpec extends SparkSpec {
  import spark.implicits._

  private val nameGen: Gen[String] = for {
    first <- Gen.oneOf("JOHN", "JON", "JOHAN", "ANA", "ANNA", "MARIA", "MARIO",
      "JOSE", "JOSEF", "EVA", "IVAN")
    lastOpt <- Gen.option(Gen.oneOf("SMITH", "SMITB", "SMYTH", "DIAZ", "DIAS",
      "NUNEZ", "NUNES", "PEREZ", "PERES"))
  } yield lastOpt.fold(first)(l => s"$first $l")

  private def corpus(seed: Long): Seq[(Long, Long, String, String)] = {
    val docGen = Gen.listOfN(24, nameGen)
    val docs = (0 until 6).map { d =>
      docGen(Gen.Parameters.default, Seed(seed * 100 + d)).getOrElse(Nil)
    }
    docs.zipWithIndex.flatMap { case (names, d) =>
      names.zipWithIndex.map { case (n, i) =>
        (d.toLong, d.toLong * 1000 + i, "PERSON", n)
      }
    }
  }

  test("distributed within-doc coref is a valid transitive superset of the reference") {
    (1L to 5L).foreach { seed =>
      val rows = corpus(seed)
      val df = rows.toDF("doc_id", "mention_id", "mention_type", "text")
      val result = Coref.withinDoc(df, Coref.WithinDocParams.person)

      // mention → cluster of the distributed run
      val assign = result.assignment.as[(Long, Long)].collect().toMap
      assert(assign.size == rows.size, "every mention assigned exactly once")

      val byDoc = rows.groupBy(_._1)
      byDoc.foreach { case (doc, ms) =>
        val ref = ReferenceCoref.withinDocPerson(ms.map(_._4))
        // reference: normalized text -> surviving key
        val refKeyOf: Map[String, String] = ref.flatMap { case (k, members) =>
          members.distinct.map(_ -> k)
        }
        // ours: normalized text -> entity id (via each mention)
        val ourKeyOf: Map[String, Long] = ms.map { m =>
          ReferenceCoref.normalize(m._4) -> assign(m._2)
        }.toMap

        // 1. SUPERSET: same reference cluster ⇒ same entity in ours.
        refKeyOf.groupBy(_._2).values.foreach { texts =>
          val ents = texts.keys.map(ourKeyOf).toSet
          assert(ents.size == 1,
            s"doc $doc: reference cluster ${texts.keys} split into $ents (seed $seed)")
        }

        // 2. VALIDITY: our clusters are unions of sorted-adjacent chains —
        // each our-cluster is a contiguous run of the sorted distinct texts.
        val sortedTexts = ms.map(m => ReferenceCoref.normalize(m._4))
          .filter(_.nonEmpty).distinct.sorted
        ourKeyOf.groupBy(_._2).values.foreach { grp =>
          val idxs = grp.keys.map(sortedTexts.indexOf).toSeq.sorted
          assert(idxs.zip(idxs.tail).forall { case (a, b) => b == a + 1 },
            s"doc $doc: non-contiguous cluster ${grp.keys} (seed $seed)")
        }
      }

      // 3. Stats conservation.
      val sumMentions = result.entities.agg(sum("num_mentions")).as[Long].head()
      assert(sumMentions == rows.size)
    }
  }
}
