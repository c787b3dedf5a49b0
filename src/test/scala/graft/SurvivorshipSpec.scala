package graft

import scala.util.Random

import graft.operators.Survivorship

/**
 * Field-level survivorship (q146): per-field independent fallback down
 * the rank chain vs a sequential reference, the difference from
 * row-level latest-wins, and provenance columns.
 */
class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Int, Option[String], Option[Long])],
      prov: Boolean = false) =
    Survivorship.goldenRecord(rows.toDF("k", "pri", "a", "b"),
      Seq("k"), Seq("pri"), Seq("a", "b"), withProvenance = prov)

  test("per-field fallback matches the sequential reference") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val rows = (0 until 30).flatMap { k =>
        (1 to 1 + r.nextInt(4)).map { pri =>
          (k.toLong, pri,
            if (r.nextInt(3) == 0) None else Some(s"a$pri-${r.nextInt(5)}"),
            if (r.nextInt(3) == 0) None else Some(r.nextInt(100).toLong))
        }
      }
      val got = run(rows).collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) None
          else Some(r.getLong(2)), r.getLong(3))).toMap
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val byPri = g.sortBy(-_._2)
        k -> (byPri.collectFirst { case (_, _, Some(a), _) => a },
          byPri.collectFirst { case (_, _, _, Some(b)) => b },
          g.size.toLong)
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("fields fall back INDEPENDENTLY — not row-level latest-wins") {
    // Highest-priority row has a but not b; b must come from the lower
    // row. A whole-row winner would leave b null.
    val rows = Seq(
      (1L, 2, Some("high-a"), None: Option[Long]),
      (1L, 1, Some("low-a"), Some(42L)))
    val r = run(rows, prov = true).collect().head
    assert(r.getString(1) === "high-a")
    assert(r.getLong(2) === 42L)
    // Provenance records which priority won each field.
    assert(r.getInt(3) === 2 && r.getInt(4) === 1)
  }

  test("key with all-null field yields null; n_source_rows counts all") {
    val rows = Seq((1L, 1, None: Option[String], Some(7L)),
      (1L, 2, None: Option[String], None: Option[Long]))
    val r = run(rows).collect().head
    assert(r.isNullAt(1) && r.getLong(2) === 7L && r.getLong(3) === 2L)
  }
}
