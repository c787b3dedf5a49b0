package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.operators.TableDiff

/**
 * Keyed snapshot diff (q143): sequential-reference statuses on random
 * snapshot pairs, null-vs-value distinctions, and the separator
 * injection a concat-based fingerprint would get wrong.
 */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Option[String], Long)]): DataFrame =
    rows.toDF("k", "s", "v")

  private def statuses(a: Seq[(Long, Option[String], Long)],
      b: Seq[(Long, Option[String], Long)]): Map[Long, String] =
    TableDiff.rowDiff(df(a), df(b), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("statuses match the sequential reference on random snapshots") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      def snap() = (0 until 40).flatMap { k =>
        if (r.nextInt(5) == 0) None
        else Some((k.toLong,
          if (r.nextInt(6) == 0) None else Some(s"s${r.nextInt(4)}"),
          r.nextInt(3).toLong))
      }
      val (a, b) = (snap(), snap())
      val am = a.map(t => t._1 -> (t._2, t._3)).toMap
      val bm = b.map(t => t._1 -> (t._2, t._3)).toMap
      val expected = (am.keySet ++ bm.keySet).map { k =>
        k -> ((am.get(k), bm.get(k)) match {
          case (None, Some(_))          => "added"
          case (Some(_), None)          => "removed"
          case (Some(x), Some(y)) if x != y => "changed"
          case _                        => "unchanged"
        })
      }.toMap
      assert(statuses(a, b) === expected, s"seed=$seed")
    }
  }

  test("null payload is distinct from any string, equal to itself") {
    val a = Seq((1L, None: Option[String], 7L), (2L, Some(""), 7L))
    val b = Seq((1L, Some(""), 7L), (2L, Some(""), 7L))
    assert(statuses(a, a) === Map(1L -> "unchanged", 2L -> "unchanged"))
    assert(statuses(a, b) === Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("field-boundary injection does not collide (the concat trap)") {
    // ("a\u0001b", "c") vs ("a", "b\u0001c"): a \u0001-separator-concat
    // fingerprint encodes both as a·SEP·b·SEP·c and reports unchanged;
    // the JSON encoding escapes the content and must say changed.
    val a = Seq((1L, "a\u0001b", "c")).toDF("k", "s", "t")
    val b = Seq((1L, "a", "b\u0001c")).toDF("k", "s", "t")
    val got = TableDiff.rowDiff(a, b, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "changed"))
  }

  test("diffSummary rolls the statuses up") {
    val a = Seq((1L, Some("x"), 1L), (2L, Some("y"), 2L))
    val b = Seq((2L, Some("z"), 2L), (3L, Some("w"), 3L))
    val got = TableDiff.diffSummary(df(a), df(b), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L))
  }
}
