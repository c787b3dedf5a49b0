package graft

import scala.util.Random

import graft.operators.Regression

/**
 * Grouped OLS from exact integer moments (q141): recovery of a known
 * line, sequential-reference equality of the exact numerator pair on
 * random data, and the constant-x degenerate guard.
 */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long, Long, Option[Double], Option[Double])] =
    Regression.olsGrouped(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap

  test("recovers an exact line y = 7x + 3") {
    val rows = (1L to 50L).map(x => ("g", x, 7 * x + 3))
    val (_, _, _, slope, intercept) = run(rows)("g")
    assert(slope === Some(7.0))
    assert(intercept === Some(3.0))
  }

  test("numerator/denominator match the sequential exact moments") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val rows = Seq.fill(300)((s"g${r.nextInt(3)}",
        r.nextInt(100).toLong, r.nextInt(100000).toLong))
      val got = run(rows)
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val n = grp.size.toLong
        val sx = grp.map(_._2).sum
        val sy = grp.map(_._3).sum
        val sxx = grp.map(t => t._2 * t._2).sum
        val sxy = grp.map(t => t._2 * t._3).sum
        val (gn, num, den, slope, _) = got(g)
        assert(gn === n)
        assert(num === n * sxy - sx * sy, s"num of $g seed=$seed")
        assert(den === n * sxx - sx * sx, s"den of $g seed=$seed")
        assert(slope.isDefined && math.abs(slope.get -
          (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)) < 1e-6)
      }
    }
  }

  test("constant x yields NULL slope/intercept, never NaN") {
    val rows = Seq(("g", 5L, 10L), ("g", 5L, 20L), ("g", 5L, 30L))
    val (n, _, den, slope, intercept) = run(rows)("g")
    assert(n === 3L && den === 0L)
    assert(slope === None && intercept === None)
  }
}
