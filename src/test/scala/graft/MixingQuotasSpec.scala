package graft

import scala.util.Random

import graft.operators.Curation

/**
 * Curation.mixingQuotas vs a sequential reference of the two-pass
 * capped largest-remainder algorithm, plus the allocation invariants on
 * random availability tables (Σ quota == min(budget, Σ avail), quota ≤
 * avail, quota ≥ 0) and the degenerate corners the q184 oracle doesn't
 * reach (budget ≥ total, budget 0, single group).
 */
class MixingQuotasSpec extends SparkSpec {
  import spark.implicits._

  private def ref(avail: Seq[(String, Long)], budget: Long)
      : Map[String, Long] = {
    val sorted = avail.sortBy(_._1)
    val n = sorted.size
    val base = budget / n
    val rem = budget % n
    val alloc1 = sorted.zipWithIndex.map { case ((g, a), i) =>
      (g, a, math.min(base + (if (i < rem) 1L else 0L), a))
    }
    val left = budget - alloc1.map(_._3).sum
    val hs = alloc1.map { case (_, a, x) => a - x }
    val hsum = hs.sum
    val l2 = math.min(left, hsum)
    val share = hs.map(h => if (hsum > 0) l2 * h / hsum else 0L)
    val fr = hs.map(h => if (hsum > 0) (BigInt(l2) * h % hsum) else BigInt(0))
    val need = (l2 - share.sum).toInt
    val winners = sorted.map(_._1).zip(fr).zipWithIndex
      .sortBy { case ((g, f), _) => (-f, g) }.take(need).map(_._2).toSet
    alloc1.zipWithIndex.map { case ((g, _, x), i) =>
      g -> (x + share(i) + (if (winners(i)) 1L else 0L))
    }.toMap
  }

  private def run(avail: Seq[(String, Long)], budget: Long)
      : Map[String, Long] =
    Curation.mixingQuotas(avail.toDF("lang", "avail"), "lang", "avail",
      budget).select("lang", "quota")
      .as[(String, Long)].collect().toMap

  for (seed <- Seq(41, 42, 43))
  test(s"matches the sequential reference + invariants, seed $seed") {
    val r = new Random(seed)
    val avail = (0 until 6 + r.nextInt(5)).map(i =>
      f"g$i%02d" -> (r.nextInt(500) + 1).toLong)
    for (budget <- Seq(0L, avail.map(_._2).sum / 3,
        avail.map(_._2).sum * 9 / 10, avail.map(_._2).sum + 100)) {
      val got = run(avail, budget)
      assert(got == ref(avail, budget), s"seed $seed budget $budget")
      assert(got.values.sum == math.min(budget, avail.map(_._2).sum),
        s"sum rule broken at budget $budget")
      val am = avail.toMap
      got.foreach { case (g, q) =>
        assert(q >= 0 && q <= am(g), s"quota $q out of [0, ${am(g)}] for $g")
      }
    }
  }

  test("single group: quota = min(budget, avail)") {
    assert(run(Seq("only" -> 70L), 100L) == Map("only" -> 70L))
    assert(run(Seq("only" -> 70L), 30L) == Map("only" -> 30L))
  }

  test("uniform-remainder tie goes to group order") {
    // 3 groups, budget 7: base 2, rem 1 → first group by name gets it.
    val got = run(Seq("b" -> 10L, "a" -> 10L, "c" -> 10L), 7L)
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("weightedSampleByQuota == fixed-k sampler when every quota is k; quotas bind per stratum") {
    val docs = (0L until 60L).map(i =>
      (i, s"g${i % 3}", (i % 7 + 1) * 10)).toDF("id", "grp", "w")
    val qk = Seq(("g0", 4L), ("g1", 4L), ("g2", 4L)).toDF("grp", "quota")
    val byQuota = Curation.weightedSampleByQuota(docs, "id", "w", "grp",
      qk, salt = "t").select("stratum", "id")
      .as[(String, Long)].collect().toSet
    val fixed = Curation.weightedSampleGrouped(docs, "id", "w", "grp",
      k = 4, salt = "t").select("stratum", "id")
      .as[(String, Long)].collect().toSet
    assert(byQuota == fixed)
    val uneven = Seq(("g0", 1L), ("g1", 6L), ("g2", 0L)).toDF("grp", "quota")
    val got = Curation.weightedSampleByQuota(docs, "id", "w", "grp",
      uneven, salt = "t").groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("g0" -> 1L, "g1" -> 6L), s"quotas not honored: $got")
  }
}
