package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * packCodes/unpackCodes — the SQ8 1-byte/dim artifact shape: exact
 * round-trip over random and boundary code arrays (the signed-top-byte
 * bijection), stability of the packed words (no ANSI overflow at the
 * extremes), and dot-from-unpacked == dot-from-codes (the identity the
 * packed serving path rests on).
 */
class Sq8PackSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(rows: Seq[(Long, Seq[Long])], dim: Int): Unit = {
    val df = rows.toDF("id", "codes")
    val back = df.select(col("id"),
        Similarity.unpackCodes(
          Similarity.packCodes(col("codes"), dim), dim).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    rows.foreach { case (id, cs) =>
      assert(back(id) === cs, s"row $id failed the pack round-trip")
    }
  }

  test("pack/unpack round-trips random codes at dims 8, 16, 64") {
    val rng = new Random(5)
    for (dim <- Seq(8, 16, 64)) {
      roundTrip((1L to 20L).map(i =>
        (i, Seq.fill(dim)(rng.nextInt(256).toLong))), dim)
    }
  }

  test("boundary codes survive (all-0, all-255, sign-bit top bytes)") {
    val dim = 16
    roundTrip(Seq(
      (1L, Seq.fill(dim)(0L)),
      (2L, Seq.fill(dim)(255L)),
      (3L, (0 until dim).map(j => if (j % 8 == 0) 255L else 0L)),
      (4L, (0 until dim).map(j => if (j % 8 == 0) 0L else 255L)),
      (5L, (0 until dim).map(j => (j * 17 % 256).toLong))), dim)
  }

  test("packed word count and the integer dot identity") {
    val rng = new Random(9)
    val dim = 64
    val rows = (1L to 10L).map(i =>
      (i, Seq.fill(dim)(rng.nextInt(256).toLong)))
    val df = rows.toDF("id", "codes")
      .withColumn("packed", Similarity.packCodes(col("codes"), dim))
    assert(df.select(size(col("packed"))).as[Int].collect().forall(_ == 8))
    // dot(q, unpack(pack(c))) == dot(q, c) for a fixed query vector
    val q = Seq.fill(dim)(rng.nextInt(256).toLong)
    val qCol = array(q.map(lit): _*)
    def dot(c: org.apache.spark.sql.Column) =
      aggregate(zip_with(qCol, c, _ * _), lit(0L), _ + _)
    val both = df.select(
        dot(col("codes")).as("direct"),
        dot(Similarity.unpackCodes(col("packed"), dim)).as("viaPack"))
      .as[(Long, Long)].collect()
    assert(both.forall { case (a, b) => a == b })
  }

  // ---- PQ pack (4-bit nibbles, round 13): the same bijection at PQ's
  // sub-byte code width.

  private def pqRoundTrip(rows: Seq[(Long, Seq[Long])], m: Int,
      bits: Int): Unit = {
    val df = rows.toDF("id", "codes")
    val back = df.select(col("id"),
        Similarity.pqUnpack(
          Similarity.pqPack(col("codes"), m, bits), m, bits).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    rows.foreach { case (id, cs) =>
      assert(back(id) === cs, s"row $id failed the PQ pack round-trip")
    }
  }

  test("pqPack/pqUnpack round-trips 4-bit codes, incl. padded words and boundaries") {
    val rng = new Random(13)
    // m = 8 pads half a word; m = 16 is exactly one word; m = 20 spans two
    for (m <- Seq(8, 16, 20)) {
      pqRoundTrip((1L to 20L).map(i =>
        (i, Seq.fill(m)(rng.nextInt(16).toLong))), m, 4)
    }
    // boundaries: all-0 (slot 0 biased to -8 -> Long.MinValue region),
    // all-15, sign-bit-heavy first slots
    pqRoundTrip(Seq(
      (1L, Seq.fill(16)(0L)),
      (2L, Seq.fill(16)(15L)),
      (3L, (0 until 16).map(j => if (j == 0) 15L else 0L)),
      (4L, (0 until 16).map(j => if (j == 0) 0L else 15L))), 16, 4)
  }

  test("pqPack at bits = 8 reproduces packCodes word for word") {
    val rng = new Random(21)
    val dim = 16
    val rows = (1L to 15L).map(i =>
      (i, Seq.fill(dim)(rng.nextInt(256).toLong)))
    val words = rows.toDF("id", "codes").select(col("id"),
        Similarity.packCodes(col("codes"), dim).as("a"),
        Similarity.pqPack(col("codes"), dim, bits = 8).as("b"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    words.foreach { case (id, a, b) =>
      assert(a === b, s"row $id: packCodes and pqPack(bits=8) diverge")
    }
  }

  test("pqPack refuses out-of-range codes instead of corrupting the word (ADVICE r13)") {
    // A code outside [0, 2^bits) would silently carry into adjacent
    // slots — the packed word round-trips to WRONG values. The per-slot
    // gate raises instead.
    for (bad <- Seq(16L, -1L, 255L)) {
      val rows = Seq((1L, Seq(3L, bad, 7L, 0L, 1L, 2L, 4L, 5L)))
      val ex = intercept[Exception] {
        rows.toDF("id", "codes")
          .select(Similarity.pqPack(col("codes"), 8, bits = 4))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("pqPack: code out of")),
        s"unexpected failure for code $bad: $ex")
    }
    // In-range codes at bits = 8 still pack (255 is legal there).
    val ok = Seq((1L, Seq.fill(8)(255L))).toDF("id", "codes")
      .select(Similarity.pqPack(col("codes"), 8, bits = 8))
      .collect()
    assert(ok.length === 1)
  }
}
