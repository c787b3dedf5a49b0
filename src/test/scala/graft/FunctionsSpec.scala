package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions._

/** Scalar semantics pinned to the reference (citations in graft.functions). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def norm1(s: String, junk: String = JunkChars): String =
    Seq(s).toDF("s").select(normalize_str(col("s"), junk).as("n"))
      .as[String].head()

  test("normalize_str: accents, case, whitespace, edge trim") {
    assert(norm1("  José   Núñez! ") == "JOSE NUNEZ")
    assert(norm1("\t maría-luisa  pérez ") == "MARIA-LUISA PEREZ")
    assert(norm1("...El Señor...") == "EL SENOR")
  }

  test("normalize_str: junk chars to space; locations keep quotes") {
    assert(norm1("A^B\"C<D>E_F") == "A B C D E F")
    assert(norm1("A^B\"C", JunkCharsForLocs) == "A B\"C")
  }

  test("normalize_str: empty after normalization drops to empty string") {
    assert(norm1("  !!  ") == "")
  }

  test("normalize_str: double application is a fixpoint (property)") {
    // The reference chain itself is NOT idempotent (junk→space runs after
    // whitespace collapse, so one pass can leave uncollapsed spaces); a
    // second pass is a fixpoint. Property pinned accordingly.
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
      ' ', 'é', 'ñ', 'Á', '^', '"', '<', '>', '_', '.', '-', '!'))).map(_.mkString)
    val samples = (0 until 60).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    import spark.implicits._
    def normAll(xs: Seq[String]): Seq[String] =
      xs.toDF("s").select(normalize_str(col("s")).as("n")).as[String].collect().toSeq
    val twice = normAll(normAll(samples))
    val thrice = normAll(twice)
    twice.zip(thrice).foreach { case (a, b) => assert(a == b) }
  }

  test("twitter_normalize_str: lower + accent strip") {
    val got = Seq("  ÁbC dÉf ").toDF("s")
      .select(twitter_normalize_str(col("s"))).as[String].head()
    assert(got == "ábc déf".replace("á", "a").replace("é", "e"))
    assert(got == "abc def")
  }

  test("digit_runs and token_count") {
    val (runs, toks) = Seq("AB12 CD3 X").toDF("s")
      .select(digit_runs(col("s")), token_count(col("s")))
      .as[(Seq[String], Int)].head()
    assert(runs == Seq("12", "3"))
    assert(toks == 3)
  }

  test("candidate_predicate: person strong/weak split (2..6 tokens, ≥5 chars, charset)") {
    val df = Seq("JUAN PEREZ", "J", "JUAN P3REZ", "SOLO",
      "A B C D E F G").toDF("s")
      .select(col("s"), candidate_predicate(col("s"), 5, 6, 2,
        Some("^[A-Za-z.\\s]+$")).as("strong"))
    val m = df.as[(String, Boolean)].collect().toMap
    assert(m("JUAN PEREZ"))
    assert(!m("J"))            // too short, 1 token
    assert(!m("JUAN P3REZ"))   // digit breaks charset
    assert(!m("SOLO"))         // 1 token
    assert(!m("A B C D E F G")) // 7 tokens
  }

  test("lat_long_parse: DMS-with-separators family (comma decimals)") {
    val out = Seq("04 38 22 73 04 51", "N04 38 22,5 W73 04 51,2", "Bogota")
      .toDF("place")
      .select(GeoParse.lat_long_parse(col("place")).as("p"))
      .select(col("p.lat"), col("p.lon"))
      .as[(Option[Double], Option[Double])].collect()
    assert(math.abs(out(0)._1.get - (4 + 38 / 60.0 + 22 / 3600.0)) < 1e-9)
    assert(math.abs(out(0)._2.get - -(73 + 4 / 60.0 + 51 / 3600.0)) < 1e-9)
    assert(math.abs(out(1)._1.get - (4 + 38 / 60.0 + 22.5 / 3600.0)) < 1e-9)
    assert(out(2)._1.isEmpty && out(2)._2.isEmpty)
  }

  test("lat_long_parse: packed DDMMSS family") {
    val Some((lat, lon)) = Seq("043822 730451").toDF("place")
      .select(GeoParse.lat_long_parse(col("place")).as("p"))
      .select(col("p.lat"), col("p.lon"))
      .as[(Double, Double)].collect().headOption
    assert(math.abs(lat - (4 + 38 / 60.0 + 22 / 3600.0)) < 1e-9)
    assert(math.abs(lon - -(73 + 4 / 60.0 + 51 / 3600.0)) < 1e-9)
  }

  test("spanish_date_normalize: three regex families + year pivot + range") {
    val cases = Seq(
      "12 de enero de 2005" -> Some("2005/01/12"),
      "3/feb/99" -> Some("1999/02/03"),       // 2-digit year > 12 → 19xx
      "el día 5-mar-11" -> Some("2011/03/05"), // ≤ 12 → 20xx
      "julio 4 del 1998" -> Some("1998/07/04"),
      "28 de febrero del año 1987" -> Some("1987/02/28"),
      "31 de abril de 2013" -> None,           // 2013 outside 1900–2012
      // Pattern-2 leftmost-match across the slash/dash expansion: the
      // reference's single \2-backreference regex picks the EARLIER
      // dash-form date, not the slash variant tried "first".
      "4-ene-99 y luego 7/mar/01" -> Some("1999/01/04"),
      "7/mar/01 y luego 4-ene-99" -> Some("2001/03/07"),
      "sin fecha" -> None)
    val got = cases.map(_._1).toDF("s")
      .select(SpanishDate.spanish_date_normalize(col("s")))
      .as[Option[String]].collect()
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"for '$in'")
    }
    // The codegen'd expression and the pure-Column chain agree.
    val viaCols = cases.map(_._1).toDF("s")
      .select(SpanishDate.spanish_date_normalize_cols(col("s")))
      .as[Option[String]].collect()
    assert(got.toSeq == viaCols.toSeq)
  }

  test("strip_accents survives SQL registration and codegen") {
    registerAll(spark)
    val got = spark.sql("SELECT strip_accents('Ándrés Muñoz')").as[String].head()
    assert(got == "Andres Munoz")
  }
}
