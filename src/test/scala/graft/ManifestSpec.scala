package graft

import graft.sinks.Manifest

/**
 * Write-audit-publish manifest sink: round-trip verifies, the hash is
 * row-order/file-layout independent, and every tamper class (dropped
 * row, altered cell, appended file) flips the verification.
 */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("manifest").toString

  private val rows = (0L until 500L).map(i => (i, s"v$i", i % 7))

  test("round-trip verifies; hash independent of layout and row order") {
    val d1 = tmp()
    val (n1, x1) = Manifest.writeWithManifest(
      rows.toDF("id", "v", "g"), d1)
    assert(n1 == 500)
    val (ok, exp, act) = Manifest.verify(spark, d1)
    assert(ok, s"fresh release must verify: $exp vs $act")
    // Same rows, shuffled order, different partitioning → same hash.
    val d2 = tmp()
    val (n2, x2) = Manifest.writeWithManifest(
      scala.util.Random.shuffle(rows).toDF("id", "v", "g").repartition(7), d2)
    assert((n1, x1) == (n2, x2),
      "content hash must not depend on row order or file layout")
  }

  test("tampering flips verification: dropped row, altered cell, appended data") {
    val base = tmp()
    Manifest.writeWithManifest(rows.toDF("id", "v", "g"), base)

    def tamper(mut: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Boolean = {
      val d = tmp()
      Manifest.writeWithManifest(rows.toDF("id", "v", "g"), d)
      // overwrite the data dir behind the manifest's back
      mut(spark.read.parquet(s"$d/data"))
        .write.mode("overwrite").parquet(s"$d/data2")
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$d/data"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$d/data2"),
        new org.apache.hadoop.fs.Path(s"$d/data"))
      Manifest.verify(spark, d)._1
    }
    import org.apache.spark.sql.functions._
    assert(!tamper(_.filter(col("id") =!= 42L)), "dropped row must fail")
    assert(!tamper(_.withColumn("v",
      when(col("id") === 7L, lit("EVIL")).otherwise(col("v")))),
      "altered cell must fail")
    assert(!tamper(df => df.unionByName(df.limit(1))),
      "duplicated row must fail")
    assert(!tamper(_.withColumnRenamed("v", "w")),
      "schema-preserving column rename must fail via the recorded columns")
  }

  test("sum fold catches the XOR-blind even-multiplicity swap") {
    import org.apache.spark.sql.functions._
    // Base data contains a row of multiplicity 2. Replacing both copies
    // with two copies of a DIFFERENT row keeps n_rows AND the XOR (each
    // pair XORs to 0) — only the modular sum fold flips.
    val d = tmp()
    val dup = Seq((1000L, "dup", 0L), (1000L, "dup", 0L))
    Manifest.writeWithManifest((rows ++ dup).toDF("id", "v", "g"), d)
    val swapped = spark.read.parquet(s"$d/data")
      .filter(!(col("id") === 1000L))
      .unionByName(Seq((2000L, "dup2", 1L), (2000L, "dup2", 1L))
        .toDF("id", "v", "g"))
    swapped.write.mode("overwrite").parquet(s"$d/data2")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/data"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$d/data2"),
      new org.apache.hadoop.fs.Path(s"$d/data"))
    val (ok, exp, act) = Manifest.verify(spark, d)
    assert(exp == act,
      s"count and XOR must BOTH collide for this tamper class: $exp vs $act")
    assert(!ok, "the sum fold must still flip verification")
  }

  test("null markers: moving a null between columns flips the hash") {
    val d1 = tmp(); val d2 = tmp()
    val (n1, x1) = Manifest.writeWithManifest(
      Seq((Option("x"), Option.empty[String])).toDF("a", "b"), d1)
    val (n2, x2) = Manifest.writeWithManifest(
      Seq((Option.empty[String], Option("x"))).toDF("a", "b"), d2)
    assert(n1 == n2 && x1 != x2,
      "(x, null) and (null, x) must hash differently")
  }

  test("missing manifest is a refused read, not a silent pass") {
    val d = tmp()
    rows.toDF("id", "v", "g").write.parquet(s"$d/data")
    val e = intercept[IllegalArgumentException] {
      Manifest.verify(spark, d)
    }
    assert(e.getMessage.contains("never committed"))
  }

  test("column names with quotes/commas/brackets round-trip (real JSON writer)") {
    val d = tmp()
    val df = rows.toDF("id", """v"quoted""", "g,comma]bracket")
    Manifest.writeWithManifest(df, d)
    val (ok, exp, act) = Manifest.verify(spark, d)
    assert(ok, s"hostile column names must verify: $exp vs $act")
    // …and the rename tamper is still caught through the escaping.
    val renamed = spark.read.parquet(s"$d/data")
      .withColumnRenamed("""v"quoted""", """v"evil""")
    renamed.write.mode("overwrite").parquet(s"$d/data2")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/data"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$d/data2"),
      new org.apache.hadoop.fs.Path(s"$d/data"))
    assert(!Manifest.verify(spark, d)._1)
  }

  test("format-less manifest CARRYING sum_hash/columns (the r9 window) " +
      "verifies with the v2 audit, not a false tamper alarm") {
    // The first v2-audit writer emitted null markers + sum_hash/columns
    // but no `format` field; dispatching such a manifest to the v1 row
    // hash would fail content_hash AND sum_hash on a legitimate release
    // (ADVICE r10). Rebuild one of those manifests by hand.
    val d = tmp()
    val df = rows.toDF("id", "v", "g")
    df.write.parquet(s"$d/data")
    val landed = spark.read.parquet(s"$d/data")
    val r = Manifest.auditFrame(landed).collect()(0)
    val windowJson =
      s"""{"n_rows":${r.getLong(0)},"content_hash":${r.getLong(1)},""" +
        s""""sum_hash":"${BigInt(r.getDecimal(2).toBigInteger)
          .mod(BigInt(1) << 64)}",""" +
        s""""columns":["id","v","g"]}"""
    val path = new org.apache.hadoop.fs.Path(s"$d/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(windowJson.getBytes("UTF-8")) finally out.close()
    val (ok, exp, act) = Manifest.verify(spark, d)
    assert(ok, s"r9-window release must verify with the v2 audit: $exp vs $act")
    // …and it still catches real tampering.
    import org.apache.spark.sql.functions._
    val tampered = spark.read.parquet(s"$d/data").filter(col("id") =!= 3L)
    tampered.write.mode("overwrite").parquet(s"$d/data2")
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/data"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$d/data2"),
      new org.apache.hadoop.fs.Path(s"$d/data"))
    assert(!Manifest.verify(spark, d)._1,
      "window manifest must still catch a dropped row")
  }

  test("format-1 manifest (pre-r9 release) verifies via the legacy fallback") {
    import org.apache.spark.sql.functions._
    // A v1 release: data + a hand-built v1 manifest (no format field, no
    // sum_hash, no columns; content_hash = XOR of the NO-null-marker row
    // hash — exactly what the r7 writer emitted).
    val d = tmp()
    val df = rows.toDF("id", "v", "g")
    df.write.parquet(s"$d/data")
    val landed = spark.read.parquet(s"$d/data")
    val r = landed
      .select(xxhash64(landed.columns.toSeq.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x")).collect()(0)
    val legacyJson =
      s"""{"n_rows":${r.getLong(0)},"content_hash":${r.getLong(1)}}"""
    val path = new org.apache.hadoop.fs.Path(s"$d/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(legacyJson.getBytes("UTF-8")) finally out.close()
    val (ok, exp, act) = Manifest.verify(spark, d)
    assert(ok, s"legacy release must verify with the v1 row hash: $exp vs $act")
    // A v1 manifest still catches v1-visible tampering…
    val tampered = spark.read.parquet(s"$d/data").filter(col("id") =!= 3L)
    tampered.write.mode("overwrite").parquet(s"$d/data2")
    fs.delete(new org.apache.hadoop.fs.Path(s"$d/data"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$d/data2"),
      new org.apache.hadoop.fs.Path(s"$d/data"))
    assert(!Manifest.verify(spark, d)._1, "legacy manifest must still catch a dropped row")
  }

  test("a manifest from a NEWER format than the reader is refused") {
    val d = tmp()
    rows.toDF("id", "v", "g").write.parquet(s"$d/data")
    val json = s"""{"format":${Manifest.FormatVersion + 1},"n_rows":1,"content_hash":0}"""
    val path = new org.apache.hadoop.fs.Path(s"$d/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] { Manifest.verify(spark, d) }
    assert(e.getMessage.contains("newer"))
  }
}
