package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Write-audit-publish parquet sink: the dataset-release contract the
 * q196 pipeline ships under. A consumer of a released training set
 * needs three guarantees a bare directory of parquet files doesn't
 * give: (1) the write COMPLETED (no torn partial output read as a
 * smaller corpus), (2) nothing was MODIFIED after release, (3) what
 * they read is what the producer audited. The manifest provides all
 * three:
 *
 *  - data lands in `dir/data/` first;
 *  - the audit re-READS what landed (not what the producer meant to
 *    write) and computes row count + an order-independent content hash
 *    — the XOR of per-row xxhash64 over every column, so any dropped,
 *    duplicated, or altered row flips it regardless of row order or
 *    file layout (XOR is the commutative fold that makes the audit a
 *    plain map-side-combined aggregate at any scale; a positional hash
 *    would force a global sort);
 *  - `dir/MANIFEST.json` is written LAST — its existence IS the commit
 *    (readers that require the manifest never observe a torn write).
 *
 * [[verify]] re-runs the same audit against the manifest and reports
 * (ok, expected, actual) — the consumer-side check, and the tamper
 * detector (RELEASE.md-style integrity without any external service).
 */
object Manifest {

  private def audit(df: DataFrame): (Long, Long) = {
    val r = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Write `df` under `dir/data`, audit what landed, publish
    * `dir/MANIFEST.json`. Returns (n_rows, content_hash). */
  def writeWithManifest(df: DataFrame, dir: String): (Long, Long) = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(s"$dir/data")
    val (n, x) = audit(spark.read.parquet(s"$dir/data"))
    val cols = spark.read.parquet(s"$dir/data").columns
      .map(c => "\"" + c + "\"").mkString("[", ",", "]")
    val json =
      s"""{"n_rows":$n,"content_hash":$x,"columns":$cols}"""
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    (n, x)
  }

  /** Consumer-side audit: recompute the content hash of `dir/data` and
    * compare with the manifest. Returns (ok, manifest (n, hash),
    * recomputed (n, hash)). Missing manifest = not committed → throws. */
  def verify(spark: SparkSession, dir: String)
      : (Boolean, (Long, Long), (Long, Long)) = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"$dir has no MANIFEST.json — release never committed")
    val in = fs.open(path)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(name: String): Long =
      s""""$name":(-?\\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(s"manifest lacks $name"))
    val expected = (field("n_rows"), field("content_hash"))
    val actual = audit(spark.read.parquet(s"$dir/data"))
    (expected == actual, expected, actual)
  }
}
