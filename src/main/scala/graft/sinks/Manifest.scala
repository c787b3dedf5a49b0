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
 *    write) and computes row count + TWO order-independent content
 *    folds of the per-row hash — the XOR and the sum mod 2⁶⁴ of
 *    xxhash64 over every column interleaved with per-column null
 *    markers. Commutative folds are what keep the audit a plain
 *    map-side-combined aggregate at any scale (a positional hash would
 *    force a global sort). Each fold alone has blind spots — XOR
 *    cancels any change of even multiplicity; the sum misses swaps
 *    summing to 0 mod 2⁶⁴ — so the audit requires a SIMULTANEOUS
 *    collision of count, XOR, and modular sum to miss a change
 *    (e.g. the "two copies of row A become two copies of row B" edit
 *    that fools XOR+count moves the sum by 2·(h_B − h_A)). The null
 *    markers keep rows like (x, null) and (null, x) distinct even
 *    though xxhash64 itself skips null arguments;
 *  - the audited column list is recorded, so a schema-preserving
 *    rename (same positional values, different column name) is caught
 *    even though the row hash is positional;
 *  - `dir/MANIFEST.json` is written LAST — its existence IS the commit
 *    (readers that require the manifest never observe a torn write).
 *
 * [[verify]] re-runs the same audit against the manifest — count, both
 * folds, and the column list — and reports (ok, expected, actual) on
 * the (n_rows, content_hash) pair. The consumer-side check, and the
 * tamper detector (RELEASE.md-style integrity without any external
 * service).
 */
object Manifest {

  private val Mod64 = BigInt(1) << 64

  private final case class Audit(n: Long, xor: Long, sum: BigInt)

  /**
   * The 1-row audit ARTIFACT of a frame: (n, x, s) = row count, XOR of
   * per-row xxhash64, and the raw (un-modded) sum of those hashes as
   * decimal(38,0). Every component is a commutative-associative fold,
   * so shard audits merge with [[mergeAudits]] and the audit carries a
   * streaming face for free
   * ([[graft.streaming.ArtifactStreams.manifestAuditStream]]): audit
   * once per increment, never rescan the release.
   */
  def auditFrame(df: DataFrame): DataFrame = {
    // Interleaved null markers: xxhash64 skips null arguments, so the
    // boolean isnull(c) after each column pins both the null-ness and
    // (by shifting what the hash consumes) the position of every value.
    val hashArgs = df.columns.toSeq.flatMap(c => Seq(col(c), isnull(col(c))))
    df.select(xxhash64(hashArgs: _*).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
        coalesce(sum(col("h").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("s"))
  }

  /** Merge audit artifacts: count and sum add, XORs fold — exactly the
    * audit of the concatenated data (ManifestSpec pins shard-merge ==
    * single-shot). decimal(38,0) holds ~10³⁷ ≈ 2⁶³·10¹⁸ rows of raw
    * sum headroom; the mod-2⁶⁴ reduction happens only at read. */
  def mergeAudits(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .agg(sum(col("n")).as("n"),
        coalesce(expr("bit_xor(x)"), lit(0L)).as("x"),
        coalesce(sum(col("s")), lit(java.math.BigDecimal.ZERO)
          .cast("decimal(38,0)")).as("s"))

  private def readAudit(frame: DataFrame): Audit = {
    val r = frame.collect()(0)
    val raw = BigInt(r.getDecimal(2).toBigInteger)
    Audit(r.getLong(0), r.getLong(1), ((raw % Mod64) + Mod64) % Mod64)
  }

  private def audit(df: DataFrame): Audit = readAudit(auditFrame(df))

  /** Write `df` under `dir/data`, audit what landed, publish
    * `dir/MANIFEST.json`. Returns (n_rows, content_hash). */
  def writeWithManifest(df: DataFrame, dir: String): (Long, Long) = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(s"$dir/data")
    val landed = spark.read.parquet(s"$dir/data")
    val a = audit(landed)
    val cols = landed.columns
      .map(c => "\"" + c + "\"").mkString("[", ",", "]")
    val json =
      s"""{"n_rows":${a.n},"content_hash":${a.xor},""" +
        s""""sum_hash":"${a.sum}","columns":$cols}"""
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    (a.n, a.xor)
  }

  /** Consumer-side audit: recompute count, both content folds, and the
    * column list of `dir/data` and compare all four with the manifest.
    * Returns (ok, manifest (n, xor), recomputed (n, xor)) — `ok` also
    * covers the sum fold and the recorded columns. Missing manifest =
    * not committed → throws. */
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
    def strField(name: String): String =
      s""""$name":"([^"]*)"""".r.findFirstMatchIn(json)
        .map(_.group(1))
        .getOrElse(throw new IllegalStateException(s"manifest lacks $name"))
    val expCols = s""""columns":\\[([^\\]]*)\\]""".r.findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalStateException("manifest lacks columns"))
    val expected = (field("n_rows"), field("content_hash"))
    val expSum = BigInt(strField("sum_hash"))
    val data = spark.read.parquet(s"$dir/data")
    val a = audit(data)
    val ok = expected == ((a.n, a.xor)) && expSum == a.sum &&
      expCols == data.columns.toSeq
    (ok, expected, (a.n, a.xor))
  }
}
