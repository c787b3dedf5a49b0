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

  /** Manifest format written by this version. History:
    *  1 (r7, implicit — no `format` field): n_rows + content_hash (XOR
    *    fold of xxhash64 over the bare columns, no null markers).
    *  2 (r9+): adds the decimal sum fold (`sum_hash`), the audited
    *    `columns` list, and interleaves per-column null markers into
    *    the row hash — which REDEFINES content_hash, so v1 and v2
    *    hashes are not comparable. NOTE an r9 window (the first v2
    *    audit commit) wrote sum_hash/columns and the null-marker hash
    *    WITHOUT a `format` field; the explicit field arrived with the
    *    r10 Jackson writer. [[verify]] therefore dispatches a
    *    format-less manifest on the fields only v2 writes
    *    (sum_hash/columns present ⇒ 2, else 1) — both legacy
    *    generations stay verifiable, not indistinguishable from
    *    tampered ones (ADVICE r9/r10). */
  val FormatVersion = 2

  /** v1 row-hash audit (no null markers) — kept solely so [[verify]]
    * can check releases published before the format-2 change. */
  private def auditV1(df: DataFrame): Audit = {
    val frame = df.select(xxhash64(df.columns.toSeq.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
        coalesce(sum(col("h").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("s"))
    readAudit(frame)
  }

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Write `df` under `dir/data`, audit what landed, publish
    * `dir/MANIFEST.json` (format 2; column names JSON-escaped by a real
    * writer, so quotes/commas/brackets in names round-trip — ADVICE r9).
    * Returns (n_rows, content_hash). */
  def writeWithManifest(df: DataFrame, dir: String): (Long, Long) = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(s"$dir/data")
    val landed = spark.read.parquet(s"$dir/data")
    val a = audit(landed)
    val m = mapper
    val root = m.createObjectNode()
    root.put("format", FormatVersion)
    root.put("n_rows", a.n)
    root.put("content_hash", a.xor)
    root.put("sum_hash", a.sum.toString)
    val colsNode = root.putArray("columns")
    landed.columns.foreach(colsNode.add)
    val json = m.writeValueAsString(root)
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    (a.n, a.xor)
  }

  /** Consumer-side audit: recompute the manifest's format of the content
    * audit over `dir/data` and compare every field the manifest carries.
    * Format 2 checks count, BOTH folds, and the column list; a format-1
    * manifest (no `format` field AND no sum_hash/columns — pre-r9
    * releases) is checked with the v1 row hash on count + XOR (each
    * absent field simply isn't checked, it does NOT fail); a format-less
    * manifest CARRYING sum_hash/columns (the r9 window) is checked as
    * format 2. Returns
    * (ok, manifest (n, xor), recomputed (n, xor)). Missing manifest =
    * not committed → throws. */
  def verify(spark: SparkSession, dir: String)
      : (Boolean, (Long, Long), (Long, Long)) = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/MANIFEST.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"$dir has no MANIFEST.json — release never committed")
    val in = fs.open(path)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = mapper.readTree(json)
    def need(name: String): com.fasterxml.jackson.databind.JsonNode = {
      val n = node.get(name)
      if (n == null) throw new IllegalStateException(s"manifest lacks $name")
      n
    }
    // Format-less dispatch: the r9 window wrote the v2 audit without a
    // `format` field (see FormatVersion history) — sum_hash/columns are
    // the fields only v2 writes, so their presence selects the v2 row
    // hash; a plain (n_rows, content_hash) manifest is v1.
    val format = Option(node.get("format")).map(_.asInt).getOrElse(
      if (node.has("sum_hash") || node.has("columns")) 2 else 1)
    require(format <= FormatVersion,
      s"manifest format $format is newer than this reader ($FormatVersion)")
    val expected = (need("n_rows").asLong, need("content_hash").asLong)
    val data = spark.read.parquet(s"$dir/data")
    val a = if (format >= 2) audit(data) else auditV1(data)
    val sumOk = Option(node.get("sum_hash"))
      .forall(s => BigInt(s.asText) == a.sum)
    val colsOk = Option(node.get("columns")).forall { c =>
      import scala.jdk.CollectionConverters._
      c.elements.asScala.map(_.asText).toSeq == data.columns.toSeq
    }
    val ok = expected == ((a.n, a.xor)) && sumOk && colsOk
    (ok, expected, (a.n, a.xor))
  }
}
