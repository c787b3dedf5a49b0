package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Large-scale deduplication operators for training-data pipelines. All are
 * pure DataFrame transforms built from codegen'd built-ins (xxhash64,
 * bitwise ops, higher-order array functions) — no UDFs, no driver loops —
 * so each lowers to scans + hash aggregations + equi-joins that scale
 * horizontally:
 *
 *  - exact:      one hash-groupBy (canonical = min id per identical text)
 *  - MinHash:    shingle → k permutations (seeded xxhash64) → banded LSH
 *                bucket join → candidates → exact-Jaccard verification.
 *                Cost is O(candidates), never O(n²).
 *  - SimHash:    64-bit signature via per-bit weighted majority; banding on
 *                16-bit chunks (Hamming ≤ 3 ⇒ some chunk equal by
 *                pigeonhole) → bucket join → bit_count(xor) verify.
 *  - n-gram Jaccard: exact sparse similarity via inverted shingle index
 *                (join on shingle), only pairs sharing ≥1 shingle surface.
 */
object Dedup {

  /** Signature-agreement count (codegen'd kernel, round 15): replaces the
    * interpreted `aggregate(zip_with(when(x === y, 1), 0, _ + _))` fold
    * evaluated once per candidate pair — identical integer count over
    * long (xxhash) or string (portable md5) signature components. */
  private def sigEqCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    graft.functions.exprCol(graft.functions.VectorEqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /**
   * Hash family used by the MinHash pipeline. `XxHash64Family` (default) is
   * the fast path: 64-bit codegen'd longs. `PortableMd5Family` produces
   * bit-identical values in any engine with md5 (DuckDB, Trino, Postgres…)
   * — same asymptotics, string-typed signatures — which puts the whole
   * shingle→sign→band→verify pipeline under an exact cross-engine oracle
   * (q43). Minhash only needs a hash that is uniform and totally ordered;
   * both families qualify (longs numerically, md5 hex lexicographically).
   */
  sealed trait HashFamily extends Serializable {
    def one(c: Column): Column
    def seeded(c: Column, seed: Int): Column
    def combine(cs: Seq[Column]): Column
  }
  object XxHash64Family extends HashFamily {
    def one(c: Column): Column = xxhash64(c)
    def seeded(c: Column, seed: Int): Column = xxhash64(c, lit(seed))
    def combine(cs: Seq[Column]): Column = xxhash64(cs: _*)
  }
  object PortableMd5Family extends HashFamily {
    def one(c: Column): Column = md5(c)
    def seeded(c: Column, seed: Int): Column = md5(concat_ws("|", lit(seed), c))
    def combine(cs: Seq[Column]): Column = md5(concat_ws("|", cs: _*))
  }

  /**
   * LSH bucket-size guard shared by the banded joins (minhash bands,
   * simhash chunks, random-hyperplane tables). A bucket of B rows emits
   * O(B²) candidate pairs; callers pre-collapse exact duplicates, so an
   * oversized bucket means a non-discriminative hash (the LSH analogue of
   * a stopword) — dropping it trades a sliver of recall (pairs can still
   * meet in their other bands) for a hard quadratic bound, the standard
   * cap in the dedup literature. 0 = unbounded.
   */
  val DefaultMaxBucket: Int = 1000

  /** Keep only rows whose bucket (by `keyCols`) has minBucket..maxBucket
    * members. Symmetric self-joins use the default minBucket=2 (singleton
    * buckets pair nothing); asymmetric probe tables pass minBucket=1
    * (a singleton corpus bucket must stay probeable by future batches).
    * maxBucket=0 = unbounded; fully unbounded input returns unchanged. */
  private[operators] def capBuckets(df: DataFrame, keyCols: Seq[String],
      maxBucket: Int, minBucket: Int = 2): DataFrame = {
    if (maxBucket <= 0 && minBucket <= 1) return df
    val upper = if (maxBucket > 0) maxBucket.toLong else Long.MaxValue
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") >= minBucket && col("bsz") <= upper)
      .select(keyCols.map(col): _*)
    df.join(counts, keyCols, "left_semi")
  }

  /**
   * Over-cap bucket policy for the symmetric (self-join) candidate
   * generators. [[Overflow.Drop]] — the default and the standard cap in
   * the dedup literature — discards an oversized bucket entirely: recall
   * loss is silent, and on boilerplate-heavy corpora the hottest buckets
   * are exactly where the duplicates are. [[Overflow.Salt]] keeps every
   * row, splitting an over-cap bucket into ceil(B/cap) sub-buckets by a
   * deterministic secondary hash of the row id; pairs are then generated
   * within sub-buckets only. Cost for a B-row bucket: expected O(B·cap)
   * candidate pairs instead of O(B²) unsalted or 0 dropped — still a hard
   * quadratic bound, while recovering ~cap/B of the bucket's pairs (and,
   * for a bucket of mutual near-dups, a MUCH higher fraction of its DOCS:
   * every doc that lands in a sub-bucket with ≥1 other doc gains a
   * verified edge, so transitive-closure consumers like [[neardupClusters]]
   * recover most members — DedupSpec measures both fractions on a planted
   * mega-bucket).
   */
  sealed trait Overflow
  object Overflow {
    case object Drop extends Overflow
    /** Sub-bucket over-cap buckets by xxhash64(id) — the default salt. */
    case object Salt extends Overflow
    /** [[Salt]] with a caller-supplied salt hash over the id column —
      * e.g. [[portableSalt]] to put the salted pipeline under a DuckDB
      * oracle (xxhash64 has no cross-engine mirror). The expression must
      * be deterministic and return a non-negative integral column. */
    final case class SaltWith(saltHash: Column => Column) extends Overflow
  }

  /** Engine-portable salt hash: first 8 md5 hex digits of the id as a
    * long (DuckDB mirror: `CAST('0x' || substr(md5(CAST(id AS VARCHAR)),
    * 1, 8) AS BIGINT)`). */
  val portableSalt: Column => Column = id =>
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** [[capBuckets]] under [[Overflow.Salt]]: instead of dropping over-cap
    * buckets, adds a `bsalt` sub-bucket column (0 for under-cap buckets;
    * hash(idCol) mod ceil(bsz/cap) above it) that the caller must include
    * in its pair-join keys. minBucket filtering matches [[capBuckets]]. */
  private[graft] def capBucketsSalted(df: DataFrame, keyCols: Seq[String],
      maxBucket: Int, minBucket: Int = 2, idCol: String = "id",
      saltHash: Column => Column = xxhash64(_)): DataFrame = {
    if (maxBucket <= 0 && minBucket <= 1) return df.withColumn("bsalt", lit(0))
    val upper = if (maxBucket > 0) maxBucket.toLong else Long.MaxValue
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") >= minBucket)
    val nSub = ((col("bsz") + lit(upper - 1L)) / lit(upper)).cast("long")
    df.join(counts, keyCols)
      .withColumn("bsalt",
        when(col("bsz") <= upper, lit(0))
          .otherwise(pmod(saltHash(col(idCol)), nSub).cast("int")))
      .drop("bsz")
  }

  /** Exact dedup: rows keyed by identical `textCol`; canonical = min id.
    *
    * The shuffle/sort key is md5(text), not the text itself: the exchange
    * hashes and the sort compares a 32-char digest instead of multi-KB
    * documents (at 100 TB the raw-text key dominates exchange CPU). A
    * 128-bit digest collision would need ~2⁶⁴ distinct docs (birthday
    * bound) — ~10⁻¹⁹ at 10¹⁰ docs — so md5 equality IS text equality at
    * any realistic corpus size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol)))
    df.withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("canonical_id")).cast("int"))
  }

  /** C4-style corpus-level line dedup (Raffel et al. 2020 §2.2 dedupe any
    * repeated occurrence; cf. `/root/reference/src/CorefBase.groovy:135-155`
    * for the reference's analogous exact-key clustering): every non-blank
    * line that occurs more than once in the corpus keeps only its FIRST
    * occurrence (min (doc_id, line_idx)), and each document is reassembled
    * from its surviving lines in original order.
    *
    * Output: (id, n_lines, n_kept, text) — n_lines counts the doc's
    * non-blank lines, text joins the kept lines with '\n' ('' when every
    * line lost). Docs whose lines are all blank emit no row (they carry no
    * dedupable content), mirrored exactly by the oracle.
    *
    * 100 TB shape: lines shuffle ONCE by a 16-byte md5 line key (never the
    * line text); the winner per key comes from a map-side-combining
    * min(struct) aggregation — a corpus-wide boilerplate line partial-
    * aggregates inside each task instead of flooding one reducer (the skew
    * reason this is an agg+join, not a row_number window). The join back is
    * keyed on the same digest with a 1-row-per-key build side, AQE
    * skew-splitting the probe; reassembly shuffles once by doc id. */
  def corpusLineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docLines(df, idCol, textCol)
    val winners = lines.groupBy(col("k"))
      .agg(min(struct(col("id").as("wid"), col("idx").as("widx"))).as("w"))
    reassembleLines(
      lines.join(winners, "k")
        .withColumn("keep",
          col("id") === col("w.wid") && col("idx") === col("w.widx")))
  }

  /** Line-dedup front half: (id, idx, line, k) — one row per non-blank
    * (SQL-trim: space-only-blank) line, k = md5 digest shuffle key. Shared
    * by [[corpusLineDedup]] and the streaming incremental form
    * (graft.streaming.CurationStreams.lineDedupStream) so both stay in
    * semantic lockstep. */
  private[graft] def docLines(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withColumn("k", md5(col("line")))

  /** Line-dedup tail: reassemble (id, idx, line, keep) line rows into
    * (id, n_lines, n_kept, text) docs, original line order. One doc-id
    * shuffle. */
  private[graft] def reassembleLines(marked: DataFrame): DataFrame =
    marked.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the non-kept NULLs; struct sorts by idx (unique
        // per doc), restoring original line order.
        array_join(
          transform(
            sort_array(collect_list(when(col("keep"),
              struct(col("idx"), col("line"))))),
            x => x.getField("line")),
          "\n").as("text"))

  /** Raw word n-gram shingle strings: (id, shingle), distinct. */
  def shingleStrings(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val withNext = (1 until n).foldLeft(toks) { (acc, i) =>
      acc.withColumn(s"t$i", lead(col("tok"), i).over(w))
    }
    val parts = col("tok") +: (1 until n).map(i => col(s"t$i"))
    withNext
      .filter(parts.last.isNotNull)
      .select(col("id"), concat_ws(" ", parts: _*).as("shingle"))
      .distinct()
  }

  /** Word n-gram shingles hashed: (id, shingle_hash), distinct. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      hash: HashFamily = XxHash64Family): DataFrame =
    shingleStrings(df, idCol, textCol, n)
      .select(col("id"), hash.one(col("shingle")).as("shingle"))

  /**
   * MinHash signatures: k seeded-hash "permutations", min per doc.
   * One shuffle (the groupBy); the k mins are a single aggregation pass.
   */
  def minhashSignatures(sh: DataFrame, k: Int = 32,
      hash: HashFamily = XxHash64Family): DataFrame = {
    val mins = (0 until k).map(i =>
      min(hash.seeded(col("shingle"), i)).as(s"h$i"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** (id, sig) → one row per band: (id, sig, band, bh) where bh hashes the
    * band's `rows` signature components. Shared by the symmetric candidate
    * join and the incremental corpus table. */
  private[operators] def bandSignatures(sigs: DataFrame, bands: Int,
      rows: Int, hash: HashFamily): DataFrame =
    sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        hash.combine(lit(b) +: (0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1)))): _*)).as(Seq("band", "bh")))

  /**
   * Cap-policy observability: one row of aggregate stats over a bucketed
   * frame — total buckets, over-cap buckets, the rows inside them (what
   * [[Overflow.Drop]] silently discards and [[Overflow.Salt]] sub-buckets),
   * and the largest bucket. Neither policy can log this inline (the
   * operators build lazy plans; counting would force an extra action in
   * the hot path), so deployments materialize THIS on their build cadence
   * and alert on it — the dedup-SLA answer to "how much recall is the cap
   * costing today?". Works on any banded frame: [[bandRowsUncapped]]
   * output with keys (band, bh), simhash chunks with (chunk, cv),
   * semantic-dedup cells with (cell).
   */
  def bucketOverflowStats(rows: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    val upper = if (maxBucket > 0) maxBucket.toLong else Long.MaxValue
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      // coalesce: a global agg over ZERO buckets (empty input) yields
      // NULL sums/max — alert thresholds comparing NULL never fire.
      .agg(count(lit(1)).as("n_buckets"),
        coalesce(sum(when(col("bsz") > upper, 1L).otherwise(0L)), lit(0L))
          .as("n_buckets_over"),
        coalesce(sum(when(col("bsz") > upper, col("bsz")).otherwise(0L)),
          lit(0L)).as("n_rows_over"),
        coalesce(max(col("bsz")), lit(0L)).as("max_bucket_size"))
  }

  /**
   * Banded-LSH candidate pairs from minhash signatures: b bands of r rows
   * (k = b·r); docs sharing any band hash become candidates. Returns
   * (id_a, id_b, est_jaccard) with id_a < id_b, est = matching-component
   * fraction of the signatures.
   */
  def minhashCandidates(sigs: DataFrame, bands: Int = 8, rows: Int = 4,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family,
      overflow: Overflow = Overflow.Drop): DataFrame =
    candidatesFromBanded(bandSignatures(sigs, bands, rows, hash),
      maxBucket, overflow)

  /** Cap-and-join tail of [[minhashCandidates]], taking prebuilt
    * [[bandSignatures]] rows — the split point that lets several
    * cap/overflow operating points share one signature build. */
  private[graft] def candidatesFromBanded(banded: DataFrame,
      maxBucket: Int, overflow: Overflow): DataFrame = {
    // Persisted (scope-tracked): the a/b self-join traverses this twice,
    // and exchange reuse does NOT collapse the two branches (their
    // projections differ — measured 16 parquet scans in q43's executed
    // plan without persists).
    val (capped, joinKeys) = overflow match {
      case Overflow.Drop =>
        (CacheScope.pin(capBuckets(banded, Seq("band", "bh"), maxBucket)),
          Seq("band", "bh"))
      case Overflow.Salt =>
        (CacheScope.pin(capBucketsSalted(banded, Seq("band", "bh"), maxBucket)),
          Seq("band", "bh", "bsalt"))
      case Overflow.SaltWith(f) =>
        (CacheScope.pin(capBucketsSalted(banded, Seq("band", "bh"), maxBucket,
          saltHash = f)), Seq("band", "bh", "bsalt"))
    }
    val a = capped.select((joinKeys.map(col) :+
      col("id").as("id_a") :+ col("sig").as("sig_a")): _*)
    val b = capped.select((joinKeys.map(col) :+
      col("id").as("id_b") :+ col("sig").as("sig_b")): _*)
    a.join(b, joinKeys)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (sigEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / size(col("sig_a"))).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * Full MinHash-LSH near-dup pass: shingle → sign → band → candidates →
   * exact-verify ≥ `threshold`. Returns (id_a, id_b, est_jaccard, jaccard).
   */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family,
      overflow: Overflow = Overflow.Drop): DataFrame = {
    // Shared-frame persists (scope-tracked — CacheScope.tracking callers
    // can release them): `sh` feeds signatures + both verify sides + sizes
    // (4 traversals) and `members` feeds 3 joins — without a persist each
    // branch recomputes the whole upstream (no exchange reuse across
    // differing projections; measured on q43). (id, shingle)/(rep, id)
    // frames are the LSH build's working set — disk-backed at scale.
    val b = minhashBuild(df, idCol, textCol, n, k, bands, hash,
      pinned = CacheScope.pin(_))
    minhashDedupFromBuild(b, threshold, maxBucket, overflow,
      pinMembers = CacheScope.pin(_))
  }

  /**
   * The shareable front half of [[minhashDedup]]: exact pre-collapse
   * membership, representative shingles, and uncapped banded signature
   * rows — everything UPSTREAM of the bucket-cap/overflow policy. Callers
   * running several operating points over the same corpus (different
   * caps, Drop vs Salt) build this ONCE, pin the three frames, and feed
   * [[minhashDedupFromBuild]] per operating point; the duplicated
   * shingle→sign→band cost was the whole q43-vs-q83 battery waste.
   *
   * `pinned` wraps `sh` before the signature pass derives from it, so a
   * pin that REPLACES the frame (checkpoint mode) still deduplicates the
   * shingle computation into the banded lineage.
   */
  case class MinhashBuild(members: DataFrame, sh: DataFrame,
      banded: DataFrame)

  def minhashBuild(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      hash: HashFamily = XxHash64Family,
      pinned: DataFrame => DataFrame = identity): MinhashBuild = {
    require(k % bands == 0, "bands must divide k")
    // Mega-cluster guard: collapse byte-identical texts FIRST, so the whole
    // shingle/sign/band/verify pipeline runs on one representative per
    // distinct text. N copies of one doc cost O(N) here, not O(N²) banded
    // candidates + O(N²) shingle verifications; their pairs are
    // reconstituted at the end as pure output (jaccard = 1 by definition).
    // Keyed by md5(text), not the raw text (see [[exact]] — digest-keyed
    // exchanges don't hash/compare multi-KB documents; collision odds are
    // ~10⁻¹⁹ at 10¹⁰ docs).
    val keyed = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val mem = keyed
      .withColumn("rep", min(col("id")).over(Window.partitionBy(md5(col("text")))))
    val reps = mem.filter(col("id") === col("rep")).select(col("id"), col("text"))
    val sh = pinned(shingles(reps, "id", "text", n, hash))
    val banded = bandSignatures(minhashSignatures(sh, k, hash), bands,
      k / bands, hash)
    MinhashBuild(mem.select(col("rep"), col("id")), sh, banded)
  }

  /** Back half of [[minhashDedup]]: cap/salt → candidate pairs → exact
    * Jaccard verify ≥ `threshold` → member expansion, over a prebuilt
    * (possibly shared) [[MinhashBuild]]. `pinMembers` lets the one-shot
    * path keep its scope-tracked members pin while a memoizing caller
    * passes an already-pinned frame through. */
  def minhashDedupFromBuild(b: MinhashBuild, threshold: Double,
      maxBucket: Int = DefaultMaxBucket,
      overflow: Overflow = Overflow.Drop,
      pinMembers: DataFrame => DataFrame = identity): DataFrame = {
    val sh = b.sh
    val cands = candidatesFromBanded(b.banded, maxBucket, overflow)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val shA = sh.select(col("id").as("id_a"), col("shingle"))
    val shB = sh.select(col("id").as("id_b"), col("shingle"))
    val shared = cands.select("id_a", "id_b")
      .join(shA, Seq("id_a"))
      .join(shB, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    val repPairs = cands
      .join(shared, Seq("id_a", "id_b"), "left_outer")
      .na.fill(0L, Seq("shared"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("shared") / (col("sz_a") + col("sz_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard"), 6).as("est_jaccard"),
        round(col("jaccard"), 6).as("jaccard"))

    // Member expansion: cross-group pairs inherit their representatives'
    // similarity; within-group pairs (identical texts) are exact dups.
    val members = pinMembers(b.members)
    val cross = repPairs
      .join(members.select(col("rep").as("id_a"), col("id").as("ma")), Seq("id_a"))
      .join(members.select(col("rep").as("id_b"), col("id").as("mb")), Seq("id_b"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"),
        col("est_jaccard"), col("jaccard"))
    val within = members.select(col("rep"), col("id").as("ia"))
      .join(members.select(col("rep"), col("id").as("ib")), Seq("rep"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        lit(1.0d).as("est_jaccard"), lit(1.0d).as("jaccard"))
    cross.unionByName(within)
  }

  /**
   * Banded MinHash signature table for a corpus — the precomputable,
   * storable artifact behind incremental dedup: (id, band, bh, sig), one
   * row per (doc, band). Build it once per corpus snapshot and write it
   * partitioned/bucketed by (band, bh); every later increment probes it
   * without touching corpus text again. Oversized (band, bh) buckets —
   * non-discriminative band hashes, the LSH analogue of stopwords — are
   * dropped at BUILD time (no 2-member lower bound here, unlike the
   * symmetric join: a singleton corpus bucket still has to pair with
   * future batch docs), so `maxBucket` bounds every future probe's
   * fan-out. 0 = unbounded.
   */
  def minhashBandTable(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family): DataFrame =
    // NOT pinned (unlike the WithCounts variant): this form is invoked
    // per trigger on the streaming default path, where a persist the
    // cleanup thunk doesn't know about would leak one full-corpus cache
    // entry per trigger.
    capBuckets(bandRowsUncapped(df, idCol, textCol, n, k, bands, hash),
      Seq("band", "bh"), maxBucket, minBucket = 1)

  /**
   * UNCAPPED banded signature rows (id, band, bh, sig) — the durable unit
   * of the incremental-dedup state: both the capped artifact and the
   * exact bucket-count sidecar are PURE FUNCTIONS of the union of these
   * rows ([[artifactFromBandLog]]), so a continuous-ingestion deployment
   * persists one O(batch) uncapped row-set per batch (an append-only log)
   * and never rewrites corpus-sized state. Deterministic in the text:
   * recomputing a batch's rows always yields the same set, which is what
   * makes per-batch overwrite writes idempotent under at-least-once
   * redelivery.
   */
  def bandRowsUncapped(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      hash: HashFamily = XxHash64Family): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val sigs = minhashSignatures(
      shingles(df.select(col(idCol).as("id"), col(textCol).as("text")),
        "id", "text", n, hash), k, hash)
    bandSignatures(sigs, bands, k / bands, hash)
  }

  /**
   * (capped artifact, exact sidecar) reconstructed from an UNCAPPED
   * band-row log (the union of [[bandRowsUncapped]] outputs for the
   * corpus and every folded batch). Bit-exact with building
   * [[minhashBandTableWithCounts]] on the whole corpus and with any
   * sidecar-exact append chain reaching the same doc set: in all three,
   * a bucket's rows survive iff its TRUE total count ≤ maxBucket.
   */
  def artifactFromBandLog(log: DataFrame,
      maxBucket: Int = DefaultMaxBucket): (DataFrame, DataFrame) = {
    val counts = log.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("true_count"))
    val artifact =
      if (maxBucket <= 0) log
      else log.join(counts.filter(col("true_count") <= maxBucket.toLong)
        .select(col("band"), col("bh")), Seq("band", "bh"), "left_semi")
    (artifact, counts)
  }

  /**
   * [[minhashBandTable]] plus the uncapped (band, bh, true_count) sidecar
   * from the SAME single shingle→minhash→band pass (the banded frame is
   * scope-pinned across the two derivations — building the sidecar
   * separately via [[bandBucketCounts]] would re-run the whole signature
   * pipeline, the dominant cost at corpus scale). Store both; chain
   * appends with [[appendToBandTableWithCounts]] for bit-exact rebuild
   * parity. Release the pin via `CacheScope.tracking` (or clearCache)
   * after materializing both outputs.
   */
  def minhashBandTableWithCounts(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, k: Int = 32, bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family): (DataFrame, DataFrame) = {
    val banded = CacheScope.pin(
      bandRowsUncapped(df, idCol, textCol, n, k, bands, hash))
    val counts = banded.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("true_count"))
    (capBuckets(banded, Seq("band", "bh"), maxBucket, minBucket = 1), counts)
  }

  /**
   * Fold a new batch into an existing [[minhashBandTable]] artifact — the
   * append half of the incremental-dedup story (the build is the rebuild
   * half). Computes the batch's banded signatures, unions them in, and
   * re-applies the bucket cap ONLY to the (band, bh) buckets the batch
   * touched; untouched buckets pass through unchanged, so on a
   * (band, bh)-partitioned artifact the append reads/writes just the
   * affected partitions — O(batch), never O(corpus).
   *
   * Append vs rebuild: the cap is monotone under growth — a surviving
   * bucket pushed over the cap by the batch is dropped by both paths, and
   * a bucket dropped at BUILD time stays dropped under rebuild (its count
   * only grew). The one divergence is a build-time-dropped bucket that the
   * batch re-touches: its artifact rows are gone, so its batch rows alone
   * can sit under the cap and survive the append where a rebuild would
   * drop the whole bucket. That divergence only ADDS candidate pairs
   * (which exact verification then filters — never a false output pair),
   * so the sidecar-less append is sound for dedup. Callers that want
   * append == rebuild bit-exactly carry the tiny uncapped bucket-count
   * sidecar through [[appendToBandTableWithCounts]] (build both sides
   * with [[minhashBandTableWithCounts]]): the true combined counts then
   * decide every touched bucket AND the returned sidecar reflects the
   * grown corpus, so parity holds across arbitrarily long append CHAINS
   * (passing a stale build-time sidecar to repeated appends would
   * under-count buckets and silently erode the cap — the spec pins a
   * two-append chain crossing the cap boundary).
   *
   * Compaction: appends never touch corpus text, so signature quality
   * never degrades; rebuild is only needed to (a) resurrect buckets the
   * cap dropped under an OLD maxBucket after raising it, or (b) re-shingle
   * after changing n/k/bands/hash. A daily-append weekly-rebuild cadence
   * is the standard operating point.
   *
   * @param artifact an existing band table (id, band, bh, sig)
   * @param bucketCounts optional sidecar (band, bh, true_count) of
   *        UNCAPPED bucket counts for the artifact's CURRENT corpus; when
   *        given, a touched bucket's combined count uses it, making this
   *        append == rebuild bit-exactly. For chained appends use
   *        [[appendToBandTableWithCounts]], which also returns the
   *        updated sidecar.
   */
  def appendToBandTable(artifact: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family,
      bucketCounts: Option[DataFrame] = None): DataFrame =
    appendWithCounts(artifact, batch, idCol, textCol, n, k, bands,
      maxBucket, hash, bucketCounts)._1

  /**
   * Sidecar-carrying append: returns (grown artifact, UPDATED uncapped
   * bucket counts). Feed each append's outputs into the next — the
   * updated counts are what keep append == rebuild exact across chains;
   * see [[appendToBandTable]].
   */
  def appendToBandTableWithCounts(artifact: DataFrame,
      bucketCounts: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family): (DataFrame, DataFrame) = {
    val (table, counts) = appendWithCounts(artifact, batch, idCol, textCol,
      n, k, bands, maxBucket, hash, Some(bucketCounts))
    (table, counts.get)
  }

  private def appendWithCounts(artifact: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, n: Int, k: Int, bands: Int,
      maxBucket: Int, hash: HashFamily,
      bucketCounts: Option[DataFrame]): (DataFrame, Option[DataFrame]) = {
    val newBands = CacheScope.pin(
      bandRowsUncapped(batch, idCol, textCol, n, k, bands, hash))
    appendBandRows(artifact, newBands, maxBucket, bucketCounts)
  }

  /** Fold PRECOMPUTED uncapped batch band rows into an artifact — the
    * inner step of [[appendToBandTable]], exposed so callers that already
    * materialized the batch's rows (e.g. the durable stream, which writes
    * them to its band log first) don't recompute the signature pipeline.
    * `newBands` should be pinned/checkpointed by the caller (it is
    * traversed several times here). */
  private[graft] def appendBandRows(artifact: DataFrame, newBands: DataFrame,
      maxBucket: Int,
      bucketCounts: Option[DataFrame]): (DataFrame, Option[DataFrame]) = {
    val touched = newBands.select(col("band"), col("bh")).distinct()
    val untouched = artifact.join(touched, Seq("band", "bh"), "left_anti")
    val combined = artifact.join(touched, Seq("band", "bh"), "left_semi")
      .unionByName(newBands)
    val batchCounts = newBands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("batch_n"))
    // Updated sidecar = old true counts + batch additions (full outer:
    // untouched buckets pass through, brand-new buckets enter at batch_n).
    val newCounts = bucketCounts.map { bc =>
      bc.select(col("band"), col("bh"), col("true_count"))
        .join(batchCounts, Seq("band", "bh"), "full_outer")
        .na.fill(0L, Seq("true_count", "batch_n"))
        .select(col("band"), col("bh"),
          (col("true_count") + col("batch_n")).as("true_count"))
    }
    val cappedTouched = bucketCounts match {
      case None =>
        capBuckets(combined, Seq("band", "bh"), maxBucket, minBucket = 1)
      case Some(_) if maxBucket <= 0 => combined
      case Some(bc) =>
        // True combined count = current true count (0 for brand-new
        // buckets) + batch additions; survivors = count within cap.
        val keep = batchCounts
          .join(bc.select(col("band"), col("bh"),
            col("true_count").as("old_n")), Seq("band", "bh"), "left")
          .na.fill(0L, Seq("old_n"))
          .filter(col("old_n") + col("batch_n") <= maxBucket.toLong)
          .select(col("band"), col("bh"))
        combined.join(keep, Seq("band", "bh"), "left_semi")
    }
    (untouched.unionByName(cappedTouched), newCounts)
  }

  /** Uncapped (band, bh, true_count) sidecar for the exact-parity append
    * mode, built standalone from corpus text. Prefer
    * [[minhashBandTableWithCounts]], which derives table AND sidecar from
    * ONE shingle→minhash→band pass — this standalone form re-runs that
    * pipeline and only exists for retrofitting a sidecar onto an
    * artifact whose build didn't keep one. */
  def bandBucketCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      hash: HashFamily = XxHash64Family): DataFrame =
    bandRowsUncapped(df, idCol, textCol, n, k, bands, hash)
      .groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("true_count"))

  /**
   * Incremental near-dup: pairs between a NEW batch and an EXISTING corpus
   * — the daily-increment shape of corpus dedup at scale (dedup today's
   * crawl against the 100 TB already ingested WITHOUT re-running the
   * corpus×corpus join). Returns (batch_id, corpus_id, est_jaccard,
   * jaccard) with exact jaccard ≥ `threshold`.
   *
   * Scale design: the corpus participates only as its banded signature
   * table — pass a precomputed [[minhashBandTable]] artifact as
   * `corpusBands` (default builds it in-flight) — plus a text lookup
   * restricted to candidate ids for exact verification. The batch side,
   * small by definition, is BROADCAST into the candidate probe, so the
   * corpus table is never shuffled (scan → broadcast-hash probe); the
   * verify stage re-shingles only candidate corpus docs (a left_semi on
   * candidate ids that prunes the corpus scan). Per-increment cost:
   * O(batch) signature work + O(candidates) verification. Batch-internal
   * duplicates are out of scope — run [[exact]]/[[minhashDedup]] on the
   * batch itself.
   */
  def incrementalMinhash(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family,
      corpusBands: Option[DataFrame] = None): DataFrame =
    incrementalMinhashWithCleanup(batch, corpus, idCol, textCol, n, k,
      bands, threshold, maxBucket, hash, corpusBands)._1

  /**
   * [[incrementalMinhash]] plus a cleanup thunk that unpersists the three
   * internal caches (batch shingles, candidates, candidate-corpus
   * shingles). Call it AFTER fully consuming the result. Long-running
   * repeated callers (the streaming wrapper fires one probe per trigger)
   * must use this form: Spark's CacheManager holds persisted plans until
   * an explicit unpersist, so leaking three entries per trigger grows
   * executor storage without bound.
   */
  def incrementalMinhashWithCleanup(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family,
      corpusBands: Option[DataFrame] = None): (DataFrame, () => Unit) = {
    require(k % bands == 0, "bands must divide k")
    val cBands = corpusBands.getOrElse(
      minhashBandTable(corpus, idCol, textCol, n, k, bands, maxBucket, hash))
    // Batch shingles feed signatures, the verify join, and sizes; the
    // candidate frame feeds the semi-join filter, est carry-through, and
    // the final assembly — both persisted (no exchange reuse across
    // differing projections). Pinned via CacheScope so an outer tracking
    // scope also sees them; the explicit thunk below remains this
    // operator's own cleanup contract (double unpersist is a no-op).
    val bsh = CacheScope.pin(
      shingles(batch.select(col(idCol).as("id"), col(textCol).as("text")),
        "id", "text", n, hash))
    val bBands = bandSignatures(minhashSignatures(bsh, k, hash), bands,
      k / bands, hash)
    val cand = broadcast(bBands.select(col("band"), col("bh"),
        col("id").as("batch_id"), col("sig").as("sig_a")))
      .join(cBands.select(col("band"), col("bh"), col("id").as("corpus_id"),
        col("sig").as("sig_b")), Seq("band", "bh"))
      .select(col("batch_id"), col("corpus_id"),
        (sigEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / size(col("sig_a"))).as("est_jaccard"))
      .dropDuplicates("batch_id", "corpus_id")
    val candP = CacheScope.pin(cand)
    val candIds = candP.select(col("corpus_id").as("id")).distinct()
    val csh = CacheScope.pin(shingles(
        corpus.select(col(idCol).as("id"), col(textCol).as("text"))
          .join(candIds, Seq("id"), "left_semi"), "id", "text", n, hash))
    val shared = candP.select("batch_id", "corpus_id")
      .join(bsh.select(col("id").as("batch_id"), col("shingle")), Seq("batch_id"))
      .join(csh.select(col("id").as("corpus_id"), col("shingle")),
        Seq("corpus_id", "shingle"))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
    val szA = bsh.groupBy(col("id")).agg(count(lit(1)).as("sz_a"))
      .withColumnRenamed("id", "batch_id")
    val szB = csh.groupBy(col("id")).agg(count(lit(1)).as("sz_b"))
      .withColumnRenamed("id", "corpus_id")
    val out = candP
      .join(shared, Seq("batch_id", "corpus_id"), "left_outer")
      .na.fill(0L, Seq("shared"))
      .join(szA, Seq("batch_id")).join(szB, Seq("corpus_id"))
      .withColumn("jaccard",
        col("shared") / (col("sz_a") + col("sz_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"),
        round(col("est_jaccard"), 6).as("est_jaccard"),
        round(col("jaccard"), 6).as("jaccard"))
    (out, () => { bsh.unpersist(); candP.unpersist(); csh.unpersist(); () })
  }

  /**
   * Near-duplicate clusters: transitive closure over the [[minhashDedup]]
   * pair graph — the form keep-one-per-cluster policies and cluster-size
   * statistics need (pairwise keep-smaller-id can retain several members
   * of one transitive group). Pair generation inherits every LSH scale
   * guard; the closure is [[ConnectedComponents.runAlternating]] star
   * contraction, O(log n) rounds REGARDLESS of component diameter —
   * near-dup components are usually shallow, but templated corpora chain
   * (A~B~C~…) and at web scale a chain can be arbitrarily long, so the
   * diameter-bounded min-label form would be a latent failure. Returns
   * (id, cluster_id, cluster_size) with cluster_id = numeric min member
   * id, for every doc appearing in at least one pair; singletons are
   * absent (the standard sparse representation — union them at the call
   * site if needed).
   */
  def neardupClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = DefaultMaxBucket,
      hash: HashFamily = XxHash64Family, maxIter: Int = 64,
      overflow: Overflow = Overflow.Drop): DataFrame = {
    // The string round-trip through CC would silently null non-numeric ids
    // on the cast back; fail fast instead.
    val idType = df.schema(idCol).dataType
    require(idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType,
      s"neardupClusters needs an integral id column, got $idType")
    neardupClustersFromPairs(
      minhashDedup(df, idCol, textCol, n, k, bands, threshold,
        maxBucket, hash, overflow), maxIter)
  }

  /** The transitive-closure half of [[neardupClusters]], over an already
    * computed (id_a, id_b) pair table (integral ids) — lets callers that
    * already ran [[minhashDedup]] cluster its pairs without re-running the
    * LSH pipeline (e.g. [[Curation.curate]]'s cluster-dedup policy). */
  def neardupClustersFromPairs(pairs: DataFrame, maxIter: Int = 64): DataFrame = {
    // Same fail-fast as neardupClusters: the string round-trip through CC
    // would silently null non-numeric ids on the cast back.
    Seq("id_a", "id_b").foreach { c =>
      val t = pairs.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType,
        s"neardupClustersFromPairs needs integral pair ids, got $c: $t")
    }
    val edges = pairs.select(col("id_a").cast("string").as("src"),
      col("id_b").cast("string").as("dst"))
    // strict: an unverified fixpoint must error, not split. The closure
    // is the ALTERNATING star contraction — O(log n) rounds regardless
    // of component diameter, so a templated corpus chaining near-dups
    // arbitrarily long can't exhaust the round budget the way the
    // min-label form's O(diameter) could.
    val cc = ConnectedComponents.runAlternating(edges, maxIter, strict = true)
    val w = Window.partitionBy(col("comp"))
    cc.select(col("id").cast("long").as("id"), col("comp"))
      .withColumn("cluster_id", min(col("id")).over(w))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("id"), col("cluster_id"), col("cluster_size"))
  }

  /**
   * SimHash signature per row: hash each token, per bit position sum
   * +weight if set else -weight, bit = sign of sum. Whole thing is one
   * aggregation with `nBits` codegen'd sum expressions.
   *
   * Default: 64 bits from xxhash64. The portable variant (`nBits = 60`,
   * `tokenHash = portableTokenHash`) derives 60 bits from md5 — a function
   * every engine shares — which puts q44's full signature+banding+verify
   * under an exact DuckDB oracle; 60 = 4 chunks × 15 bits keeps the
   * pigeonhole banding structure intact.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      nBits: Int = 64,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(nBits >= 4 && nBits <= 64, "nBits in 4..64")
    val toks = df.select(col(idCol).as("id"),
      explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("th", tokenHash(col("tok")))
    val bitSums = (0 until nBits).map { i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(1) === 1, col("w"))
        .otherwise(-col("w"))).as(s"b$i")
    }
    toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until nBits).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("simhash"))
  }

  /** 60-bit engine-portable token hash: first 15 hex digits of md5,
    * parsed base-16 (same value computable in DuckDB/Trino/Postgres). */
  def portableTokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /**
   * SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (< 16):
   * band the `nBits`-bit signature into four chunks — pigeonhole
   * guarantees pairs within distance 3 share a chunk; then verify with
   * bit_count(xor). (For maxHamming in 4..15 recall is partial — standard
   * multi-probe tradeoff, noted at the call site.)
   */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = DefaultMaxBucket, nBits: Int = 64): DataFrame = {
    require(nBits % 4 == 0, "nBits must split into 4 chunks")
    val chunkBits = nBits / 4
    val chunkMask = (1L << chunkBits) - 1
    // Identical signatures collapse to one representative per value (the
    // mega-cluster guard: N copies cost O(N), not an O(N²) bucket join);
    // their member pairs come back at the end with hamming = 0.
    // Persisted: reps and members both traverse mem (and the caller's sigs
    // lineage — q44's 64 bit-sum aggregation — would otherwise run twice);
    // capped is traversed by both self-join sides. Same rationale as
    // minhashDedup's persists. (id, simhash, rep) is 3 fixed-width cols.
    val mem = CacheScope.pin(sigs
      .withColumn("rep", min(col("id")).over(Window.partitionBy(col("simhash")))))
    val reps = mem.filter(col("id") === col("rep")).select(col("id"), col("simhash"))

    val chunked = reps.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * chunkBits)
          .bitwiseAND(chunkMask)): _*))
        .as(Seq("chunk", "cv")))
    val capped = CacheScope.pin(capBuckets(chunked, Seq("chunk", "cv"), maxBucket))
    val a = capped.select(col("chunk"), col("cv"),
      col("id").as("id_a"), col("simhash").as("sig_a"))
    val b = capped.select(col("chunk"), col("cv"),
      col("id").as("id_b"), col("simhash").as("sig_b"))
    val repPairs = a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)

    val members = mem.select(col("rep"), col("id"))
    val cross = repPairs
      .join(members.select(col("rep").as("id_a"), col("id").as("ma")), Seq("id_a"))
      .join(members.select(col("rep").as("id_b"), col("id").as("mb")), Seq("id_b"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    val within = members.select(col("rep"), col("id").as("ia"))
      .join(members.select(col("rep"), col("id").as("ib")), Seq("rep"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        lit(0).cast("int").as("hamming"))
    cross.unionByName(within)
  }

  // ------------------------------------------------ Bloom membership artifact

  /**
   * Constant-size probabilistic membership artifact — the O(1)-state
   * alternative to the exact md5 line/doc-digest artifacts: a corpus of
   * ANY size compresses to `-n·ln(fpp)/ln²2` bits (~1.1 GB at 10⁹ keys,
   * fpp 1% — vs 16 B/key exact), so incremental "have we seen this
   * document?" probes against a 100 TB history become a broadcast-size
   * side input instead of a corpus-wide join.
   *
   * Built with Spark's own BloomFilterAggregate (the engine's runtime
   * join-filter machinery): one pass, mergeable partial aggregates,
   * result collected as ONE binary cell — O(bits) driver transfer
   * independent of corpus size, the same shape Spark itself uses for
   * injected runtime filters. Keys are xxhash64'd (matching
   * BloomFilterMightContain's probe hashing).
   *
   * Semantics: NO false negatives ever — a key the filter rejects is
   * DEFINITELY unseen — and false positives at ≤ ~fpp: a genuinely-new
   * row is mistaken for seen (and, in [[bloomNewRows]], over-dropped)
   * with that probability. The right trade for ingestion dedup, where a
   * duplicate slipping IN costs training quality but an occasional fresh
   * row dropped costs ~nothing.
   */
  def buildBloomArtifact(df: DataFrame, key: Column,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits))
    val row = df.select(
      ColumnBridge.column(agg.toAggregateExpression()).as("bloom")).head()
    row.getAs[Array[Byte]]("bloom")
  }

  /** Probe column: true ⇔ the artifact MIGHT contain `key` (false ⇒
    * definitely absent). A plan-literal + codegen'd predicate — map-side,
    * no join, no shuffle. */
  def bloomMightContain(artifact: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    ColumnBridge.column(BloomFilterMightContain(
      Literal(artifact, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))
  }

  /** Definitely-new rows of `batch` vs the artifact: keeps every row whose
    * key the filter rejects. Over-drops genuinely-new rows at ≤ ~fpp (the
    * documented bloom trade); never passes a true duplicate. */
  def bloomNewRows(batch: DataFrame, artifact: Array[Byte], key: Column): DataFrame =
    batch.filter(!bloomMightContain(artifact, key))

  /** Fold a new batch into the artifact (set union — same bit layout
    * required: build every increment with the same expectedItems/fpp).
    * O(bits) driver work; the 100 TB cadence is build-per-batch →
    * merge-into-carried-artifact, mirroring the md5 band-log append path. */
  def mergeBloomArtifacts(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fa = BloomFilter.readFrom(a)
    fa.mergeInPlace(BloomFilter.readFrom(b))
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }
}
