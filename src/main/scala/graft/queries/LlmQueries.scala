package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables => T}
import graft.operators.{Curation, Dedup, Multimodal, Similarity, Sketches, SpanDedup, TextAnalysis}

/**
 * LLM-training-data pipeline surface: dedup family, similarity search,
 * text analysis, multimodal plumbing. Queries whose logic is expressible
 * with identical semantics in DuckDB carry an oracle; hash-based ones
 * (xxhash64 signatures) are Spark-deterministic and get rows-only checks
 * plus ScalaTest invariants (DedupSpec/AnnSpec).
 */
object LlmQueries {

  // q43, q76 and q83 are the SAME corpus and signature config (n=3,
  // k=32, bands=8, portable md5) up to the cap/overflow policy — q43
  // and q76 share the full default operating point (q76 adds the
  // transitive closure over the identical pair table) and q83 differs
  // only in cap 2 + Salt. The expensive front half (exact pre-collapse
  // → shingles → signatures → banded rows) is memoized per
  // (session, dir) with eagerly-checkpointed frames (same
  // single-JVM-harness rationale as PipelineQueries.corefPipeline), so
  // a Verify/Bench session pays it once; each query still runs its own
  // cap/verify tail. Released via [[resetCache]] (Bench calls it after
  // q83, the family's last user in battery order, and between passes).
  private val buildCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), Dedup.MinhashBuild]

  private def sharedMd5Build(s: org.apache.spark.sql.SparkSession,
      d: String): Dedup.MinhashBuild =
    buildCache.getOrElseUpdate((s, d), {
      val b = Dedup.minhashBuild(T.documents(s, d), "doc_id", "text",
        n = 3, k = 32, bands = 8, hash = Dedup.PortableMd5Family,
        pinned = _.localCheckpoint(true))
      Dedup.MinhashBuild(b.members.localCheckpoint(true), b.sh,
        b.banded.localCheckpoint(true))
    })

  // q87's fixed linear probe: Knuth-multiplicative integer recipe →
  // weights in [-1, 1] with exactly 3 decimal digits, so the Scala
  // double ((k-1000)/1000.0) and the DuckDB literal ("-0.123") are the
  // SAME correctly-rounded double. dim 64 = the embeddings table's width.
  private val ProbeDim = 64
  private[graft] val ProbeWeights: Array[Double] =
    Array.tabulate(ProbeDim)(i =>
      (((i + 1) * 2654435761L) % 1000003L % 2001L - 1000L) / 1000.0)
  private def probeWeightsSql: String =
    ProbeWeights.map(w => f"$w%.3f").mkString("[", ", ", "]")

  /** Drop the memoized q43/q83 signature build for `s` and free its
    * checkpoint blocks. */
  def resetCache(s: org.apache.spark.sql.SparkSession): Unit =
    buildCache.keys.filter(_._1 eq s).foreach { k =>
      buildCache.remove(k).foreach { b =>
        Seq(b.members, b.sh, b.banded)
          .foreach(graft.operators.CacheScope.unpinCheckpoint)
      }
    }

  val all: Seq[Q] = Seq(

    // ---- MinHash-LSH near-dup detection (shingle→sign→band→verify).
    // Runs on the portable md5 hash family, so the ENTIRE pipeline —
    // exact-dup pre-collapse, 32 minhash permutations, 8-band LSH with
    // bucket caps, exact-Jaccard verification, member expansion — is
    // replicated verbatim in DuckDB and hash-compared (the fast xxhash64
    // family stays the default and is covered by DedupSpec).
    Q("q43_minhash_neardup",
      (s, d) => Dedup.minhashDedupFromBuild(sharedMd5Build(s, d),
        threshold = 0.05)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH mem AS (
               SELECT doc_id AS id, text,
                 min(doc_id) OVER (PARTITION BY text) AS rep
               FROM documents),
             reps AS (SELECT id, text FROM mem WHERE id = rep),
             toks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM reps))
               WHERE tok <> ''),
             seq AS (
               SELECT id, tok, lead(tok,1) OVER w AS t1,
                 lead(tok,2) OVER w AS t2
               FROM toks WINDOW w AS (PARTITION BY id ORDER BY i)),
             sh AS (
               SELECT DISTINCT id, md5(tok || ' ' || t1 || ' ' || t2) AS shingle
               FROM seq WHERE t2 IS NOT NULL),
             mh AS (
               SELECT id, k, min(md5(CAST(k AS VARCHAR) || '|' || shingle)) AS h
               FROM sh CROSS JOIN range(32) AS t(k) GROUP BY id, k),
             bands AS (
               SELECT id,
                 md5(CAST(k // 4 AS VARCHAR) || '|' ||
                     string_agg(h, '|' ORDER BY k)) AS bh,
                 k // 4 AS band
               FROM mh GROUP BY id, k // 4),
             capped AS (
               SELECT * FROM bands
               QUALIFY count(*) OVER (PARTITION BY band, bh) BETWEEN 2 AND 1000),
             cand AS (
               SELECT DISTINCT a.id AS id_a, b.id AS id_b
               FROM capped a JOIN capped b USING (band, bh)
               WHERE a.id < b.id),
             est AS (
               SELECT c.id_a, c.id_b,
                 sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) / 32.0
                   AS est_jaccard
               FROM cand c
               JOIN mh x ON x.id = c.id_a
               JOIN mh y ON y.id = c.id_b AND y.k = x.k
               GROUP BY 1, 2),
             sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
             shared AS (
               SELECT c.id_a, c.id_b, count(*) AS shared
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
             rep_pairs AS (
               SELECT e.id_a, e.id_b,
                 round(e.est_jaccard, 6) AS est_jaccard,
                 round(coalesce(s.shared, 0) /
                   (sa.sz + sb.sz - coalesce(s.shared, 0)), 6) AS jaccard
               FROM est e
               LEFT JOIN shared s ON e.id_a = s.id_a AND e.id_b = s.id_b
               JOIN sizes sa ON sa.id = e.id_a
               JOIN sizes sb ON sb.id = e.id_b
               WHERE coalesce(s.shared, 0) /
                 (sa.sz + sb.sz - coalesce(s.shared, 0)) >= 0.05),
             cross_pairs AS (
               SELECT least(ma.id, mb.id) AS id_a,
                 greatest(ma.id, mb.id) AS id_b, p.est_jaccard, p.jaccard
               FROM rep_pairs p
               JOIN mem ma ON ma.rep = p.id_a
               JOIN mem mb ON mb.rep = p.id_b),
             within_pairs AS (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(1.0 AS DOUBLE) AS est_jaccard,
                 CAST(1.0 AS DOUBLE) AS jaccard
               FROM mem a JOIN mem b ON a.rep = b.rep AND a.id < b.id)
             SELECT * FROM cross_pairs
             UNION ALL SELECT * FROM within_pairs""")),

    // ---- SimHash signatures + banded Hamming pairs. maxHamming=15 stays
    // inside simhashPairs' documented domain (< 16); recall is partial for
    // distances 4-15 (4-chunk pigeonhole is complete only to 3) — the
    // standard banding tradeoff, measured in DedupSpec's recall test.
    // Portable 60-bit signatures (md5-derived token hash) so the whole
    // signature+banding+verify pipeline is replicated in DuckDB and
    // hash-compared; the 64-bit xxhash64 default stays covered by DedupSpec.
    Q("q44_simhash_pairs",
      (s, d) => {
        val sigs = Dedup.simhash(T.documents(s, d), "doc_id", "text",
          nBits = 60, tokenHash = Dedup.portableTokenHash)
        Dedup.simhashPairs(sigs, maxHamming = 15, nBits = 60)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val bitSums = (0 until 60).map(i =>
          s"sum(CASE WHEN ((th >> $i) & 1) = 1 THEN w ELSE -w END) AS b$i")
          .mkString(", ")
        val sigTerms = (0 until 60).map(i =>
          s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
        s"""WITH toks AS (
             SELECT doc_id AS id, tok, count(*) AS w FROM (
               SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
               FROM documents)
             WHERE tok <> '' GROUP BY 1, 2),
           hashed AS (
             SELECT id, w,
               CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS th
             FROM toks),
           sums AS (SELECT id, $bitSums FROM hashed GROUP BY id),
           sig AS (SELECT id, $sigTerms AS simhash FROM sums),
           mem AS (SELECT id, simhash,
             min(id) OVER (PARTITION BY simhash) AS rep FROM sig),
           reps AS (SELECT id, simhash FROM mem WHERE id = rep),
           chunked AS (
             SELECT id, simhash, c AS chunk,
               (simhash >> CAST(c * 15 AS INT)) & 32767 AS cv
             FROM reps CROSS JOIN range(4) AS t(c)),
           capped AS (
             SELECT * FROM chunked
             QUALIFY count(*) OVER (PARTITION BY chunk, cv) BETWEEN 2 AND 1000),
           rep_pairs AS (
             SELECT * FROM (
               SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
               FROM capped a JOIN capped b USING (chunk, cv)
               WHERE a.id < b.id)
             WHERE hamming <= 15),
           cross_pairs AS (
             SELECT least(ma.id, mb.id) AS id_a,
               greatest(ma.id, mb.id) AS id_b, p.hamming
             FROM rep_pairs p
             JOIN mem ma ON ma.rep = p.id_a
             JOIN mem mb ON mb.rep = p.id_b),
           within_pairs AS (
             SELECT a.id AS id_a, b.id AS id_b, 0 AS hamming
             FROM mem a JOIN mem b ON a.rep = b.rep AND a.id < b.id)
           SELECT * FROM cross_pairs UNION ALL SELECT * FROM within_pairs"""
      }),

    // ---- IVF ANN (Voronoi cells + nProbe probing — the partition-pruned
    // scale path). Hash-derived FIXED centroids (portableCentroids) make
    // cell assignment, probing, and the exact-cosine rank fully
    // deterministic on both engines, so the whole IVF pipeline sits under
    // the DuckDB hash-compare — the same trick as q45/q56's portable
    // hyperplanes. The k-means-trained path stays the production default
    // and is spec-pinned in AnnSpec (full-probe == brute force, recall).
    // Distances replicate exactly: both engines compute in-order double
    // folds of the same values (Spark aggregate/zip_with and VectorDot vs
    // DuckDB list_inner_product — the pairing q46 already hash-validates).
    Q("q62_ann_ivf",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4,
          fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .select(col("q_id"), col("n_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             d2s AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM d2s) WHERE rn = 1),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM d2s WHERE vec_id < 10) WHERE cr <= 4),
             cand AS (
               SELECT p.q_id, a.n_id
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             sims AS (
               SELECT cand.q_id, cand.n_id,
                 list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb))) AS sim
               FROM cand
               JOIN v a ON a.vec_id = cand.q_id
               JOIN v b ON b.vec_id = cand.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, n_id) AS rank
               FROM sims) WHERE rank <= 5""")),

    // ---- HNSW-style beam navigation over the q62 IVF cells
    // (Similarity.ivfBeamTopK): queries enter at 2 fixed cells and take
    // 2 expansion rounds over the centroid 3-NN graph, keeping the 4
    // closest cells seen — O(entry + beam·degree·depth) centroid touches
    // per query instead of q62's scan of ALL centroids (the difference
    // that matters when a 100 TB corpus wants 10⁵–10⁶ cells). Every step
    // is deterministic (in-order double d2, integer tie-breaks), so the
    // oracle replays the NAVIGATION itself — entry beam, two
    // expand-and-prune rounds, then the exact-cosine probe — not just
    // its endpoint.
    Q("q181_ann_beam",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfBeamTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nLists = 16, beamWidth = 4,
          depth = 2, degree = 3, entryCells = 2,
          fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .select(col("q_id"), col("n_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             cd AS (
               SELECT a.cell AS src, b.cell AS dst,
                 list_inner_product(
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]),
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]))
                   AS d2
               FROM clists a CROSS JOIN clists b WHERE a.cell <> b.cell),
             nbr AS (
               SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY d2, dst) AS rn FROM cd) WHERE rn <= 3),
             qd AS (
               SELECT v.vec_id AS q_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]))
                   AS d2
               FROM v CROSS JOIN clists c WHERE v.vec_id < 10),
             b0 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT q_id, cell, d2, row_number() OVER (PARTITION BY q_id
                   ORDER BY d2, cell) AS rn
                 FROM qd WHERE cell < 2) WHERE rn <= 4),
             e1 AS (
               SELECT DISTINCT q_id, cell FROM (
                 SELECT b.q_id, n.dst AS cell FROM b0 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT q_id, cell FROM b0)),
             b1 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT e.q_id, e.cell, qd.d2, row_number() OVER (
                   PARTITION BY e.q_id ORDER BY qd.d2, e.cell) AS rn
                 FROM e1 e JOIN qd ON qd.q_id = e.q_id AND qd.cell = e.cell)
               WHERE rn <= 4),
             e2 AS (
               SELECT DISTINCT q_id, cell FROM (
                 SELECT b.q_id, n.dst AS cell FROM b1 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT q_id, cell FROM b1)),
             b2 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT e.q_id, e.cell, qd.d2, row_number() OVER (
                   PARTITION BY e.q_id ORDER BY qd.d2, e.cell) AS rn
                 FROM e2 e JOIN qd ON qd.q_id = e.q_id AND qd.cell = e.cell)
               WHERE rn <= 4),
             d2s AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]))
                   AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM d2s) WHERE rn = 1),
             cand AS (
               SELECT b.q_id, a.n_id
               FROM b2 b JOIN assign a ON a.cell = b.cell
               WHERE a.n_id <> b.q_id),
             sims AS (
               SELECT cand.q_id, cand.n_id,
                 list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb))) AS sim
               FROM cand
               JOIN v a ON a.vec_id = cand.q_id
               JOIN v b ON b.vec_id = cand.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, n_id) AS rank
               FROM sims) WHERE rank <= 5""")),

    // ---- Product-quantization ANN (the COMPRESSION scale path next to
    // q45's LSH and q62's IVF pruning): vectors → m=8 codebook indices
    // (4-32 B vs 256 B — the artifact that lets a 100 TB embedding corpus
    // sit in memory), queries ranked by asymmetric distance = an in-order
    // fold of 8 LUT lookups. Hash-derived portable codebooks
    // (Similarity.portableCodebooks — the q62 centroid trick per
    // subspace) make encode, LUT, and rank bit-identical on both engines;
    // the k-means-trained codebooks stay the production default and are
    // recall-pinned in AnnSpec. Ranks only in the output (adist is a
    // float; the rank ordering already hash-pins it).
    Q("q96_ann_pq",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.pqTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5,
          codebooks = Similarity.portableCodebooks(8, 16, 8))
          .select(col("q_id"), col("n_id"), col("rank"))
      },
      Some("""WITH cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             subd AS (
               SELECT v.vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i]),
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i])) AS d2
               FROM v CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT vec_id AS q_id, sub, code, d2
               FROM subd WHERE vec_id < 10),
             paird AS (
               SELECT l.q_id, c.vec_id AS n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
               WHERE c.vec_id <> l.q_id
               GROUP BY l.q_id, c.vec_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adist, n_id) AS rank
               FROM paird) WHERE rank <= 5""")),

    // ---- IVF-ADC (FAISS IVFADC; Jégou 2011): q62's cell PRUNING composed
    // with q96's PQ COMPRESSION — the production big-corpus layout. The
    // stored artifact is (cell, 8 codes) per vector, partitioned by cell;
    // a probe reads nProbe/nLists of it and ranks by LUT lookups without
    // touching a float vector. Both halves on portable hash-derived
    // parameters → the whole compose is hash-checked; nProbe == nLists
    // equals plain PQ exactly (spec-pinned in AnnSpec).
    Q("q97_ann_ivfpq",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5,
          centroids = Similarity.portableCentroids(16, 64),
          codebooks = Similarity.portableCodebooks(8, 16, 8),
          nProbe = 4)
          .select(col("q_id"), col("n_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM celld WHERE vec_id < 10) WHERE cr <= 4),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT v.vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i]),
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i])) AS d2
               FROM v CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT vec_id AS q_id, sub, code, d2
               FROM subd WHERE vec_id < 10),
             cand AS (
               SELECT p.q_id, a.n_id
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adist, n_id) AS rank
               FROM paird) WHERE rank <= 5""")),

    // ---- Johnson–Lindenstrauss random projection (map-only dim
    // reduction; the cheap pre-step that narrows downstream clustering /
    // ANN 4×): x′_j = (x·r_j)/√outDim over the portable hyperplane family
    // — every dot is the same in-order double fold as q45/q46, so the
    // projected values replicate exactly and round(·, 6) hash-compares.
    Q("q99_random_projection",
      (s, d) => {
        val planes = Similarity.portableHyperplanes(1, 16, 64)(0)
        Similarity.randomProjection(
          T.embeddings(s, d).filter(col("vec_id") < 50),
          "vec_id", "embedding", planes)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "v")))
          .select(col("vec_id"), col("j"), round(col("v"), 6).as("v"))
      },
      Some("""WITH planes AS (
               SELECT b.bit, d.dim,
                 CAST('0x' || substr(md5('0|' || CAST(b.bit AS VARCHAR) ||
                   '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                   / 2147483648.0 - 1.0 AS w
               FROM range(16) b(bit) CROSS JOIN range(64) d(dim)),
             plists AS (
               SELECT bit, list(w ORDER BY dim) AS pvec
               FROM planes GROUP BY bit),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings WHERE vec_id < 50)
             SELECT v.vec_id, CAST(p.bit AS INT) AS j,
               round(list_inner_product(emb, pvec) / sqrt(16.0), 6) AS v
             FROM v CROSS JOIN plists p""")),

    // ---- PCA moment pass (the data-aware counterpart of q99's
    // data-oblivious JL projection): the full second-moment/gram artifact
    // over micro-quantized embeddings — one mapPartitions fold per
    // partition, one O(partitions·d²) merge agg, exact integer output
    // (operators/Pca.scala scaladoc). The oracle recomputes every
    // (i ≤ j) pair through an unnest self-join; integer sums make the
    // 2080-row matrix hash-identical regardless of partitioning. The
    // eigensolve/projection stage on top is driver-side O(d²) and
    // spec-bound (PcaSpec) — no SQL-expressible oracle exists for an
    // iterative eigendecomposition.
    Q("q115_pca_moments",
      (s, d) => graft.operators.Pca.momentsMicro(
          T.embeddings(s, d), "embedding", dim = 64)
        .orderBy(col("i"), col("j")),
      Some("""WITH q AS (
               SELECT vec_id, list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                 AS qv
               FROM embeddings),
             c AS (
               SELECT vec_id, CAST(t.i AS BIGINT) AS i, qv[t.i] AS v
               FROM q CROSS JOIN range(1, 65) t(i))
             SELECT a.i, b.i AS j, CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(a.v) AS BIGINT) AS s_i,
               CAST(sum(b.v) AS BIGINT) AS s_j,
               CAST(sum(a.v * b.v) AS BIGINT) AS s_ij
             FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
             GROUP BY a.i, b.i ORDER BY a.i, b.i""")),

    // ---- Greedy k-center coreset (farthest-point traversal): the
    // diversity-selection counterpart of q79's SemDeDup removal — pick
    // the 6 vectors that best cover the corpus. Exact integer micro-d²
    // makes the greedy trajectory engine-portable; the oracle unrolls
    // all 5 selection rounds CTE-for-CTE (operators/KCenter.scala).
    // Each round is one max(struct) agg with centers inlined as array
    // literals — no join, no data shuffle, O(k·d) driver state.
    Q("q117_kcenter_coreset",
      (s, d) => graft.operators.KCenter.select(
        T.embeddings(s, d), "vec_id", "embedding", k = 6)
        .orderBy(col("sel_round")),
      Some(KCenterSql(k = 6, dim = 64))),

    // ---- LSH-bucketed ANN (the scale path; recall measured in AnnSpec).
    // Short signatures + more tables: the right operating point for
    // weak-similarity (random-gaussian) data — see AnnSpec's recall
    // measurement against the brute-force baseline. Hash-derived
    // (engine-portable) hyperplanes put the signature → bucket-join →
    // exact-cosine-rank pipeline under a full DuckDB oracle. The dot
    // products are computed as IN-ORDER double folds on both engines
    // (Spark VectorDot ↔ DuckDB list_inner_product over the dim-ordered
    // plane list — the pairing q46 hash-validates), so a dp within
    // floating-point noise of 0 cannot flip a signature bit on one engine
    // only (an unordered SUM group would reassociate the additions).
    Q("q45_ann_lsh",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.lshTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nTables = 12, nBits = 6,
          planes = Similarity.portableHyperplanes)
          .select(col("q_id"), col("n_id"), col("rank"))
      },
      Some("""WITH planes AS (
               SELECT t.tb, b.bit, d.dim,
                 CAST('0x' || substr(md5(CAST(t.tb AS VARCHAR) || '|' ||
                   CAST(b.bit AS VARCHAR) || '|' || CAST(d.dim AS VARCHAR)),
                   1, 8) AS BIGINT) / 2147483648.0 - 1.0 AS w
               FROM range(12) t(tb)
               CROSS JOIN range(6) b(bit)
               CROSS JOIN range(64) d(dim)),
             plists AS (
               SELECT tb, bit, list(w ORDER BY dim) AS pvec
               FROM planes GROUP BY tb, bit),
             v0 AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             dots AS (
               SELECT v.vec_id, p.tb, p.bit,
                 list_inner_product(v.emb, p.pvec) AS dp
               FROM v0 v CROSS JOIN plists p),
             sigs AS (
               SELECT vec_id, tb,
                 sum(CASE WHEN dp > 0
                     THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS sig
               FROM dots GROUP BY 1, 2),
             cand AS (
               SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
               FROM sigs q JOIN sigs c ON q.tb = c.tb AND q.sig = c.sig
               WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
             v AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                   FROM embeddings),
             sims AS (
               SELECT cand.q_id, cand.n_id,
                 list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb))) AS sim
               FROM cand
               JOIN v a ON a.vec_id = cand.q_id
               JOIN v b ON b.vec_id = cand.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, n_id) AS rank
               FROM sims) WHERE rank <= 5""")),

    // ---- Exact top-1 neighbor via the brute-force operator (oracle-checked).
    Q("q46_nn_top1",
      (s, d) => {
        val v = T.embeddings(s, d).filter(col("vec_id") < 1000)
        Similarity.bruteForceTopK(v, v.filter(col("vec_id") < 300),
          "vec_id", "embedding", k = 1)
          .select(col("q_id"), col("n_id"))
      },
      Some("""WITH v AS (
               SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings WHERE vec_id < 1000),
             q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < 300),
             sims AS (
               SELECT q_id, vec_id AS n_id,
                 list_inner_product(q_emb, emb) /
                   (sqrt(list_inner_product(q_emb, q_emb)) *
                    sqrt(list_inner_product(emb, emb))) AS sim
               FROM q CROSS JOIN v WHERE q_id <> vec_id)
             SELECT q_id, n_id FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
               FROM sims) WHERE rn = 1""")),

    // ---- Contrastive pair mining (Similarity.hardPairs): per query the
    // hardest POSITIVE (same label, lowest cosine) and hardest NEGATIVE
    // (different label, highest cosine) — the triplet/InfoNCE training-
    // set construction step, exercised on the labeled embeddings table.
    // Same broadcast-query/in-order-fold discipline as q46, so the
    // argmin/argmax replays exactly in DuckDB.
    Q("q130_hard_pairs",
      (s, d) => {
        val v = T.embeddings(s, d)
        graft.operators.Similarity.hardPairs(
          v, v.filter(col("vec_id") < 100), "vec_id", "embedding", "label")
          .orderBy(col("q_id"))
      },
      Some("""WITH v AS (
               SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             q AS (SELECT vec_id AS q_id, label AS q_lab, emb AS q_emb
                   FROM v WHERE vec_id < 100),
             sims AS (
               SELECT q_id, q_lab, vec_id AS n_id, label AS n_lab,
                 list_inner_product(q_emb, emb) /
                   (sqrt(list_inner_product(q_emb, q_emb)) *
                    sqrt(list_inner_product(emb, emb))) AS sim
               FROM q CROSS JOIN v WHERE q_id <> vec_id),
             pos AS (
               SELECT q_id, n_id AS pos_id, round(sim, 6) AS pos_sim FROM (
                 SELECT q_id, n_id, sim, row_number() OVER (
                   PARTITION BY q_id ORDER BY sim ASC, n_id) AS rn
                 FROM sims WHERE q_lab = n_lab) WHERE rn = 1),
             neg AS (
               SELECT q_id, n_id AS neg_id, round(sim, 6) AS neg_sim FROM (
                 SELECT q_id, n_id, sim, row_number() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
                 FROM sims WHERE q_lab <> n_lab) WHERE rn = 1)
             SELECT q_id, pos_id, pos_sim, neg_id, neg_sim
             FROM pos JOIN neg USING (q_id) ORDER BY q_id""")),

    // ---- Marker-token language ID (oracle-checked: identical scoring).
    Q("q47_lang_id",
      (s, d) => TextAnalysis.langId(T.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH toks AS (
               SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
               FROM documents),
             scored AS (
               SELECT doc_id,
                 sum(CASE WHEN tok IN ('der','die','das','und','ist','nicht') THEN 1 ELSE 0 END) AS s_de,
                 sum(CASE WHEN tok IN ('the','and','of','is','to','in') THEN 1 ELSE 0 END) AS s_en,
                 sum(CASE WHEN tok IN ('el','la','de','que','los','es') THEN 1 ELSE 0 END) AS s_es,
                 sum(CASE WHEN tok IN ('le','la','les','et','des','est') THEN 1 ELSE 0 END) AS s_fr
               FROM toks GROUP BY doc_id)
             SELECT doc_id,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang,
               CAST(greatest(s_de, s_en, s_es, s_fr) AS BIGINT) AS marker_hits
             FROM scored""")),

    // ---- Token counting: whitespace + BPE-ish subunits (oracle-checked).
    Q("q48_token_counts",
      (s, d) => TextAnalysis.tokenCounts(T.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Some("""SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
             FROM documents""")),

    // ---- TF-IDF term weighting over the corpus (extends q54's inverted
    // index; identical ln() on both engines, rounded).
    Q("q60_tfidf",
      (s, d) => {
        // Same tokenization as the q54 inverted index (shared helper); the
        // corpus size is a broadcast 1-row aggregate folded into the plan —
        // no driver-side count() scan at plan-build time.
        val toks = TextQueries.tokens(s, d).filter(length(col("tok")) >= 4)
        val nDocs = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val df = toks.select(col("doc_id"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        tf.join(df, "tok")
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("tok"),
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
              .as("tfidf"))
      },
      Some(s"""WITH toks AS (
                SELECT doc_id, tok FROM (
                  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
                WHERE tok <> '' AND length(tok) >= 4),
              n AS (SELECT count(*) AS n_docs FROM documents),
              tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
              df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok)
              SELECT tf.doc_id, tf.tok,
                round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
              FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n""")),

    // ---- PII scrubbing: email/URL/phone redaction (fixture-pinned; the
    // regex chain is the operator, applied identically on both engines).
    Q("q61_pii_scrub",
      (s, d) => {
        val fixture = s.createDataFrame(Seq(
          (1, "contact john.smith@example.com or visit https://example.com/a?b=1"),
          (2, "call +1-555-123-4567 or (555) 987-6543 today"),
          (3, "plain text with no pii at all"),
          (4, "mixed: a@b.co http://x.io 555-111-2222"))).toDF("id", "text")
        val email = regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
        val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
        val phone = regexp_replace(url,
          "(\\+?1[-. ])?(\\(\\d{3}\\)[ ]?|\\d{3}[-. ])\\d{3}[-. ]\\d{4}", "<PHONE>")
        fixture.select(col("id"), phone.as("scrubbed"))
      },
      Some("""SELECT id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 'https?://[^\s]+', '<URL>', 'g'),
               '(\+?1[-. ])?(\(\d{3}\)[ ]?|\d{3}[-. ])\d{3}[-. ]\d{4}', '<PHONE>', 'g')
               AS scrubbed
             FROM (VALUES
               (1, 'contact john.smith@example.com or visit https://example.com/a?b=1'),
               (2, 'call +1-555-123-4567 or (555) 987-6543 today'),
               (3, 'plain text with no pii at all'),
               (4, 'mixed: a@b.co http://x.io 555-111-2222')) AS t(id, text)""")),

    // ---- RefinedWeb-style URL/domain blocklist filter: the curation
    // stage upstream of every text heuristic. Pinned fixture (the
    // synthetic documents carry no URLs — q61 precedent); exercises
    // multi-URL docs, subdomain + exact matches, case/port insensitivity,
    // no-URL docs, and a non-match whose host merely CONTAINS a blocked
    // name (fineads.net vs ads.net).
    Q("q91_domain_blocklist",
      (s, d) => {
        val fixture = s.createDataFrame(Seq(
          (1, "see https://spam.example/path and http://ok.org"),
          (2, "http://tracker.ads.net/x?y=1 plus https://Mirror.SPAM.example:8080/z"),
          (3, "no urls at all here"),
          (4, "https://ok.org/a https://also-ok.io/b https://ok.org/c"),
          (5, "edge http://ads.net trailing text"),
          (6, "notads.net without scheme and https://fineads.net/ok")))
          .toDF("id", "text")
        TextAnalysis.domainBlocklistFilter(fixture, "id", "text",
          Seq("spam.example", "ads.net"))
          .orderBy(col("id"))
      },
      Some("""WITH input(id, text) AS (VALUES
               (1, 'see https://spam.example/path and http://ok.org'),
               (2, 'http://tracker.ads.net/x?y=1 plus https://Mirror.SPAM.example:8080/z'),
               (3, 'no urls at all here'),
               (4, 'https://ok.org/a https://also-ok.io/b https://ok.org/c'),
               (5, 'edge http://ads.net trailing text'),
               (6, 'notads.net without scheme and https://fineads.net/ok')),
             urls AS (
               SELECT id, unnest(regexp_extract_all(text, 'https?://\S+')) AS url
               FROM input),
             doms AS (
               SELECT id, url,
                 lower(regexp_extract(url, '^https?://([^/:?#\s]+)', 1)) AS domain
               FROM urls),
             agg AS (
               SELECT id, count(*) AS n_urls,
                 CAST(sum(CASE WHEN domain = 'spam.example' OR domain LIKE '%.spam.example'
                            OR domain = 'ads.net' OR domain LIKE '%.ads.net'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
                 coalesce(array_to_string(list_sort(list(DISTINCT domain)
                   FILTER (WHERE domain = 'spam.example' OR domain LIKE '%.spam.example'
                             OR domain = 'ads.net' OR domain LIKE '%.ads.net')), ','), '')
                   AS blocked_domains
               FROM doms GROUP BY id)
             SELECT i.id, CAST(coalesce(a.n_urls, 0) AS BIGINT) AS n_urls,
               CAST(coalesce(a.n_blocked, 0) AS BIGINT) AS n_blocked,
               coalesce(a.blocked_domains, '') AS blocked_domains,
               CAST(coalesce(a.n_blocked, 0) = 0 AS INT) AS keep
             FROM input i LEFT JOIN agg a ON i.id = a.id
             ORDER BY i.id""")),

    // ---- Winnowing-style min-k fingerprints (md5 shingle hashes — the
    // same function exists in DuckDB, so the full operator is
    // oracle-checked).
    Q("q49_fingerprints",
      (s, d) => TextAnalysis.fingerprints(T.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        // String-joined for the driver harness (pandas can't sort array cells).
        .withColumn("fingerprint", array_join(col("fingerprint"), ",")),
      Some("""WITH toks AS (
               SELECT doc_id, i, tok FROM (
                 SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT doc_id, string_split_regex(text, '\s+') AS l
                       FROM documents))
               WHERE tok <> ''),
             seq AS (
               SELECT doc_id, tok,
                 lead(tok, 1) OVER w AS t1,
                 lead(tok, 2) OVER w AS t2,
                 lead(tok, 3) OVER w AS t3
               FROM toks
               WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
             sh AS (
               SELECT DISTINCT doc_id,
                 md5(tok || ' ' || t1 || ' ' || t2 || ' ' || t3) AS shingle
               FROM seq WHERE t3 IS NOT NULL),
             ranked AS (
               SELECT doc_id, shingle,
                 row_number() OVER (PARTITION BY doc_id ORDER BY shingle) AS rn
               FROM sh)
             SELECT doc_id, string_agg(shingle, ',' ORDER BY shingle) AS fingerprint
             FROM ranked WHERE rn <= 8 GROUP BY doc_id""")),

    // ---- Multimodal plumbing: binary assets → decoded meta + features.
    // The codec is still a declared STUB (DEVIATIONS.md §10) executed via
    // the real mapPartitions machinery — but its fake values derive from
    // md5(content bytes), so DuckDB replicates the whole decode+embed
    // surface and the query is hash-compared, not rows-only.
    Q("q50_multimodal_meta",
      (s, d) => {
        implicit val sp = s
        val assets = Multimodal.assetsFromText(T.documents(s, d), "doc_id", "text")
        val meta = Multimodal.decodeMeta(assets).toDF()
        val feats = Multimodal.extractFeatures(assets, dim = 4).toDF()
          .select(col("asset_id"),
            round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))
        meta.join(feats, "asset_id")
          .select("asset_id", "media_type", "width", "height", "n_frames", "f0")
      },
      Some("""SELECT doc_id AS asset_id, 'image' AS media_type,
               CAST(64 + CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)
                 % 1024 AS INT) AS width,
               CAST(64 + CAST('0x' || substr(md5(text), 9, 8) AS BIGINT)
                 % 1024 AS INT) AS height,
               1 AS n_frames,
               round((CAST('0x' || substr(md5('0|' || text), 1, 15) AS BIGINT)
                 % 1000) / 1000.0, 6) AS f0
             FROM documents""")),

    // ---- Embedding-cosine near-dup pairs via LSH candidates. Random 64-d
    // gaussians have cos ~ N(0, 1/64): threshold 0.3 ≈ 2.4σ keeps output
    // sparse but non-empty at oracle scale; short signatures (8 bits ×
    // 6 tables) hold candidate recall up for weakly-similar pairs.
    // Portable hyperplanes → exact-dup collapse, banding, bucket caps,
    // cosine verify, member expansion all replicated in DuckDB. Dot
    // products are in-order double folds on BOTH engines (VectorDot ↔
    // list_inner_product over the dim-ordered plane list), so a dp within
    // fp-noise of 0 cannot flip a signature bit on one engine only.
    Q("q56_cosine_neardup",
      (s, d) => graft.operators.Similarity.cosineNearDup(
        T.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.3, nTables = 6, nBits = 8,
        planes = Similarity.portableHyperplanes)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH planes AS (
               SELECT t.tb, b.bit, d.dim,
                 CAST('0x' || substr(md5(CAST(t.tb AS VARCHAR) || '|' ||
                   CAST(b.bit AS VARCHAR) || '|' || CAST(d.dim AS VARCHAR)),
                   1, 8) AS BIGINT) / 2147483648.0 - 1.0 AS w
               FROM range(6) t(tb)
               CROSS JOIN range(8) b(bit)
               CROSS JOIN range(64) d(dim)),
             mem AS (
               SELECT vec_id AS id, embedding,
                 min(vec_id) OVER (PARTITION BY embedding) AS rep
               FROM embeddings),
             reps AS (SELECT id, embedding FROM mem WHERE id = rep),
             plists AS (
               SELECT tb, bit, list(w ORDER BY dim) AS pvec
               FROM planes GROUP BY tb, bit),
             v0 AS (
               SELECT id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM reps),
             dots AS (
               SELECT v.id, p.tb, p.bit,
                 list_inner_product(v.emb, p.pvec) AS dp
               FROM v0 v CROSS JOIN plists p),
             sigs AS (
               SELECT id, tb,
                 sum(CASE WHEN dp > 0
                     THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS sig
               FROM dots GROUP BY 1, 2),
             capped AS (
               SELECT * FROM sigs
               QUALIFY count(*) OVER (PARTITION BY tb, sig) BETWEEN 2 AND 1000),
             cand AS (
               SELECT DISTINCT a.id AS id_a, b.id AS id_b
               FROM capped a JOIN capped b ON a.tb = b.tb AND a.sig = b.sig
               WHERE a.id < b.id),
             v AS (SELECT id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                   FROM reps),
             rep_pairs AS (
               SELECT s.id_a, s.id_b, round(s.sim, 6) AS cosine FROM (
                 SELECT cand.id_a, cand.id_b,
                   list_inner_product(a.emb, b.emb) /
                     (sqrt(list_inner_product(a.emb, a.emb)) *
                      sqrt(list_inner_product(b.emb, b.emb))) AS sim
                 FROM cand
                 JOIN v a ON a.id = cand.id_a
                 JOIN v b ON b.id = cand.id_b) s
               WHERE s.sim >= 0.3),
             cross_pairs AS (
               SELECT least(ma.id, mb.id) AS id_a,
                 greatest(ma.id, mb.id) AS id_b, p.cosine
               FROM rep_pairs p
               JOIN mem ma ON ma.rep = p.id_a
               JOIN mem mb ON mb.rep = p.id_b),
             within_pairs AS (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(1.0 AS DOUBLE) AS cosine
               FROM mem a JOIN mem b ON a.rep = b.rep AND a.id < b.id)
             SELECT * FROM cross_pairs UNION ALL SELECT * FROM within_pairs""")),

    // ---- Full quality-signal battery (operator form of q33's family).
    Q("q51_quality_signals",
      (s, d) => TextAnalysis.qualityScore(T.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH toks AS (
               SELECT doc_id, text, unnest(string_split_regex(text, '\s+')) AS tok
               FROM documents),
             agg AS (
               SELECT doc_id,
                 any_value(length(text)) AS n_chars,
                 count(*) AS n_tokens,
                 count(DISTINCT tok) AS n_distinct,
                 round(avg(length(tok)), 6) AS avg_tok_len,
                 round(avg(CASE WHEN lower(tok) IN
                   ('der','die','das','und','ist','nicht','the','and','of','is','to','in',
                    'el','la','de','que','los','es','le','les','et','des','est')
                   THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio
               FROM toks WHERE tok <> '' GROUP BY doc_id)
             SELECT a.doc_id, a.n_chars, a.n_tokens, a.n_distinct, a.avg_tok_len,
               a.stopword_ratio,
               round(1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_tokens, 6) AS repetition_ratio,
               round(CAST(length(regexp_replace(d.text, '[A-Za-z0-9\s]+', '', 'g')) AS DOUBLE)
                 / greatest(length(d.text), 1), 6) AS punct_ratio,
               round(CAST(length(regexp_replace(d.text, '[^0-9]+', '', 'g')) AS DOUBLE)
                 / greatest(length(d.text), 1), 6) AS digit_ratio
             FROM agg a JOIN documents d ON a.doc_id = d.doc_id""")),

    // ---- Gopher-style repetition signal: fraction of duplicate bigram /
    // trigram occurrences per doc (the standard boilerplate filter).
    Q("q63_ngram_repetition",
      (s, d) => Curation.ngramRepetition(T.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH toks AS (
               SELECT doc_id, i, tok FROM (
                 SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT doc_id, string_split_regex(text, '\s+') AS l
                       FROM documents))
               WHERE tok <> ''),
             seq AS (
               SELECT doc_id, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY i) AS t2
               FROM toks),
             ngrams AS (
               SELECT doc_id, 2 AS n, tok || ' ' || t1 AS ng
               FROM seq WHERE t1 IS NOT NULL
               UNION ALL
               SELECT doc_id, 3 AS n, tok || ' ' || t1 || ' ' || t2 AS ng
               FROM seq WHERE t2 IS NOT NULL),
             counts AS (
               SELECT doc_id, n, ng, count(*) AS c FROM ngrams GROUP BY 1, 2, 3),
             per AS (
               SELECT doc_id, n,
                 round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                   / sum(c), 6) AS frac
               FROM counts GROUP BY 1, 2),
             wide AS (
               SELECT doc_id,
                 max(CASE WHEN n = 2 THEN frac END) AS b,
                 max(CASE WHEN n = 3 THEN frac END) AS t
               FROM per GROUP BY 1)
             SELECT d.doc_id, coalesce(w.b, 0.0) AS dup_bigram_frac,
               coalesce(w.t, 0.0) AS dup_trigram_frac
             FROM documents d LEFT JOIN wide w ON d.doc_id = w.doc_id""")),

    // ---- Context-window chunking: fixed-size character chunks with
    // 1-based offsets (narrow explode, no shuffle).
    Q("q64_doc_chunks",
      (s, d) => Curation.chunk(T.documents(s, d), "doc_id", "text", size = 500)
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH c AS (
               SELECT doc_id, text,
                 unnest(range(CAST(ceil(length(text) / (500 * 1.0)) AS INT)))
                   AS chunk_idx
               FROM documents WHERE length(text) > 0)
             SELECT doc_id, chunk_idx,
               chunk_idx * 500 + 1 AS chunk_start,
               substr(text, CAST(chunk_idx * 500 + 1 AS INT), 500) AS chunk,
               length(substr(text, CAST(chunk_idx * 500 + 1 AS INT), 500))
                 AS n_chunk_chars
             FROM c""")),

    // ---- Deterministic content-hash train/val split (leakage-safe:
    // identical text → identical split, reproducible on any engine).
    Q("q70_content_split",
      (s, d) => Curation.contentSplit(T.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Some("""SELECT doc_id,
               CASE WHEN substring(md5(text), 1, 1) <= 'c'
                    THEN 'train' ELSE 'val' END AS split
             FROM documents""")),

    // ---- Benchmark decontamination: training docs sharing any word 4-gram
    // with the benchmark corpus (source 'src19' stands in for the eval set).
    // Benchmark shingle set is broadcast — the training side never shuffles.
    Q("q71_decontaminate",
      (s, d) => {
        val docs = T.documents(s, d)
        Curation.decontaminate(
          docs.filter(col("source") =!= "src19"),
          docs.filter(col("source") === "src19"),
          "doc_id", "text", n = 4)
          .withColumnRenamed("id", "doc_id")
      },
      Some("""WITH toks AS (
               SELECT doc_id, source, i, tok FROM (
                 SELECT doc_id, source, unnest(l) AS tok,
                   unnest(range(len(l))) AS i
                 FROM (SELECT doc_id, source,
                         string_split_regex(text, '\s+') AS l
                       FROM documents))
               WHERE tok <> ''),
             seq AS (
               SELECT doc_id, source, tok,
                 lead(tok, 1) OVER w AS t1,
                 lead(tok, 2) OVER w AS t2,
                 lead(tok, 3) OVER w AS t3
               FROM toks
               WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
             sh AS (
               SELECT DISTINCT doc_id, source,
                 tok || ' ' || t1 || ' ' || t2 || ' ' || t3 AS shingle
               FROM seq WHERE t3 IS NOT NULL),
             ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src19'),
             hits AS (
               SELECT s.doc_id, count(*) AS c
               FROM sh s JOIN ev USING (shingle)
               WHERE s.source <> 'src19' GROUP BY 1)
             SELECT d.doc_id,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_shared,
               CAST(CASE WHEN coalesce(h.c, 0) > 0 THEN 1 ELSE 0 END AS INT)
                 AS contaminated
             FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
             WHERE d.source <> 'src19'""")),

    // ---- Deterministic stratified sampling (domain/language mixture
    // reweighting): content-hash uniform vs per-stratum threshold.
    // en kept at 50%, zh at 25%, everything else at 100%. Thresholds are
    // 8-hex-digit literals (rate · 2^32): 0.5 → 80000000, 0.25 → 40000000.
    Q("q72_stratified_sample",
      (s, d) => Curation.stratifiedSample(T.documents(s, d), "doc_id",
        "lang", "text", rates = Map("en" -> 0.5, "zh" -> 0.25))
        .withColumnRenamed("id", "doc_id"),
      Some("""SELECT doc_id, lang AS stratum FROM documents
             WHERE substring(md5(text), 1, 8) <
               CASE lang WHEN 'en' THEN '80000000'
                         WHEN 'zh' THEN '40000000'
                         ELSE 'g' END""")),

    // ---- FULL curation pipeline under one oracle: exact dedup → MinHash
    // near-dup removal (portable md5) → quality filter (length + Gopher
    // trigram repetition) → benchmark decontamination (src19 as the eval
    // set) → stratified mixture sampling (en at 50%) → content-hash
    // train/val split → shard-local packing. Every stage is replicated
    // CTE-by-CTE in DuckDB, so the composed flagship — not just its parts —
    // carries the hard hash-compare signal.
    Q("q73_curation_pipeline",
      (s, d) => {
        val docs = T.documents(s, d)
        val cfg = Curation.CurationConfig(
          benchmark = Some(docs.filter(col("source") === "src19")),
          sampleRates = Map("en" -> 0.5),
          nShards = 8, // pinned: the oracle replicates shard = id % 8
          minhashHash = Dedup.PortableMd5Family)
        Curation.curate(docs.filter(col("source") =!= "src19"),
          "doc_id", "text", "lang", cfg)
          .withColumnRenamed("id", "doc_id")
      },
      Some("""WITH tr AS (
               SELECT doc_id AS id, text, lang AS stratum FROM documents
               WHERE source <> 'src19'),
             exact_kept AS (
               SELECT id, text, stratum FROM (
                 SELECT id, text, stratum,
                   min(id) OVER (PARTITION BY text) AS rep FROM tr)
               WHERE id = rep),
             toks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM exact_kept))
               WHERE tok <> ''),
             seq AS (
               SELECT id, tok, lead(tok,1) OVER w AS t1,
                 lead(tok,2) OVER w AS t2
               FROM toks WINDOW w AS (PARTITION BY id ORDER BY i)),
             sh AS (
               SELECT DISTINCT id, md5(tok || ' ' || t1 || ' ' || t2) AS shingle
               FROM seq WHERE t2 IS NOT NULL),
             mh AS (
               SELECT id, k, min(md5(CAST(k AS VARCHAR) || '|' || shingle)) AS h
               FROM sh CROSS JOIN range(32) AS t(k) GROUP BY id, k),
             bands AS (
               SELECT id, k // 4 AS band,
                 md5(CAST(k // 4 AS VARCHAR) || '|' ||
                     string_agg(h, '|' ORDER BY k)) AS bh
               FROM mh GROUP BY id, k // 4),
             capped AS (
               SELECT * FROM bands
               QUALIFY count(*) OVER (PARTITION BY band, bh) BETWEEN 2 AND 1000),
             cand AS (
               SELECT DISTINCT a.id AS id_a, b.id AS id_b
               FROM capped a JOIN capped b USING (band, bh)
               WHERE a.id < b.id),
             sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
             shared AS (
               SELECT c.id_a, c.id_b, count(*) AS shared
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
             near_drop AS (
               SELECT DISTINCT s.id_b AS id
               FROM shared s
               JOIN sizes sa ON sa.id = s.id_a
               JOIN sizes sb ON sb.id = s.id_b
               WHERE s.shared / (sa.sz + sb.sz - s.shared) >= 0.8),
             deduped AS (
               SELECT * FROM exact_kept
               WHERE id NOT IN (SELECT id FROM near_drop)),
             gtoks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM deduped))
               WHERE tok <> ''),
             gseq AS (
               SELECT id, tok,
                 lead(tok,1) OVER (PARTITION BY id ORDER BY i) AS t1,
                 lead(tok,2) OVER (PARTITION BY id ORDER BY i) AS t2
               FROM gtoks),
             gngrams AS (
               SELECT id, 2 AS n, tok || ' ' || t1 AS ng
               FROM gseq WHERE t1 IS NOT NULL
               UNION ALL
               SELECT id, 3 AS n, tok || ' ' || t1 || ' ' || t2 AS ng
               FROM gseq WHERE t2 IS NOT NULL),
             gcounts AS (
               SELECT id, n, ng, count(*) AS c FROM gngrams GROUP BY 1, 2, 3),
             gper AS (
               SELECT id, n,
                 round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                   / sum(c), 6) AS frac
               FROM gcounts GROUP BY 1, 2),
             gwide AS (
               SELECT id, max(CASE WHEN n = 3 THEN frac END) AS dup_trigram_frac
               FROM gper GROUP BY 1),
             quality AS (
               SELECT d.id, d.text, d.stratum,
                 len(string_split_regex(trim(d.text), '\s+')) AS n_tokens
               FROM deduped d LEFT JOIN gwide g ON g.id = d.id
               WHERE len(string_split_regex(trim(d.text), '\s+')) >= 10
                 AND coalesce(g.dup_trigram_frac, 0.0) <= 0.5),
             evsh AS (
               SELECT DISTINCT tok || ' ' || t1 || ' ' || t2 || ' ' || t3
                 AS shingle FROM (
                 SELECT doc_id, tok, lead(tok,1) OVER w AS t1,
                   lead(tok,2) OVER w AS t2, lead(tok,3) OVER w AS t3
                 FROM (
                   SELECT doc_id, i, tok FROM (
                     SELECT doc_id, unnest(l) AS tok,
                       unnest(range(len(l))) AS i
                     FROM (SELECT doc_id, string_split_regex(text, '\s+') AS l
                           FROM documents WHERE source = 'src19'))
                   WHERE tok <> '')
                 WINDOW w AS (PARTITION BY doc_id ORDER BY i))
               WHERE t3 IS NOT NULL),
             trsh4 AS (
               SELECT DISTINCT id,
                 tok || ' ' || t1 || ' ' || t2 || ' ' || t3 AS shingle FROM (
                 SELECT id, tok, lead(tok,1) OVER w AS t1,
                   lead(tok,2) OVER w AS t2, lead(tok,3) OVER w AS t3
                 FROM (
                   SELECT id, i, tok FROM (
                     SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                     FROM (SELECT id, string_split_regex(text, '\s+') AS l
                           FROM quality))
                   WHERE tok <> '')
                 WINDOW w AS (PARTITION BY id ORDER BY i))
               WHERE t3 IS NOT NULL),
             contaminated AS (
               SELECT DISTINCT t.id FROM trsh4 t JOIN evsh e USING (shingle)),
             clean AS (
               SELECT * FROM quality
               WHERE id NOT IN (SELECT id FROM contaminated)),
             sampled AS (
               SELECT * FROM clean
               WHERE substring(md5(text), 1, 8) <
                 CASE stratum WHEN 'en' THEN '80000000' ELSE 'g' END),
             with_split AS (
               SELECT *, CASE WHEN substring(md5(text), 1, 1) <= 'c'
                 THEN 'train' ELSE 'val' END AS split
               FROM sampled),
             packed AS (
               SELECT id, CAST(id % 8 AS INT) AS shard,
                 sum(n_tokens) OVER (PARTITION BY id % 8 ORDER BY id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
               FROM with_split)
             SELECT w.id AS doc_id, w.text, w.stratum, w.n_tokens, w.split,
               p.shard, CAST(p.cum_before // 2048 AS BIGINT) AS pack_id,
               CAST(p.cum_before % 2048 AS BIGINT) AS pack_offset
             FROM with_split w JOIN packed p ON p.id = w.id""")),

    // ---- Incremental near-dup: today's increment (doc_id ≡ 4 mod 5, a
    // scale-free stand-in for the daily batch) probed against the banded
    // signature table of everything already ingested. The corpus side is
    // never shuffled — batch bands broadcast into the probe; verification
    // re-shingles only candidate corpus docs. Portable md5 hashing puts
    // the full asymmetric pipeline under the DuckDB hash-compare.
    Q("q75_incremental_neardup",
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.incrementalMinhash(
          docs.filter(pmod(col("doc_id"), lit(5)) === 4),
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 4),
          "doc_id", "text", n = 3, k = 32, bands = 8, threshold = 0.5,
          hash = Dedup.PortableMd5Family)
          .orderBy(col("batch_id"), col("corpus_id"))
      },
      Some("""WITH batch AS (
               SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 = 4),
             corp AS (
               SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 <> 4),
             btoks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM batch))
               WHERE tok <> ''),
             bseq AS (
               SELECT id, tok, lead(tok,1) OVER w AS t1,
                 lead(tok,2) OVER w AS t2
               FROM btoks WINDOW w AS (PARTITION BY id ORDER BY i)),
             bsh AS (
               SELECT DISTINCT id, md5(tok || ' ' || t1 || ' ' || t2) AS shingle
               FROM bseq WHERE t2 IS NOT NULL),
             bmh AS (
               SELECT id, k, min(md5(CAST(k AS VARCHAR) || '|' || shingle)) AS h
               FROM bsh CROSS JOIN range(32) AS t(k) GROUP BY id, k),
             bbands AS (
               SELECT id, k // 4 AS band,
                 md5(CAST(k // 4 AS VARCHAR) || '|' ||
                     string_agg(h, '|' ORDER BY k)) AS bh
               FROM bmh GROUP BY id, k // 4),
             ctoks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM corp))
               WHERE tok <> ''),
             cseq AS (
               SELECT id, tok, lead(tok,1) OVER w AS t1,
                 lead(tok,2) OVER w AS t2
               FROM ctoks WINDOW w AS (PARTITION BY id ORDER BY i)),
             csh AS (
               SELECT DISTINCT id, md5(tok || ' ' || t1 || ' ' || t2) AS shingle
               FROM cseq WHERE t2 IS NOT NULL),
             cmh AS (
               SELECT id, k, min(md5(CAST(k AS VARCHAR) || '|' || shingle)) AS h
               FROM csh CROSS JOIN range(32) AS t(k) GROUP BY id, k),
             cbands AS (
               SELECT id, k // 4 AS band,
                 md5(CAST(k // 4 AS VARCHAR) || '|' ||
                     string_agg(h, '|' ORDER BY k)) AS bh
               FROM cmh GROUP BY id, k // 4),
             ccap AS (
               SELECT * FROM cbands
               QUALIFY count(*) OVER (PARTITION BY band, bh) <= 1000),
             cand AS (
               SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
               FROM bbands b JOIN ccap c USING (band, bh)),
             est AS (
               SELECT d.batch_id, d.corpus_id,
                 round(CAST(sum(CASE WHEN bm.h = cm.h THEN 1 ELSE 0 END)
                   AS DOUBLE) / 32, 6) AS est_jaccard
               FROM cand d
               JOIN bmh bm ON bm.id = d.batch_id
               JOIN cmh cm ON cm.id = d.corpus_id AND cm.k = bm.k
               GROUP BY 1, 2),
             bsz AS (SELECT id, count(*) AS sz FROM bsh GROUP BY id),
             csz AS (SELECT id, count(*) AS sz FROM csh GROUP BY id),
             shared AS (
               SELECT d.batch_id, d.corpus_id, count(*) AS shared
               FROM cand d
               JOIN bsh a ON a.id = d.batch_id
               JOIN csh b ON b.id = d.corpus_id AND b.shingle = a.shingle
               GROUP BY 1, 2)
             SELECT e.batch_id, e.corpus_id, e.est_jaccard,
               round(CAST(coalesce(s.shared, 0) AS DOUBLE) /
                 (ba.sz + ca.sz - coalesce(s.shared, 0)), 6) AS jaccard
             FROM est e
             LEFT JOIN shared s ON s.batch_id = e.batch_id
               AND s.corpus_id = e.corpus_id
             JOIN bsz ba ON ba.id = e.batch_id
             JOIN csz ca ON ca.id = e.corpus_id
             WHERE CAST(coalesce(s.shared, 0) AS DOUBLE) /
               (ba.sz + ca.sz - coalesce(s.shared, 0)) >= 0.5""")),

    // ---- Near-dup CLUSTERS: transitive closure over the q43 pair graph
    // (keep-one-per-cluster needs components, not pairs). Spark side runs
    // ConnectedComponents min-label propagation; the oracle closes the
    // same pair graph with a recursive CTE — the first graph-connectivity
    // operator under the hard hash-compare. cluster_id = numeric min
    // member id, so the engines' internal label choices cancel out.
    Q("q76_neardup_clusters",
      // Same operating point as q43 (n=3, k=32, bands=8, t=0.05, md5,
      // Drop): its pair table IS q43's output, so the clustering runs
      // over the shared memoized build instead of a third full
      // shingle→sign→band→verify pipeline.
      (s, d) => Dedup.neardupClustersFromPairs(
        Dedup.minhashDedupFromBuild(sharedMd5Build(s, d), threshold = 0.05))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE mem AS (
               SELECT doc_id AS id, text,
                 min(doc_id) OVER (PARTITION BY text) AS rep
               FROM documents),
             reps AS (SELECT id, text FROM mem WHERE id = rep),
             toks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM reps))
               WHERE tok <> ''),
             seq AS (
               SELECT id, tok, lead(tok,1) OVER w AS t1,
                 lead(tok,2) OVER w AS t2
               FROM toks WINDOW w AS (PARTITION BY id ORDER BY i)),
             sh AS (
               SELECT DISTINCT id, md5(tok || ' ' || t1 || ' ' || t2) AS shingle
               FROM seq WHERE t2 IS NOT NULL),
             mh AS (
               SELECT id, k, min(md5(CAST(k AS VARCHAR) || '|' || shingle)) AS h
               FROM sh CROSS JOIN range(32) AS t(k) GROUP BY id, k),
             bands AS (
               SELECT id,
                 md5(CAST(k // 4 AS VARCHAR) || '|' ||
                     string_agg(h, '|' ORDER BY k)) AS bh,
                 k // 4 AS band
               FROM mh GROUP BY id, k // 4),
             capped AS (
               SELECT * FROM bands
               QUALIFY count(*) OVER (PARTITION BY band, bh) BETWEEN 2 AND 1000),
             cand AS (
               SELECT DISTINCT a.id AS id_a, b.id AS id_b
               FROM capped a JOIN capped b USING (band, bh)
               WHERE a.id < b.id),
             sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
             shared AS (
               SELECT c.id_a, c.id_b, count(*) AS shared
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
             rep_pairs AS (
               SELECT c.id_a, c.id_b
               FROM cand c
               LEFT JOIN shared s ON c.id_a = s.id_a AND c.id_b = s.id_b
               JOIN sizes sa ON sa.id = c.id_a
               JOIN sizes sb ON sb.id = c.id_b
               WHERE coalesce(s.shared, 0) /
                 (sa.sz + sb.sz - coalesce(s.shared, 0)) >= 0.05),
             all_pairs AS (
               SELECT least(ma.id, mb.id) AS id_a,
                 greatest(ma.id, mb.id) AS id_b
               FROM rep_pairs p
               JOIN mem ma ON ma.rep = p.id_a
               JOIN mem mb ON mb.rep = p.id_b
               UNION
               SELECT a.id AS id_a, b.id AS id_b
               FROM mem a JOIN mem b ON a.rep = b.rep AND a.id < b.id),
             edges AS (
               SELECT id_a AS a, id_b AS b FROM all_pairs
               UNION SELECT id_b, id_a FROM all_pairs),
             reach AS (
               SELECT a AS id, a AS lbl FROM edges
               UNION
               SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
             labeled AS (
               SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
             sized AS (
               SELECT cluster_id, count(*) AS cluster_size
               FROM labeled GROUP BY cluster_id)
             SELECT l.id AS doc_id, l.cluster_id, s.cluster_size
             FROM labeled l JOIN sized s USING (cluster_id)""")),

    // ---- Corpus-level repeated-segment removal (the line-dedup step of
    // CCNet/RefinedWeb pipelines): 8-token segments occurring in > 2
    // distinct docs are boilerplate, dropped everywhere, and the docs are
    // reassembled. Token positions are re-indexed after empty filtering so
    // both engines segment identically regardless of whitespace runs.
    Q("q74_segment_dedup",
      (s, d) => Curation.segmentDedup(T.documents(s, d), "doc_id", "text",
        maxDf = 2, segWords = 8)
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH toks AS (
               SELECT doc_id, i, tok FROM (
                 SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT doc_id, string_split_regex(text, '\s+') AS l
                       FROM documents))
               WHERE tok <> ''),
             rtoks AS (
               SELECT doc_id, tok,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS ti
               FROM toks),
             segs AS (
               SELECT doc_id, ti // 8 AS seg_i,
                 string_agg(tok, ' ' ORDER BY ti) AS seg
               FROM rtoks GROUP BY doc_id, ti // 8),
             bl AS (
               SELECT seg FROM segs
               GROUP BY seg HAVING count(DISTINCT doc_id) > 2),
             flagged AS (
               SELECT s.doc_id, s.seg_i, s.seg,
                 s.seg IN (SELECT seg FROM bl) AS is_bl
               FROM segs s),
             agg AS (
               SELECT doc_id,
                 string_agg(seg, ' ' ORDER BY seg_i)
                   FILTER (WHERE NOT is_bl) AS clean_text,
                 count(*) FILTER (WHERE NOT is_bl) AS n_seg_kept,
                 count(*) FILTER (WHERE is_bl) AS n_seg_dropped
               FROM flagged GROUP BY doc_id)
             SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
               CAST(coalesce(a.n_seg_kept, 0) AS BIGINT) AS n_seg_kept,
               CAST(coalesce(a.n_seg_dropped, 0) AS BIGINT) AS n_seg_dropped
             FROM documents d LEFT JOIN agg a USING (doc_id)""")),

    // ---- Shard-local sequence packing into fixed token budgets (packing
    // for pretraining batches; per-shard running sums, no global sort).
    Q("q65_seq_packing",
      (s, d) => Curation.packSequences(T.documents(s, d), "doc_id", "text",
        budget = 2048, nShards = 8)
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH base AS (
               SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                 len(string_split_regex(trim(text), '\s+')) AS n_tokens
               FROM documents),
             c AS (
               SELECT doc_id, shard, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
               FROM base)
             SELECT doc_id, shard, n_tokens,
               CAST(cum_before // 2048 AS BIGINT) AS pack_id,
               CAST(cum_before % 2048 AS BIGINT) AS pack_offset
             FROM c""")),

    // ---- Cross-document duplicate-SPAN detection (the rolling-window
    // approximation of suffix-array substring dedup — repeated passages at
    // arbitrary positions inside otherwise-distinct docs). 10-token
    // windows keyed by md5(window text), df >= 2 across docs, flagged
    // window starts coalesced into maximal [start, end) spans per doc.
    // Identical lead-based window build + gaps-and-islands on both engines.
    Q("q77_duplicate_spans",
      (s, d) => graft.operators.SpanDedup.duplicateSpans(
        T.documents(s, d), "doc_id", "text", window = 10, minDf = 2)
        .select(col("id").as("doc_id"),
          col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"),
          col("n_windows")),
      Some(SpanSql + """
        SELECT id AS doc_id, CAST(min(ti) AS BIGINT) AS span_start,
          CAST(max(ti) + 10 AS BIGINT) AS span_end,
          count(*) AS n_windows
        FROM grp GROUP BY id, g""")),

    // ---- Corpus mixing quotas (Curation.mixingQuotas): allocate a 90%
    // document budget across languages toward a UNIFORM mix, capped by
    // availability, shortfall redistributed by exact largest remainder —
    // the "balance languages but respect what exists" table a
    // multilingual mix computes before sampling (quotas then feed
    // q128's grouped sampler). At the 90% operating point the caps
    // genuinely bind (every minority language saturates; the leftover
    // flows to the headroom languages), so the oracle exercises both
    // passes. Cross-multiplies in DECIMAL(38,0)/HUGEINT; all windows
    // run over the O(languages) aggregate, never the corpus.
    Q("q184_mixing_quotas",
      (s, d) => {
        val docs = T.documents(s, d)
        val budget = 9L * docs.count() / 10L
        Curation.mixingQuotas(
          docs.groupBy(col("lang")).agg(count(lit(1)).as("avail")),
          "lang", "avail", budget)
          .orderBy(col("lang"))
      },
      Some("""WITH cnt AS (
               SELECT lang AS g, CAST(count(*) AS BIGINT) AS avail
               FROM documents GROUP BY lang),
             b AS (SELECT CAST(9 * count(*) // 10 AS BIGINT) AS budget
                   FROM documents),
             nv AS (SELECT count(*) AS n FROM cnt),
             p1 AS (
               SELECT g, avail, budget, n, budget // n AS base,
                 CASE WHEN row_number() OVER (ORDER BY g) <= budget % n
                   THEN 1 ELSE 0 END AS extra
               FROM cnt CROSS JOIN b CROSS JOIN nv),
             p2 AS (
               SELECT *, least(base + extra, avail) AS alloc1,
                 avail - least(base + extra, avail) AS h
               FROM p1),
             p3 AS (
               SELECT *, budget - sum(alloc1) OVER () AS left1,
                 sum(h) OVER () AS hsum
               FROM p2),
             p4 AS (SELECT *, least(left1, hsum) AS l2 FROM p3),
             p5 AS (
               SELECT *,
                 CASE WHEN hsum > 0
                   THEN CAST((CAST(l2 AS HUGEINT) * h) // hsum AS BIGINT)
                   ELSE 0 END AS share,
                 CASE WHEN hsum > 0
                   THEN CAST(l2 AS HUGEINT) * h % hsum
                   ELSE 0 END AS fr
               FROM p4),
             p6 AS (SELECT *, l2 - sum(share) OVER () AS need FROM p5),
             p7 AS (
               SELECT *, CASE WHEN row_number() OVER (ORDER BY fr DESC, g)
                 <= need THEN 1 ELSE 0 END AS extra2
               FROM p6)
             SELECT g AS lang, avail,
               CAST(alloc1 + share + extra2 AS BIGINT) AS quota
             FROM p7 ORDER BY lang""")),

    // ---- Deterministic training-order shuffle: every epoch's document
    // order is a pure function of (epoch seed, doc_id) — md5 position
    // keys + ScaleOps.globalRowNumbers (ONE range shuffle + O(P) prefix
    // offsets, the distributed zipWithIndex), so the order is
    // reproducible on any cluster size, resumable mid-epoch, and needs
    // no RNG state (the q70 content-split discipline applied to
    // ordering). The oracle IS the single-partition row_number window —
    // the q144 compare, on the hashed order — with the same per-lang
    // position rollup pinning the whole permutation.
    Q("q187_training_shuffle",
      (s, d) => {
        val keyed = T.documents(s, d).select(col("doc_id"), col("lang"),
          md5(concat(lit("ep1|"), col("doc_id").cast("string"))).as("k"))
        graft.operators.ScaleOps.globalRowNumbers(keyed, Seq("k", "doc_id"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            min(col("row_num")).as("first_pos"),
            max(col("row_num")).as("last_pos"),
            sum(col("row_num")).as("pos_sum"))
          .orderBy(col("lang"))
      },
      Some("""WITH numbered AS (
               SELECT lang, row_number() OVER (
                 ORDER BY md5('ep1|' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS row_num
               FROM documents)
             SELECT lang, count(*) AS n,
               CAST(min(row_num) AS BIGINT) AS first_pos,
               CAST(max(row_num) AS BIGINT) AS last_pos,
               CAST(sum(row_num) AS BIGINT) AS pos_sum
             FROM numbered GROUP BY lang ORDER BY lang""")),

    // ---- k-anonymity audit over quasi-identifiers (lang, source,
    // length bucket): combinations supported by fewer than k documents
    // are re-identification risks — the privacy screen a dataset release
    // runs next to q61's PII scrub. One map-side-combined groupBy over
    // the corpus; risky combos are a tiny residue by construction.
    Q("q189_k_anonymity",
      (s, d) => T.documents(s, d)
        .select(col("lang"), col("source"),
          expr("length(text) div 200").as("len_bucket"))
        .groupBy(col("lang"), col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") < 5)
        .orderBy(col("lang"), col("source"), col("len_bucket")),
      Some("""SELECT lang, source,
               CAST(length(text) // 200 AS BIGINT) AS len_bucket,
               count(*) AS support
             FROM documents GROUP BY 1, 2, 3
             HAVING count(*) < 5
             ORDER BY lang, source, len_bucket""")),

    // ---- Entropy ℓ-diversity (Machanavajjhala et al. 2007) — the
    // companion audit to q189's k-anonymity: a quasi-identifier group
    // can clear k-anonymity with 1000 rows yet leak everything if all
    // 1000 share one sensitive value. Per (lang, length bucket) group
    // over `source` as the sensitive attribute: group size, distinct
    // sources (distinct-ℓ), and the EFFECTIVE source count
    // exp(−Σ p ln p) = exp(ln n − (Σ c·ln c)/n) (entropy-ℓ — the group
    // passes ℓ iff this ≥ ℓ; the q175 entropy identity keeps it one
    // two-level map-side-combined aggregate, no per-row log of ratios).
    Q("q229_l_diversity",
      (s, d) => T.documents(s, d)
        .select(col("lang"),
          expr("length(text) div 500").as("len_bucket"), col("source"))
        .groupBy(col("lang"), col("len_bucket"), col("source"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("lang"), col("len_bucket"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("l_distinct"),
          sum(col("c").cast("double") * log(col("c").cast("double")))
            .as("sclogc"))
        .select(col("lang"), col("len_bucket"), col("n"),
          col("l_distinct"),
          round(exp(log(col("n").cast("double"))
            - col("sclogc") / col("n")), 4).as("eff_sources"))
        .orderBy(col("lang"), col("len_bucket")),
      Some("""WITH g AS (
               SELECT lang, CAST(length(text) // 500 AS BIGINT)
                   AS len_bucket,
                 source, count(*) AS c
               FROM documents GROUP BY 1, 2, 3)
             SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS n,
               count(*) AS l_distinct,
               round(exp(ln(CAST(sum(c) AS DOUBLE))
                 - sum(c * ln(c)) / CAST(sum(c) AS DOUBLE)), 4)
                 AS eff_sources
             FROM g GROUP BY 1, 2 ORDER BY lang, len_bucket""")),

    // ---- INT8 scalar quantization of the embedding corpus (the FAISS
    // SQ8 workhorse: 4× smaller vectors, integer SIMD dot products) with
    // an EXACT quality readout. Per-dim global min/max (one map-side
    // agg), q = floor((v − min)·255/(max − min)) clamped to 255 —
    // identical IEEE-double arithmetic on both engines, so the
    // quantized vectors hash-match. Per query vector: top-5 corpus
    // neighbors by EXACT INTEGER quantized dot product, each row
    // carrying the per-query overlap with the fixed-point float
    // baseline's top-5 (floor(v·10⁶) BIGINT dots — the ground truth is
    // integer too, so recall@5 is hash-exact, no float ordering
    // anywhere). The dim-keyed join form (3·N·64 rows) avoids array
    // reassembly; at 100 TB the quantized corpus is the artifact and
    // the per-dim stats frame is a 64-row broadcast.
    Q("q232_scalar_quantization",
      (s, d) => {
        val ev = T.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("dim", "v")))
          .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
        val stats = ev.groupBy(col("dim"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val qv = ev.join(broadcast(stats), Seq("dim"))
          .withColumn("q", when(col("mx") > col("mn"),
            least(lit(255L), floor((col("v") - col("mn")) * 255.0
              / (col("mx") - col("mn"))).cast("long"))).otherwise(0L))
          .select(col("vec_id"), col("dim"), col("q"),
            floor(col("v") * 1000000.0).cast("long").as("f"))
        val queries = qv.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("dim"),
            col("q").as("qq"), col("f").as("qf"))
        val dots = queries.join(qv.filter(col("vec_id") >= 3), Seq("dim"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(sum(col("qq") * col("q")).as("q_dot"),
            sum(col("qf") * col("f")).as("f_dot"))
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("q_dot").desc, col("vec_id"))
        val wf = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(col("f_dot").desc, col("vec_id"))
        val ranked = dots
          .withColumn("rank", row_number().over(wq))
          .withColumn("f_rank", row_number().over(wf))
        val overlap = ranked
          .filter(col("rank") <= 5 && col("f_rank") <= 5)
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_in_exact_top5"))
        // LEFT join + coalesce: a query whose quantized top-5 shares
        // NOTHING with the exact baseline is the worst case the readout
        // exists to expose — it must appear with 0, not vanish.
        ranked.filter(col("rank") <= 5)
          .join(overlap, Seq("qid"), "left")
          .select(col("qid").as("query_id"), col("rank"), col("vec_id"),
            col("q_dot"),
            coalesce(col("n_in_exact_top5"), lit(0L)).as("n_in_exact_top5"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH ev AS (
               SELECT vec_id, i - 1 AS dim,
                 CAST(embedding[i] AS DOUBLE) AS v
               FROM (SELECT vec_id, embedding FROM embeddings),
                    LATERAL (SELECT unnest(generate_series(1,
                      len(embedding))) AS i)),
             stats AS (
               SELECT dim, min(v) AS mn, max(v) AS mx FROM ev GROUP BY dim),
             qv AS (
               SELECT vec_id, ev.dim,
                 CASE WHEN mx > mn THEN least(CAST(255 AS BIGINT),
                   CAST(floor((v - mn) * 255.0 / (mx - mn)) AS BIGINT))
                 ELSE 0 END AS q,
                 CAST(floor(v * 1000000.0) AS BIGINT) AS f
               FROM ev JOIN stats ON ev.dim = stats.dim),
             dots AS (
               SELECT a.vec_id AS qid, b.vec_id,
                 CAST(sum(a.q * b.q) AS BIGINT) AS q_dot,
                 CAST(sum(a.f * b.f) AS BIGINT) AS f_dot
               FROM qv a JOIN qv b ON a.dim = b.dim
               WHERE a.vec_id < 3 AND b.vec_id >= 3
               GROUP BY 1, 2),
             ranked AS (
               SELECT qid, vec_id, q_dot,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY q_dot DESC, vec_id) AS rank,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY f_dot DESC, vec_id) AS f_rank
               FROM dots),
             ov AS (
               SELECT qid, count(*) AS n_in_exact_top5
               FROM ranked WHERE rank <= 5 AND f_rank <= 5 GROUP BY qid)
             SELECT r.qid AS query_id, r.rank, r.vec_id, r.q_dot,
               coalesce(ov.n_in_exact_top5, 0) AS n_in_exact_top5
             FROM ranked r LEFT JOIN ov USING (qid)
             WHERE r.rank <= 5
             ORDER BY query_id, rank""")),

    // ---- SQ8 composed into the ANN SERVING path (VERDICT r11 #4):
    // q62's IVF candidate generation (portable centroids, 4/16 probe)
    // scored with q232's int8 quantized integer dots instead of float
    // cosine — the production FAISS shape, where the candidate I/O is
    // the 1-byte/dim code artifact (SCALE.md sq8_bytes measures the
    // parquet-byte reduction). Every output row carries the per-query
    // overlap between the quantized and fixed-point-float top-5 over
    // the SAME candidates, so quantization loss is a hash-checked
    // column. Oracle: q62's assignment/probe CTEs + q232's code CTEs,
    // composed CTE-for-CTE.
    Q("q233_ivf_quantized",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfTopKQuantized(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4,
            fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             ev AS (
               SELECT vec_id, i AS di, emb[i] AS val
               FROM v, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
             stats AS (
               SELECT di, min(val) AS mn, max(val) AS mx FROM ev GROUP BY di),
             codes AS (
               SELECT vec_id, ev.di,
                 CASE WHEN mx > mn THEN greatest(CAST(0 AS BIGINT),
                   least(CAST(255 AS BIGINT),
                     CAST(floor((val - mn) * 255.0 / (mx - mn))
                       AS BIGINT)))
                 ELSE 0 END AS q,
                 CAST(floor(val * 1000000.0) AS BIGINT) AS f
               FROM ev JOIN stats ON ev.di = stats.di),
             d2s AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM d2s) WHERE rn = 1),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM d2s WHERE vec_id < 10) WHERE cr <= 4),
             cand AS (
               SELECT p.q_id, a.n_id
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             dots AS (
               SELECT c.q_id, c.n_id,
                 CAST(sum(qa.q * qb.q) AS BIGINT) AS q_dot,
                 CAST(sum(qa.f * qb.f) AS BIGINT) AS f_dot
               FROM cand c
               JOIN codes qa ON qa.vec_id = c.q_id
               JOIN codes qb ON qb.vec_id = c.n_id AND qb.di = qa.di
               GROUP BY 1, 2),
             ranked AS (
               SELECT q_id, n_id, q_dot,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY q_dot DESC, n_id) AS rank,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY f_dot DESC, n_id) AS f_rank
               FROM dots),
             ov AS (
               SELECT q_id, count(*) AS n_in_float_topk
               FROM ranked WHERE rank <= 5 AND f_rank <= 5 GROUP BY q_id)
             SELECT r.q_id, CAST(r.rank AS INT) AS rank, r.n_id, r.q_dot,
               coalesce(ov.n_in_float_topk, 0) AS n_in_float_topk
             FROM ranked r LEFT JOIN ov USING (q_id)
             WHERE r.rank <= 5
             ORDER BY q_id, rank""")),

    // ---- SemDeDup through the QUANTIZED serving path (VERDICT r12
    // #4's consumer): the corpus serves as its OWN query set through
    // ivfTopKQuantizedServe's SHUFFLE join (broadcastQueries = false —
    // a corpus-sized broadcast would OOM the driver at scale); pairs
    // clearing the integer-dot threshold canonicalize and dedup. All
    // scores exact BIGINT, so the pair set hash-matches the oracle,
    // which composes q233's cell/code CTEs with an all-queries probe,
    // the top-k window, and the least/greatest pair collapse.
    Q("q242_semdedup_quantized",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.semanticDedupQuantized(e, "vec_id", "embedding",
            dim = 64, k = 5, minDot = 1200000L, nLists = 16, nProbe = 4,
            fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             ev AS (
               SELECT vec_id, i AS di, emb[i] AS val
               FROM v, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
             stats AS (
               SELECT di, min(val) AS mn, max(val) AS mx FROM ev GROUP BY di),
             codes AS (
               SELECT vec_id, ev.di,
                 CASE WHEN mx > mn THEN greatest(CAST(0 AS BIGINT),
                   least(CAST(255 AS BIGINT),
                     CAST(floor((val - mn) * 255.0 / (mx - mn))
                       AS BIGINT)))
                 ELSE 0 END AS q
               FROM ev JOIN stats ON ev.di = stats.di),
             d2s AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM d2s) WHERE rn = 1),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM d2s) WHERE cr <= 4),
             cand AS (
               SELECT p.q_id, a.n_id
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             dots AS (
               SELECT c.q_id, c.n_id,
                 CAST(sum(qa.q * qb.q) AS BIGINT) AS q_dot
               FROM cand c
               JOIN codes qa ON qa.vec_id = c.q_id
               JOIN codes qb ON qb.vec_id = c.n_id AND qb.di = qa.di
               GROUP BY 1, 2),
             ranked AS (
               SELECT q_id, n_id, q_dot,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY q_dot DESC, n_id) AS rank
               FROM dots),
             pairs AS (
               SELECT least(q_id, n_id) AS id_a,
                 greatest(q_id, n_id) AS id_b, q_dot
               FROM ranked WHERE rank <= 5 AND q_dot >= 1200000)
             SELECT id_a, id_b, CAST(max(q_dot) AS BIGINT) AS q_dot
             FROM pairs GROUP BY 1, 2
             ORDER BY id_a, id_b""")),

    // ---- PQ code packing under the hash oracle (q237's discipline at
    // PQ's 4-bit width): m = 8 codes of ksub = 16 pack into ONE BIGINT
    // per vector (Similarity.pqPack — first nibble sign-biased so the
    // word stays inside signed long), with a roundtrip column pinning
    // pqUnpack(pqPack(codes)) == codes row by row. The oracle
    // recomputes the word as shift arithmetic over the q96/q97 code
    // CTEs: (c1 − 8)·2^60 + Σ c_j·2^(64 − 4j).
    Q("q243_pq_pack",
      (s, d) => {
        val e = T.embeddings(s, d).filter(col("vec_id") < 20)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val codes = Similarity.pqEncode(e, "vec_id", "embedding", books)
        codes.select(col("n_id").as("vec_id"),
            element_at(Similarity.pqPack(col("codes"), 8, 4), 1)
              .as("word"),
            (Similarity.pqUnpack(Similarity.pqPack(col("codes"), 8, 4),
                8, 4).cast("array<int>") === col("codes"))
              .cast("int").as("roundtrip_ok"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings WHERE vec_id < 20),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT v.vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i]),
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i])) AS d2
               FROM v CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             words AS (
               SELECT vec_id, list(code ORDER BY sub) AS cl
               FROM codes GROUP BY vec_id)
             SELECT vec_id,
               CAST((cl[1] - 8) * (1::BIGINT << 60)
                 + cl[2] * (1::BIGINT << 56) + cl[3] * (1::BIGINT << 52)
                 + cl[4] * (1::BIGINT << 48) + cl[5] * (1::BIGINT << 44)
                 + cl[6] * (1::BIGINT << 40) + cl[7] * (1::BIGINT << 36)
                 + cl[8] * (1::BIGINT << 32) AS BIGINT) AS word,
               1 AS roundtrip_ok
             FROM words ORDER BY vec_id""")),

    // ---- IVFADC SERVED from the packed artifact, under the oracle:
    // the q97 composition with the corpus stored as (cell, ONE packed
    // BIGINT) and the candidates unpacked in-expression — the oracle is
    // q97's CTE stack verbatim (pack∘unpack is the identity q243 pins,
    // so the oracle scores the same codes the serving path reads).
    Q("q244_ivfpq_served",
      (s, d) => {
        val e = T.embeddings(s, d)
        val cents = Similarity.portableCentroids(16, 64)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val art = Similarity.pqIvfArtifact(e, "vec_id", "embedding",
          cents, books)
        Similarity.ivfPqTopKServe(art, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, centroids = cents,
            codebooks = books, nProbe = 4)
          .select(col("q_id"), col("n_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM celld WHERE vec_id < 10) WHERE cr <= 4),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT v.vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i]),
                   list_transform(range(1, 9),
                     i -> emb[CAST(c.sub * 8 + i AS INT)] - cvec[i])) AS d2
               FROM v CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT vec_id AS q_id, sub, code, d2
               FROM subd WHERE vec_id < 10),
             cand AS (
               SELECT p.q_id, a.n_id
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adist, n_id) AS rank
               FROM paird) WHERE rank <= 5
             ORDER BY q_id, rank""")),

    // ---- RESIDUAL IVFADC under the hash oracle (the real Jégou 2011
    // encoding — q244's packed artifact upgraded from raw-vector to
    // residual codes): the corpus PQ-encodes x − centroid(cell) and the
    // ADC lookup table becomes per-(query, probed cell) over
    // q − centroid(cell), so adist ≈ ‖(q − c) − decode(codes)‖². The
    // oracle unrolls the full residual composition — coarse assign,
    // residual formation, per-subspace argmin on the residual, the
    // per-(query, cell) LUT, the in-order 8-term ADC sum — CTE-for-CTE;
    // everything is deterministic double arithmetic over the portable
    // hash-derived centroids/codebooks, so ranks hash-match
    // cross-engine exactly.
    Q("q245_ivfpq_residual",
      (s, d) => {
        val e = T.embeddings(s, d)
        val cents = Similarity.portableCentroids(16, 64)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val art = Similarity.pqIvfArtifact(e, "vec_id", "embedding",
          cents, books, residual = true)
        Similarity.ivfPqTopKServe(art, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, centroids = cents,
            codebooks = books, nProbe = 4, residual = true)
          .select(col("q_id"), col("n_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             resid AS (
               SELECT a.n_id, a.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM assign a JOIN v ON v.vec_id = a.n_id
               JOIN clists cl ON cl.cell = a.cell),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM celld WHERE vec_id < 10) WHERE cr <= 4),
             qres AS (
               SELECT p.q_id, p.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM probed p JOIN v ON v.vec_id = p.q_id
               JOIN clists cl ON cl.cell = p.cell),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT r.n_id AS vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM resid r CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT q.q_id, q.cell, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM qres q CROSS JOIN cbl c),
             cand AS (
               SELECT p.q_id, a.n_id, a.cell
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id AND l.cell = ca.cell
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adist, n_id) AS rank
               FROM paird) WHERE rank <= 5
             ORDER BY q_id, rank""")),

    // ---- HD-ROTATED residual IVFADC under the hash oracle: q245's
    // composition with a signed-Hadamard structured rotation in front —
    // the cheap OPQ rung (Ge et al. 2013; H·D/√dim is exactly
    // orthonormal, so true distances are preserved while subspace
    // energy spreads). Everything stays md5-derivable: the sign
    // diagonal comes from md5("hd|i"), the Hadamard entry from
    // bit_count(i & j) parity, the scale 1/√64 = 0.125 is exact in
    // binary — the oracle re-derives the full 64×64 matrix and rotates
    // every vector with in-order list_inner_product before running the
    // identical residual CTE stack.
    Q("q247_ivfpq_rotated",
      (s, d) => {
        val e = T.embeddings(s, d)
        // Pinned like q250's recipe: the rotated corpus feeds the artifact
        // build AND the query side — unpinned, the 64-dot rotation re-runs
        // per consumer subtree (measured 40.7 s vs 4.4 s for the identical
        // unrotated stack, round-15 baseline; pinned it is ~5 s).
        val rot = graft.operators.CacheScope.pin(
          Similarity.hdRotate(e, "vec_id", "embedding", 64))
        val cents = Similarity.portableCentroids(16, 64)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val art = Similarity.pqIvfArtifact(rot, "vec_id", "embedding",
          cents, books, residual = true)
        Similarity.ivfPqTopKServe(art, rot.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, centroids = cents,
            codebooks = books, nProbe = 4, residual = true)
          .select(col("q_id"), col("n_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH v0 AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             signs AS (
               SELECT i, CASE WHEN
                 (CAST('0x' || substr(md5('hd|' || CAST(i AS VARCHAR)),
                    1, 8) AS BIGINT) / 2147483648.0 - 1.0) >= 0
                 THEN 1 ELSE -1 END AS s
               FROM range(64) t(i)),
             hd AS (
               SELECT j.j, list(CAST(s.s *
                   (CASE WHEN bit_count(CAST(i.i AS BIGINT) &
                      CAST(j.j AS BIGINT)) % 2 = 0
                    THEN 0.125 ELSE -0.125 END) AS DOUBLE)
                 ORDER BY i.i) AS hrow
               FROM range(64) j(j) CROSS JOIN range(64) i(i)
               JOIN signs s ON s.i = i.i
               GROUP BY j.j),
             v AS (
               SELECT v0.vec_id,
                 list(list_inner_product(v0.emb, h.hrow)
                   ORDER BY h.j) AS emb
               FROM v0 CROSS JOIN hd h GROUP BY v0.vec_id),
             cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             resid AS (
               SELECT a.n_id, a.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM assign a JOIN v ON v.vec_id = a.n_id
               JOIN clists cl ON cl.cell = a.cell),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM celld WHERE vec_id < 10) WHERE cr <= 4),
             qres AS (
               SELECT p.q_id, p.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM probed p JOIN v ON v.vec_id = p.q_id
               JOIN clists cl ON cl.cell = p.cell),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT r.n_id AS vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM resid r CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT q.q_id, q.cell, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM qres q CROSS JOIN cbl c),
             cand AS (
               SELECT p.q_id, a.n_id, a.cell
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id AND l.cell = ca.cell
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adist, n_id) AS rank
               FROM paird) WHERE rank <= 5
             ORDER BY q_id, rank""")),

    // ---- Two-stage IVFADC serving under the hash oracle: the ADC
    // shortlist (q245's residual composition, top-20 per query) is
    // RE-RANKED with exact squared L2 over the float vectors — the
    // FAISS refine step (Jégou et al. 2011 §V / IndexRefineFlat). At
    // scale the exact stage reads floats for only |Q|·shortlist rows;
    // here the oracle carries q245's CTE stack one step further: widen
    // the rank cut to the shortlist, join both float vectors back, and
    // re-rank on the in-order exact distance.
    Q("q248_ivfpq_rerank",
      (s, d) => {
        val e = T.embeddings(s, d)
        val cents = Similarity.portableCentroids(16, 64)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val art = Similarity.pqIvfArtifact(e, "vec_id", "embedding",
          cents, books, residual = true)
        Similarity.ivfPqTopKRerank(art, e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, shortlist = 20,
            centroids = cents, codebooks = books, nProbe = 4,
            residual = true)
          .select(col("q_id"), col("n_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             resid AS (
               SELECT a.n_id, a.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM assign a JOIN v ON v.vec_id = a.n_id
               JOIN clists cl ON cl.cell = a.cell),
             probed AS (
               SELECT vec_id AS q_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS cr
                 FROM celld WHERE vec_id < 10) WHERE cr <= 4),
             qres AS (
               SELECT p.q_id, p.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM probed p JOIN v ON v.vec_id = p.q_id
               JOIN clists cl ON cl.cell = p.cell),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT r.n_id AS vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM resid r CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT q.q_id, q.cell, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM qres q CROSS JOIN cbl c),
             cand AS (
               SELECT p.q_id, a.n_id, a.cell
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id AND l.cell = ca.cell
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id),
             short AS (
               SELECT q_id, n_id FROM (
                 SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY adist, n_id) AS srank
                 FROM paird) WHERE srank <= 20),
             rer AS (
               SELECT sh.q_id, sh.n_id,
                 list_inner_product(
                   list_transform(range(1, 65),
                     i -> qv.emb[i] - nv.emb[i]),
                   list_transform(range(1, 65),
                     i -> qv.emb[i] - nv.emb[i])) AS d2
               FROM short sh
               JOIN v qv ON qv.vec_id = sh.q_id
               JOIN v nv ON nv.vec_id = sh.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY d2, n_id) AS rank
               FROM rer) WHERE rank <= 5
             ORDER BY q_id, rank""")),

    // ---- BEAM-navigated packed-ADC serving under the hash oracle —
    // the full production IVFADC stack: q181's centroid-graph walk
    // picks the probe cells (O(entry + beam·degree·depth) centroid
    // touches per query instead of scanning all nLists — the 10⁵-cell
    // regime's bottleneck), then q245's residual ADC serves from the
    // 4 B/vector packed artifact for only the beam's cells. The oracle
    // replays BOTH halves CTE-for-CTE: the 3-NN centroid graph, entry
    // beam, two expand-and-prune rounds, then per-(query, beam cell)
    // residual LUTs and the in-order ADC sum.
    Q("q249_ivfpq_beam_served",
      (s, d) => {
        val e = T.embeddings(s, d)
        val cents = Similarity.portableCentroids(16, 64)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val centDf = s.createDataFrame(
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
          .toDF("cell", "centroid")
        // pinned: beamWalk broadcasts the nav frame once per round
        val nav = graft.operators.CacheScope.pin(
          Similarity.buildNavGraph(centDf, degree = 3))
        val art = Similarity.pqIvfArtifact(e, "vec_id", "embedding",
          cents, books, residual = true)
        Similarity.ivfPqBeamServe(art, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, centroids = centDf, nav = nav,
            codebooks = books, beamWidth = 4, depth = 2, entryCells = 2,
            nProbe = 4, residual = true)
          .select(col("q_id"), col("n_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             cd AS (
               SELECT a.cell AS src, b.cell AS dst,
                 list_inner_product(
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]),
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]))
                   AS d2
               FROM clists a CROSS JOIN clists b WHERE a.cell <> b.cell),
             nbr AS (
               SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY d2, dst) AS rn FROM cd) WHERE rn <= 3),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             qd AS (
               SELECT vec_id AS q_id, cell, d2
               FROM celld WHERE vec_id < 10),
             b0 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT q_id, cell, d2, row_number() OVER (PARTITION BY q_id
                   ORDER BY d2, cell) AS rn
                 FROM qd WHERE cell < 2) WHERE rn <= 4),
             e1 AS (
               SELECT DISTINCT q_id, cell FROM (
                 SELECT b.q_id, n.dst AS cell FROM b0 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT q_id, cell FROM b0)),
             b1 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT e.q_id, e.cell, qd.d2, row_number() OVER (
                   PARTITION BY e.q_id ORDER BY qd.d2, e.cell) AS rn
                 FROM e1 e JOIN qd ON qd.q_id = e.q_id AND qd.cell = e.cell)
               WHERE rn <= 4),
             e2 AS (
               SELECT DISTINCT q_id, cell FROM (
                 SELECT b.q_id, n.dst AS cell FROM b1 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT q_id, cell FROM b1)),
             b2 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT e.q_id, e.cell, qd.d2, row_number() OVER (
                   PARTITION BY e.q_id ORDER BY qd.d2, e.cell) AS rn
                 FROM e2 e JOIN qd ON qd.q_id = e.q_id AND qd.cell = e.cell)
               WHERE rn <= 4),
             probed AS (SELECT q_id, cell FROM b2),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             resid AS (
               SELECT a.n_id, a.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM assign a JOIN v ON v.vec_id = a.n_id
               JOIN clists cl ON cl.cell = a.cell),
             qres AS (
               SELECT p.q_id, p.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM probed p JOIN v ON v.vec_id = p.q_id
               JOIN clists cl ON cl.cell = p.cell),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT r.n_id AS vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM resid r CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT q.q_id, q.cell, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM qres q CROSS JOIN cbl c),
             cand AS (
               SELECT p.q_id, a.n_id, a.cell
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id AND l.cell = ca.cell
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adist, n_id) AS rank
               FROM paird) WHERE rank <= 5
             ORDER BY q_id, rank""")),

    // ---- The COMPOSED serving recipe under ONE hash oracle (VERDICT
    // r14 #1): SCALE.md's 7-step production stack executed as a single
    // plan — hdRotate the corpus (the signed-Hadamard OPQ rung, q247)
    // → residual pqIvfArtifact in ROTATED space (q245) → buildNavGraph
    // centroid metadata (q225/q249) → beam-navigated packed-ADC
    // shortlist (q249's walk, widened to 20 with emitCell) → exact
    // re-rank over the rotated float corpus joined on (cell, id) — the
    // cell-partitioned layout the rerank face's dynamic-partition-
    // pruning contract assumes (q248). Every stage was individually
    // hash-green in round 14; what this query pins is the SEAMS
    // (schema drift between stages, double rotation, artifact/float
    // cell mismatch) that per-stage oracles cannot see. The oracle
    // composes the same stacks CTE-for-CTE: q247's md5-derived 64×64
    // rotation feeds q249's 3-NN centroid graph + entry beam + two
    // expand-and-prune rounds + per-(query, cell) residual ADC, whose
    // top-20 shortlist q248's exact-L2 tail re-ranks — rotated doubles
    // throughout, so ranks hash-match cross-engine exactly.
    Q("q250_ivfpq_recipe",
      (s, d) => {
        val e = T.embeddings(s, d)
        // pinned: the rotated corpus feeds the artifact build, the
        // query side, AND the re-rank float join; the artifact feeds
        // the ADC serve and the cell layout of the float corpus.
        val rot = graft.operators.CacheScope.pin(
          Similarity.hdRotate(e, "vec_id", "embedding", 64))
        val cents = Similarity.portableCentroids(16, 64)
        val books = Similarity.portableCodebooks(8, 16, 8)
        val centDf = s.createDataFrame(
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
          .toDF("cell", "centroid")
        val nav = graft.operators.CacheScope.pin(
          Similarity.buildNavGraph(centDf, degree = 3))
        val art = graft.operators.CacheScope.pin(
          Similarity.pqIvfArtifact(rot, "vec_id", "embedding",
            cents, books, residual = true))
        val short = Similarity.ivfPqBeamServe(art,
            rot.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 20, centroids = centDf, nav = nav,
            codebooks = books, beamWidth = 4, depth = 2, entryCells = 2,
            nProbe = 4, residual = true, emitCell = true)
          .select(col("q_id"), col("n_id"), col("cell"))
        val corpusWithCell = rot.join(
          art.select(col("n_id").as("vec_id"), col("cell")), Seq("vec_id"))
        Similarity.rerankShortlist(short, corpusWithCell,
            rot.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
            cellCol = Some("cell"))
          .select(col("q_id"), col("n_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH v0 AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             signs AS (
               SELECT i, CASE WHEN
                 (CAST('0x' || substr(md5('hd|' || CAST(i AS VARCHAR)),
                    1, 8) AS BIGINT) / 2147483648.0 - 1.0) >= 0
                 THEN 1 ELSE -1 END AS s
               FROM range(64) t(i)),
             hd AS (
               SELECT j.j, list(CAST(s.s *
                   (CASE WHEN bit_count(CAST(i.i AS BIGINT) &
                      CAST(j.j AS BIGINT)) % 2 = 0
                    THEN 0.125 ELSE -0.125 END) AS DOUBLE)
                 ORDER BY i.i) AS hrow
               FROM range(64) j(j) CROSS JOIN range(64) i(i)
               JOIN signs s ON s.i = i.i
               GROUP BY j.j),
             v AS (
               SELECT v0.vec_id,
                 list(list_inner_product(v0.emb, h.hrow)
                   ORDER BY h.j) AS emb
               FROM v0 CROSS JOIN hd h GROUP BY v0.vec_id),
             cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             cd AS (
               SELECT a.cell AS src, b.cell AS dst,
                 list_inner_product(
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]),
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]))
                   AS d2
               FROM clists a CROSS JOIN clists b WHERE a.cell <> b.cell),
             nbr AS (
               SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY d2, dst) AS rn FROM cd) WHERE rn <= 3),
             celld AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             qd AS (
               SELECT vec_id AS q_id, cell, d2
               FROM celld WHERE vec_id < 10),
             b0 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT q_id, cell, d2, row_number() OVER (PARTITION BY q_id
                   ORDER BY d2, cell) AS rn
                 FROM qd WHERE cell < 2) WHERE rn <= 4),
             e1 AS (
               SELECT DISTINCT q_id, cell FROM (
                 SELECT b.q_id, n.dst AS cell FROM b0 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT q_id, cell FROM b0)),
             b1 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT e.q_id, e.cell, qd.d2, row_number() OVER (
                   PARTITION BY e.q_id ORDER BY qd.d2, e.cell) AS rn
                 FROM e1 e JOIN qd ON qd.q_id = e.q_id AND qd.cell = e.cell)
               WHERE rn <= 4),
             e2 AS (
               SELECT DISTINCT q_id, cell FROM (
                 SELECT b.q_id, n.dst AS cell FROM b1 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT q_id, cell FROM b1)),
             b2 AS (
               SELECT q_id, cell, d2 FROM (
                 SELECT e.q_id, e.cell, qd.d2, row_number() OVER (
                   PARTITION BY e.q_id ORDER BY qd.d2, e.cell) AS rn
                 FROM e2 e JOIN qd ON qd.q_id = e.q_id AND qd.cell = e.cell)
               WHERE rn <= 4),
             probed AS (SELECT q_id, cell FROM b2),
             assign AS (
               SELECT vec_id AS n_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM celld) WHERE rn = 1),
             resid AS (
               SELECT a.n_id, a.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM assign a JOIN v ON v.vec_id = a.n_id
               JOIN clists cl ON cl.cell = a.cell),
             qres AS (
               SELECT p.q_id, p.cell,
                 list_transform(range(1, 65),
                   i -> v.emb[i] - cl.cvec[i]) AS res
               FROM probed p JOIN v ON v.vec_id = p.q_id
               JOIN clists cl ON cl.cell = p.cell),
             cb AS (
               SELECT s.sub, c.code, d.dim,
                 (CAST('0x' || substr(md5('pq|' || CAST(s.sub AS VARCHAR) ||
                    '|' || CAST(c.code AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(8) s(sub) CROSS JOIN range(16) c(code)
               CROSS JOIN range(8) d(dim)),
             cbl AS (
               SELECT sub, code, list(w ORDER BY dim) AS cvec
               FROM cb GROUP BY sub, code),
             subd AS (
               SELECT r.n_id AS vec_id, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> r.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM resid r CROSS JOIN cbl c),
             codes AS (
               SELECT vec_id, sub, code FROM (
                 SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn
                 FROM subd) WHERE rn = 1),
             lut AS (
               SELECT q.q_id, q.cell, c.sub, c.code,
                 list_inner_product(
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]),
                   list_transform(range(1, 9),
                     i -> q.res[CAST(c.sub * 8 + i AS INT)] - c.cvec[i]))
                   AS d2
               FROM qres q CROSS JOIN cbl c),
             cand AS (
               SELECT p.q_id, a.n_id, a.cell
               FROM probed p JOIN assign a ON a.cell = p.cell
               WHERE a.n_id <> p.q_id),
             paird AS (
               SELECT ca.q_id, ca.n_id,
                 list_inner_product(list(l.d2 ORDER BY l.sub),
                   list_transform(range(8), x -> 1.0)) AS adist
               FROM cand ca
               JOIN codes c ON c.vec_id = ca.n_id
               JOIN lut l ON l.q_id = ca.q_id AND l.cell = ca.cell
                 AND l.sub = c.sub AND l.code = c.code
               GROUP BY ca.q_id, ca.n_id),
             short AS (
               SELECT q_id, n_id FROM (
                 SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY adist, n_id) AS srank
                 FROM paird) WHERE srank <= 20),
             rer AS (
               SELECT sh.q_id, sh.n_id,
                 list_inner_product(
                   list_transform(range(1, 65),
                     i -> qv.emb[i] - nv.emb[i]),
                   list_transform(range(1, 65),
                     i -> qv.emb[i] - nv.emb[i])) AS d2
               FROM short sh
               JOIN v qv ON qv.vec_id = sh.q_id
               JOIN v nv ON nv.vec_id = sh.n_id)
             SELECT q_id, n_id, CAST(rank AS INT) AS rank FROM (
               SELECT q_id, n_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY d2, n_id) AS rank
               FROM rer) WHERE rank <= 5
             ORDER BY q_id, rank""")),

    // ---- The FWHT BUTTERFLY under the hash oracle: q247/q250 pin the
    // DENSE rotation arithmetic (in-order dots against the literal
    // matrix); this pins the PRODUCTION path — the fast Walsh–Hadamard
    // ladder (log₂64 = 6 chained pairwise add/sub stages) — plus its
    // inverse, cross-engine. Both engines execute the IDENTICAL
    // floating-point operation order (per stage: u'[j] = u[j] + u[j|h]
    // on the clear bit, u[j^h] − u[j] on the set bit, over doubles), so
    // the rotated components match bit-for-bit, not merely to the
    // driver's 1e-6 rounding; roundtrip_ok pins inverse∘rotate == id to
    // 1e-9 inside EACH engine (the q237 roundtrip-flag pattern).
    Q("q251_fwht_rotation",
      (s, d) => {
        val e = T.embeddings(s, d).filter(col("vec_id") < 30)
        // pinned: the rotated frame feeds BOTH the output join and the
        // inverse ladder — unpinned, the 6-stage forward subtree
        // duplicates under the 6-stage inverse and the join, and the
        // composed 12+-projection tree blows the driver heap at plan
        // instantiation (observed: OOM at sf0.01)
        val rot = graft.operators.CacheScope.pin(
          Similarity.hdRotate(e, "vec_id", "embedding", 64,
            butterfly = Some(true)))
        val back = Similarity.hdRotateInverse(rot, "vec_id", "embedding",
            64, butterfly = Some(true))
          .select(col("vec_id"), col("embedding").as("decoded"))
        rot
          .join(e.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("orig")),
            Seq("vec_id"))
          .join(back, Seq("vec_id"))
          .withColumn("roundtrip_ok",
            when(aggregate(zip_with(col("decoded"), col("orig"),
                (a, b) => abs(a - b)), lit(0.0),
                (acc, x) => greatest(acc, x)) <= lit(1e-9), lit(1L))
              .otherwise(lit(0L)))
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("dim", "val")), col("roundtrip_ok"))
          .select(col("vec_id"), col("dim"), col("val"),
            col("roundtrip_ok"))
          .orderBy(col("vec_id"), col("dim"))
      },
      Some("""WITH v0 AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings WHERE vec_id < 30),
             signs AS (
               SELECT i, CASE WHEN
                 (CAST('0x' || substr(md5('hd|' || CAST(i AS VARCHAR)),
                    1, 8) AS BIGINT) / 2147483648.0 - 1.0) >= 0
                 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
               FROM range(64) t(i)),
             sgl AS (SELECT list(s ORDER BY i) AS sg FROM signs),
             u0 AS (
               SELECT vec_id, list_transform(range(1, 65),
                 j -> emb[CAST(j AS INT)] * sg[CAST(j AS INT)] * 0.125)
                 AS u
               FROM v0 CROSS JOIN sgl),
             u1 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 1) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 1) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 1) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM u0),
             u2 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 2) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 2) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 2) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM u1),
             u3 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 4) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 4) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 4) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM u2),
             u4 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 8) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 8) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 8) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM u3),
             u5 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 16) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 16) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 16) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM u4),
             rotf AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 32) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 32) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 32) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM u5),
             w1 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 1) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 1) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 1) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM rotf),
             w2 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 2) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 2) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 2) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM w1),
             w3 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 4) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 4) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 4) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM w2),
             w4 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 8) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 8) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 8) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM w3),
             w5 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 16) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 16) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 16) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM w4),
             w6 AS (SELECT vec_id, list_transform(range(1, 65), j ->
               CASE WHEN ((j - 1) & 32) = 0
                 THEN u[CAST(j AS INT)] + u[CAST(((j - 1) | 32) + 1 AS INT)]
                 ELSE u[CAST(xor(j - 1, 32) + 1 AS INT)] - u[CAST(j AS INT)]
               END) AS u FROM w5),
             dec AS (
               SELECT w6.vec_id, list_transform(range(1, 65),
                 j -> w6.u[CAST(j AS INT)] * sg[CAST(j AS INT)] * 0.125)
                 AS decoded
               FROM w6 CROSS JOIN sgl),
             rt AS (
               SELECT d.vec_id,
                 CASE WHEN list_max(list_transform(range(1, 65),
                   j -> abs(d.decoded[CAST(j AS INT)]
                     - v0.emb[CAST(j AS INT)]))) <= 1e-9
                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ok
               FROM dec d JOIN v0 ON v0.vec_id = d.vec_id)
             SELECT r.vec_id, CAST(j.j - 1 AS INT) AS dim,
               r.u[CAST(j.j AS INT)] AS val, rt.ok AS roundtrip_ok
             FROM rotf r CROSS JOIN range(1, 65) j(j)
             JOIN rt ON rt.vec_id = r.vec_id
             ORDER BY r.vec_id, dim""")),

    // ---- SQ8 code packing under the hash oracle: quantize (q232's
    // recipe), pack 8 codes per BIGINT word (Similarity.packCodes — the
    // signed-top-byte bijection that keeps the 64-bit pack inside
    // signed long), and emit every word of the first 20 vectors WITH a
    // roundtrip column asserting unpackCodes(packCodes(codes)) == codes
    // row by row. The oracle recomputes each word as plain positional
    // arithmetic ((q₁−128)·256⁷ + Σ qᵢ·256^(8−i)) and pins roundtrip_ok
    // to 1 — if the engine's unpack ever diverged from its pack, the
    // flag flips and the hash breaks. The words are exactly the packed
    // artifact SCALE.md's sq8_bytes row prices at 7.2× under float64.
    Q("q237_sq8_pack",
      (s, d) => {
        val ev = T.embeddings(s, d)
          .filter(col("vec_id") < 20)
          .select(col("vec_id"), posexplode(col("embedding"))
            .as(Seq("dim", "v")))
          .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
        val stats = T.embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy(col("dim"))
          .agg(min(col("v").cast("double")).as("mn"),
            max(col("v").cast("double")).as("mx"))
        val codes = ev.join(broadcast(stats), Seq("dim"))
          .withColumn("q", when(col("mx") > col("mn"),
            least(lit(255L), floor((col("v") - col("mn")) * 255.0
              / (col("mx") - col("mn"))).cast("long"))).otherwise(0L))
          .groupBy(col("vec_id"))
          .agg(transform(array_sort(collect_list(struct(col("dim"),
              col("q")))), x => x.getField("q")).as("codes"))
        codes
          .withColumn("packed",
            Similarity.packCodes(col("codes"), 64))
          .withColumn("roundtrip_ok",
            (Similarity.unpackCodes(col("packed"), 64) === col("codes"))
              .cast("long"))
          .select(col("vec_id"), posexplode(col("packed"))
            .as(Seq("g", "word")), col("roundtrip_ok"))
          .select(col("vec_id"), col("g"), col("word"), col("roundtrip_ok"))
          .orderBy(col("vec_id"), col("g"))
      },
      Some("""WITH ev AS (
               SELECT vec_id, i AS di,
                 CAST(embedding[i] AS DOUBLE) AS val
               FROM (SELECT vec_id, embedding FROM embeddings),
                    LATERAL (SELECT unnest(generate_series(1, 64)) AS i)),
             stats AS (
               SELECT di, min(val) AS mn, max(val) AS mx
               FROM ev GROUP BY di),
             codes AS (
               SELECT vec_id, ev.di,
                 CASE WHEN mx > mn THEN least(CAST(255 AS BIGINT),
                   CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT))
                 ELSE 0 END AS q
               FROM ev JOIN stats ON ev.di = stats.di
               WHERE vec_id < 20),
             cl AS (
               SELECT vec_id, list(q ORDER BY di) AS qs
               FROM codes GROUP BY vec_id),
             words AS (
               SELECT vec_id, g,
                 CAST((qs[g * 8 + 1] - 128) * 72057594037927936
                   + qs[g * 8 + 2] * 281474976710656
                   + qs[g * 8 + 3] * 1099511627776
                   + qs[g * 8 + 4] * 4294967296
                   + qs[g * 8 + 5] * 16777216
                   + qs[g * 8 + 6] * 65536
                   + qs[g * 8 + 7] * 256
                   + qs[g * 8 + 8] AS BIGINT) AS word
               FROM cl, LATERAL (SELECT unnest(generate_series(0, 7))
                 AS g))
             SELECT vec_id, CAST(g AS INT) AS g, word,
               CAST(1 AS BIGINT) AS roundtrip_ok
             FROM words ORDER BY vec_id, g""")),

    // ---- Training-data RELEASE pipeline (the round-8 composition
    // flagship, q73's discipline applied to the mix-and-ship stage):
    // language mixing quotas (q184's capped largest remainder at a 4/5
    // budget) → per-language weighted A-ES draws UNDER those quotas
    // (weightedSampleByQuota — the q128 sampler with an O(langs)
    // broadcast budget frame) → deterministic epoch ORDER over the
    // selected set (q187's md5 keys + distributed zipWithIndex) →
    // per-language position rollup. Three operators composed end to
    // end, every stage mirrored in ONE DuckDB oracle, all arithmetic
    // integer or hash-derived — the pipeline a 100 TB multilingual
    // release actually runs, with no RNG state anywhere.
    Q("q196_release_pipeline",
      (s, d) => {
        val docs = T.documents(s, d)
        val budget = 4L * docs.count() / 5L
        val quotas = Curation.mixingQuotas(
          docs.groupBy(col("lang")).agg(count(lit(1)).as("avail")),
          "lang", "avail", budget)
        val sel = Curation.weightedSampleByQuota(docs, "doc_id",
          "n_chars", "lang", quotas, salt = "rel8")
        graft.operators.ScaleOps.globalRowNumbers(
            sel.select(col("id").as("doc_id"), col("stratum").as("lang"),
              md5(concat(lit("rel8|"), col("id").cast("string"))).as("k")),
            Seq("k", "doc_id"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_selected"),
            min(col("row_num")).as("first_pos"),
            max(col("row_num")).as("last_pos"),
            sum(col("row_num")).as("pos_sum"))
          .orderBy(col("lang"))
      },
      Some(ReleasePipelineSql)),

    // ---- Dedup yield forecast: before running a corpus-wide dedup,
    // what will it actually save? Exact-duplicate clusters (text
    // equality — the md5 pre-collapse every dedup pass here starts
    // with) bucketed by cluster size, with documents, kept
    // representatives, and the token mass a keep-one policy drops per
    // bucket — the capacity-planning table that decides whether the
    // full near-dup pass is worth scheduling. One groupBy(text) pass +
    // an O(clusters) rollup; exact integers throughout.
    Q("q205_dedup_yield",
      (s, d) => {
        val cl = T.documents(s, d)
          .select(col("text"),
            size(filter(split(col("text"), "\\s+"), t => t =!= lit("")))
              .cast("long").as("n_toks"))
          .groupBy(col("text"))
          .agg(count(lit(1)).as("csize"), first(col("n_toks")).as("n_toks"))
        cl.groupBy(col("csize"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("n_toks") * (col("csize") - 1)).as("tokens_dropped"))
          .select(col("csize"), col("n_clusters"),
            (col("n_clusters") * col("csize")).as("n_docs"),
            col("tokens_dropped"))
          .orderBy(col("csize"))
      },
      Some("""WITH cl AS (
               SELECT text, CAST(count(*) AS BIGINT) AS csize,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   t -> t <> '')) AS BIGINT) AS n_toks
               FROM documents GROUP BY text)
             SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(count(*) * csize AS BIGINT) AS n_docs,
               CAST(sum(n_toks * (csize - 1)) AS BIGINT) AS tokens_dropped
             FROM cl GROUP BY csize ORDER BY csize""")),

    // ---- Bigram LM scoring (TextAnalysis.bigramCrossEntropy): docs
    // scored under an add-one bigram model trained on the doc_id % 4
    // reference quarter — the context-aware upgrade of q80's unigram
    // (rare TRANSITIONS, not just rare words, are what separate
    // shuffled-token spam from prose). Per-pair ln terms nano-quantized
    // before the per-doc sum (the q190 discipline), reference tables
    // broadcast, corpus shuffled once for the pair window + once for
    // the rollup.
    Q("q204_bigram_lm",
      (s, d) => {
        val docs = T.documents(s, d)
        TextAnalysis.bigramCrossEntropy(
            docs.filter(col("doc_id") % 4 =!= 0), "doc_id", "text",
            docs.filter(col("doc_id") % 4 === 0), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
               SELECT doc_id AS id, i, tok FROM (
                 SELECT doc_id,
                   unnest(string_split_regex(text, '\s+')) AS tok,
                   unnest(range(len(string_split_regex(text, '\s+')))) AS i
                 FROM documents)
               WHERE tok <> ''),
             rp AS (
               SELECT w1, w2 FROM (
                 SELECT id, tok AS w1,
                   lead(tok) OVER (PARTITION BY id ORDER BY i) AS w2
                 FROM toks WHERE id % 4 = 0)
               WHERE w2 IS NOT NULL),
             c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                    FROM rp GROUP BY w1, w2),
             c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                    FROM rp GROUP BY w1),
             vr AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v_ref
                    FROM toks WHERE id % 4 = 0),
             sp AS (
               SELECT id, w1, w2 FROM (
                 SELECT id, tok AS w1,
                   lead(tok) OVER (PARTITION BY id ORDER BY i) AS w2
                 FROM toks WHERE id % 4 <> 0)
               WHERE w2 IS NOT NULL),
             terms AS (
               SELECT sp.id,
                 CAST(round(ln((coalesce(c2.c2, 0) + 1) /
                   CAST(coalesce(c1.c1, 0) + vr.v_ref + 1 AS DOUBLE))
                   * 1000000000) AS BIGINT) AS term_n
               FROM sp
               LEFT JOIN c2 ON sp.w1 = c2.w1 AND sp.w2 = c2.w2
               LEFT JOIN c1 ON sp.w1 = c1.w1
               CROSS JOIN vr),
             agg AS (
               SELECT id, CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(term_n) AS BIGINT) AS sum_n
               FROM terms GROUP BY id)
             SELECT d.doc_id, coalesce(a.n_pairs, 0) AS n_pairs,
               CASE WHEN a.id IS NULL THEN 0.0
                 ELSE round(-(CAST(a.sum_n AS DOUBLE) / 1e9) / a.n_pairs, 6)
               END AS bigram_ce
             FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <> 0) d
             LEFT JOIN agg a ON a.id = d.doc_id
             ORDER BY d.doc_id""")),

    // ---- Bitext mining by MUTUAL nearest neighbors (the CCMatrix/
    // LASER-style parallel-corpus step): English docs paired with
    // non-English docs when each is the other's top-1 embedding
    // neighbor — mutual-NN kills the hubness false positives a one-way
    // top-1 accepts. Exact brute top-1 here — the SPEC REFERENCE tier:
    // the scale path is Similarity.ivfMutualTop1 (q206), which draws
    // each direction's candidates from shared IVF cells and runs the
    // mutual join on candidate pairs instead of two cross products.
    // In-order double cosines, round-6 only in the output, ties to the
    // smaller id on both directions.
    Q("q195_bitext_mining",
      (s, d) => {
        val emb = T.embeddings(s, d).join(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          col("vec_id") === col("doc_id"))
        // SIZE GUARD (VERDICT r9 #4, the globalCumSum fail-fast
        // pattern): both sides here are corpus-sized, so the two
        // bruteForceTopK passes are deliberate cross products —
        // acceptable ONLY at validation scale, where this query is the
        // spec-reference tier the ANN paths (q206/q209/q210) are pinned
        // against. Above the bound the right answer is those operators,
        // never a bigger cross product; fail fast with the redirect.
        // Guard proxy (ADVICE r10): count the bare embeddings scan with
        // an early-stopping limit — an UPPER bound on the joined emb
        // (the doc join only drops rows) — instead of the old eager
        // emb.count(), which re-ran the 3-way join on every
        // construction, including plan-only paths.
        val nVec = T.embeddings(s, d).limit(100001).count()
        require(nVec <= 100000L,
          s"q195 brute-force bitext mining is the validation-scale " +
            s"reference tier (> 100000 vectors); at scale use " +
            s"ivfMutualTop1 (q206) / marginMutualTop1 (q209)")
        val en = emb.filter(col("lang") === "en")
          .select(col("vec_id"), col("embedding"))
        val xx = emb.filter(col("lang") =!= "en")
          .select(col("vec_id"), col("embedding"))
        val e2x = Similarity.bruteForceTopK(xx, en, "vec_id", "embedding", 1)
          .select(col("q_id").as("en_id"), col("n_id").as("xx_id"),
            col("sim"))
        val x2e = Similarity.bruteForceTopK(en, xx, "vec_id", "embedding", 1)
          .select(col("q_id").as("xx_id"), col("n_id").as("en_id"))
        e2x.join(x2e, Seq("en_id", "xx_id"))
          .select(col("en_id"), col("xx_id"), round(col("sim"), 6).as("cos"))
          .orderBy(col("en_id"))
      },
      Some("""WITH v AS (
               SELECT vec_id, lang,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings JOIN documents ON vec_id = doc_id),
             en AS (SELECT vec_id, emb FROM v WHERE lang = 'en'),
             xx AS (SELECT vec_id, emb FROM v WHERE lang <> 'en'),
             sims AS (
               SELECT en.vec_id AS en_id, xx.vec_id AS xx_id,
                 list_inner_product(en.emb, xx.emb) /
                   (sqrt(list_inner_product(en.emb, en.emb)) *
                    sqrt(list_inner_product(xx.emb, xx.emb))) AS sim
               FROM en CROSS JOIN xx),
             e2x AS (
               SELECT en_id, xx_id, sim FROM (
                 SELECT en_id, xx_id, sim, row_number() OVER (
                   PARTITION BY en_id ORDER BY sim DESC, xx_id) AS rn
                 FROM sims) WHERE rn = 1),
             x2e AS (
               SELECT en_id, xx_id FROM (
                 SELECT en_id, xx_id, row_number() OVER (
                   PARTITION BY xx_id ORDER BY sim DESC, en_id) AS rn
                 FROM sims) WHERE rn = 1)
             SELECT e.en_id, e.xx_id, round(e.sim, 6) AS cos
             FROM e2x e JOIN x2e USING (en_id, xx_id)
             ORDER BY en_id""")),

    // ---- ANN-backed bitext mining (Similarity.ivfMutualTop1): q195's
    // mutual-top-1 semantics with candidates drawn from shared IVF
    // cells instead of two |en|×|xx| cross products — each side probes
    // its 4 nearest of the 16 portable cells, candidate pairs are the
    // union of (en probes xx's cells) and (xx probes en's cells), the
    // exact cosine runs ONCE per candidate pair, and the mutual join
    // runs on node-sized argmax tables. The one plan in the r8 battery
    // that was still cartesian-at-scale, replaced; recall vs the brute
    // tier is measured in MutualNnSpec (full-probe == q195 exactly).
    // Fixed hash-derived centroids make the whole pipeline — cell
    // sort, probe sets, candidate union, mutual argmax — replayable
    // CTE-for-CTE in DuckDB.
    Q("q206_bitext_ann",
      (s, d) => {
        val emb = T.embeddings(s, d).join(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          col("vec_id") === col("doc_id"))
        val en = emb.filter(col("lang") === "en")
          .select(col("vec_id"), col("embedding"))
        val xx = emb.filter(col("lang") =!= "en")
          .select(col("vec_id"), col("embedding"))
        Similarity.ivfMutualTop1(en, xx, "vec_id", "embedding",
          nLists = 16, nProbe = 4,
          fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .select(col("l_id").as("en_id"), col("r_id").as("xx_id"),
            round(col("sim"), 6).as("cos"))
          .orderBy(col("en_id"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id, lang,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings JOIN documents ON vec_id = doc_id),
             en AS (SELECT vec_id, emb FROM v WHERE lang = 'en'),
             xx AS (SELECT vec_id, emb FROM v WHERE lang <> 'en'),
             end2 AS (
               SELECT e.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM en e CROSS JOIN clists c),
             xxd2 AS (
               SELECT x.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM xx x CROSS JOIN clists c),
             enp AS (
               SELECT vec_id, cell, rn FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM end2) WHERE rn <= 4),
             xxp AS (
               SELECT vec_id, cell, rn FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM xxd2) WHERE rn <= 4),
             ena AS (SELECT vec_id, cell FROM enp WHERE rn = 1),
             xxa AS (SELECT vec_id, cell FROM xxp WHERE rn = 1),
             cand AS (
               SELECT DISTINCT l_id, r_id FROM (
                 SELECT p.vec_id AS l_id, a.vec_id AS r_id
                 FROM enp p JOIN xxa a USING (cell)
                 UNION ALL
                 SELECT a.vec_id AS l_id, p.vec_id AS r_id
                 FROM xxp p JOIN ena a USING (cell))),
             sims AS (
               SELECT cand.l_id, cand.r_id,
                 list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb))) AS sim
               FROM cand
               JOIN en a ON a.vec_id = cand.l_id
               JOIN xx b ON b.vec_id = cand.r_id),
             l2r AS (
               SELECT l_id, r_id, sim FROM (
                 SELECT l_id, r_id, sim, row_number() OVER (
                   PARTITION BY l_id ORDER BY sim DESC, r_id) AS rn
                 FROM sims) WHERE rn = 1),
             r2l AS (
               SELECT l_id, r_id FROM (
                 SELECT l_id, r_id, row_number() OVER (
                   PARTITION BY r_id ORDER BY sim DESC, l_id) AS rn
                 FROM sims) WHERE rn = 1)
             SELECT l.l_id AS en_id, l.r_id AS xx_id,
               round(l.sim, 6) AS cos
             FROM l2r l JOIN r2l USING (l_id, r_id)
             ORDER BY en_id""")),

    // ---- IVF cell-balance diagnostics (Similarity.cellStats): per-cell
    // population of the embedding corpus under the q62 portable
    // centroids — the operational report that tunes nProbe/beamWidth
    // and triggers centroid re-training (a hot cell = per-probe
    // candidate blowup; an empty cell = wasted beam fan-out). One
    // narrow argmin pass + one map-side-combined groupBy; every cell
    // 0..15 present (empties at 0), exact integer permille.
    Q("q208_cell_balance",
      (s, d) => Similarity.cellStats(T.embeddings(s, d), "vec_id",
        "embedding", Similarity.portableCentroids(16, 64))
        .orderBy(col("cell")),
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             d2s AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             assign AS (
               SELECT vec_id, cell FROM (
                 SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) AS rn
                 FROM d2s) WHERE rn = 1),
             counts AS (
               SELECT cell, CAST(count(*) AS BIGINT) AS n
               FROM assign GROUP BY cell),
             tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM counts)
             SELECT r.cell, coalesce(c.n, 0) AS n_vectors,
               (coalesce(c.n, 0) * 1000) // tot.tot AS share_permille
             FROM (SELECT CAST(cell AS INT) AS cell
                   FROM range(16) t(cell)) r
             LEFT JOIN counts c USING (cell)
             CROSS JOIN tot
             ORDER BY r.cell""")),

    // ---- MARGIN-scored bitext mining (Similarity.marginMutualTop1;
    // Artetxe & Schwenk 2019 — the actual CCMatrix/LASER selection
    // criterion): q206's candidate pairs rescored by the margin
    // cos/(avg_k/2 + avg_k/2), killing the hub false-positives raw
    // cosine over-accepts, then mutual-argmax BY MARGIN. Exactness
    // plumbing for the hash compare: nano-quantized cosines, integer
    // top-k sums, one IEEE division of int64 cross-products per pair.
    Q("q209_bitext_margin",
      (s, d) => {
        val emb = T.embeddings(s, d).join(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          col("vec_id") === col("doc_id"))
        val en = emb.filter(col("lang") === "en")
          .select(col("vec_id"), col("embedding"))
        val xx = emb.filter(col("lang") =!= "en")
          .select(col("vec_id"), col("embedding"))
        Similarity.marginMutualTop1(en, xx, "vec_id", "embedding",
          k = 4, nLists = 16, nProbe = 4,
          fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .select(col("l_id").as("en_id"), col("r_id").as("xx_id"),
            col("margin"))
          .orderBy(col("en_id"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id, lang,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings JOIN documents ON vec_id = doc_id),
             en AS (SELECT vec_id, emb FROM v WHERE lang = 'en'),
             xx AS (SELECT vec_id, emb FROM v WHERE lang <> 'en'),
             end2 AS (
               SELECT e.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM en e CROSS JOIN clists c),
             xxd2 AS (
               SELECT x.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM xx x CROSS JOIN clists c),
             enp AS (
               SELECT vec_id, cell, rn FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM end2) WHERE rn <= 4),
             xxp AS (
               SELECT vec_id, cell, rn FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM xxd2) WHERE rn <= 4),
             ena AS (SELECT vec_id, cell FROM enp WHERE rn = 1),
             xxa AS (SELECT vec_id, cell FROM xxp WHERE rn = 1),
             cand AS (
               SELECT DISTINCT l_id, r_id FROM (
                 SELECT p.vec_id AS l_id, a.vec_id AS r_id
                 FROM enp p JOIN xxa a USING (cell)
                 UNION ALL
                 SELECT a.vec_id AS l_id, p.vec_id AS r_id
                 FROM xxp p JOIN ena a USING (cell))),
             sims AS (
               SELECT cand.l_id, cand.r_id,
                 CAST(round(1000000000 * list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb)))) AS BIGINT)
                   AS sim_n
               FROM cand
               JOIN en a ON a.vec_id = cand.l_id
               JOIN xx b ON b.vec_id = cand.r_id),
             rk AS (
               SELECT l_id, r_id, sim_n,
                 row_number() OVER (PARTITION BY l_id
                   ORDER BY sim_n DESC, r_id) AS rkl,
                 row_number() OVER (PARTITION BY r_id
                   ORDER BY sim_n DESC, l_id) AS rkr
               FROM sims),
             al AS (SELECT l_id, CAST(sum(sim_n) AS BIGINT) AS suml,
                      CAST(count(*) AS BIGINT) AS cl
                    FROM rk WHERE rkl <= 4 GROUP BY l_id),
             ar AS (SELECT r_id, CAST(sum(sim_n) AS BIGINT) AS sumr,
                      CAST(count(*) AS BIGINT) AS cr
                    FROM rk WHERE rkr <= 4 GROUP BY r_id),
             mg AS (
               SELECT rk.l_id, rk.r_id,
                 CAST(rk.sim_n * 2 * al.cl * ar.cr AS DOUBLE) /
                   CAST(al.suml * ar.cr + ar.sumr * al.cl AS DOUBLE)
                   AS margin
               FROM rk JOIN al USING (l_id) JOIN ar USING (r_id)
               WHERE al.suml * ar.cr + ar.sumr * al.cl > 0),
             l2m AS (
               SELECT l_id, r_id, margin FROM (
                 SELECT l_id, r_id, margin, row_number() OVER (
                   PARTITION BY l_id ORDER BY margin DESC, r_id) AS rn
                 FROM mg) WHERE rn = 1),
             r2m AS (
               SELECT l_id, r_id FROM (
                 SELECT l_id, r_id, row_number() OVER (
                   PARTITION BY r_id ORDER BY margin DESC, l_id) AS rn
                 FROM mg) WHERE rn = 1)
             SELECT l.l_id AS en_id, l.r_id AS xx_id,
               round(l.margin, 6) AS margin
             FROM l2m l JOIN r2m USING (l_id, r_id)
             ORDER BY en_id""")),

    // ---- BEAM-navigated bitext mining (Similarity.ivfMutualTop1Beam):
    // q206's mutual-top-1 with assignment and probing from the q181
    // centroid-graph walk instead of the dense d2-to-every-centroid
    // pass — the variant that exists for PRODUCTION cell counts
    // (nLists ∝ corpus at the CCMatrix operating point, where the dense
    // assignment is O(n·nLists) ≈ quadratic; the walk touches
    // O(entry + beam·degree·depth) centroids per vector, independent of
    // nLists). Every step deterministic (fixed entry cells, in-order
    // double d2, integer tie-breaks), so the oracle replays BOTH sides'
    // navigation — entry beam, two expand-and-prune rounds, final
    // probe/assign ranking — plus the candidate union and mutual argmax,
    // CTE-for-CTE. Recall vs the dense path is pinned in MutualNnSpec
    // (full-connectivity == dense exactly; pruned recall on the
    // clustered fixture).
    Q("q210_bitext_beam",
      (s, d) => {
        val emb = T.embeddings(s, d).join(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          col("vec_id") === col("doc_id"))
        val en = emb.filter(col("lang") === "en")
          .select(col("vec_id"), col("embedding"))
        val xx = emb.filter(col("lang") =!= "en")
          .select(col("vec_id"), col("embedding"))
        Similarity.ivfMutualTop1Beam(en, xx, "vec_id", "embedding",
          nLists = 16, nProbe = 4, beamWidth = 4, depth = 2, degree = 3,
          entryCells = 2,
          fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .select(col("l_id").as("en_id"), col("r_id").as("xx_id"),
            round(col("sim"), 6).as("cos"))
          .orderBy(col("en_id"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id, lang,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings JOIN documents ON vec_id = doc_id),
             en AS (SELECT vec_id, emb FROM v WHERE lang = 'en'),
             xx AS (SELECT vec_id, emb FROM v WHERE lang <> 'en'),
             cd AS (
               SELECT a.cell AS src, b.cell AS dst,
                 list_inner_product(
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]),
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]))
                   AS d2
               FROM clists a CROSS JOIN clists b WHERE a.cell <> b.cell),
             nbr AS (
               SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY d2, dst) AS rn FROM cd) WHERE rn <= 3),
             end2 AS (
               SELECT e.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM en e CROSS JOIN clists c),
             xxd2 AS (
               SELECT x.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM xx x CROSS JOIN clists c),
             eb0 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT vec_id, cell, d2, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM end2 WHERE cell < 2) WHERE rn <= 4),
             ee1 AS (
               SELECT DISTINCT vec_id, cell FROM (
                 SELECT b.vec_id, n.dst AS cell FROM eb0 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT vec_id, cell FROM eb0)),
             eb1 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT e.vec_id, e.cell, end2.d2, row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY end2.d2, e.cell) AS rn
                 FROM ee1 e JOIN end2 ON end2.vec_id = e.vec_id
                   AND end2.cell = e.cell)
               WHERE rn <= 4),
             ee2 AS (
               SELECT DISTINCT vec_id, cell FROM (
                 SELECT b.vec_id, n.dst AS cell FROM eb1 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT vec_id, cell FROM eb1)),
             eb2 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT e.vec_id, e.cell, end2.d2, row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY end2.d2, e.cell) AS rn
                 FROM ee2 e JOIN end2 ON end2.vec_id = e.vec_id
                   AND end2.cell = e.cell)
               WHERE rn <= 4),
             enp AS (
               SELECT vec_id, cell, row_number() OVER (
                 PARTITION BY vec_id ORDER BY d2, cell) AS rn
               FROM eb2),
             ena AS (SELECT vec_id, cell FROM enp WHERE rn = 1),
             xb0 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT vec_id, cell, d2, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM xxd2 WHERE cell < 2) WHERE rn <= 4),
             xe1 AS (
               SELECT DISTINCT vec_id, cell FROM (
                 SELECT b.vec_id, n.dst AS cell FROM xb0 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT vec_id, cell FROM xb0)),
             xb1 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT e.vec_id, e.cell, xxd2.d2, row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY xxd2.d2, e.cell) AS rn
                 FROM xe1 e JOIN xxd2 ON xxd2.vec_id = e.vec_id
                   AND xxd2.cell = e.cell)
               WHERE rn <= 4),
             xe2 AS (
               SELECT DISTINCT vec_id, cell FROM (
                 SELECT b.vec_id, n.dst AS cell FROM xb1 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT vec_id, cell FROM xb1)),
             xb2 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT e.vec_id, e.cell, xxd2.d2, row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY xxd2.d2, e.cell) AS rn
                 FROM xe2 e JOIN xxd2 ON xxd2.vec_id = e.vec_id
                   AND xxd2.cell = e.cell)
               WHERE rn <= 4),
             xxp AS (
               SELECT vec_id, cell, row_number() OVER (
                 PARTITION BY vec_id ORDER BY d2, cell) AS rn
               FROM xb2),
             xxa AS (SELECT vec_id, cell FROM xxp WHERE rn = 1),
             cand AS (
               SELECT DISTINCT l_id, r_id FROM (
                 SELECT p.vec_id AS l_id, a.vec_id AS r_id
                 FROM (SELECT vec_id, cell FROM enp WHERE rn <= 4) p
                 JOIN xxa a USING (cell)
                 UNION ALL
                 SELECT a.vec_id AS l_id, p.vec_id AS r_id
                 FROM (SELECT vec_id, cell FROM xxp WHERE rn <= 4) p
                 JOIN ena a USING (cell))),
             sims AS (
               SELECT cand.l_id, cand.r_id,
                 list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb))) AS sim
               FROM cand
               JOIN en a ON a.vec_id = cand.l_id
               JOIN xx b ON b.vec_id = cand.r_id),
             l2r AS (
               SELECT l_id, r_id, sim FROM (
                 SELECT l_id, r_id, sim, row_number() OVER (
                   PARTITION BY l_id ORDER BY sim DESC, r_id) AS rn
                 FROM sims) WHERE rn = 1),
             r2l AS (
               SELECT l_id, r_id FROM (
                 SELECT l_id, r_id, row_number() OVER (
                   PARTITION BY r_id ORDER BY sim DESC, l_id) AS rn
                 FROM sims) WHERE rn = 1)
             SELECT l.l_id AS en_id, l.r_id AS xx_id,
               round(l.sim, 6) AS cos
             FROM l2r l JOIN r2l USING (l_id, r_id)
             ORDER BY en_id""")),


    // ---- Margin-RANKED bitext candidates (Similarity.marginTopK):
    // the thresholded-mining face of q209's margin criterion — CCMatrix
    // keeps every pair above a margin cut, not only mutual argmaxes,
    // and ranked per-source lists feed threshold calibration and human
    // review. Same cell-bounded candidates, same nano-quantized margin
    // arithmetic and denominator guard; ONE rank window (partitioned by
    // the English side, fan-in probe-bounded) replaces the mutual
    // argmax join. Top-3 per English doc.
    Q("q211_bitext_rank",
      (s, d) => {
        val emb = T.embeddings(s, d).join(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          col("vec_id") === col("doc_id"))
        val en = emb.filter(col("lang") === "en")
          .select(col("vec_id"), col("embedding"))
        val xx = emb.filter(col("lang") =!= "en")
          .select(col("vec_id"), col("embedding"))
        Similarity.marginTopK(en, xx, "vec_id", "embedding",
          k = 4, topK = 3, nLists = 16, nProbe = 4,
          fixedCentroids = Some(Similarity.portableCentroids(16, 64)))
          .select(col("l_id").as("en_id"), col("r_id").as("xx_id"),
            col("rank"), col("margin"))
          .orderBy(col("en_id"), col("rank"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id, lang,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings JOIN documents ON vec_id = doc_id),
             en AS (SELECT vec_id, emb FROM v WHERE lang = 'en'),
             xx AS (SELECT vec_id, emb FROM v WHERE lang <> 'en'),
             end2 AS (
               SELECT e.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM en e CROSS JOIN clists c),
             xxd2 AS (
               SELECT x.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM xx x CROSS JOIN clists c),
             enp AS (
               SELECT vec_id, cell, rn FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM end2) WHERE rn <= 4),
             xxp AS (
               SELECT vec_id, cell, rn FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM xxd2) WHERE rn <= 4),
             ena AS (SELECT vec_id, cell FROM enp WHERE rn = 1),
             xxa AS (SELECT vec_id, cell FROM xxp WHERE rn = 1),
             cand AS (
               SELECT DISTINCT l_id, r_id FROM (
                 SELECT p.vec_id AS l_id, a.vec_id AS r_id
                 FROM enp p JOIN xxa a USING (cell)
                 UNION ALL
                 SELECT a.vec_id AS l_id, p.vec_id AS r_id
                 FROM xxp p JOIN ena a USING (cell))),
             sims AS (
               SELECT cand.l_id, cand.r_id,
                 CAST(round(1000000000 * list_inner_product(a.emb, b.emb) /
                   (sqrt(list_inner_product(a.emb, a.emb)) *
                    sqrt(list_inner_product(b.emb, b.emb)))) AS BIGINT)
                   AS sim_n
               FROM cand
               JOIN en a ON a.vec_id = cand.l_id
               JOIN xx b ON b.vec_id = cand.r_id),
             rk AS (
               SELECT l_id, r_id, sim_n,
                 row_number() OVER (PARTITION BY l_id
                   ORDER BY sim_n DESC, r_id) AS rkl,
                 row_number() OVER (PARTITION BY r_id
                   ORDER BY sim_n DESC, l_id) AS rkr
               FROM sims),
             al AS (SELECT l_id, CAST(sum(sim_n) AS BIGINT) AS suml,
                      CAST(count(*) AS BIGINT) AS cl
                    FROM rk WHERE rkl <= 4 GROUP BY l_id),
             ar AS (SELECT r_id, CAST(sum(sim_n) AS BIGINT) AS sumr,
                      CAST(count(*) AS BIGINT) AS cr
                    FROM rk WHERE rkr <= 4 GROUP BY r_id),
             mg AS (
               SELECT rk.l_id, rk.r_id,
                 CAST(rk.sim_n * 2 * al.cl * ar.cr AS DOUBLE) /
                   CAST(al.suml * ar.cr + ar.sumr * al.cl AS DOUBLE)
                   AS margin
               FROM rk JOIN al USING (l_id) JOIN ar USING (r_id)
               WHERE al.suml * ar.cr + ar.sumr * al.cl > 0)
             SELECT l_id AS en_id, r_id AS xx_id, CAST(rank AS INT) AS rank,
               round(margin, 6) AS margin
             FROM (
               SELECT l_id, r_id, margin, row_number() OVER (
                 PARTITION BY l_id ORDER BY margin DESC, r_id) AS rank
               FROM mg)
             WHERE rank <= 3
             ORDER BY en_id, rank""")),

    // ---- Distributed navigation-graph build + table-metadata beam
    // assignment (Similarity.buildNavGraph / beamAssignWithGraph — the
    // VERDICT r10 #1 closure): the centroid nav graph is built IN-ENGINE
    // (exact pair-join tier + the Kleinberg rank ladder: out-links at
    // ranks 1..3 plus 6 and 12 of the per-src (d2, dst) ranking), then
    // the embeddings table is beam-assigned over that graph with the
    // driver holding only the 2 entry vectors — nothing driver-side
    // scales with the cell count. Output is the per-cell occupancy (the
    // cellStats pre-flight face). The oracle replays the ENTIRE thing
    // CTE-for-CTE: md5 centroid synthesis, the cross-join ranking with
    // the ladder filter, the 2-round walk, the final assignment, the
    // rollup.
    Q("q225_nav_graph_assign",
      (s, d) => {
        val cents = Similarity.portableCentroids(24, 64)
        val centDf = s.createDataFrame(
          cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
          .toDF("cell", "centroid")
        // Pinned: beamWalk broadcasts the nav frame once PER ROUND —
        // unpinned, each broadcast re-runs the nLists² build (harmless
        // at 24 cells, ruinous at the 10⁵-cell tier this query is the
        // exemplar for; navFrames pins for the same reason).
        val nav = graft.operators.CacheScope.pin(
          Similarity.buildNavGraph(centDf, degree = 3, longLinks = 2))
        Similarity.beamAssignWithGraph(T.embeddings(s, d), "vec_id",
          "embedding", centDf, nav, beamWidth = 4, depth = 2,
          entryCells = 2)
          .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
          .orderBy(col("cell"))
      },
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(24) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             v AS (
               SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             cd AS (
               SELECT a.cell AS src, b.cell AS dst,
                 list_inner_product(
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]),
                   list_transform(range(1, 65), i -> a.cvec[i] - b.cvec[i]))
                   AS d2
               FROM clists a CROSS JOIN clists b WHERE a.cell <> b.cell),
             nbr AS (
               SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY d2, dst) AS rn FROM cd)
               WHERE rn <= 3 OR rn IN (6, 12)),
             vd2 AS (
               SELECT v.vec_id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM v CROSS JOIN clists c),
             b0 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT vec_id, cell, d2, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM vd2 WHERE cell < 2) WHERE rn <= 4),
             e1 AS (
               SELECT DISTINCT vec_id, cell FROM (
                 SELECT b.vec_id, n.dst AS cell FROM b0 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT vec_id, cell FROM b0)),
             b1 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT e.vec_id, e.cell, vd2.d2, row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY vd2.d2, e.cell) AS rn
                 FROM e1 e JOIN vd2 ON vd2.vec_id = e.vec_id
                   AND vd2.cell = e.cell)
               WHERE rn <= 4),
             e2 AS (
               SELECT DISTINCT vec_id, cell FROM (
                 SELECT b.vec_id, n.dst AS cell FROM b1 b
                 JOIN nbr n ON b.cell = n.src
                 UNION ALL SELECT vec_id, cell FROM b1)),
             b2 AS (
               SELECT vec_id, cell, d2 FROM (
                 SELECT e.vec_id, e.cell, vd2.d2, row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY vd2.d2, e.cell) AS rn
                 FROM e2 e JOIN vd2 ON vd2.vec_id = e.vec_id
                   AND vd2.cell = e.cell)
               WHERE rn <= 4),
             asg AS (
               SELECT vec_id, cell FROM (
                 SELECT vec_id, cell, row_number() OVER (
                   PARTITION BY vec_id ORDER BY d2, cell) AS rn
                 FROM b2) WHERE rn = 1)
             SELECT cell, count(*) AS n_vectors
             FROM asg GROUP BY cell ORDER BY cell""")),

    // ---- Length-distribution matching weights: per (lang, length
    // bucket) resampling weight that reshapes every language's length
    // distribution onto ENGLISH's — the length-bias correction a
    // multilingual mix applies so a length-quality confound doesn't
    // masquerade as a language signal (the DSIR/importance-weighting
    // idea at the cheap, auditable bucket grain). w = target share /
    // current share; buckets English lacks get weight 0. Exact integer
    // counts off ONE groupBy; the weight is the only float, computed
    // once per O(langs·buckets) cell.
    Q("q193_length_match_weights",
      (s, d) => {
        val b = T.documents(s, d).select(col("lang"),
          expr("length(text) div 200").as("lb"))
        val cell = b.groupBy(col("lang"), col("lb"))
          .agg(count(lit(1)).as("n"))
        val langTot = cell.groupBy(col("lang")).agg(sum(col("n")).as("lt"))
        val en = cell.filter(col("lang") === "en")
          .select(col("lb"), col("n").as("en_b"))
        val enTot = en.agg(sum(col("en_b")).as("et"))
        cell.join(broadcast(langTot), "lang")
          .join(broadcast(en), Seq("lb"), "left")
          .crossJoin(broadcast(enTot))
          .withColumn("weight", round(
            (coalesce(col("en_b"), lit(0L)).cast("double") / col("et")) /
            (col("n").cast("double") / col("lt")), 6))
          .select(col("lang"), col("lb"), col("n"), col("weight"))
          .orderBy(col("lang"), col("lb"))
      },
      Some("""WITH cell AS (
               SELECT lang, length(text) // 200 AS lb,
                 CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY 1, 2),
             lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lt
                    FROM cell GROUP BY lang),
             en AS (SELECT lb, n AS en_b FROM cell WHERE lang = 'en'),
             et AS (SELECT CAST(sum(en_b) AS BIGINT) AS et FROM en)
             SELECT cell.lang, cell.lb, cell.n,
               round((CAST(coalesce(en.en_b, 0) AS DOUBLE) / et.et) /
                 (CAST(cell.n AS DOUBLE) / lt.lt), 6) AS weight
             FROM cell JOIN lt USING (lang)
             LEFT JOIN en ON cell.lb = en.lb
             CROSS JOIN et
             ORDER BY cell.lang, cell.lb""")),

    // ---- EXACT suffix-array-grade duplicated spans (SuffixDedup): the
    // hash-free, occurrence-counted (within-doc repeats included) form of
    // q77 — global range sort of the 10-token-truncated suffixes +
    // adjacent-run scan with the O(P) boundary stitch; the union of
    // duplicated windows equals the suffix-array + LCP ≥ 10 position set
    // exactly (lemma in SuffixDedup's scaladoc). Oracle is definitional:
    // occurrence counts over the raw (unhashed) window strings — the hash
    // compare proves the distributed sort + stitch against the semantics,
    // not against another implementation of itself.
    Q("q179_exact_spans",
      (s, d) => graft.operators.SuffixDedup.duplicateSpans(
        T.documents(s, d), "doc_id", "text", minLen = 10)
        .select(col("id").as("doc_id"),
          col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"),
          col("n_windows")),
      Some(ExactSpanSql + """
        SELECT id AS doc_id, CAST(min(ti) AS BIGINT) AS span_start,
          CAST(max(ti) + 10 AS BIGINT) AS span_end,
          count(*) AS n_windows
        FROM grp GROUP BY id, g""")),

    // ---- EXACT keep-first-occurrence removal (SuffixDedup, the Lee et
    // al. dedup ACTION on top of q179's detection): every duplicated
    // 10-token window's (id, ti)-minimal occurrence survives; later
    // occurrences — same-doc repeats included — drop their covered
    // tokens. On the Spark side "later occurrence" is just "equals its
    // sorted predecessor" (the suffix sort tie-breaks by (id, ti)); the
    // oracle computes the canonical occurrence definitionally per window
    // key, so the hash proves that identification is exact.
    Q("q182_exact_span_removal",
      (s, d) => graft.operators.SuffixDedup.removeDuplicateSpans(
        T.documents(s, d), "doc_id", "text", minLen = 10)
        .withColumnRenamed("id", "doc_id"),
      Some(ExactWinsSql + """,
        dupc AS (
          SELECT sfx, id AS cid, ti AS cti FROM (
            SELECT sfx, id, ti,
              row_number() OVER (PARTITION BY sfx ORDER BY id, ti) AS rn,
              count(*) OVER (PARTITION BY sfx) AS cnt
            FROM wins) WHERE rn = 1 AND cnt >= 2),
        covered AS (
          SELECT DISTINCT w.id, r.xti AS ti
          FROM wins w JOIN dupc d USING (sfx),
               LATERAL (SELECT unnest(range(w.ti, w.ti + 10)) AS xti) r
          WHERE NOT (w.id = d.cid AND w.ti = d.cti)),
        kept AS (
          SELECT t.id, t.ti, t.tok FROM rtoks t
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.id = t.id AND c.ti = t.ti)),
        cleaned AS (
          SELECT id, string_agg(tok, ' ' ORDER BY ti) AS clean_text,
            count(*) AS n_tokens_kept
          FROM kept GROUP BY id),
        totals AS (SELECT id, count(*) AS n_tokens FROM rtoks GROUP BY id)
        SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text,
          CAST(coalesce(c.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
          CAST(coalesce(t.n_tokens, 0) - coalesce(c.n_tokens_kept, 0) AS BIGINT)
            AS n_tokens_dropped
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN totals t ON t.id = d.doc_id
        LEFT JOIN cleaned c ON c.id = d.doc_id""")),

    // ---- TWO-TIER exact span dedup (SuffixDedup.tieredDuplicateSpans):
    // the composed 100 TB shape q179's scaladoc promises, executed —
    // SpanDedup's hashed rolling-window pass (md5 digests, occurrence-
    // counted) flags candidate starts, and the exact suffix sort runs
    // ONLY over the flagged neighborhoods. The oracle is the same
    // DEFINITIONAL occurrence-count semantics as q179 (at minLen = 8
    // here): hashing inside the composition is collision-PROOF — md5
    // equality never misses a true duplicate (every equal-suffix run
    // enters the exact tier intact) and collision false-positives find
    // no equal neighbor in the sort — so composed == exact-over-corpus,
    // which is precisely what this hash compare proves.
    Q("q207_tiered_spans",
      (s, d) => graft.operators.SuffixDedup.tieredDuplicateSpans(
        T.documents(s, d), "doc_id", "text", minLen = 8)
        .select(col("id").as("doc_id"),
          col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"),
          col("n_windows")),
      Some(exactSpanSql(8) + """
        SELECT id AS doc_id, CAST(min(ti) AS BIGINT) AS span_start,
          CAST(max(ti) + 8 AS BIGINT) AS span_end,
          count(*) AS n_windows
        FROM grp GROUP BY id, g""")),

    // ---- Incremental span probe (SpanDedup.probeSpans): spans of a
    // BATCH (doc_id % 10 = 7) that duplicate CORPUS text (the rest),
    // probed against the stored corpus window-digest artifact — 16 B per
    // distinct window, the band-table discipline applied to spans, so a
    // new crawl batch costs O(batch tokens) no matter how big the
    // corpus is. The decontamination-shaped face of q77 (q71/q170 test
    // membership of whole shingles; this localizes WHERE the overlap
    // sits inside each batch doc).
    Q("q186_span_probe",
      (s, d) => {
        val docs = T.documents(s, d)
        val corpus = docs.filter(col("doc_id") % 10 =!= 7)
        val batch = docs.filter(col("doc_id") % 10 === 7)
        val art = SpanDedup.corpusWindowDigests(corpus, "doc_id", "text",
          window = 10)
        SpanDedup.probeSpans(batch, "doc_id", "text", art, window = 10)
          .select(col("id").as("doc_id"),
            col("span_start").cast("long").as("span_start"),
            col("span_end").cast("long").as("span_end"),
            col("n_windows"))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some(ProbeSpanSql)),

    // ---- Per-document contamination score (the q186 spans rolled up to
    // the filtering decision): for every BATCH doc, covered-token count,
    // contamination permille, and longest overlapping run — the exact
    // per-doc statistic a "drop if > x% benchmark overlap" gate consumes
    // (WIMBD-style overlap accounting). Spans are disjoint maximal by
    // construction, so Σ(span_end − span_start) IS the covered-token
    // count; integer permille, no floats.
    Q("q194_contamination_score",
      (s, d) => {
        val docs = T.documents(s, d)
        val corpus = docs.filter(col("doc_id") % 10 =!= 7)
        val batch = docs.filter(col("doc_id") % 10 === 7)
        val art = SpanDedup.corpusWindowDigests(corpus, "doc_id", "text",
          window = 10)
        val spans = SpanDedup.probeSpans(batch, "doc_id", "text", art,
            window = 10)
          .groupBy(col("id"))
          .agg(sum(col("span_end") - col("span_start")).as("covered"),
            max(col("span_end") - col("span_start")).as("max_span"),
            count(lit(1)).as("n_spans"))
        batch.select(col("doc_id"),
            size(filter(split(col("text"), "\\s+"), t => t =!= lit("")))
              .cast("long").as("n_tokens"))
          .join(spans.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .na.fill(0L, Seq("covered", "max_span", "n_spans"))
          .withColumn("contamination_pm",
            expr("CASE WHEN n_tokens > 0 THEN covered * 1000 div n_tokens " +
              "ELSE CAST(0 AS BIGINT) END"))
          .select(col("doc_id"), col("n_tokens"), col("covered"),
            col("max_span"), col("n_spans"), col("contamination_pm"))
          .orderBy(col("doc_id"))
      },
      Some(ProbeSpanCtes + """,
        spans AS (
          SELECT id, CAST(min(ti) AS BIGINT) AS span_start,
            CAST(max(ti) + 10 AS BIGINT) AS span_end
          FROM grp GROUP BY id, g),
        per_doc AS (
          SELECT id, CAST(sum(span_end - span_start) AS BIGINT) AS covered,
            CAST(max(span_end - span_start) AS BIGINT) AS max_span,
            CAST(count(*) AS BIGINT) AS n_spans
          FROM spans GROUP BY id),
        totals AS (
          SELECT id, CAST(count(*) AS BIGINT) AS n_tokens
          FROM rtoks WHERE id % 10 = 7 GROUP BY id)
        SELECT t.id AS doc_id, t.n_tokens,
          coalesce(p.covered, 0) AS covered,
          coalesce(p.max_span, 0) AS max_span,
          coalesce(p.n_spans, 0) AS n_spans,
          CAST(CASE WHEN t.n_tokens > 0
            THEN coalesce(p.covered, 0) * 1000 // t.n_tokens
            ELSE 0 END AS BIGINT) AS contamination_pm
        FROM totals t LEFT JOIN per_doc p ON t.id = p.id
        ORDER BY doc_id""")),

    // ---- Duplicate-span REMOVAL, keep-first-occurrence: the canonical
    // holder of each duplicate window (min doc id) keeps its text; every
    // other doc drops the covered tokens and is reassembled in order.
    Q("q78_span_removal",
      (s, d) => graft.operators.SpanDedup.removeDuplicateSpans(
        T.documents(s, d), "doc_id", "text", window = 10, minDf = 2)
        .withColumnRenamed("id", "doc_id"),
      Some(SpanSql + """,
        dupc AS (
          SELECT wkey, min(id) AS canonical FROM wins
          GROUP BY wkey HAVING count(DISTINCT id) >= 2),
        covered AS (
          SELECT DISTINCT w.id, r.cti AS ti
          FROM wins w JOIN dupc d USING (wkey),
               LATERAL (SELECT unnest(range(w.ti, w.ti + 10)) AS cti) r
          WHERE w.id <> d.canonical),
        kept AS (
          SELECT t.id, t.ti, t.tok FROM rtoks t
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.id = t.id AND c.ti = t.ti)),
        cleaned AS (
          SELECT id, string_agg(tok, ' ' ORDER BY ti) AS clean_text,
            count(*) AS n_tokens_kept
          FROM kept GROUP BY id),
        totals AS (SELECT id, count(*) AS n_tokens FROM rtoks GROUP BY id)
        SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text,
          CAST(coalesce(c.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
          CAST(coalesce(t.n_tokens, 0) - coalesce(c.n_tokens_kept, 0) AS BIGINT)
            AS n_tokens_dropped
        FROM documents d
        LEFT JOIN totals t ON t.id = d.doc_id
        LEFT JOIN cleaned c ON c.id = d.doc_id""")),

    // ---- SemDeDup-style semantic dedup: cosine near-dup pairs WITHIN
    // Voronoi cells around the q62 portable centroids — one cell per
    // vector, so at scale the corpus partitions by cell and the pair join
    // is partition-local (recall trade: cross-cell pairs missed by
    // design). Assignment + cosine replicate exactly (in-order folds).
    Q("q79_semantic_dedup",
      (s, d) => Similarity.semanticDedup(T.embeddings(s, d),
        "vec_id", "embedding", threshold = 0.3,
        centroids = Similarity.portableCentroids(16, 64))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH cents AS (
               SELECT c.cell, d.dim,
                 (CAST('0x' || substr(md5('c|' || CAST(c.cell AS VARCHAR) ||
                    '|' || CAST(d.dim AS VARCHAR)), 1, 8) AS BIGINT)
                  / 2147483648.0 - 1.0) * 0.25 AS w
               FROM range(16) c(cell) CROSS JOIN range(64) d(dim)),
             clists AS (
               SELECT cell, list(w ORDER BY dim) AS cvec
               FROM cents GROUP BY cell),
             mem AS (
               SELECT vec_id AS id, embedding,
                 min(vec_id) OVER (PARTITION BY embedding) AS rep
               FROM embeddings),
             reps AS (
               SELECT id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM mem WHERE id = rep),
             d2s AS (
               SELECT r.id, c.cell,
                 list_inner_product(
                   list_transform(range(1, 65), i -> emb[i] - cvec[i]),
                   list_transform(range(1, 65), i -> emb[i] - cvec[i])) AS d2
               FROM reps r CROSS JOIN clists c),
             assign AS (
               SELECT id, cell FROM (
                 SELECT id, cell,
                   row_number() OVER (PARTITION BY id
                     ORDER BY d2, cell) AS rn
                 FROM d2s) WHERE rn = 1),
             capped AS (
               SELECT * FROM assign
               QUALIFY count(*) OVER (PARTITION BY cell) BETWEEN 2 AND 1000),
             rep_pairs AS (
               SELECT s.id_a, s.id_b, round(s.cos, 6) AS cosine FROM (
                 SELECT a.id AS id_a, b.id AS id_b,
                   list_inner_product(x.emb, y.emb) /
                     (sqrt(list_inner_product(x.emb, x.emb)) *
                      sqrt(list_inner_product(y.emb, y.emb))) AS cos
                 FROM capped a JOIN capped b USING (cell)
                 JOIN reps x ON x.id = a.id
                 JOIN reps y ON y.id = b.id
                 WHERE a.id < b.id) s
               WHERE s.cos >= 0.3),
             cross_pairs AS (
               SELECT least(ma.id, mb.id) AS id_a,
                 greatest(ma.id, mb.id) AS id_b, p.cosine
               FROM rep_pairs p
               JOIN mem ma ON ma.rep = p.id_a
               JOIN mem mb ON mb.rep = p.id_b),
             within_pairs AS (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(1.0 AS DOUBLE) AS cosine
               FROM mem a JOIN mem b ON a.rep = b.rep AND a.id < b.id)
             SELECT * FROM cross_pairs
             UNION ALL SELECT * FROM within_pairs""")),

    // ---- CCNet-style reference-LM quality score: cross-entropy of each
    // doc under an add-one unigram LM built from a trusted slice (source
    // 'src0' here) — low = looks like the reference, high = junk/outlier;
    // plus the OOV rate. The LM is exactly reproducible on both engines.
    Q("q80_lm_quality",
      (s, d) => {
        val docs = T.documents(s, d)
        TextAnalysis.lmCrossEntropy(
          docs.filter(col("source") =!= "src0"), "doc_id", "text",
          docs.filter(col("source") === "src0"), "text")
          .withColumnRenamed("id", "doc_id")
      },
      Some("""WITH ref_toks AS (
               SELECT tok FROM (
                 SELECT unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents WHERE source = 'src0')
               WHERE tok <> ''),
             lm AS (SELECT tok, count(*) AS c FROM ref_toks GROUP BY tok),
             stats AS (
               SELECT sum(c) AS n_ref, count(*) AS v_ref FROM lm),
             doc_toks AS (
               SELECT doc_id, tok FROM (
                 SELECT doc_id,
                   unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents WHERE source <> 'src0')
               WHERE tok <> ''),
             scored AS (
               SELECT t.doc_id,
                 count(*) AS n_tokens,
                 round(avg(CASE WHEN l.c IS NULL THEN 1.0 ELSE 0.0 END), 6)
                   AS oov_rate,
                 round(-avg(ln((coalesce(l.c, 0) + CAST(1 AS DOUBLE)) /
                   (s.n_ref + s.v_ref + 1))), 6) AS cross_entropy
               FROM doc_toks t
               LEFT JOIN lm l ON l.tok = t.tok
               CROSS JOIN stats s
               GROUP BY t.doc_id)
             SELECT d.doc_id,
               CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
               CASE WHEN s.n_tokens IS NULL THEN 0.0
                    ELSE s.oov_rate END AS oov_rate,
               -- zero-fill ONLY token-less docs (mirror the operator: an
               -- empty REFERENCE must stay NULL, never perfect-0 quality)
               CASE WHEN s.n_tokens IS NULL THEN 0.0
                    ELSE s.cross_entropy END AS cross_entropy
             FROM documents d
             LEFT JOIN scored s ON s.doc_id = d.doc_id
             WHERE d.source <> 'src0'""")),

    // ---- CCNet head/middle/tail bucketing: q80's cross-entropy cut
    // into per-lang terciles (head = closest to the reference LM) — the
    // published CCNet pipeline's quality-stratification stage, and the
    // q108 ntile discipline applied to a model score. Bucket means are
    // micro-int sums (the rounded score is already on a 1e-6 grid) so
    // the per-bucket averages are association-free.
    Q("q129_ccnet_buckets",
      (s, d) => {
        val docs = T.documents(s, d)
        val scored = TextAnalysis.lmCrossEntropy(
          docs.filter(col("source") =!= "src0"), "doc_id", "text",
          docs.filter(col("source") === "src0"), "text")
          .withColumnRenamed("id", "doc_id")
        val withLang = scored.join(
          docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        val byLang = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("cross_entropy"), col("doc_id"))
        withLang
          .withColumn("bucket", ntile(3).over(byLang))
          .withColumn("ce_micro",
            round(col("cross_entropy") * 1e6).cast("long"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            round((sum(col("ce_micro")) / count(lit(1))) / 1e6, 6)
              .as("avg_ce"))
          .orderBy(col("lang"), col("bucket"))
      },
      Some("""WITH ref_toks AS (
               SELECT tok FROM (
                 SELECT unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents WHERE source = 'src0')
               WHERE tok <> ''),
             lm AS (SELECT tok, count(*) AS c FROM ref_toks GROUP BY tok),
             stats AS (
               SELECT sum(c) AS n_ref, count(*) AS v_ref FROM lm),
             doc_toks AS (
               SELECT doc_id, tok FROM (
                 SELECT doc_id,
                   unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents WHERE source <> 'src0')
               WHERE tok <> ''),
             sc AS (
               SELECT t.doc_id,
                 round(-avg(ln((coalesce(l.c, 0) + CAST(1 AS DOUBLE)) /
                   (s.n_ref + s.v_ref + 1))), 6) AS ce
               FROM doc_toks t
               LEFT JOIN lm l ON l.tok = t.tok
               CROSS JOIN stats s
               GROUP BY t.doc_id),
             all_docs AS (
               SELECT d.doc_id, d.lang,
                 CASE WHEN s.ce IS NULL THEN 0.0 ELSE s.ce END AS ce
               FROM documents d
               LEFT JOIN sc s ON s.doc_id = d.doc_id
               WHERE d.source <> 'src0'),
             bucketed AS (
               SELECT lang,
                 CAST(ntile(3) OVER (PARTITION BY lang
                   ORDER BY ce, doc_id) AS INT) AS bucket,
                 CAST(round(ce * 1e6) AS BIGINT) AS ce_micro
               FROM all_docs)
             SELECT lang, bucket, count(*) AS n_docs,
               round((CAST(sum(ce_micro) AS BIGINT) / count(*)) / 1e6, 6)
                 AS avg_ce
             FROM bucketed GROUP BY lang, bucket
             ORDER BY lang, bucket""")),

    // ---- Corpus vocabulary + coverage curve (the frequency-cutoff step
    // before tokenizer/vocab training): top-500 tokens by count (ties →
    // token asc), cumulative coverage of all occurrences at each rank.
    Q("q81_vocabulary",
      (s, d) => TextAnalysis.vocabulary(T.documents(s, d),
        "doc_id", "text", topK = 500),
      Some("""WITH toks AS (
               SELECT tok FROM (
                 SELECT unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents)
               WHERE tok <> ''),
             counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
             total AS (SELECT sum(n) AS total FROM counts),
             ranked AS (
               SELECT tok, n,
                 row_number() OVER (ORDER BY n DESC, tok) AS rank,
                 sum(n) OVER (ORDER BY n DESC, tok
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM counts)
             SELECT CAST(rank AS INT) AS rank, tok, n,
               round(cum / CAST(t.total AS DOUBLE), 6) AS cum_coverage
             FROM ranked CROSS JOIN total t
             WHERE rank <= 500""")),

    // ---- Budgeted corpus selection (data-constrained training): keep the
    // highest-quality docs (distinct-token ratio here; any score plugs in)
    // until a global token budget is exhausted. Spark runs the two-phase
    // histogram plan (driver prefix over ≤1024 bins + boundary-bin window,
    // never a corpus-wide ordered window); DuckDB computes the global
    // greedy directly — the hash compare proves the phases agree, ties
    // pinned by (score desc, id). Distinct-ratio scoring is two-level
    // (id, tok) → id, avoiding the distinct-agg Expand (see q53).
    Q("q82_budget_selection",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id").as("id"),
            explode(split(col("text"), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
        val scored = toks.groupBy(col("id"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("id"))
          .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("nd"))
          .select(col("id"),
            round(col("nd").cast("double") / col("n_tokens"), 6).as("score"),
            col("n_tokens"))
        Curation.selectByTokenBudget(scored, tokenBudget = 20000L)
          .orderBy(col("id"))
      },
      Some("""WITH toks AS (
               SELECT id, tok FROM (
                 SELECT doc_id AS id,
                   unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents)
               WHERE tok <> ''),
             scored AS (
               SELECT id, count(*) AS n_tokens,
                 round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6)
                   AS score
               FROM toks GROUP BY id),
             ordered AS (
               SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, id
                 ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
               FROM scored)
             SELECT id, score, n_tokens FROM ordered
             WHERE cum_before < 20000 ORDER BY id""")),

    // ---- Salted LSH overflow under the hash gate: q43's pipeline with a
    // deliberately tiny bucket cap (2 — sf0.01's largest real buckets
    // hold 3 docs, so they genuinely overflow), and
    // Overflow.SaltWith(portableSalt) instead of dropping them — the
    // whole sub-bucket assignment (ceil(bsz/cap) sub-buckets keyed by the
    // first 8 md5 hex digits of the id) is replicated in DuckDB, proving
    // the bounded-cost recovery path pair-for-pair, not just spec-level.
    Q("q83_salted_neardup",
      (s, d) => Dedup.minhashDedupFromBuild(sharedMd5Build(s, d),
        threshold = 0.05, maxBucket = 2,
        overflow = Dedup.Overflow.SaltWith(Dedup.portableSalt))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH mem AS (
               SELECT doc_id AS id, text,
                 min(doc_id) OVER (PARTITION BY text) AS rep
               FROM documents),
             reps AS (SELECT id, text FROM mem WHERE id = rep),
             toks AS (
               SELECT id, i, tok FROM (
                 SELECT id, unnest(l) AS tok, unnest(range(len(l))) AS i
                 FROM (SELECT id, string_split_regex(text, '\s+') AS l
                       FROM reps))
               WHERE tok <> ''),
             seq AS (
               SELECT id, tok, lead(tok,1) OVER w AS t1,
                 lead(tok,2) OVER w AS t2
               FROM toks WINDOW w AS (PARTITION BY id ORDER BY i)),
             sh AS (
               SELECT DISTINCT id, md5(tok || ' ' || t1 || ' ' || t2) AS shingle
               FROM seq WHERE t2 IS NOT NULL),
             mh AS (
               SELECT id, k, min(md5(CAST(k AS VARCHAR) || '|' || shingle)) AS h
               FROM sh CROSS JOIN range(32) AS t(k) GROUP BY id, k),
             bands AS (
               SELECT id,
                 md5(CAST(k // 4 AS VARCHAR) || '|' ||
                     string_agg(h, '|' ORDER BY k)) AS bh,
                 k // 4 AS band
               FROM mh GROUP BY id, k // 4),
             counts AS (
               SELECT band, bh, count(*) AS bsz FROM bands GROUP BY band, bh),
             salted AS (
               SELECT b.id, b.band, b.bh,
                 CASE WHEN c.bsz <= 2 THEN 0
                   ELSE CAST('0x' || substr(md5(CAST(b.id AS VARCHAR)), 1, 8)
                          AS BIGINT) % ((c.bsz + 1) // 2) END AS bsalt
               FROM bands b JOIN counts c USING (band, bh)
               WHERE c.bsz >= 2),
             cand AS (
               SELECT DISTINCT a.id AS id_a, b.id AS id_b
               FROM salted a JOIN salted b USING (band, bh, bsalt)
               WHERE a.id < b.id),
             est AS (
               SELECT c.id_a, c.id_b,
                 sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) / 32.0
                   AS est_jaccard
               FROM cand c
               JOIN mh x ON x.id = c.id_a
               JOIN mh y ON y.id = c.id_b AND y.k = x.k
               GROUP BY 1, 2),
             sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
             shared AS (
               SELECT c.id_a, c.id_b, count(*) AS shared
               FROM cand c
               JOIN sh a ON a.id = c.id_a
               JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
             rep_pairs AS (
               SELECT e.id_a, e.id_b,
                 round(e.est_jaccard, 6) AS est_jaccard,
                 round(coalesce(s.shared, 0) /
                   (sa.sz + sb.sz - coalesce(s.shared, 0)), 6) AS jaccard
               FROM est e
               LEFT JOIN shared s ON e.id_a = s.id_a AND e.id_b = s.id_b
               JOIN sizes sa ON sa.id = e.id_a
               JOIN sizes sb ON sb.id = e.id_b
               WHERE coalesce(s.shared, 0) /
                 (sa.sz + sb.sz - coalesce(s.shared, 0)) >= 0.05),
             cross_pairs AS (
               SELECT least(ma.id, mb.id) AS id_a,
                 greatest(ma.id, mb.id) AS id_b, p.est_jaccard, p.jaccard
               FROM rep_pairs p
               JOIN mem ma ON ma.rep = p.id_a
               JOIN mem mb ON mb.rep = p.id_b),
             within_pairs AS (
               SELECT a.id AS id_a, b.id AS id_b,
                 CAST(1.0 AS DOUBLE) AS est_jaccard,
                 CAST(1.0 AS DOUBLE) AS jaccard
               FROM mem a JOIN mem b ON a.rep = b.rep AND a.id < b.id)
             SELECT * FROM cross_pairs
             UNION ALL SELECT * FROM within_pairs""")),

    // ---- Temperature mixture resampling (UniMax/mT5 balancing): α = 0.5
    // flattens the language mixture — rare strata sampled at a HIGHER
    // rate than common ones — while the content-hash draw keeps selection
    // deterministic and leakage-safe. Rates round to 6 before the
    // threshold compare (pow/summation last-ULP portability); both
    // engines turn the first 8 md5 hex digits into the same integer.
    Q("q84_temperature_sample",
      (s, d) => Curation.temperatureSample(T.documents(s, d),
        "doc_id", "text", "lang", alpha = 0.5, targetFrac = 0.5)
        .orderBy(col("id")),
      Some("""WITH counts AS (
               SELECT lang AS stratum, count(*) AS n_s
               FROM documents GROUP BY lang),
             tot AS (
               SELECT sum(pow(n_s, 0.5)) AS denom, sum(n_s) AS n_total
               FROM counts),
             rates AS (
               SELECT stratum,
                 round(least(1.0, 0.5 * t.n_total * pow(n_s, -0.5) /
                   t.denom), 6) AS rate
               FROM counts CROSS JOIN tot t)
             SELECT d.doc_id AS id, r.stratum, r.rate
             FROM documents d
             JOIN rates r ON d.lang IS NOT DISTINCT FROM r.stratum
             WHERE CAST('0x' || substr(md5(d.text), 1, 8) AS BIGINT)
               < r.rate * 4294967296
             ORDER BY id""")),

    // ---- Deterministic weighted sampling without replacement
    // (Efraimidis–Spirakis A-ES; Curation.weightedSample): inclusion
    // probability ∝ n_chars via salted hash draws u and top-k on the
    // nano-quantized ln(u)/w key — q72 samples strata at fixed RATES,
    // this draws an exact-size sample BIASED by a per-row weight.
    // Corpus never shuffles (TakeOrderedAndProject top-k).
    Q("q120_weighted_sample",
      (s, d) => Curation.weightedSample(T.documents(s, d),
        "doc_id", "n_chars", k = 25, salt = "s1"),
      Some("""WITH d AS (
               SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
                 CAST('0x' || substr(md5('s1|' || CAST(doc_id AS VARCHAR)),
                   1, 8) AS BIGINT) AS h
               FROM documents WHERE n_chars > 0)
             SELECT id, weight,
               CAST(round(ln((h + 1) / 4294967296.0) / weight * 1e9)
                 AS BIGINT) AS skey
             FROM d ORDER BY skey DESC, id LIMIT 25""")),

    // ---- Per-stratum weighted sampling (q120's draw under a stratum
    // window): k weight-biased winners PER LANG — balanced coverage
    // with in-stratum weight bias, where q72 fixes rates and q120 a
    // global size. One stratum-keyed shuffle.
    Q("q128_grouped_weighted_sample",
      (s, d) => Curation.weightedSampleGrouped(T.documents(s, d),
        "doc_id", "n_chars", "lang", k = 5, salt = "s2")
        .orderBy(col("stratum"), col("rk")),
      Some("""WITH d AS (
               SELECT lang AS stratum, doc_id AS id,
                 CAST(n_chars AS BIGINT) AS weight,
                 CAST('0x' || substr(md5('s2|' || CAST(doc_id AS VARCHAR)),
                   1, 8) AS BIGINT) AS h
               FROM documents WHERE n_chars > 0),
             keyed AS (
               SELECT stratum, id, weight,
                 CAST(round(ln((h + 1) / 4294967296.0) / weight * 1e9)
                   AS BIGINT) AS skey
               FROM d),
             ranked AS (
               SELECT *, CAST(row_number() OVER (PARTITION BY stratum
                 ORDER BY skey DESC, id) AS INT) AS rk
               FROM keyed)
             SELECT stratum, id, weight, skey, rk
             FROM ranked WHERE rk <= 5
             ORDER BY stratum, rk""")),

    // ---- Gopher quality rule set (Rae et al. 2021 appendix A): per-doc
    // structural signals + one 0/1 flag per rule + composite keep. Rules
    // decide by exact integer cross-multiplication (never a float
    // threshold), so both engines agree bit-for-bit; thresholds tuned so
    // the synthetic corpus discriminates on every rule.
    Q("q85_gopher_rules",
      (s, d) => TextAnalysis.gopherRules(T.documents(s, d), "doc_id", "text")
        .orderBy(col("id")),
      Some("""WITH toks AS (
               SELECT id, tok FROM (
                 SELECT doc_id AS id,
                   unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents) WHERE tok <> ''),
             pt AS (SELECT id, tok, count(*) AS c FROM toks GROUP BY id, tok),
             sig AS (
               SELECT id,
                 CAST(sum(c) AS BIGINT) AS n_words,
                 CAST(sum(c * length(tok)) AS BIGINT) AS sum_len,
                 CAST(max(c) AS BIGINT) AS top_c,
                 CAST(sum(CASE WHEN regexp_matches(tok, '[A-Za-z]')
                   THEN c ELSE 0 END) AS BIGINT) AS alpha_c,
                 CAST(sum(CASE WHEN tok IN ('table','row','data','key')
                   THEN 1 ELSE 0 END) AS BIGINT) AS req_hits
               FROM pt GROUP BY id)
             SELECT id, n_words,
               round(CAST(sum_len AS DOUBLE) / n_words, 6) AS mean_word_len,
               round(CAST(top_c AS DOUBLE) / n_words, 6) AS top_tok_frac,
               round(CAST(alpha_c AS DOUBLE) / n_words, 6) AS alpha_frac,
               req_hits,
               CAST(n_words BETWEEN 30 AND 90 AS INT) AS words_ok,
               CAST(sum_len * 10 >= n_words * 42
                 AND sum_len * 10 <= n_words * 50 AS INT) AS mean_len_ok,
               CAST(top_c * 100 <= n_words * 10 AS INT) AS rep_ok,
               CAST(alpha_c * 100 >= n_words * 80 AS INT) AS alpha_ok,
               CAST(req_hits >= 2 AS INT) AS req_ok,
               CAST(n_words BETWEEN 30 AND 90
                 AND sum_len * 10 >= n_words * 42
                 AND sum_len * 10 <= n_words * 50
                 AND top_c * 100 <= n_words * 10
                 AND alpha_c * 100 >= n_words * 80
                 AND req_hits >= 2 AS INT) AS keep
             FROM sig ORDER BY id""")),

    // ---- DSIR importance weights (Xie et al. 2023): hashed-bigram
    // bucket LLR vs the lang='en' target slice, mean LLR per doc, top-100.
    // The md5 bucket hash is the portable-salt recipe (q83/q84); the
    // bucket LLR quantizes to an integer micro-LLR so the per-doc mean is
    // exact integer arithmetic in both engines (see dsirWeights scaladoc).
    Q("q86_dsir_weights",
      (s, d) => Curation.dsirWeights(T.documents(s, d), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 1024, topK = 100)
        .orderBy(col("id")),
      Some("""WITH l AS (
               SELECT doc_id AS id, lang = 'en' AS is_target,
                 list_filter(string_split_regex(text, '\s+'),
                   t -> t <> '') AS toks
               FROM documents),
             bg AS (
               SELECT id, is_target,
                 unnest(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1])) AS bg
               FROM l WHERE len(toks) >= 2),
             bk AS (
               SELECT id, is_target,
                 CAST('0x' || substr(md5(bg), 1, 8) AS BIGINT) % 1024
                   AS bucket
               FROM bg),
             bc AS (
               SELECT bucket, count(*) AS c_raw,
                 sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
               FROM bk GROUP BY bucket),
             tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt
               FROM bc),
             llr AS (
               SELECT bucket, CAST(round(ln(
                 (CAST(c_tgt + 1 AS DOUBLE) / CAST(t.t_tgt + 1024 AS DOUBLE)) /
                 (CAST(c_raw + 1 AS DOUBLE) / CAST(t.t_raw + 1024 AS DOUBLE)))
                 * 1000000) AS BIGINT) AS illr
               FROM bc CROSS JOIN tot t),
             w AS (
               SELECT bk.id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 round(CAST(sum(l2.illr) AS DOUBLE) / count(*) / 1000000, 6)
                   AS weight
               FROM bk JOIN llr l2 USING (bucket) GROUP BY bk.id)
             SELECT id, n_bigrams, weight, CAST(rank AS INT) AS rank FROM (
               SELECT *, row_number() OVER (ORDER BY weight DESC, id)
                 AS rank
               FROM w)
             WHERE rank <= 100 ORDER BY id""")),

    // ---- Model-based quality filter (FineWeb-Edu / fastText-style): a
    // fixed linear probe over the embedding column, sigmoid score, keep
    // score >= 0.5. Weights derive from a Knuth-hash integer recipe with
    // 3 decimal digits — the identical double literal in both engines —
    // and the score rounds to 6 before the threshold (libm exp ULPs).
    Q("q87_probe_filter",
      (s, d) => Similarity.linearProbeScore(T.embeddings(s, d), "vec_id",
        "embedding", ProbeWeights)
        .filter(col("score") >= 0.5).orderBy(col("id")),
      Some(s"""WITH v AS (
               SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings)
             SELECT id, score FROM (
               SELECT id, round(1.0 / (1.0 +
                 exp(-(list_inner_product(emb, $probeWeightsSql)))), 6)
                 AS score
               FROM v)
             WHERE score >= 0.5 ORDER BY id""")),

    // ---- Calibration audit of the q87 probe classifier (reliability
    // table + Expected Calibration Error): before a 100 TB corpus is
    // FILTERED by a classifier score, the score must mean what it says —
    // per equal-width confidence bin, predicted confidence vs empirical
    // positive rate (label: declared lang = 'en', the probe's target),
    // and each bin's weighted |gap| contribution whose sum is the ECE
    // (Guo et al. 2017). Scores are the round-6 sigmoids q87 already
    // hash-validates, so micro-units (score·10⁶) are EXACT integers —
    // sums are order-independent, floats appear only in the final
    // rounded divisions. One groupBy over the corpus, O(bins) after.
    Q("q185_probe_calibration",
      (s, d) => {
        val scored = Similarity.linearProbeScore(T.embeddings(s, d),
          "vec_id", "embedding", ProbeWeights)
        val lbl = T.documents(s, d).select(col("doc_id").as("id"),
          (col("lang") === "en").cast("long").as("y"))
        val bins = scored.join(lbl, "id")
          .withColumn("conf_u",
            expr("CAST(round(score * 1000000) AS BIGINT)"))
          .withColumn("bin",
            least(expr("CAST(conf_u div 100000 AS INT)"), lit(9)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
            sum(col("conf_u")).as("conf_sum_u"))
        bins.crossJoin(broadcast(bins.agg(sum(col("n")).as("nt"))))
          .select(col("bin"), col("n"), col("pos"),
            round(col("conf_sum_u").cast("double") / 1000000.0 / col("n"), 6)
              .as("avg_conf"),
            round(col("pos").cast("double") / col("n"), 6).as("pos_rate"),
            round(abs(col("conf_sum_u").cast("double") / 1000000.0 / col("n")
                - col("pos").cast("double") / col("n"))
              * col("n") / col("nt"), 6).as("ece_term"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH v AS (
               SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
             sc AS (
               SELECT id, CAST(round(round(1.0 / (1.0 +
                 exp(-(list_inner_product(emb, $probeWeightsSql)))), 6)
                 * 1000000) AS BIGINT) AS conf_u
               FROM v),
             lb AS (
               SELECT doc_id AS id,
                 CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
               FROM documents),
             bins AS (
               SELECT least(CAST(conf_u // 100000 AS INT), 9) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos,
                 CAST(sum(conf_u) AS BIGINT) AS conf_sum_u
               FROM sc JOIN lb USING (id) GROUP BY 1),
             nt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM bins)
             SELECT bin, n, pos,
               round(CAST(conf_sum_u AS DOUBLE) / 1000000.0 / n, 6)
                 AS avg_conf,
               round(CAST(pos AS DOUBLE) / n, 6) AS pos_rate,
               round(abs(CAST(conf_sum_u AS DOUBLE) / 1000000.0 / n
                   - CAST(pos AS DOUBLE) / n) * n / nt.nt, 6) AS ece_term
             FROM bins CROSS JOIN nt ORDER BY bin""")),

    // ---- C4-style corpus-level line dedup (Raffel et al. 2020): any
    // non-blank line repeated anywhere in the corpus keeps only its first
    // occurrence (min (doc_id, idx)); docs are reassembled from surviving
    // lines. The oracle mirrors the winner rule with a row_number window —
    // same winner as Spark's skew-proof min(struct) aggregation.
    Q("q89_line_dedup",
      (s, d) => Dedup.corpusLineDedup(T.documents(s, d), "doc_id", "text")
        .orderBy(col("id")),
      Some("""WITH lines AS (
               SELECT id, i, line FROM (
                 SELECT doc_id AS id,
                   unnest(string_split(text, chr(10))) AS line,
                   unnest(range(len(string_split(text, chr(10))))) AS i
                 FROM documents)
               WHERE length(trim(line)) > 0),
             flag AS (
               SELECT id, i, line,
                 row_number() OVER (PARTITION BY md5(line)
                   ORDER BY id, i) = 1 AS keep
               FROM lines)
             SELECT id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               coalesce(string_agg(CASE WHEN keep THEN line END,
                 chr(10) ORDER BY i), '') AS text
             FROM flag GROUP BY id ORDER BY id""")),

    // ---- Language-ID confusion matrix: q47's marker-token classifier
    // evaluated against the declared `lang` metadata — (declared,
    // predicted) counts plus per-cell share of the declared row. The
    // classifier-evaluation face of the curation stack: before a
    // lang-id FILTER runs at 100 TB, this is the table that says what
    // it will throw away per language. One classify pass + one tiny
    // matrix agg.
    Q("q164_langid_confusion",
      (s, d) => {
        val pred = TextAnalysis.langId(T.documents(s, d), "doc_id",
            "text")
          .withColumnRenamed("id", "doc_id")
          .select(col("doc_id"), col("pred_lang"))
        val m = T.documents(s, d).select(col("doc_id"), col("lang"))
          .join(pred, "doc_id")
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
        val rowTot = m.groupBy(col("lang"))
          .agg(sum(col("n")).as("n_lang"))
        m.join(broadcast(rowTot), "lang")
          .select(col("lang"), col("pred_lang"), col("n"),
            round(col("n") / col("n_lang"), 6).as("row_share"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some("""WITH toks AS (
               SELECT doc_id,
                 unnest(string_split_regex(lower(text), '\s+')) AS tok
               FROM documents),
             scored AS (
               SELECT doc_id,
                 sum(CASE WHEN tok IN ('der','die','das','und','ist','nicht') THEN 1 ELSE 0 END) AS s_de,
                 sum(CASE WHEN tok IN ('the','and','of','is','to','in') THEN 1 ELSE 0 END) AS s_en,
                 sum(CASE WHEN tok IN ('el','la','de','que','los','es') THEN 1 ELSE 0 END) AS s_es,
                 sum(CASE WHEN tok IN ('le','la','les','et','des','est') THEN 1 ELSE 0 END) AS s_fr
               FROM toks GROUP BY doc_id),
             pred AS (
               SELECT doc_id,
                 CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                      WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                      WHEN s_es >= s_fr THEN 'es'
                      ELSE 'fr' END AS pred_lang
               FROM scored),
             m AS (
               SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
               FROM documents d JOIN pred p ON d.doc_id = p.doc_id
               GROUP BY d.lang, p.pred_lang),
             rt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
                    FROM m GROUP BY lang)
             SELECT m.lang, m.pred_lang, m.n,
               round(m.n / rt.n_lang, 6) AS row_share
             FROM m JOIN rt ON m.lang = rt.lang
             ORDER BY m.lang, m.pred_lang""")),

    // ---- Bloom-filter decontamination (the APPROXIMATE face of q71's
    // exact shingle semi-join): the benchmark's 4-gram shingles are folded
    // into a 16384-bit table-form Bloom artifact
    // (Sketches.bloomTableBuild — portable md5 positions, so the filter is
    // bit-identical in both engines and the probe is oracle-checkable,
    // unlike the xxhash64 driver-side bloom in Dedup.buildBloomArtifact);
    // the corpus probes it with k=4 broadcast joins and NEVER shuffles
    // against the benchmark. n_hits over-counts n_shared at the documented
    // fp rate — that asymmetry (no false negatives, bounded false
    // positives) is exactly the contract a 100 TB pre-filter needs: bloom
    // first pass prunes, q71's exact join confirms the survivors.
    Q("q170_bloom_decontaminate",
      (s, d) => {
        val docs = T.documents(s, d)
        val bench = docs.filter(col("source") === "src19")
        val corpus = docs.filter(col("source") =!= "src19")
        val evSh = Dedup.shingleStrings(bench, "doc_id", "text", n = 4)
          .select(col("shingle")).distinct()
        val bloom = Sketches.bloomTableBuild(evSh, "shingle",
          mBits = 16384, k = 4)
        val trSh = Dedup.shingleStrings(corpus, "doc_id", "text", n = 4)
        val perDoc = Sketches
          .bloomTableProbe(bloom, trSh, "shingle", mBits = 16384, k = 4)
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(col("bloom_hit").cast("long")).as("n_hits"))
          .withColumnRenamed("id", "doc_id")
        corpus.select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_shingles", "n_hits"))
          .withColumn("flagged", (col("n_hits") > 0).cast("int"))
      },
      Some("""WITH toks AS (
               SELECT doc_id, source, i, tok FROM (
                 SELECT doc_id, source, unnest(l) AS tok,
                   unnest(range(len(l))) AS i
                 FROM (SELECT doc_id, source,
                         string_split_regex(text, '\s+') AS l
                       FROM documents))
               WHERE tok <> ''),
             seq AS (
               SELECT doc_id, source, tok,
                 lead(tok, 1) OVER w AS t1,
                 lead(tok, 2) OVER w AS t2,
                 lead(tok, 3) OVER w AS t3
               FROM toks
               WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
             sh AS (
               SELECT DISTINCT doc_id, source,
                 tok || ' ' || t1 || ' ' || t2 || ' ' || t3 AS shingle
               FROM seq WHERE t3 IS NOT NULL),
             ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src19'),
             ks AS (SELECT CAST(unnest([0, 1, 2, 3]) AS INT) AS i),
             evpos AS (
               SELECT CAST(concat('0x', substr(md5(concat(
                   CAST(ks.i AS VARCHAR), ':', ev.shingle)), 1, 15))
                 AS BIGINT) % 16384 AS pos
               FROM ev CROSS JOIN ks),
             bloom AS (
               SELECT pos // 32 AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
               FROM evpos GROUP BY 1),
             pr AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src19'),
             prpos AS (
               SELECT pr.doc_id, pr.shingle,
                 CAST(concat('0x', substr(md5(concat(
                     CAST(ks.i AS VARCHAR), ':', pr.shingle)), 1, 15))
                 AS BIGINT) % 16384 AS pos
               FROM pr CROSS JOIN ks),
             hit AS (
               SELECT p.doc_id, p.shingle,
                 min(CASE WHEN (b.bits &
                     (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))) != 0
                   THEN 1 ELSE 0 END) AS h
               FROM prpos p LEFT JOIN bloom b ON p.pos // 32 = b.word
               GROUP BY p.doc_id, p.shingle),
             agg AS (
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                 CAST(sum(h) AS BIGINT) AS n_hits
               FROM hit GROUP BY doc_id)
             SELECT d.doc_id,
               coalesce(a.n_shingles, 0) AS n_shingles,
               coalesce(a.n_hits, 0) AS n_hits,
               CAST(CASE WHEN coalesce(a.n_hits, 0) > 0 THEN 1 ELSE 0 END
                 AS INT) AS flagged
             FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
             WHERE d.source <> 'src19'"""))
  )

  /** Shared DuckDB CTEs for q77/q78: re-indexed tokens, lead-built
    * 10-token window keys, df-flagged window starts, and the
    * gaps-and-islands span grouping — the exact mirror of
    * SpanDedup.tokens/windowKeys/coalesceSpans. (lazy: referenced during
    * `all`'s initializer, which is declared above this val.) */
  private lazy val SpanSql: String = {
    val leads = (1 until 10).map(k => s"lead(tok, $k) OVER w AS t$k").mkString(", ")
    val parts = "tok" +: (1 until 10).map(k => s"t$k")
    s"""WITH toks AS (
         SELECT doc_id AS id, i, tok FROM (
           SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
                  unnest(range(len(string_split_regex(text, '\\s+')))) AS i
           FROM documents)
         WHERE tok <> ''),
       rtoks AS (
         SELECT id, tok,
           row_number() OVER (PARTITION BY id ORDER BY i) - 1 AS ti
         FROM toks),
       wins AS (
         SELECT id, ti, md5(${parts.mkString(" || ' ' || ")}) AS wkey FROM (
           SELECT id, ti, tok, $leads
           FROM rtoks WINDOW w AS (PARTITION BY id ORDER BY ti))
         WHERE t9 IS NOT NULL),
       dup AS (
         SELECT wkey FROM wins GROUP BY wkey
         HAVING count(DISTINCT id) >= 2),
       flag AS (
         SELECT w.id, w.ti FROM wins w
         WHERE EXISTS (SELECT 1 FROM dup d WHERE d.wkey = w.wkey)),
       isl AS (
         SELECT id, ti,
           CASE WHEN prev_end IS NULL OR ti > prev_end THEN 1 ELSE 0 END AS brk
         FROM (SELECT id, ti,
                 max(ti + 10) OVER (PARTITION BY id ORDER BY ti
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
               FROM flag)),
       grp AS (
         SELECT id, ti,
           sum(brk) OVER (PARTITION BY id ORDER BY ti
             ROWS UNBOUNDED PRECEDING) AS g
         FROM isl)"""
  }

  /** Shared CTE head for the q179/q182/q207 oracles: re-indexed tokens
    * and the RAW space-joined `l`-token window strings (no md5;
    * injective over whitespace tokens). */
  private def exactWinsSql(l: Int): String = {
    val leads = (1 until l).map(k => s"lead(tok, $k) OVER w AS t$k").mkString(", ")
    val parts = "tok" +: (1 until l).map(k => s"t$k")
    s"""WITH toks AS (
         SELECT doc_id AS id, i, tok FROM (
           SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
                  unnest(range(len(string_split_regex(text, '\\s+')))) AS i
           FROM documents)
         WHERE tok <> ''),
       rtoks AS (
         SELECT id, tok,
           row_number() OVER (PARTITION BY id ORDER BY i) - 1 AS ti
         FROM toks),
       wins AS (
         SELECT id, ti, ${parts.mkString(" || ' ' || ")} AS sfx FROM (
           SELECT id, ti, tok, $leads
           FROM rtoks WINDOW w AS (PARTITION BY id ORDER BY ti))
         WHERE t${l - 1} IS NOT NULL)"""
  }
  private lazy val ExactWinsSql: String = exactWinsSql(10)

  /** q179/q207 oracle: SpanSql's shape with the suffix-array semantics —
    * OCCURRENCE counts (count(*) ≥ 2, same-doc repeats included)
    * instead of distinct-document counts. */
  private def exactSpanSql(l: Int): String =
    exactWinsSql(l) + s""",
       dup AS (
         SELECT sfx FROM wins GROUP BY sfx
         HAVING count(*) >= 2),
       flag AS (
         SELECT w.id, w.ti FROM wins w
         WHERE EXISTS (SELECT 1 FROM dup d WHERE d.sfx = w.sfx)),
       isl AS (
         SELECT id, ti,
           CASE WHEN prev_end IS NULL OR ti > prev_end THEN 1 ELSE 0 END AS brk
         FROM (SELECT id, ti,
                 max(ti + $l) OVER (PARTITION BY id ORDER BY ti
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
               FROM flag)),
       grp AS (
         SELECT id, ti,
           sum(brk) OVER (PARTITION BY id ORDER BY ti
             ROWS UNBOUNDED PRECEDING) AS g
         FROM isl)"""
  private lazy val ExactSpanSql: String = exactSpanSql(10)

  /** q186/q194 oracle CTEs: SpanSql's window machinery with the
    * batch/corpus split — batch windows flagged by EXISTS against the
    * corpus digest set, coalesced with the standard gaps-and-islands
    * (through the `grp` CTE; q186 emits spans, q194 rolls them up). */
  private lazy val ProbeSpanCtes: String = {
    val leads = (1 until 10).map(k => s"lead(tok, $k) OVER w AS t$k").mkString(", ")
    val parts = "tok" +: (1 until 10).map(k => s"t$k")
    s"""WITH toks AS (
         SELECT doc_id AS id, i, tok FROM (
           SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
                  unnest(range(len(string_split_regex(text, '\\s+')))) AS i
           FROM documents)
         WHERE tok <> ''),
       rtoks AS (
         SELECT id, tok,
           row_number() OVER (PARTITION BY id ORDER BY i) - 1 AS ti
         FROM toks),
       wins AS (
         SELECT id, ti, md5(${parts.mkString(" || ' ' || ")}) AS wkey FROM (
           SELECT id, ti, tok, $leads
           FROM rtoks WINDOW w AS (PARTITION BY id ORDER BY ti))
         WHERE t9 IS NOT NULL),
       cw AS (SELECT DISTINCT wkey FROM wins WHERE id % 10 <> 7),
       bw AS (SELECT id, ti, wkey FROM wins WHERE id % 10 = 7),
       flag AS (
         SELECT b.id, b.ti FROM bw b
         WHERE EXISTS (SELECT 1 FROM cw c WHERE c.wkey = b.wkey)),
       isl AS (
         SELECT id, ti,
           CASE WHEN prev_end IS NULL OR ti > prev_end THEN 1 ELSE 0 END AS brk
         FROM (SELECT id, ti,
                 max(ti + 10) OVER (PARTITION BY id ORDER BY ti
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
               FROM flag)),
       grp AS (
         SELECT id, ti,
           sum(brk) OVER (PARTITION BY id ORDER BY ti
             ROWS UNBOUNDED PRECEDING) AS g
         FROM isl)"""
  }

  private lazy val ProbeSpanSql: String =
    ProbeSpanCtes + """
       SELECT id AS doc_id, CAST(min(ti) AS BIGINT) AS span_start,
         CAST(max(ti) + 10 AS BIGINT) AS span_end, count(*) AS n_windows
       FROM grp GROUP BY id, g ORDER BY doc_id, span_start"""

  /** q196 oracle: the q184 quota CTEs (4/5 budget) + the q128 A-ES
    * ranking joined against the quota per stratum + the q187 hashed
    * global order over the selected set, rolled up per language. */
  private lazy val ReleasePipelineSql: String =
    """WITH cnt AS (
         SELECT lang AS g, CAST(count(*) AS BIGINT) AS avail
         FROM documents GROUP BY lang),
       b AS (SELECT CAST(4 * count(*) // 5 AS BIGINT) AS budget
             FROM documents),
       nv AS (SELECT count(*) AS n FROM cnt),
       p1 AS (
         SELECT g, avail, budget, n, budget // n AS base,
           CASE WHEN row_number() OVER (ORDER BY g) <= budget % n
             THEN 1 ELSE 0 END AS extra
         FROM cnt CROSS JOIN b CROSS JOIN nv),
       p2 AS (
         SELECT *, least(base + extra, avail) AS alloc1,
           avail - least(base + extra, avail) AS h
         FROM p1),
       p3 AS (
         SELECT *, budget - sum(alloc1) OVER () AS left1,
           sum(h) OVER () AS hsum
         FROM p2),
       p4 AS (SELECT *, least(left1, hsum) AS l2 FROM p3),
       p5 AS (
         SELECT *,
           CASE WHEN hsum > 0
             THEN CAST((CAST(l2 AS HUGEINT) * h) // hsum AS BIGINT)
             ELSE 0 END AS share,
           CASE WHEN hsum > 0 THEN CAST(l2 AS HUGEINT) * h % hsum
             ELSE 0 END AS fr
         FROM p4),
       p6 AS (SELECT *, l2 - sum(share) OVER () AS need FROM p5),
       quota AS (
         SELECT g AS stratum,
           CAST(alloc1 + share +
             CASE WHEN row_number() OVER (ORDER BY fr DESC, g) <= need
               THEN 1 ELSE 0 END AS BIGINT) AS quota
         FROM p6),
       keyed AS (
         SELECT lang AS stratum, doc_id AS id,
           CAST(round(ln((CAST('0x' ||
               substr(md5('rel8|' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) + 1) / 4294967296.0)
             / CAST(n_chars AS BIGINT) * 1e9) AS BIGINT) AS skey
         FROM documents WHERE n_chars > 0),
       ranked AS (
         SELECT stratum, id, row_number() OVER (PARTITION BY stratum
           ORDER BY skey DESC, id) AS rk
         FROM keyed),
       sel AS (
         SELECT r.stratum, r.id FROM ranked r
         JOIN quota q ON r.stratum = q.stratum
         WHERE r.rk <= q.quota),
       numbered AS (
         SELECT stratum AS lang, row_number() OVER (
           ORDER BY md5('rel8|' || CAST(id AS VARCHAR)), id) AS row_num
         FROM sel)
       SELECT lang, count(*) AS n_selected,
         CAST(min(row_num) AS BIGINT) AS first_pos,
         CAST(max(row_num) AS BIGINT) AS last_pos,
         CAST(sum(row_num) AS BIGINT) AS pos_sum
       FROM numbered GROUP BY lang ORDER BY lang"""

  /** q117 oracle: the farthest-point recursion unrolled — per round a
    * distance CTE (min exact-integer d² to every already-chosen center)
    * and an argmax CTE (farthest, ties to smaller id) — the
    * q94/q104/q110 unrolling discipline. Centers are 1-row CTEs, so each
    * round's scan is a cross join against O(r) single rows. */
  private def KCenterSql(k: Int, dim: Int): String = {
    def dist(a: String, b: String) =
      s"""CAST(list_sum(list_transform(range(1, ${dim + 1}),
          ii -> ($a[ii] - $b[ii]) * ($a[ii] - $b[ii]))) AS BIGINT)"""
    val head = s"""WITH q AS (
        SELECT vec_id, list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        FROM embeddings),
      c0 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1)"""
    val iters = (1 until k).map { r =>
      val dists = (0 until r).map(i => dist("v.qv", s"c$i.qv"))
      val dmin =
        if (r == 1) dists.head else dists.mkString("least(", ", ", ")")
      val joins = (0 until r).map(i => s"CROSS JOIN c$i").mkString(" ")
      s"""m$r AS (
          SELECT v.vec_id, v.qv, $dmin AS dmin
          FROM q v $joins),
        c$r AS (
          SELECT vec_id, qv, dmin FROM m$r
          ORDER BY dmin DESC, vec_id LIMIT 1)"""
    }.mkString(",\n")
    val out =
      (s"SELECT CAST(0 AS INT) AS sel_round, vec_id, " +
        s"CAST(0 AS BIGINT) AS d2 FROM c0") +:
        (1 until k).map(r =>
          s"SELECT CAST($r AS INT) AS sel_round, vec_id, dmin AS d2 FROM c$r")
    s"""$head,
      $iters
      ${out.mkString("\nUNION ALL ")}
      ORDER BY sel_round"""
  }
}
