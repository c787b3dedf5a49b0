package graft

import scala.util.Random

import org.apache.spark.sql.functions.{col, md5}

import graft.operators.Dedup
import graft.streaming.CurationStreams

/**
 * Streaming incremental line dedup == batch [[Dedup.corpusLineDedup]] when
 * docs arrive in doc-id order (the stream's first-in-arrival-order winner
 * rule then coincides with the batch min-(doc_id, idx) rule), plus the
 * seenKeys bootstrap path. Mirrors the StreamingSpec file-source discipline:
 * one parquet file per trigger, maxFilesPerTrigger=1, mtime-ordered.
 */
class LineDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Docs with boilerplate lines shared across the doc-id range (so
    * duplicates straddle trigger boundaries), blanks, and within-doc
    * repeats. Same shape family as LineDedupPropertySpec's generator. */
  private def gen(seed: Int): Seq[(Long, String)] = {
    val r = new Random(seed)
    val boiler = (0 until 6).map(i => s"shared boilerplate line $i s$seed")
    (0L until 18L).map { id =>
      val lines = (0 until 2 + r.nextInt(5)).map { j =>
        r.nextInt(10) match {
          case 0 | 1 | 2 | 3 => boiler(r.nextInt(boiler.size))
          case 4             => if (r.nextBoolean()) "" else "   "
          case _             => s"own d$id l$j ${r.nextInt(100)}"
        }
      }
      id -> lines.mkString("\n")
    }
  }

  private def toDocs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Write `splits` as one parquet file each, mtime-ordered, and return a
    * maxFilesPerTrigger=1 stream over them. */
  private def triggerStream(dir: String, splits: Seq[Seq[(Long, String)]]) = {
    splits.zipWithIndex.foreach { case (rows, i) =>
      if (i > 0) Thread.sleep(1100) // distinct mtimes => stable file order
      toDocs(rows).coalesce(1).write.mode("append").parquet(s"$dir/in")
    }
    spark.readStream
      .schema(CurationStreams.DocumentSchema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$dir/in")
  }

  test("lineDedupStream == batch corpusLineDedup on a doc-id-ordered split") {
    val docs = gen(41)
    val splits = Seq(docs.filter(_._1 < 6), docs.filter(d => d._1 >= 6 && d._1 < 12),
      docs.filter(_._1 >= 12))
    assert(splits.forall(_.nonEmpty))
    val tmp = java.nio.file.Files.createTempDirectory("line_dedup_stream").toString

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val q = CurationStreams.lineDedupStream(
      triggerStream(tmp, splits), "doc_id", "text") { out =>
      got ++= out.as[(Long, Long, Long, String)].collect()
    }
    q.processAllAvailable()
    q.stop()

    val want = Dedup.corpusLineDedup(toDocs(docs), "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
    assert(got.map(r => r._1 -> ((r._2, r._3, r._4))).toMap ==
      want.map(r => r._1 -> ((r._2, r._3, r._4))).toMap,
      s"stream union != batch: got=${got.sortBy(_._1).toSeq} want=${want.sortBy(_._1).toSeq}")
    // The split actually exercised cross-trigger dedup: some doc in a later
    // trigger lost a line to an earlier trigger's winner.
    val laterIds = splits.drop(1).flatten.map(_._1).toSet
    assert(got.exists(r => laterIds(r._1) && r._3 < r._2),
      "fixture produced no cross-trigger duplicate")
  }

  test("lineDedupStream seenKeys bootstrap drops pre-seen lines in trigger 1") {
    val corpus = toDocs(Seq(
      0L -> "already ingested line one\nalready ingested line two"))
    val fresh = Seq(
      100L -> "already ingested line one\nbrand new line alpha",
      101L -> "brand new line alpha\nbrand new line beta")
    val tmp = java.nio.file.Files.createTempDirectory("line_dedup_boot").toString
    val seen = Dedup.docLines(corpus, "doc_id", "text").select("k").distinct()

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    val q = CurationStreams.lineDedupStream(
      triggerStream(tmp, Seq(fresh)), "doc_id", "text",
      seenKeys = Some(seen)) { out =>
      got ++= out.as[(Long, Long, Long, String)].collect()
    }
    q.processAllAvailable()
    q.stop()

    val byId = got.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // Doc 100: corpus line dropped, its novel line kept (first occurrence).
    assert(byId(100L) == ((2L, 1L, "brand new line alpha")), s"got ${byId(100L)}")
    // Doc 101: "alpha" lost to doc 100 within the same batch; "beta" kept.
    assert(byId(101L) == ((2L, 1L, "brand new line beta")), s"got ${byId(101L)}")
  }

  test("bloomDedupStream: cross-trigger doc dedup with constant-size state") {
    // 12 distinct texts; each later trigger repeats some earlier texts
    // under new ids, plus within-batch twins.
    def doc(id: Long, t: String) = id -> t
    val t1 = Seq(doc(0, "text A"), doc(1, "text B"), doc(2, "text A"))
    val t2 = Seq(doc(10, "text B"), doc(11, "text C"), doc(12, "text C"))
    val t3 = Seq(doc(20, "text A"), doc(21, "text D"))
    val tmp = java.nio.file.Files.createTempDirectory("bloom_stream").toString

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = CurationStreams.bloomDedupStream(
      triggerStream(tmp, Seq(t1, t2, t3)), "doc_id", "text",
      expectedItems = 1000L, fpp = 0.001) { out =>
      got ++= out.select("doc_id", "text").as[(Long, String)].collect()
    }
    q.processAllAvailable()
    q.stop()

    // No duplicate text ever passes (the one-sided bloom guarantee) and
    // the winner is the min id of the first trigger containing the text.
    // fpp over-drop is deterministic per key set; at 0.001 on 4 keys the
    // probability-weighted expectation of a drop is ~0.004 — and if one
    // DID occur it would fail the exact expectation below, loudly.
    assert(got.map(_._2).distinct.size == got.size, s"dup text passed: $got")
    assert(got.sortBy(_._1).toSeq == Seq(
      0L -> "text A", 1L -> "text B", 11L -> "text C", 21L -> "text D"),
      s"got ${got.sortBy(_._1).toSeq}")
  }

  test("bloomDedupStream seeded with an existing corpus artifact") {
    val corpusBloom = Dedup.buildBloomArtifact(
      toDocs(Seq(0L -> "pre-seen text")).withColumn("k", md5(col("text"))),
      col("k"), 1000L, fpp = 0.001)
    val fresh = Seq(100L -> "pre-seen text", 101L -> "genuinely new text")
    val tmp = java.nio.file.Files.createTempDirectory("bloom_boot").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = CurationStreams.bloomDedupStream(
      triggerStream(tmp, Seq(fresh)), "doc_id", "text",
      expectedItems = 1000L, fpp = 0.001, seen = Some(corpusBloom)) { out =>
      got ++= out.select("doc_id", "text").as[(Long, String)].collect()
    }
    q.processAllAvailable()
    q.stop()
    assert(got.toSeq == Seq(101L -> "genuinely new text"), s"got $got")
  }
}
