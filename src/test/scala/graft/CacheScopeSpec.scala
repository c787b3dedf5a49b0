package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.{CacheScope, Curation, Dedup}

/**
 * CacheScope.tracking: batch operators' internal persists are collected by
 * the innermost active scope and released on demand — the bounded-cache
 * discipline repeated library invocations need (ADVICE r2: every persisting
 * operator, not just the streaming path, must have a release path).
 */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 40L).map { i =>
    val base = s"token$i alpha beta gamma delta epsilon zeta eta theta word$i"
    (i, if (i % 4 == 0) base else base + s" extra$i", if (i % 2 == 0) "en" else "de")
  }.toDF("doc_id", "text", "lang")

  test("tracking collects minhashDedup's internal persists; release drops them") {
    val (pairs, caches) = CacheScope.tracking {
      Dedup.minhashDedup(corpus, "doc_id", "text", n = 3, k = 32,
        bands = 16, threshold = 0.3)
    }
    pairs.count() // fully consume before releasing
    assert(caches.size >= 3,
      s"expected sh/members/capped at minimum, got ${caches.size}")
    assert(caches.all.forall(_.storageLevel != StorageLevel.NONE),
      "tracked frames are persisted while in use")
    caches.release()
    assert(caches.all.forall(_.storageLevel == StorageLevel.NONE),
      "release() unpersists every tracked frame")
  }

  test("tracking covers the composed curate pipeline") {
    val (out, caches) = CacheScope.tracking {
      Curation.curate(corpus, "doc_id", "text", "lang",
        Curation.CurationConfig(minhashThreshold = 0.5, nShards = 8))
    }
    assert(out.count() > 0)
    assert(caches.size >= 5, s"curate + nested dedup persists: ${caches.size}")
    caches.release()
    assert(caches.all.forall(_.storageLevel == StorageLevel.NONE))
  }

  test("no active scope: operators still persist (plain library default)") {
    val pairs = Dedup.minhashDedup(corpus, "doc_id", "text", n = 3, k = 32,
      bands = 16, threshold = 0.3)
    assert(pairs.count() >= 0) // builds and runs fine outside any scope
  }

  test("tracking releases everything pinned so far when the body throws") {
    import org.apache.spark.sql.graftbridge.CacheBridge
    spark.catalog.clearCache()
    assert(CacheBridge.cacheIsEmpty(spark), "precondition: clean cache")
    val ex = intercept[RuntimeException] {
      CacheScope.tracking {
        // Build (and pin) a full operator, then fail the enclosing body —
        // the retried-trigger shape that must not strand cache entries.
        Dedup.minhashDedup(corpus, "doc_id", "text", n = 3, k = 32,
          bands = 16, threshold = 0.3).count()
        throw new RuntimeException("trigger failed after pinning")
      }
    }
    assert(ex.getMessage.contains("after pinning"))
    assert(CacheBridge.cacheIsEmpty(spark),
      "throw path must release the operator's pins")
  }

  test("connected-components checkpoints release under a tracking scope") {
    import org.apache.spark.sql.graftbridge.CacheBridge
    spark.catalog.clearCache()
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e"))
      .toDF("src", "dst")
    // Compare persistent-RDD sets before/after (other suites may have
    // left unrelated checkpoint RDDs in this shared session).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (comps, caches) = CacheScope.tracking {
      graft.operators.ConnectedComponents.run(edges, maxIter = 8,
        strict = true).collect()
    }
    assert(comps.length == 5)
    caches.release()
    assert(CacheBridge.cacheIsEmpty(spark),
      "no cached plans may remain after release")
    // The returned frame's localCheckpoint blocks are RDD-level caches:
    // release() must free them too (the scope learned checkpoint pins).
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked checkpoint RDDs: $leaked")
  }

  test("scopes nest: inner pins do not leak into the outer handle") {
    val (outerFrames, outer) = CacheScope.tracking {
      val (_, inner) = CacheScope.tracking {
        Dedup.minhashDedup(corpus, "doc_id", "text", n = 3, k = 32,
          bands = 16, threshold = 0.3)
      }
      val innerSize = inner.size
      inner.release()
      innerSize
    }
    assert(outerFrames >= 3, "inner scope saw the operator's pins")
    assert(outer.size == 0, "outer scope saw none of them")
  }
}
