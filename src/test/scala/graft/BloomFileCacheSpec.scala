package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.BloomFileCache

/** The executor-side sidecar cache's failure and eviction contracts:
  * a MISSING shard must fail loudly (the concurrent-compaction race —
  * an always-false fallback would silently commit cross-epoch
  * duplicates), an EXISTING zero-length shard is the empty filter, and
  * eviction is byte-bounded least-recently-probed, not a wholesale
  * clear. */
class BloomFileCacheSpec extends AnyFunSuite {

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("bloomcache")

  private def writeFilter(dir: java.nio.file.Path, name: String,
                          keys: Seq[Long]): String = {
    val f = BloomFilter.create(math.max(keys.size.toLong, 1L), 0.01)
    keys.foreach(f.putLong)
    val p = dir.resolve(name)
    val out = java.nio.file.Files.newOutputStream(p)
    try f.writeTo(out) finally out.close()
    p.toString
  }

  test("a missing shard file propagates FileNotFoundException — the " +
       "compaction race must fail the task, not probe false") {
    BloomFileCache.clear()
    val dir = tmpDir()
    intercept[java.io.FileNotFoundException] {
      BloomFileCache.get(s"$dir/shard-0")
    }
    // and it is NOT cached as anything — a later write is picked up
    writeFilter(dir, "shard-0", Seq(7L))
    assert(BloomFileCache.get(s"$dir/shard-0").mightContainLong(7L))
  }

  test("an existing zero-length shard loads as the empty filter") {
    BloomFileCache.clear()
    val dir = tmpDir()
    val p = dir.resolve("shard-0")
    java.nio.file.Files.createFile(p)
    val f = BloomFileCache.get(p.toString)
    assert(!f.mightContainLong(0L) && !f.mightContainLong(42L))
  }

  test("a written filter round-trips through the cache") {
    BloomFileCache.clear()
    val dir = tmpDir()
    val p = writeFilter(dir, "shard-0", Seq(1L, 2L, 3L))
    val f = BloomFileCache.get(p)
    assert(Seq(1L, 2L, 3L).forall(f.mightContainLong))
    assert(!f.mightContainLong(99999L))
  }

  test("eviction is byte-bounded LRU: total stays under the cap and " +
       "the hot entry survives while cold ones age out") {
    BloomFileCache.clear()
    val dir = tmpDir()
    val paths = (0 until 6).map { i =>
      writeFilter(dir, s"shard-$i", Seq(i.toLong))
    }
    val prior = BloomFileCache.maxCacheBytes
    try {
      // size the cap to hold ~3 of the 6 filters
      BloomFileCache.get(paths(0))
      val one = BloomFileCache.cachedBytes
      BloomFileCache.maxCacheBytes = one * 3 + one / 2
      paths.zipWithIndex.foreach { case (p, i) =>
        BloomFileCache.get(paths(0)) // keep shard-0 hot between misses
        BloomFileCache.get(p)
        assert(BloomFileCache.cachedBytes <= BloomFileCache.maxCacheBytes,
          s"after load $i: ${BloomFileCache.cachedBytes} bytes cached")
      }
      assert(BloomFileCache.cachedEntries < paths.length,
        "cold entries must have been evicted")
      // the hot entry is still served (no reload storm of live filters);
      // probing through it still answers correctly either way
      assert(BloomFileCache.get(paths(0)).mightContainLong(0L))
      assert(BloomFileCache.get(paths(5)).mightContainLong(5L))
    } finally {
      BloomFileCache.maxCacheBytes = prior
      BloomFileCache.clear()
    }
  }
}
