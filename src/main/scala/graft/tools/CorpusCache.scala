package graft.tools

/** Tmpdir cache-path derivation for per-corpus build artifacts (dedup
  * cluster labels, ANN index payloads): the path is keyed by the
  * source file's (mtime, length) fingerprint, so a driver-side
  * testdata regeneration INVALIDATES the cache — stale artifacts can
  * never silently answer for a new corpus. Consumers treat the
  * `_SUCCESS` marker inside the returned dir as the "built" signal
  * (Spark writes it atomically at job commit). */
object CorpusCache {
  def dirFor(srcDir: String, table: String, kind: String): java.io.File = {
    val src = new java.io.File(s"$srcDir/$table.parquet")
    val tag = java.lang.Long.toHexString(
      src.lastModified() ^ (src.length() * 2654435761L))
    new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_${kind}_${Integer.toHexString(srcDir.hashCode)}_$tag")
  }

  def isBuilt(dir: java.io.File): Boolean =
    new java.io.File(dir, "_SUCCESS").exists()
}
