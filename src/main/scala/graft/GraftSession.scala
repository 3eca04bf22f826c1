package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession wired the way graft's own
  * mains run — native functions registered, the TopKPerKey operator
  * stack injected, and the session defaults every operator assumes
  * (UTC timestamps, AQE on, shuffle parallelism sized to the
  * cluster, not the 200 default).
  *
  * Cluster deployments that build their own session can instead pass
  * `--conf spark.sql.extensions=graft.GraftExtensions` (the SPI route —
  * identical bindings) or call [[configure]] on an existing session.
  */
object GraftSession {

  /** Apply graft's session-level requirements to an existing session:
    * native function registration (idempotent) plus the runtime confs
    * the serve paths assume. Extensions (rule/strategy) can only be
    * injected at build time — sessions not built via [[local]]/the SPI
    * still run every operator, with TopKPerKey falling back to its
    * logical form's window rewrite.
    *
    * `parquet.pushdown.inFilterThreshold = 10000`: Spark pushes a
    * literal IN to parquet as a REAL In predicate only up to this
    * threshold (default 10) and degrades to a min/max RANGE above it —
    * for the uniformly-distributed keys every standing index here
    * serves (md5 hashes, xxhash64 terms/grams, cell ids), that range
    * spans the whole keyspace and prunes nothing, so the IN-literal
    * serve silently reads every row group. With the values pushed,
    * the clustered tables' tight per-row-group min/max skip the groups
    * containing no probed key — measured 2.4× on a 1000-key probe of a
    * 200M-row clustered table (tools.InPushdownProbe, 0.69 → 0.29 s).
    * 10000 matches the streams' InPushdownCap, so the pregate verify
    * always pushes its real key set; per-row-group evaluation of a
    * sorted 10k set is microseconds against stats, noise next to
    * reading one group. Applied only when the session still carries
    * Spark's default (10): a value the deployment set explicitly
    * (spark-submit --conf, builder config) is deliberate tuning and
    * configure() must not silently clobber it. */
  def configure(spark: SparkSession): SparkSession = {
    functions.Registry.register(spark)
    val inKey = "spark.sql.parquet.pushdown.inFilterThreshold"
    if (spark.conf.get(inKey, "10") == "10")
      spark.conf.set(inKey, "10000")
    spark
  }

  /** A local session with graft fully wired (the shape Verify/Bench/
    * Explain run): extensions injected at build time, functions
    * registered, shuffle partitions = cores. Fails fast if a session
    * already exists in the JVM — getOrCreate would silently hand that
    * session back with every config here ignored (no extensions, wrong
    * shuffle width), breaking the "extensions injected at build time"
    * contract; callers with an existing session want [[configure]]. */
  def local(cores: Int): SparkSession = {
    // check BOTH slots: a stopped thread-local active session must not
    // mask a live default session (getOrCreate would return the latter)
    val existing = (SparkSession.getActiveSession.toSeq ++
      SparkSession.getDefaultSession.toSeq)
    existing.filterNot(_.sparkContext.isStopped).headOption.foreach { _ =>
      throw new IllegalStateException(
        "GraftSession.local: a SparkSession already exists in this JVM; " +
        "getOrCreate would ignore the graft configs and return it without " +
        "the extension stack. Use GraftSession.configure(session) instead, " +
        "or stop the existing session first.")
    }
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    configure(s)
  }
}
