package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.rnd

/** PII detection / redaction and re-identification-risk audits — the
  * privacy layer every training-data pipeline runs before text leaves
  * the lake (C4/Dolma-style scrubbing), and the reference's PHI-handling
  * obligations (ref: core/etl_service.py's PHI hash step, core/auth.py's
  * HIPAA posture) re-expressed as corpus-scale operators:
  *
  *  - text_pii_scrub: regex redaction of phone/SSN/email/IP tokens. The
  *    synthetic corpus carries no natural PII, so — exactly like the
  *    DERIVED partsupp that unlocked Q2/Q11/Q20 (TpchExtra.partsupp) —
  *    the entry assembles a deterministic "case note" per customer with
  *    PII-shaped tokens derived from c_custkey via a stride formula
  *    MIRRORED VERBATIM in the oracle CTE: both engines derive
  *    bit-identical notes, then both run the same redaction, so the
  *    hash compare checks the actual regex machinery, not a fixture.
  *    Type coverage is deliberately partial per row (email on 1/3 of
  *    keys, SSN on 1/5, IP on 1/2) so the scrub output is varied and
  *    the stats entry measures real per-type incidence.
  *  - text_pii_stats: per-type incidence (docs containing ≥1 match,
  *    total matches) over the same note corpus.
  *  - etl_k_anonymity / etl_l_diversity: the release-audit side of the
  *    same obligation — quasi-identifier equivalence-class profiling
  *    (Sweeney k-anonymity; Machanavajjhala l-diversity) over customer.
  *
  * Scale notes (100 TB posture):
  *  - The scrub is a pure per-row projection — chained codegen'd
  *    regexp_replace, zero shuffles, zero joins; it parallelizes
  *    embarrassingly and pipelines inside whole-stage codegen with
  *    whatever scan feeds it. Patterns are anchored with `\b` and use
  *    only dialect-neutral constructs (explicit classes, bounded
  *    repetition — no lookaround) so Java regex (Spark) and RE2
  *    (DuckDB) agree by construction.
  *  - text_pii_stats is ONE scan: per-row match counts (pure map) into
  *    a single map-side-combined aggregate; the per-type frame is
  *    stack()'d from the 1-row aggregate, never a second pass.
  *  - k-anonymity / l-diversity are each ONE hash aggregate over the
  *    quasi columns (partial agg pushes the class counting map-side;
  *    the class frame is |distinct quasi| rows, orders of magnitude
  *    below the corpus) followed by a 1-row summary aggregate that
  *    stack()s the thresholds. l-diversity's single-column
  *    count_distinct rides the per-class grouping — no Expand (one
  *    distinct aggregate rewrites to a two-phase group), no second
  *    corpus scan.
  */
object Pii {

  // ---- dialect-neutral PII patterns (Java regex ∩ RE2 semantics) ----
  private[graft] val PhonePat = """\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"""
  private[graft] val SsnPat   = """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"""
  private[graft] val EmailPat = """\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b"""
  private[graft] val IpPat    = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Redact all four PII types in one chained projection. Order is
    * immaterial — the derived token shapes are pairwise disjoint
    * (3-3-4 dashes vs 3-2-4 dashes vs @-form vs dotted quads) and no
    * replacement token introduces digits — but SSN runs before phone
    * by convention (most-specific first). */
  private[graft] def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailPat, "[EMAIL]"),
          SsnPat, "[SSN]"),
        PhonePat, "[PHONE]"),
      IpPat, "[IP]")

  /** Match count for one pattern (group 0: the full match). */
  private[graft] def matches(c: Column, pat: String): Column =
    size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")

  /** The deterministic PII-bearing "case note" per customer. Every
    * arithmetic step uses only + * % (no division — integer-division
    * semantics differ across engines) and is mirrored token-for-token
    * in [[noteCte]]. */
  private[graft] def notes(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    def s(c: Column): Column = c.cast("string")
    val phone = concat(
      lpad(s(k % 800 + 200), 3, "0"), lit("-"),
      lpad(s((k * 7) % 1000), 3, "0"), lit("-"),
      lpad(s((k * 13) % 10000), 4, "0"))
    val ssn = concat(
      lpad(s(k % 900 + 100), 3, "0"), lit("-"),
      lpad(s((k * 3) % 100), 2, "0"), lit("-"),
      lpad(s((k * 17) % 10000), 4, "0"))
    val email = concat(lower(regexp_replace(col("c_name"), "#", ".")),
                       lit("@example.org"))
    val ip = concat(s(k % 223 + 1), lit("."), s((k * 3) % 256), lit("."),
                    s((k * 5) % 256), lit("."), s((k * 11) % 254 + 1))
    Tables.customer(spark, dir).select(
      k.as("c_custkey"),
      concat(
        lit("Contact "), col("c_name"),
        lit(" seg "), col("c_mktsegment"),
        lit(" ph "), phone,
        when(k % 3 === 0, concat(lit(" em "), email)).otherwise(lit("")),
        when(k % 5 === 0, concat(lit(" ssn "), ssn)).otherwise(lit("")),
        when(k % 2 === 0, concat(lit(" ip "), ip)).otherwise(lit("")),
        lit(" end")).as("note"))
  }

  /** Shared DuckDB CTE deriving the same notes (mirror of [[notes]]). */
  private val noteCte =
    """WITH notes AS (
         SELECT c_custkey,
                'Contact ' || c_name || ' seg ' || c_mktsegment
                || ' ph ' || lpad(CAST(c_custkey % 800 + 200 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0')
                || CASE WHEN c_custkey % 3 = 0 THEN
                     ' em ' || lower(replace(c_name, '#', '.')) || '@example.org'
                   ELSE '' END
                || CASE WHEN c_custkey % 5 = 0 THEN
                     ' ssn ' || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0')
                       || '-' || lpad(CAST((c_custkey * 3) % 100 AS VARCHAR), 2, '0')
                       || '-' || lpad(CAST((c_custkey * 17) % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
                || CASE WHEN c_custkey % 2 = 0 THEN
                     ' ip ' || CAST(c_custkey % 223 + 1 AS VARCHAR)
                       || '.' || CAST((c_custkey * 3) % 256 AS VARCHAR)
                       || '.' || CAST((c_custkey * 5) % 256 AS VARCHAR)
                       || '.' || CAST((c_custkey * 11) % 254 + 1 AS VARCHAR)
                   ELSE '' END
                || ' end' AS note
         FROM customer)"""

  /** text_pii_scrub: per-note redaction + removed-token count. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val n = notes(spark, dir)
    n.select(
      col("c_custkey"),
      (matches(col("note"), PhonePat) + matches(col("note"), SsnPat) +
       matches(col("note"), EmailPat) + matches(col("note"), IpPat))
        .as("pii_found"),
      scrub(col("note")).as("note_redacted"))
      .orderBy(col("c_custkey"))
  }

  /** text_pii_stats: per-type incidence over the note corpus, one scan. */
  def piiStats(spark: SparkSession, dir: String): DataFrame = {
    val perRow = notes(spark, dir).select(
      matches(col("note"), PhonePat).as("phone"),
      matches(col("note"), SsnPat).as("ssn"),
      matches(col("note"), EmailPat).as("email"),
      matches(col("note"), IpPat).as("ip"))
    perRow.agg(
      count(lit(1)).as("docs"),
      sum(when(col("phone") > 0, 1L).otherwise(0L)).as("d_phone"),
      sum(col("phone")).as("m_phone"),
      sum(when(col("ssn") > 0, 1L).otherwise(0L)).as("d_ssn"),
      sum(col("ssn")).as("m_ssn"),
      sum(when(col("email") > 0, 1L).otherwise(0L)).as("d_email"),
      sum(col("email")).as("m_email"),
      sum(when(col("ip") > 0, 1L).otherwise(0L)).as("d_ip"),
      sum(col("ip")).as("m_ip"))
      .selectExpr("docs",
        """stack(4,
             'email', d_email, m_email,
             'ip',    d_ip,    m_ip,
             'phone', d_phone, m_phone,
             'ssn',   d_ssn,   m_ssn) AS (pii_type, docs_with, total_matches)""")
      .select(col("pii_type"), col("docs_with"), col("total_matches"),
              col("docs").as("corpus_docs"))
      .orderBy(col("pii_type"))
  }

  /** Quasi-identifier columns for the release audits: nation ×
    * market segment × coarse balance bucket (floor(bal/1000) — the
    * same IEEE divide in both engines). */
  private def quasi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))

  /** etl_k_anonymity: equivalence-class profile of the quasi set at
    * k ∈ {2, 5, 10} — classes below k and the rows they expose. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = quasi(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("n"))
    def below(k: Int) = Seq(
      sum(when(col("n") < k, 1L).otherwise(0L)).as(s"c$k"),
      sum(when(col("n") < k, col("n")).otherwise(0L)).as(s"r$k"))
    classes.agg(
      count(lit(1)).as("classes"),
      (below(2) ++ below(5) ++ below(10)): _*)
      .selectExpr("classes",
        """stack(3,
             CAST(2 AS BIGINT),  c2,  r2,
             CAST(5 AS BIGINT),  c5,  r5,
             CAST(10 AS BIGINT), c10, r10)
           AS (k, classes_at_risk, rows_at_risk)""")
      .select(col("k"), col("classes"), col("classes_at_risk"),
              col("rows_at_risk"))
      .orderBy(col("k"))
  }

  /** etl_l_diversity: distinct-sensitive-value profile — sensitive =
    * c_mktsegment, quasi = (nation, balance bucket); classes whose
    * sensitive diversity falls below l ∈ {2, 3, 5}. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val classes = quasi(spark, dir)
      .groupBy(col("c_nationkey"), col("bal_bucket"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("c_mktsegment")).as("l"))
    def below(l: Int) = Seq(
      sum(when(col("l") < l, 1L).otherwise(0L)).as(s"c$l"),
      sum(when(col("l") < l, col("n")).otherwise(0L)).as(s"r$l"))
    classes.agg(
      count(lit(1)).as("classes"),
      (below(2) ++ below(3) ++ below(5)): _*)
      .selectExpr("classes",
        """stack(3,
             CAST(2 AS BIGINT), c2, r2,
             CAST(3 AS BIGINT), c3, r3,
             CAST(5 AS BIGINT), c5, r5)
           AS (l, classes_at_risk, rows_at_risk)""")
      .select(col("l"), col("classes"), col("classes_at_risk"),
              col("rows_at_risk"))
      .orderBy(col("l"))
  }

  /** etl_t_closeness: the third rung of the release-audit ladder
    * (Li/Li/Venkatasubramanian) — l-diversity still leaks when a class
    * is diverse but SKEWED (5 distinct segments, 96 % one of them);
    * t-closeness bounds the DISTANCE between each class's sensitive
    * distribution and the global one. Sensitive = c_mktsegment
    * (nominal), so EMD under the uniform ground distance reduces to
    * total variation distance: TVD = ½ Σᵢ |pᵢ − qᵢ|.
    *
    * Cross-engine exactness: TVD is a ratio of sums of ratios — naive
    * double summation would be order-dependent across engines. Instead
    * every per-cell term is kept INTEGER: with class counts cᵢ (total
    * n) and global counts gᵢ (total G),
    *   Σ_all |cᵢG − gᵢn| = Σ_present (|cᵢG − gᵢn| − gᵢn) + nG
    * (absent segments contribute gᵢn; Σ gᵢ = G), so S := that sum is
    * bigint-exact and TVD = S/(2nG) is ONE IEEE division. The t-risk
    * classification never touches doubles at all: TVD > t ⇔
    * mₜ·S > dₜ·nG with (mₜ,dₜ) = (5,2)/(5,3)/(1,1) for t = 0.2/0.3/0.5.
    * (Integer products stay < 2⁶³ through ~10⁹-row dimensions; beyond
    * that the same algebra runs in decimal(38,0).)
    *
    * Scale: ONE corpus-scan hash aggregate builds the cell frame
    * (|quasi classes| × |segments| rows — orders below the corpus);
    * everything after operates on that frame (global totals are a
    * segment-count rollup of it, broadcast back; class totals a second
    * tiny rollup), so the audit costs one shuffle of class-cardinality
    * data however wide the corpus. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val cell = quasi(spark, dir)
      .groupBy(col("c_nationkey"), col("bal_bucket"), col("c_mktsegment"))
      .agg(count(lit(1)).as("c"))
    val glob = cell.groupBy(col("c_mktsegment")).agg(sum(col("c")).as("g"))
    val tot  = glob.agg(sum(col("g")).as("grand"))
    val nFr  = cell.groupBy(col("c_nationkey"), col("bal_bucket"))
      .agg(sum(col("c")).as("n"))
    val cls = cell
      .join(broadcast(glob), "c_mktsegment")
      .join(nFr, Seq("c_nationkey", "bal_bucket"))
      .crossJoin(broadcast(tot))
      .groupBy(col("c_nationkey"), col("bal_bucket"))
      .agg(max(col("n")).as("n"), max(col("grand")).as("grand"),
           sum(abs(col("c") * col("grand") - col("g") * col("n"))
               - col("g") * col("n")).as("sp"))
      .withColumn("s", col("sp") + col("n") * col("grand"))
      .withColumn("tvd",
        col("s").cast("double") /
          (lit(2.0) * col("n").cast("double") * col("grand").cast("double")))
    def risk(mult: Long, den: Long) = col("s") * mult > col("n") * col("grand") * den
    def at(mult: Long, den: Long, tag: String) = Seq(
      sum(when(risk(mult, den), 1L).otherwise(0L)).as(s"c$tag"),
      sum(when(risk(mult, den), col("n")).otherwise(0L)).as(s"r$tag"))
    cls.agg(
      count(lit(1)).as("classes"),
      (Seq(rnd(max(col("tvd")), 4).as("max_tvd")) ++
       at(5, 2, "2") ++ at(5, 3, "3") ++ at(1, 1, "5")): _*)
      .selectExpr("classes", "max_tvd",
        """stack(3,
             CAST(0.2 AS DOUBLE), c2, r2,
             CAST(0.3 AS DOUBLE), c3, r3,
             CAST(0.5 AS DOUBLE), c5, r5)
           AS (t, classes_at_risk, rows_at_risk)""")
      .select(col("t"), col("classes"), col("classes_at_risk"),
              col("rows_at_risk"), col("max_tvd"))
      .orderBy(col("t"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub"   -> (piiScrub _),
    "text_pii_stats"   -> (piiStats _),
    "etl_k_anonymity"  -> (kAnonymity _),
    "etl_l_diversity"  -> (lDiversity _),
    "etl_t_closeness"  -> (tCloseness _))

  val oracles: Map[String, String] = Map(
    "text_pii_scrub" -> (noteCte +
      """
         SELECT c_custkey,
                CAST(len(regexp_extract_all(note, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b'))
                   + len(regexp_extract_all(note, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))
                   + len(regexp_extract_all(note, '\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b'))
                   + len(regexp_extract_all(note, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                   AS BIGINT) AS pii_found,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(note,
                        '\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b', '[EMAIL]', 'g'),
                      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
                    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g'),
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g')
                  AS note_redacted
         FROM notes ORDER BY c_custkey"""),
    "text_pii_stats" -> (noteCte +
      """,
         per_row AS (
           SELECT CAST(len(regexp_extract_all(note, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS phone,
                  CAST(len(regexp_extract_all(note, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS ssn,
                  CAST(len(regexp_extract_all(note, '\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b')) AS BIGINT) AS email,
                  CAST(len(regexp_extract_all(note, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS ip
           FROM notes),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS docs,
                  CAST(sum(CASE WHEN phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_phone,
                  CAST(sum(phone) AS BIGINT) AS m_phone,
                  CAST(sum(CASE WHEN ssn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_ssn,
                  CAST(sum(ssn) AS BIGINT) AS m_ssn,
                  CAST(sum(CASE WHEN email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_email,
                  CAST(sum(email) AS BIGINT) AS m_email,
                  CAST(sum(CASE WHEN ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_ip,
                  CAST(sum(ip) AS BIGINT) AS m_ip
           FROM per_row)
         SELECT pii_type, docs_with, total_matches, docs AS corpus_docs
         FROM (SELECT 'email' AS pii_type, d_email AS docs_with, m_email AS total_matches, docs FROM agg
               UNION ALL SELECT 'ip', d_ip, m_ip, docs FROM agg
               UNION ALL SELECT 'phone', d_phone, m_phone, docs FROM agg
               UNION ALL SELECT 'ssn', d_ssn, m_ssn, docs FROM agg)
         ORDER BY pii_type"""),
    "etl_k_anonymity" ->
      """WITH classes AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                  CAST(count(*) AS BIGINT) AS n
           FROM customer GROUP BY 1, 2, 3),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS classes,
                  CAST(sum(CASE WHEN n < 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                  CAST(sum(CASE WHEN n < 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
                  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS r5,
                  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT) AS c10,
                  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) AS r10
           FROM classes)
         SELECT k, classes, classes_at_risk, rows_at_risk
         FROM (SELECT CAST(2 AS BIGINT) AS k, classes, c2 AS classes_at_risk, r2 AS rows_at_risk FROM agg
               UNION ALL SELECT 5, classes, c5, r5 FROM agg
               UNION ALL SELECT 10, classes, c10, r10 FROM agg)
         ORDER BY k""",
    "etl_l_diversity" ->
      """WITH classes AS (
           SELECT c_nationkey,
                  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
           FROM customer GROUP BY 1, 2),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS classes,
                  CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                  CAST(sum(CASE WHEN l < 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
                  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                  CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT) AS r3,
                  CAST(sum(CASE WHEN l < 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                  CAST(sum(CASE WHEN l < 5 THEN n ELSE 0 END) AS BIGINT) AS r5
           FROM classes)
         SELECT l, classes, classes_at_risk, rows_at_risk
         FROM (SELECT CAST(2 AS BIGINT) AS l, classes, c2 AS classes_at_risk, r2 AS rows_at_risk FROM agg
               UNION ALL SELECT 3, classes, c3, r3 FROM agg
               UNION ALL SELECT 5, classes, c5, r5 FROM agg)
         ORDER BY l""",
    "etl_t_closeness" ->
      """WITH cell AS (
           SELECT c_nationkey,
                  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                  c_mktsegment, CAST(count(*) AS BIGINT) AS c
           FROM customer GROUP BY 1, 2, 3),
         gseg AS (SELECT c_mktsegment, CAST(sum(c) AS BIGINT) AS g
                  FROM cell GROUP BY 1),
         tot AS (SELECT CAST(sum(g) AS BIGINT) AS grand FROM gseg),
         nf AS (SELECT c_nationkey, bal_bucket, CAST(sum(c) AS BIGINT) AS n
                FROM cell GROUP BY 1, 2),
         cls AS (
           SELECT cell.c_nationkey, cell.bal_bucket,
                  max(nf.n) AS n, max(tot.grand) AS grand,
                  CAST(sum(abs(cell.c * tot.grand - gseg.g * nf.n)
                           - gseg.g * nf.n) AS BIGINT)
                    + max(nf.n) * max(tot.grand) AS s
           FROM cell
           JOIN gseg USING (c_mktsegment)
           JOIN nf USING (c_nationkey, bal_bucket)
           CROSS JOIN tot
           GROUP BY 1, 2),
         scored AS (
           SELECT n, grand, s,
                  CAST(s AS DOUBLE) /
                    (2.0 * CAST(n AS DOUBLE) * CAST(grand AS DOUBLE)) AS tvd
           FROM cls),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS classes,
                  floor(max(tvd) * 10000.0 + 0.5) / 10000.0 AS max_tvd,
                  CAST(sum(CASE WHEN s * 5 > n * grand * 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                  CAST(sum(CASE WHEN s * 5 > n * grand * 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
                  CAST(sum(CASE WHEN s * 5 > n * grand * 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                  CAST(sum(CASE WHEN s * 5 > n * grand * 3 THEN n ELSE 0 END) AS BIGINT) AS r3,
                  CAST(sum(CASE WHEN s * 1 > n * grand * 1 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                  CAST(sum(CASE WHEN s * 1 > n * grand * 1 THEN n ELSE 0 END) AS BIGINT) AS r5
           FROM scored)
         SELECT t, classes, classes_at_risk, rows_at_risk, max_tvd
         FROM (SELECT CAST(0.2 AS DOUBLE) AS t, classes, c2 AS classes_at_risk, r2 AS rows_at_risk, max_tvd FROM agg
               UNION ALL SELECT CAST(0.3 AS DOUBLE), classes, c3, r3, max_tvd FROM agg
               UNION ALL SELECT CAST(0.5 AS DOUBLE), classes, c5, r5, max_tvd FROM agg)
         ORDER BY t""")
}
