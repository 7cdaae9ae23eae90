package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Privacy
import graft.sources.Tables

/** Round-12 privacy/anonymization suite — the metadata-release step of
  * a training-data pipeline (in-content PII is q161/q183's scrub; these
  * gate the QUASI-IDENTIFIER surface): k-anonymity suppression (q186),
  * l-diversity homogeneity audit (q187), and the bounded generalization
  * ladder (q188). Quasi-identifiers are the documents table's natural
  * release metadata (lang, source, length buckets); q188's k is
  * corpus-proportional (N/10, the fixture shape) so the ladder
  * exercises multiple levels at every scale factor. */
object PrivacyQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  /** q190 mechanism constants — the SQL twin's CASE chain is GENERATED
    * from the same thresholds the engine embeds (anti-drift: one
    * constant source for both plans). */
  private val DpEps = 0.5
  private val DpSeed = "graft-r12-release"
  private val DpMaxShift = 40
  // q203 DP-sum constants (Δ = max(|lo|, |hi|) = 400 is the sensitivity)
  private val DpSumEps = 0.5
  private val DpSumSeed = "graft-r14-sums"
  private val DpSumLo = 0L
  private val DpSumHi = 400L
  private def dpNoiseCase(uE: String, eps: Double, maxShift: Int): String = {
    val ts = Privacy.geometricThresholds(eps, maxShift)
    val whens = ts.zipWithIndex.map { case (t, i) =>
      s"WHEN $uE < $t THEN ${i - maxShift}"
    }.mkString(" ")
    s"CASE $whens ELSE $maxShift END"
  }
  private val dpNoiseCaseSql: String = dpNoiseCase("u", DpEps, DpMaxShift)
  // q204 DP-mean constants: ε splits ε/2 count + ε/2 sum
  private val DpAvgEps = 1.0
  private val DpAvgSeed = "graft-r14-mean"
  private val DpAvgHi = 400L
  // q219 user-level constants: ε per USER, k-bounded contributions
  private val DpUserEps = 0.9
  private val DpUserK = 3
  private val DpUserSeed = "graft-r15-user"
  // q223 user-level sum constants: per-user per-group total clipped to
  // [0, 2000] — Δ = 2000 is the user-level sensitivity
  private val DpUserSumEps = 0.5
  private val DpUserSumSeed = "graft-r15-usersum"

  val queries: Seq[Q] = Seq(

    // k-anonymity by suppression (Privacy.kAnonymize): quasi =
    // (lang, source, length-bucket-500); rows in groups under k=5 are
    // flagged. Both verdicts fire tri-scale (87/43 .. 62/134 groups).
    Q("q186_k_anonymity",
      Some("""WITH g AS (SELECT lang, source, n_chars // 500 AS b,
             |    count(*) AS group_size
             |  FROM documents GROUP BY 1, 2, 3)
             |SELECT d.doc_id, g.group_size, g.group_size < 5 AS suppressed
             |FROM documents d JOIN g ON g.lang = d.lang
             |  AND g.source = d.source AND g.b = d.n_chars // 500""".stripMargin),
      (s, dir) =>
        Privacy.kAnonymize(docs(s, dir),
            Seq(col("lang"), col("source"), (col("n_chars") / 500).cast("long")),
            k = 5L)
          .select(col("doc_id"), col("group_size"), col("suppressed"))),

    // l-diversity audit (Privacy.lDiversity): per (lang, source) group,
    // distinct length-bucket-50 sensitive values; diverse iff >= 5.
    // Group-level output (the audit artifact a release pipeline files).
    Q("q187_l_diversity",
      Some("""SELECT lang AS q0, source AS q1,
             |  count(*) AS group_size,
             |  CAST(count(DISTINCT n_chars // 50) AS BIGINT) AS n_sensitive,
             |  count(DISTINCT n_chars // 50) >= 5 AS diverse
             |FROM documents GROUP BY 1, 2""".stripMargin),
      (s, dir) =>
        Privacy.lDiversity(docs(s, dir), Seq(col("lang"), col("source")),
          (col("n_chars") / 50).cast("long"), l = 5L)),

    // Bounded generalization ladder (Privacy.generalizeUntilK): coarsen
    // n_chars to the smallest 25*2^level bucket holding >= N/10 rows
    // (4 levels); the released value is the bucket floor. The ladder
    // lands on levels 1-3 at every sf (no level-0 bucket is ever a
    // tenth of the corpus at width 25).
    Q("q188_generalize_ladder",
      Some("""WITH n AS (SELECT count(*) // 10 AS k FROM documents),
             |lv AS (SELECT doc_id, n_chars,
             |    unnest(range(0, 4)) AS level FROM documents),
             |b AS (SELECT doc_id, level,
             |    (n_chars // (25 * (1 << level))) * (25 * (1 << level))
             |      AS bucket FROM lv),
             |s AS (SELECT level, bucket, count(*) AS n FROM b GROUP BY 1, 2),
             |ch AS (SELECT doc_id, min(b.level) AS lev
             |  FROM b JOIN s USING (level, bucket), n
             |  WHERE s.n >= n.k GROUP BY 1)
             |SELECT d.doc_id, CAST(coalesce(ch.lev, -1) AS BIGINT) AS level,
             |  b.bucket, s.n AS group_size
             |FROM documents d
             |LEFT JOIN ch ON ch.doc_id = d.doc_id
             |LEFT JOIN b ON b.doc_id = d.doc_id AND b.level = ch.lev
             |LEFT JOIN s ON s.level = b.level AND s.bucket = b.bucket""".stripMargin),
      (s, dir) => {
        val d = docs(s, dir)
        // fixture k is corpus-proportional; the one count action is the
        // fixture's, not the operator's (k is a policy literal there)
        val k = math.max(1L, d.count() / 10L)
        Privacy.generalizeUntilK(d, col("doc_id"), col("n_chars"),
            baseWidth = 25L, maxLevels = 4, k = k)
          .select(col("doc_id"), col("level"), col("bucket"), col("group_size"))
      }),

    // t-closeness audit (Privacy.tCloseness): per (lang, source) group,
    // integer-exact total-variation distance of the length-bucket-50
    // distribution vs the corpus-wide one; close iff TVD <= 1/3 (the
    // threshold inside every sf's TVD range, so both verdicts fire
    // tri-scale: 9/99, 3/97, 98/100 close).
    Q("q189_t_closeness",
      Some("""WITH tot AS (SELECT count(*) AS n FROM documents),
             |gl AS (SELECT n_chars // 50 AS v, count(*) AS cv
             |  FROM documents GROUP BY 1),
             |gv AS (SELECT lang AS q0, source AS q1, n_chars // 50 AS v,
             |    count(*) AS cgv FROM documents GROUP BY 1, 2, 3),
             |sz AS (SELECT q0, q1, CAST(sum(cgv) AS BIGINT) AS ng
             |  FROM gv GROUP BY 1, 2)
             |SELECT gv.q0, gv.q1, max(sz.ng) AS group_size,
             |  CAST(sum(abs(gv.cgv * tot.n - gl.cv * sz.ng))
             |    + (max(tot.n) - sum(gl.cv)) * max(sz.ng) AS BIGINT) AS tvd_num,
             |  3 * (CAST(sum(abs(gv.cgv * tot.n - gl.cv * sz.ng))
             |    + (max(tot.n) - sum(gl.cv)) * max(sz.ng) AS BIGINT))
             |    <= 2 * max(sz.ng) * max(tot.n) AS close
             |FROM gv JOIN gl USING (v) JOIN sz USING (q0, q1), tot
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) =>
        Privacy.tCloseness(docs(s, dir), Seq(col("lang"), col("source")),
          (col("n_chars") / 50).cast("long"), tNum = 1L, tDen = 3L)),

    // Deterministic eps-DP noisy count release (Privacy.dpNoisyCounts):
    // per (lang, source) group, count + two-sided-geometric noise
    // derived from md5(seed|keys) through the inverse-CDF table — the
    // SQL twin's CASE chain is generated from the SAME thresholds.
    Q("q190_dp_noisy_release",
      Some(s"""WITH c AS (SELECT lang AS q0, source AS q1,
              |    count(*) AS group_size FROM documents GROUP BY 1, 2),
              |h AS (SELECT q0, q1, group_size,
              |  ('0x' || substr(md5('$DpSeed' || '|' || q0 || '|' || q1), 1, 6))::BIGINT
              |    AS u FROM c),
              |n AS (SELECT q0, q1, group_size,
              |  CAST($dpNoiseCaseSql AS BIGINT) AS noise FROM h)
              |SELECT q0, q1, group_size, noise,
              |  greatest(0, group_size + noise) AS released FROM n""".stripMargin),
      (s, dir) =>
        Privacy.dpNoisyCounts(docs(s, dir), Seq(col("lang"), col("source")),
          eps = DpEps, seed = DpSeed, maxShift = DpMaxShift)),

    // ε-DP noisy SUM release (Privacy.dpNoisySums): per-(lang, source)
    // char-mass sums with per-row contribution clipped to [0, 400]
    // (Δ = 400 = the sensitivity), discrete-Laplace noise at ε/Δ from
    // the CLOSED-FORM inverse CDF — q190's table would need thousands
    // of branches at this Δ. All mechanism constants (p, 1+p, p/(1+p),
    // ln p) fold in Scala and print into this twin, so both engines'
    // runtime float work is the identical multiply+ln+divide+floor tree.
    Q("q203_dp_noisy_sums", {
      val delta = math.max(math.abs(DpSumLo), math.abs(DpSumHi)).toDouble
      val p = math.exp(-DpSumEps / delta)
      Some(s"""WITH s AS (SELECT lang AS q0, source AS q1,
              |    CAST(sum(greatest($DpSumLo, least($DpSumHi, n_chars)))
              |      AS BIGINT) AS group_sum
              |  FROM documents GROUP BY 1, 2),
              |h AS (SELECT q0, q1, group_sum,
              |  (('0x' || substr(md5('$DpSumSeed' || '|' || q0 || '|' || q1), 1, 6))::BIGINT
              |    + 0.5) / 16777216.0 AS u FROM s),
              |n AS (SELECT q0, q1, group_sum,
              |  CAST(CASE WHEN u < ${p / (1 + p)}
              |       THEN 1 - ceil(ln(u * ${1 + p}) / ${math.log(p)})
              |       ELSE floor(ln((1 - u) * ${1 + p}) / ${math.log(p)}) END
              |    AS BIGINT) AS noise FROM h)
              |SELECT q0, q1, group_sum, noise,
              |  greatest(0, group_sum + noise) AS released FROM n""".stripMargin)
    },
      (s, dir) =>
        Privacy.dpNoisySums(docs(s, dir), Seq(col("lang"), col("source")),
          col("n_chars"), clipLo = DpSumLo, clipHi = DpSumHi,
          eps = DpSumEps, seed = DpSumSeed)),

    // ε-DP noisy MEAN (Privacy.dpNoisyAvg) — the DP release trio's
    // third member: ε/2 to the count (q190's table mechanism), ε/2 to
    // the clipped sum (q203's closed form), DOMAIN-SEPARATED uniforms
    // (seed|count|keys vs seed|sum|keys — one shared uniform would
    // correlate the noises through the ratio), mean as the exact
    // staged-integer micro-ratio of the two releases (post-processing).
    Q("q204_dp_noisy_mean", {
      import graft.operators.Sampling.microRatioSql
      val epsHalf = DpAvgEps / 2
      val p = math.exp(-epsHalf / DpAvgHi.toDouble)
      val countCase = dpNoiseCase("uc", epsHalf, DpMaxShift)
      Some(s"""WITH s AS (SELECT lang AS q0, source AS q1,
              |    count(*) AS group_size,
              |    CAST(sum(greatest(0, least($DpAvgHi, n_chars))) AS BIGINT)
              |      AS group_sum
              |  FROM documents GROUP BY 1, 2),
              |h AS (SELECT q0, q1, group_size, group_sum,
              |  ('0x' || substr(md5('$DpAvgSeed' || '|count|' || q0 || '|' || q1), 1, 6))::BIGINT
              |    AS uc,
              |  (('0x' || substr(md5('$DpAvgSeed' || '|sum|' || q0 || '|' || q1), 1, 6))::BIGINT
              |    + 0.5) / 16777216.0 AS us
              |  FROM s),
              |n AS (SELECT q0, q1, group_size, group_sum,
              |  greatest(0, group_size + CAST($countCase AS BIGINT)) AS released_count,
              |  greatest(0, group_sum + CAST(CASE WHEN us < ${p / (1 + p)}
              |      THEN 1 - ceil(ln(us * ${1 + p}) / ${math.log(p)})
              |      ELSE floor(ln((1 - us) * ${1 + p}) / ${math.log(p)}) END
              |    AS BIGINT)) AS released_sum
              |  FROM h)
              |SELECT q0, q1, group_size, group_sum, released_count, released_sum,
              |  ${microRatioSql("released_sum", "greatest(1, released_count)", "//")}
              |    AS mean_micro
              |FROM n""".stripMargin)
    },
      (s, dir) =>
        Privacy.dpNoisyAvg(docs(s, dir), Seq(col("lang"), col("source")),
          col("n_chars"), clipLo = 0L, clipHi = DpAvgHi,
          eps = DpAvgEps, seed = DpAvgSeed, maxShift = DpMaxShift)),

    // DP budget ledger + composed audit (Privacy.dpLedger /
    // dpBudgetAudit): the q190/q203/q204 trio re-run as a REAL
    // multi-release pipeline over documents (counts + sums + mean —
    // the mean contributing its two ε/2 mechanism halves), plus two
    // event-table releases that REUSE a seed. Per table: cumulative
    // micro-ε under sequential composition vs a 1.5ε budget
    // (documents: 2.0ε spent → over budget; events: 0.5ε → within)
    // and the seed-hygiene flag (events' reuse fires it, documents'
    // domain-separated seeds don't) — both verdicts of both flags
    // fire tri-scale. All-integer arithmetic; n_groups comes from the
    // actually-released frames.
    Q("q216_dp_budget_ledger",
      Some(s"""WITH gd AS (SELECT CAST(count(*) AS BIGINT) AS ng
              |  FROM (SELECT DISTINCT lang, source FROM documents)),
              |ge AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS ng
              |  FROM events),
              |led AS (
              |  SELECT 'rel_counts' AS release, 'documents' AS table_name,
              |    CAST(500000 AS BIGINT) AS eps_micro, '$DpSeed' AS seed_domain,
              |    ng AS n_groups FROM gd
              |  UNION ALL SELECT 'rel_sums', 'documents', 500000,
              |    '$DpSumSeed', ng FROM gd
              |  UNION ALL SELECT 'rel_mean', 'documents', 500000,
              |    '$DpAvgSeed' || '|count', ng FROM gd
              |  UNION ALL SELECT 'rel_mean', 'documents', 500000,
              |    '$DpAvgSeed' || '|sum', ng FROM gd
              |  UNION ALL SELECT 'rel_ev_a', 'events', 250000,
              |    'graft-r15-ev', ng FROM ge
              |  UNION ALL SELECT 'rel_ev_b', 'events', 250000,
              |    'graft-r15-ev', ng FROM ge)
              |SELECT table_name,
              |  CAST(count(DISTINCT release) AS BIGINT) AS n_releases,
              |  count(*) AS n_mechanisms,
              |  CAST(sum(eps_micro) AS BIGINT) AS spent_eps_micro,
              |  CAST(count(DISTINCT seed_domain) AS BIGINT) AS n_seed_domains,
              |  CAST(sum(n_groups) AS BIGINT) AS n_groups_released,
              |  CAST(1500000 AS BIGINT) AS budget_eps_micro,
              |  CAST(1500000 - sum(eps_micro) AS BIGINT) AS remaining_eps_micro,
              |  sum(eps_micro) > 1500000 AS over_budget,
              |  count(*) > count(DISTINCT seed_domain) AS seed_reused
              |FROM led GROUP BY table_name""".stripMargin),
      (s, dir) => {
        val d = docs(s, dir)
        val quasi = Seq(col("lang"), col("source"))
        val ev = Tables.events(s, dir)
        val evQuasi = Seq(col("event_type"))
        // run the releases; each count() is the published row count
        val nDoc = Privacy.dpNoisyCounts(d, quasi, DpEps, DpSeed,
          DpMaxShift).count()
        val nSum = Privacy.dpNoisySums(d, quasi, col("n_chars"),
          DpSumLo, DpSumHi, DpSumEps, DpSumSeed).count()
        val nAvg = Privacy.dpNoisyAvg(d, quasi, col("n_chars"),
          0L, DpAvgHi, DpAvgEps, DpAvgSeed, DpMaxShift).count()
        val nEvA = Privacy.dpNoisyCounts(ev, evQuasi, 0.25,
          "graft-r15-ev").count()
        val nEvB = Privacy.dpNoisyCounts(ev, evQuasi, 0.25,
          "graft-r15-ev").count() // the seed-reuse defect the audit flags
        val ledger = Privacy.dpLedger(s,
          Privacy.spendOfCounts("rel_counts", "documents", DpEps, DpSeed, nDoc) ++
          Privacy.spendOfSums("rel_sums", "documents", DpSumEps,
            DpSumLo, DpSumHi, DpSumSeed, nSum) ++
          Privacy.spendOfAvg("rel_mean", "documents", DpAvgEps,
            DpAvgHi, DpAvgSeed, nAvg) ++
          Privacy.spendOfCounts("rel_ev_a", "events", 0.25, "graft-r15-ev", nEvA) ++
          Privacy.spendOfCounts("rel_ev_b", "events", 0.25, "graft-r15-ev", nEvB))
        Privacy.dpBudgetAudit(ledger, budgetMicroEps = 1500000L)
      }),

    // USER-level ε-DP noisy counts (Privacy.dpNoisyCountsByUser): the
    // row-level q190 contract is wrong for event tables — one user
    // contributes MANY rows, so row-level ε protects almost nothing.
    // Contributions are bounded at k=3 under the deterministic total
    // order (ts, event_id), then the count mechanism runs at ε/k; by
    // group privacy the release is ε-DP per USER. The oracle replays
    // the bound (row_number window) and the noise (CASE chain generated
    // from geometricThresholds at ε/k — the one constant source).
    // Ledger rows for this release come from spendOfUserCounts, which
    // records sensitivity k so the audit charges the user-level price.
    Q("q219_dp_user_level", {
      val caseSql = dpNoiseCase("u", DpUserEps / DpUserK, DpMaxShift)
      Some(s"""WITH b AS (
              |  SELECT event_type FROM (
              |    SELECT event_type, row_number() OVER (
              |        PARTITION BY user_id ORDER BY ts, event_id) AS rk
              |    FROM events) WHERE rk <= $DpUserK),
              |c AS (SELECT event_type AS q0, count(*) AS group_size
              |  FROM b GROUP BY 1),
              |h AS (SELECT q0, group_size,
              |  ('0x' || substr(md5('$DpUserSeed' || '|' || q0), 1, 6))::BIGINT
              |    AS u FROM c),
              |n AS (SELECT q0, group_size,
              |  CAST($caseSql AS BIGINT) AS noise FROM h)
              |SELECT q0, group_size, noise,
              |  greatest(0, group_size + noise) AS released FROM n""".stripMargin)
    },
      (s, dir) =>
        Privacy.dpNoisyCountsByUser(Tables.events(s, dir), col("user_id"),
          Seq(col("ts"), col("event_id")), k = DpUserK,
          quasi = Seq(col("event_type")), eps = DpUserEps,
          seed = DpUserSeed, maxShift = DpMaxShift)),

    // USER-level ε-DP noisy SUMS (Privacy.dpNoisySumsByUser): value mass
    // pre-aggregated per (user, event_type) — after which rows ARE
    // individuals, dpNoisySums' documented contract — each user's
    // per-group TOTAL clipped to [0, 2000] (Δ = 2000 is now the
    // USER-level sensitivity), closed-form discrete-Laplace at ε/Δ.
    // The oracle replays pre-aggregate, clip, and noise; floor(value)
    // (not a raw double cast) keeps the integer conversion identical
    // across engines (Spark CAST truncates, DuckDB CAST rounds).
    Q("q223_dp_user_sums", {
      val p = math.exp(-DpUserSumEps / 2000.0)
      Some(s"""WITH pu AS (SELECT user_id, event_type AS q0,
              |    CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS uv
              |  FROM events GROUP BY 1, 2),
              |s AS (SELECT q0,
              |    CAST(sum(greatest(0, least(2000, uv))) AS BIGINT) AS group_sum
              |  FROM pu GROUP BY 1),
              |h AS (SELECT q0, group_sum,
              |  (('0x' || substr(md5('$DpUserSumSeed' || '|' || q0), 1, 6))::BIGINT
              |    + 0.5) / 16777216.0 AS u FROM s),
              |n AS (SELECT q0, group_sum,
              |  CAST(CASE WHEN u < ${p / (1 + p)}
              |       THEN 1 - ceil(ln(u * ${1 + p}) / ${math.log(p)})
              |       ELSE floor(ln((1 - u) * ${1 + p}) / ${math.log(p)}) END
              |    AS BIGINT) AS noise FROM h)
              |SELECT q0, group_sum, noise,
              |  greatest(0, group_sum + noise) AS released FROM n""".stripMargin)
    },
      (s, dir) =>
        Privacy.dpNoisySumsByUser(Tables.events(s, dir), col("user_id"),
          Seq(col("event_type")), floor(col("value")),
          clipLo = 0L, clipHi = 2000L, eps = DpUserSumEps,
          seed = DpUserSumSeed)),

    // Keyed pseudonymization (Privacy.pseudonymize): doc_id and source
    // replaced by sha2-256(secret|col|value); the released frame still
    // groups correctly on the pseudonym (per-source doc counts over
    // pseudonyms == over raw ids — referential integrity preserved).
    Q("q191_pseudonymize",
      Some("""SELECT sha256('rel-2026|source|' || source) AS source,
             |  count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  min(sha256('rel-2026|doc_id|' || CAST(doc_id AS VARCHAR)))
             |    AS min_doc_pseud
             |FROM documents GROUP BY 1""".stripMargin),
      (s, dir) =>
        Privacy.pseudonymize(docs(s, dir)
            .select("doc_id", "source", "n_chars"),
            Seq("doc_id", "source"), secret = "rel-2026")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"),
            min("doc_id").as("min_doc_pseud"))),

    // Erasure cascade audit (Privacy.erasureAudit): deletion requests
    // (every 20th user — a portable fixture predicate; production
    // feeds an external request frame) audited through the base events
    // table AND a derived per-(user, event_type) materialization — the
    // regulator's "what was deleted where" artifact.
    Q("q192_erasure_cascade",
      Some("""WITH req AS (SELECT DISTINCT user_id FROM events
             |  WHERE user_id % 20 = 0),
             |d AS (SELECT user_id, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT 'events' AS table_name,
             |  count(*) AS rows_before,
             |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM req)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_erased,
             |  count(*) - CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM req)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_after
             |FROM events
             |UNION ALL
             |SELECT 'user_type_counts', count(*),
             |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM req)
             |    THEN 1 ELSE 0 END) AS BIGINT),
             |  count(*) - CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM req)
             |    THEN 1 ELSE 0 END) AS BIGINT)
             |FROM d""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val requests = ev.filter(col("user_id") % 20 === 0)
          .select("user_id")
        val derived = ev.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
        Privacy.erasureAudit(Seq(
          ("events", ev, col("user_id")),
          ("user_type_counts", derived, col("user_id"))), requests)
      }))
}
