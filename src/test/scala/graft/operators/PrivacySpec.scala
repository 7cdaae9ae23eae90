package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymize: small quasi groups flagged, audit trail keeps every row") {
    val rows = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "en", "book"),                     // singleton -> suppressed
      (5L, "de", "web"), (6L, "de", "web"))   // pair at k=3 -> suppressed
      .toDF("id", "lang", "src")
    val got = Privacy.kAnonymize(rows, Seq(col("lang"), col("src")), k = 3L)
      .select("id", "group_size", "suppressed")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 6, "every row must come back with its verdict")
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) == ((3L, false)), got.toString))
    assert(got(4L) == ((1L, true)), got.toString)
    Seq(5L, 6L).foreach(i => assert(got(i) == ((2L, true)), got.toString))
  }

  test("lDiversity: the homogeneity attack case — k-anonymous but constant-sensitive") {
    val rows = Seq(
      // group (en, web): 3 rows, all the same diagnosis -> NOT diverse
      (1L, "en", "web", "flu"), (2L, "en", "web", "flu"), (3L, "en", "web", "flu"),
      // group (de, web): 3 rows, 2 distinct -> diverse at l=2, not at l=3
      (4L, "de", "web", "flu"), (5L, "de", "web", "cold"), (6L, "de", "web", "cold"))
      .toDF("id", "lang", "src", "diag")
    def audit(l: Long) =
      Privacy.lDiversity(rows, Seq(col("lang"), col("src")), col("diag"), l)
        .select("q0", "group_size", "n_sensitive", "diverse")
        .as[(String, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val l2 = audit(2L)
    assert(l2("en") == ((3L, 1L, false)),
      s"k-anonymous constant-sensitive group must fail diversity: $l2")
    assert(l2("de") == ((3L, 2L, true)), l2.toString)
    assert(audit(3L)("de")._3 == false, "l is a real threshold")
  }

  test("generalizeUntilK: minimal qualifying width, floor-bucket release, suppression") {
    // values 0..9 (width-10 bucket 0 holds 10) plus a far outlier at
    // 1000 that no level of a 4-level base-5 ladder can crowd
    val rows = ((0L until 10L).map(v => (v, v)) :+ ((99L, 1000L)))
      .toDF("id", "v")
    val got = Privacy.generalizeUntilK(rows, col("id"), col("v"),
        baseWidth = 5L, maxLevels = 2, k = 8L)
      .select("id", "level", "bucket", "group_size")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // level 0 buckets (w=5): {0..4}, {5..9} -> 5 rows each, under k=8;
    // level 1 (w=10): {0..9} -> 10 rows >= 8. Minimal level is 1.
    (0L until 10L).foreach { v =>
      assert(got(v) == ((1L, Some(0L), Some(10L))),
        s"v=$v must generalize to the level-1 bucket: ${got(v)}")
    }
    // the outlier's bucket holds 1 row at every level -> suppressed
    assert(got(99L) == ((-1L, None, None)), got.toString)
    // minimality cross-check: with k=5 level 0 already qualifies and the
    // released bucket is the FINER floor
    val fine = Privacy.generalizeUntilK(rows, col("id"), col("v"),
        baseWidth = 5L, maxLevels = 2, k = 5L)
      .select("id", "level", "bucket")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fine(3L) == ((0L, Some(0L))) && fine(7L) == ((0L, Some(5L))), fine.toString)
  }

  test("tCloseness: integer-exact TVD — skewed group caught, matching group passes") {
    // global sensitive histogram: a=4, b=4 (N=8); group de matches it
    // exactly (TVD 0); en and fr are each ALL one value (TVD 1/2)
    val rows = Seq(
      (1L, "en", "a"), (2L, "en", "a"),
      (3L, "de", "a"), (4L, "de", "a"), (5L, "de", "b"), (6L, "de", "b"),
      (7L, "fr", "b"), (8L, "fr", "b")).toDF("id", "lang", "s")
    val got = Privacy.tCloseness(rows, Seq(col("lang")), col("s"),
        tNum = 1L, tDen = 4L)
      .select("q0", "group_size", "tvd_num", "close")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // en: present |2*8-4*2|=8, absent-mass (8-4)*2=8 -> 16; TVD=16/32=1/2
    assert(got("en") == ((2L, 16L, false)), got.toString)
    assert(got("fr") == ((2L, 16L, false)), got.toString)
    // de: both values match global proportions exactly -> 0
    assert(got("de") == ((4L, 0L, true)), got.toString)
    // threshold boundary is inclusive: at t=1/2 the skewed groups are
    // (exactly) close — the integer comparison has no float slack
    val loose = Privacy.tCloseness(rows, Seq(col("lang")), col("s"), 1L, 2L)
      .select("q0", "close").as[(String, Boolean)].collect().toMap
    assert(loose("en") && loose("fr"), loose.toString)
  }

  test("dpNoisyCounts: deterministic, table-exact noise; clamped release") {
    val rows = (1L to 100L).map { i =>
      (i, if (i <= 60) "en" else if (i <= 90) "de" else "fr",
        if (i % 2 == 0) "web" else "book")
    }.toDF("id", "lang", "src")
    val eps = 0.5; val seed = "spec-seed"; val b = 40
    def release(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpNoisyCounts(df, Seq(col("lang"), col("src")), eps, seed, b)
        .select("q0", "q1", "group_size", "noise", "released")
        .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val got = release(rows)
    assert(got.length == 6)
    // engine-side noise equals a from-scratch JVM replay of the mechanism
    val thresholds = Privacy.geometricThresholds(eps, b)
    got.foreach { case (q0, q1, n, noise, rel) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$q0|$q1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(h.take(6), 16)
      val idx = thresholds.indexWhere(u < _)
      val expect = (if (idx < 0) b else idx - b).toLong
      assert(noise == expect, s"($q0,$q1): noise $noise != replayed $expect")
      assert(rel == math.max(0L, n + noise))
      assert(math.abs(noise) <= b)
    }
    // partitioning-invariant (the determinism a release audit needs)
    assert(release(rows.repartition(7, col("id"))).toSeq == got.toSeq)
    // threshold table is a valid monotone CDF image ending at full mass
    assert(thresholds.zip(thresholds.tail).forall { case (a2, b2) => a2 <= b2 })
    assert(thresholds.last >= (1L << 24) - 2, thresholds.last.toString)
  }

  test("dpNoisySums: clipped sensitivity, JVM-replayed closed-form noise, clamp") {
    // values straddle the clip bounds so the clamp does real work
    val rows = (1L to 100L).map { i =>
      (i, if (i <= 60) "en" else "de", if (i % 2 == 0) "web" else "book",
        i * 13L % 700L) // 0..699, clip [0, 400] bites on ~43% of rows
    }.toDF("id", "lang", "src", "v")
    val eps = 0.5; val seed = "sum-seed"; val lo = 0L; val hi = 400L
    def release(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpNoisySums(df, Seq(col("lang"), col("src")), col("v"),
          lo, hi, eps, seed)
        .select("q0", "q1", "group_sum", "noise", "released")
        .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val got = release(rows)
    assert(got.length == 4)
    // group_sum is the CLIPPED sum (driver-replayed)
    val wantSums = (1L to 100L).map { i =>
      ((if (i <= 60) "en" else "de", if (i % 2 == 0) "web" else "book"),
        math.min(hi, math.max(lo, i * 13L % 700L)))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // noise equals a from-scratch JVM replay of the closed-form inverse CDF
    val delta = hi.toDouble
    val p = math.exp(-eps / delta)
    got.foreach { case (q0, q1, s, noise, rel) =>
      assert(s == wantSums((q0, q1)), s"($q0,$q1): clipped sum")
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$q0|$q1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(h.take(6), 16) + 0.5) / 16777216.0
      val expect =
        if (u < p / (1 + p)) 1L - math.ceil(math.log(u * (1 + p)) / math.log(p)).toLong
        else math.floor(math.log((1 - u) * (1 + p)) / math.log(p)).toLong
      assert(noise == expect, s"($q0,$q1): noise $noise != replayed $expect")
      assert(rel == math.max(0L, s + noise))
    }
    // noise scale is Δ/ε-ish, not count-scale: some group must move by > 40
    assert(got.exists(g => math.abs(g._4) > 40L),
      s"expected sum-scale noise, got ${got.map(_._4).toSeq}")
    // partitioning-invariant (the determinism a release audit needs)
    assert(release(rows.repartition(7, col("id"))).toSeq == got.toSeq)
    // negative clip bounds skip the 0-clamp (sums may be negative)
    val signed = Privacy.dpNoisySums(rows.toDF(), Seq(col("lang")),
        col("v") - 650L, -100L, 100L, eps = 5.0, seed)
      .select("group_sum", "noise", "released")
      .as[(Long, Long, Long)].collect()
    signed.foreach { case (s, n, r) => assert(r == s + n, "no clamp when lo < 0") }
    assert(signed.exists(_._1 < 0), "fixture must produce a negative sum")
    intercept[IllegalArgumentException] {
      Privacy.dpNoisySums(rows.toDF(), Seq(col("lang")), col("v"), 5L, 5L, eps, seed)
    }
  }

  test("dpNoisyAvg: split-budget trio — both halves JVM-replayed, exact micro-ratio") {
    val rows = (1L to 100L).map { i =>
      (i, if (i <= 60) "en" else "de", if (i % 2 == 0) "web" else "book",
        i * 13L % 700L)
    }.toDF("id", "lang", "src", "v")
    val eps = 1.0; val seed = "mean-seed"; val hi = 400L; val b = 40
    val got = Privacy.dpNoisyAvg(rows, Seq(col("lang"), col("src")), col("v"),
        0L, hi, eps, seed, b)
      .select("q0", "q1", "group_size", "group_sum",
        "released_count", "released_sum", "mean_micro")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length == 4)
    val epsHalf = eps / 2
    val p = math.exp(-epsHalf / hi.toDouble)
    val thresholds = Privacy.geometricThresholds(epsHalf, b)
    def u24(tag: String, q0: String, q1: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$tag|$q0|$q1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(6), 16)
    }
    got.foreach { case (q0, q1, n, s, rc, rs, m) =>
      val idx = thresholds.indexWhere(u24("count", q0, q1) < _)
      val nc = (if (idx < 0) b else idx - b).toLong
      assert(rc == math.max(0L, n + nc), s"($q0,$q1): count half")
      val us = (u24("sum", q0, q1) + 0.5) / 16777216.0
      val ns =
        if (us < p / (1 + p)) 1L - math.ceil(math.log(us * (1 + p)) / math.log(p)).toLong
        else math.floor(math.log((1 - us) * (1 + p)) / math.log(p)).toLong
      assert(rs == math.max(0L, s + ns), s"($q0,$q1): sum half")
      val d = math.max(1L, rc)
      val expectM = (rs * 1000L / d) * 1000L + (rs * 1000L % d) * 1000L / d
      assert(m == expectM, s"($q0,$q1): micro-ratio")
      assert(math.abs(nc) <= b, "count noise is count-scale (table-bounded)")
    }
    // sum noise must be sum-scale somewhere (domain separation is real:
    // the two halves draw from different uniforms and mechanisms)
    assert(got.exists(g => math.abs(g._6 - g._4) > b),
      s"expected a sum-scale perturbation beyond the count table bound")
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyAvg(rows.toDF(), Seq(col("lang")), col("v"),
        -1L, hi, eps, seed)
    }
  }

  test("pseudonymize: referential integrity, domain separation, secret rotation") {
    val users = Seq((1L, "alice"), (2L, "bob")).toDF("uid", "name")
    val events = Seq((1L, "click"), (1L, "view"), (2L, "click"), (3L, "view"))
      .toDF("uid", "kind")
    def p(df: org.apache.spark.sql.DataFrame, secret: String) =
      Privacy.pseudonymize(df, Seq("uid"), secret)
    // joins over the pseudonym reproduce the raw join exactly
    val raw = users.join(events, "uid").select("name", "kind")
      .as[(String, String)].collect().sorted
    val pseud = p(users, "s1").join(p(events, "s1"), "uid")
      .select("name", "kind").as[(String, String)].collect().sorted
    assert(pseud.toSeq == raw.toSeq, "pseudonym join must equal raw join")
    // the pseudonym is a 64-hex sha2 string, not the raw id
    val ids = p(events, "s1").select("uid").as[String].collect()
    assert(ids.forall(s => s.length == 64 && s.matches("[0-9a-f]+")))
    // rotating the secret unlinks releases
    val s1 = p(events, "s1").select("uid").as[String].collect().toSet
    val s2 = p(events, "s2").select("uid").as[String].collect().toSet
    assert(s1.intersect(s2).isEmpty, "different secrets must not collide")
    // domain separation: the same raw VALUE in different columns
    // pseudonymizes differently (no cross-column linkage)
    val two = Seq((7L, 7L)).toDF("a", "b")
    val sep = Privacy.pseudonymize(two, Seq("a", "b"), "s1")
      .as[(String, String)].head()
    assert(sep._1 != sep._2, "column-name domain separation")
    // unknown columns fail loudly, not silently no-op
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(events, Seq("nope"), "s1")
    }
  }

  test("eraseByKey/erasureAudit: cascade commutes, duplicate requests idempotent") {
    val events = Seq(
      (1L, "click"), (1L, "view"), (2L, "click"),
      (3L, "view"), (3L, "view"), (4L, "click"))
      .toDF("uid", "kind")
    // duplicate + never-present requests: erasure must be idempotent
    // and not over-count
    val requests = Seq(1L, 1L, 3L, 99L).toDF("uid")
    val erased = Privacy.eraseByKey(events, col("uid"), requests)
    assert(erased.select("uid").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    // cascade soundness: erase-then-derive == derive-then-erase for a
    // user-keyed derivation (what justifies cascading through
    // materialized tables instead of recomputing them)
    def derive(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("uid").agg(count(lit(1)).as("n"))
    val a = derive(erased).as[(Long, Long)].collect().sorted
    val b = Privacy.eraseByKey(derive(events), col("uid"), requests)
      .as[(Long, Long)].collect().sorted
    assert(a.toSeq == b.toSeq, "erasure must commute with per-key derivation")
    // the audit artifact: per-table before/erased/after arithmetic
    val audit = Privacy.erasureAudit(Seq(
        ("events", events, col("uid")),
        ("user_counts", derive(events), col("uid"))), requests)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(audit("events") == ((6L, 4L, 2L)), audit.toString)
    assert(audit("user_counts") == ((4L, 2L, 2L)), audit.toString)
    // malformed request frames fail loudly
    intercept[IllegalArgumentException] {
      Privacy.eraseByKey(events, col("uid"), events)
    }
  }

  test("dpLedger/dpBudgetAudit: composition arithmetic, seed hygiene, " +
    "and spend rows that mirror the mechanisms' actual budget splits") {
    // spendOfAvg must mirror dpNoisyAvg: ε/2 + ε/2, domain-separated
    // |count / |sum seeds — the accounting can't drift from the split
    val avg = Privacy.spendOfAvg("r", "t", eps = 1.0, clipHi = 400L,
      seed = "s", nGroups = 7L)
    assert(avg.map(_.epsMicro) === Seq(500000L, 500000L))
    assert(avg.map(_.seedDomain) === Seq("s|count", "s|sum"))
    assert(avg.map(_.sensitivity) === Seq(1L, 400L))
    assert(Privacy.spendOfSums("r", "t", 0.3, -50L, 40L, "s", 1L)
      .head.sensitivity === 50L, "Δ = max(|lo|, |hi|), the mechanism's")
    assert(Privacy.spendOfCounts("r", "t", 0.25, "s", 1L)
      .head.epsMicro === 250000L)

    val ledger = Privacy.dpLedger(spark,
      Privacy.spendOfCounts("a", "docs", 0.5, "s1", 10L) ++
      Privacy.spendOfAvg("b", "docs", 1.0, 400L, "s2", 10L) ++
      Privacy.spendOfCounts("c", "ev", 0.25, "sx", 3L) ++
      Privacy.spendOfCounts("d", "ev", 0.25, "sx", 3L)) // seed reuse
    val audit = Privacy.dpBudgetAudit(ledger, budgetMicroEps = 1200000L)
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
    val docsRow = audit("docs")
    assert(docsRow.getAs[Long]("spent_eps_micro") === 1500000L)
    assert(docsRow.getAs[Long]("remaining_eps_micro") === -300000L)
    assert(docsRow.getAs[Boolean]("over_budget"))
    assert(!docsRow.getAs[Boolean]("seed_reused"),
      "domain-separated mean halves are NOT seed reuse")
    val evRow = audit("ev")
    assert(evRow.getAs[Long]("spent_eps_micro") === 500000L)
    assert(!evRow.getAs[Boolean]("over_budget"))
    assert(evRow.getAs[Boolean]("seed_reused"),
      "two releases hashing under one seed must be flagged")
    assert(evRow.getAs[Long]("n_releases") === 2L)
    intercept[IllegalArgumentException] {
      Privacy.dpLedger(spark, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpBudgetAudit(ledger, 0L)
    }
  }

  test("boundContributions: first k per user under the total order") {
    val df = Seq(
      ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "c"),
      ("u1", 40L, "d"), ("u1", 50L, "e"),
      ("u2", 15L, "x"), ("u2", 25L, "y")).toDF("user", "ts", "tag")
    val kept = Privacy.boundContributions(df, col("user"), 3,
        Seq(col("ts"), col("tag")))
      .select("user", "tag").as[(String, String)].collect().toSet
    assert(kept === Set(("u1", "a"), ("u1", "b"), ("u1", "c"),
      ("u2", "x"), ("u2", "y")), kept.toString)
    intercept[IllegalArgumentException] {
      Privacy.boundContributions(df, col("user"), 0, Seq(col("ts")))
    }
    intercept[IllegalArgumentException] {
      Privacy.boundContributions(df, col("user"), 3, Nil)
    }
  }

  test("dpNoisyCountsByUser == bound-then-count at eps/k; ledger charges k") {
    val df = Seq(
      ("u1", 1L, "t1"), ("u1", 2L, "t1"), ("u1", 3L, "t1"),
      ("u1", 4L, "t1"), ("u1", 5L, "t2"),
      ("u2", 1L, "t2"), ("u2", 2L, "t2"), ("u3", 1L, "t1"))
      .toDF("user", "seq", "tag")
    val eps = 0.9; val k = 3
    val got = Privacy.dpNoisyCountsByUser(df, col("user"),
        Seq(col("seq")), k, Seq(col("tag")), eps, "s15")
      .select("q0", "group_size", "noise", "released")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = Privacy.dpNoisyCounts(
        Privacy.boundContributions(df, col("user"), k, Seq(col("seq"))),
        Seq(col("tag")), eps / k, "s15")
      .select("q0", "group_size", "noise", "released")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
    // the bound bit: u1's 5 rows cap at 3 (t1 loses its seq=4,5 rows,
    // so t2 contributes nothing from u1)
    assert(got.map(r => r._1 -> r._2).toMap === Map("t1" -> 4L, "t2" -> 2L))
    // ledger: ONE row at the user-level price — full ε, sensitivity k
    val spend = Privacy.spendOfUserCounts("rel", "events", eps, k, "s15", 2L)
    assert(spend.size == 1 && spend.head.epsMicro == 900000L &&
      spend.head.sensitivity == 3L &&
      spend.head.mechanism == "dp_noisy_counts.user_k3", spend.toString)
  }

  test("dpNoisySumsByUser: per-user totals clipped, == dpNoisySums over pre-agg") {
    // u1 contributes 3 rows to g1 totaling 900 (clips to 500);
    // u2 contributes 100 to g1; u3 contributes 2 rows to g2 totaling 300
    val df = Seq(
      ("u1", "g1", 400L), ("u1", "g1", 400L), ("u1", "g1", 100L),
      ("u2", "g1", 100L), ("u3", "g2", 200L), ("u3", "g2", 100L))
      .toDF("user", "grp", "v")
    val got = Privacy.dpNoisySumsByUser(df, col("user"), Seq(col("grp")),
        col("v"), clipLo = 0L, clipHi = 500L, eps = 0.5, seed = "us15")
      .select("q0", "group_sum", "noise", "released")
      .as[(String, Long, Long, Long)].collect().toSet
    val pre = df.groupBy("user", "grp").agg(sum("v").as("uv"))
    val want = Privacy.dpNoisySums(pre, Seq(col("grp")), col("uv"),
        clipLo = 0L, clipHi = 500L, eps = 0.5, seed = "us15")
      .select("q0", "group_sum", "noise", "released")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
    // the user-level clip bit: g1's sum is 500 (u1's 900 clipped) + 100,
    // NOT 1000 — a row-level clip at 500 would have passed all of u1's
    // rows through unclipped
    assert(got.map(r => r._1 -> r._2).toMap === Map("g1" -> 600L, "g2" -> 300L))
    // ledger: the mechanism's guarantee is per-GROUP, so the row must
    // charge the composed g·ε price and name the scope — an auditor
    // reading the artifact alone sees the whole-release user-level cost
    val spend = Privacy.spendOfUserSums("rel", "events", eps = 0.5,
      clipLo = 0L, clipHi = 500L, seed = "us15", nGroups = 2L,
      maxGroupsPerUser = 2)
    assert(spend.size == 1 && spend.head.epsMicro == 1000000L &&
      spend.head.sensitivity == 500L &&
      spend.head.mechanism == "dp_noisy_sums.user_g2", spend.toString)
    assertThrows[IllegalArgumentException] {
      Privacy.spendOfUserSums("rel", "events", 0.5, 0L, 500L, "us15", 2L,
        maxGroupsPerUser = 0)
    }
  }
}
