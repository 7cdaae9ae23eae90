package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.sources.Tables

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens trims and splits on whitespace runs") {
    val got = Seq("  a  b\tc ").toDF("t")
      .select(tokens(col("t")).as("tk")).head.getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("portableHash matches the known md5-prefix value") {
    // first 15 hex chars of md5('hello') = 0x5d41402abc4b2a7
    val got = Seq("hello").toDF("t").select(portableHash(col("t"))).head.getLong(0)
    assert(got == 419982666956583591L)
  }

  test("fingerprint is order-sensitive") {
    val fps = Seq("a b c", "c b a").toDF("t")
      .select(fingerprint(tokens(col("t"))).as("fp")).collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }

  test("identical text gives identical fingerprint") {
    val fps = Seq("x y z", "x y z").toDF("t")
      .select(fingerprint(tokens(col("t")))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }

  test("RollingFingerprint matches the aggregate/transform HOF fold on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val toks = tokens(col("text"))
    val hof = aggregate( // the interpreted form the expression replaced
      transform(toks, t => portableHash(t) % FpTokenMod),
      lit(0L), (acc, x) => (acc * 31L + x) % FpMod)
    val hofFast = aggregate(
      transform(toks, t => pmod(xxhash64(t), lit(FpTokenMod))),
      lit(0L), (acc, x) => (acc * 31L + x) % FpMod)
    val cmp = docs.select(fingerprint(toks).as("f"), hof.as("f0"),
      fingerprintFast(toks).as("g"), hofFast.as("g0"))
    assert(cmp.filter($"f" =!= $"f0" || $"g" =!= $"g0").count() == 0)
    // no interpreted lambda remains in the fingerprint plan
    val plan = docs.select(fingerprint(toks))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rolling_fingerprint") && !plan.contains("lambdafunction"),
      plan.take(1500))
  }

  test("lexiconHits counts once per token regardless of duplicate lexicon entries") {
    val df = Seq("good good bad", "nothing here", "").toDF("text")
    val dup = df.select(lexiconHits(tokens(col("text")), Seq("good", "bad", "good")).as("n"))
    val uniq = df.select(lexiconHits(tokens(col("text")), Seq("good", "bad")).as("n"))
    assert(dup.collect().map(_.getLong(0)).toSeq == uniq.collect().map(_.getLong(0)).toSeq)
    assert(dup.head.getLong(0) == 3L)
  }

  test("langId: all-scores-zero ties resolve to en (declaration order)") {
    val got = TextAnalysis.withLangId(Seq("zzz qqq").toDF("text"), col("text"))
      .select("pred_lang").head.getString(0)
    assert(got == "en")
  }

  test("langId prefers the language with most stopword hits") {
    val got = TextAnalysis.withLangId(Seq("el la de y que xxx").toDF("text"), col("text"))
      .select("pred_lang").head.getString(0)
    assert(got == "es")
  }

  test("quality score stays in [0,1]") {
    val q = TextAnalysis.withQuality(Tables.documents(spark, sfDir), col("text"))
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("sentiment: labels follow pos/neg counts; polarity sign matches") {
    val df = Seq("fast big fast", "slow small slow", "data table").toDF("text")
    val got = TextAnalysis.withSentiment(df, col("text"))
      .select("sentiment").collect().map(_.getString(0)).toSeq
    assert(got == Seq("positive", "negative", "neutral"))
  }

  test("sentiment seam: WeightedSentiment swaps in without touching call sites") {
    val path = getClass.getResource("/sentiment_weights.tsv").getPath
    val scorer = WeightedSentiment.load(path)
    assert(scorer.bias == 0.0 && scorer.weights.size == 10)
    val df = Seq("excellent fast work", "terrible broken junk", "data table").toDF("text")
    // SAME call site, different scorer — only the extra default argument
    val got = TextAnalysis.withSentiment(df, col("text"), scorer)
    assert(got.columns.takeRight(4).toSeq ==
      Seq("n_pos", "n_neg", "sentiment", "polarity"),
      "seam contract: identical output columns as the lexicon default")
    val rows = got.select("sentiment", "polarity", "n_pos", "n_neg")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("positive", "negative", "neutral"))
    assert(rows(0)._2 > 0 && rows(1)._2 < 0 && math.abs(rows(2)._2) < 0.1,
      s"polarity = 2σ(z)−1 must track the label: ${rows.toSeq}")
    assert(rows(0)._3 == 2 && rows(0)._4 == 0, "hit counts follow weight signs")
    // logistic semantics: weights sum through the sigmoid, bounded (−1,1)
    assert(rows.forall(r => r._2 > -1 && r._2 < 1))
    // multiplicity matters: repeated positive token strictly raises polarity
    val rep = TextAnalysis.withSentiment(
      Seq("good", "good good good").toDF("text"), col("text"), scorer)
      .select("polarity").collect().map(_.getDouble(0))
    assert(rep(1) > rep(0))
  }

  test("sentiment seam: one-sided weight vectors score without crashing") {
    // an all-positive model leaves the negative vocab empty — the
    // empty-lexicon guard must yield n_neg = 0, not an empty.reduce crash
    val scorer = WeightedSentiment(Seq("good" -> 0.5, "great" -> 0.3), -0.2)
    val rows = TextAnalysis.withSentiment(
        Seq("good great good", "plain text").toDF("text"), col("text"), scorer)
      .select("sentiment", "n_neg").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("positive", 0L), ("negative", 0L)))
  }

  test("LexiconWeightedSum z is bit-identical to the per-word fold (120-word vocab)") {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.expressions.LexiconWeightedSum
    // 120 words: the fold COLUMN this test compares against nests one
    // node per term and overflows the ColumnNode conversion stack around
    // ~300 terms — itself the reason the one-walk expression exists
    val rnd = new scala.util.Random(20260813L)
    val vocab = (1 to 120).map(i => s"w$i")
    val wts = vocab.map(w => w -> (rnd.nextDouble() * 2 - 1))
    val text = (1 to 400).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val df = Seq(text, "none of these words", "").toDF("text")
    val toks = tokens(col("text"))
    val fold = wts.foldLeft(lit(-0.123)) { case (acc, (w, wt)) =>
      acc + lit(wt) * lexiconHits(toks, Seq(w)).cast("double")
    }
    val one = Bridge.column(LexiconWeightedSum(Bridge.expression(toks),
      wts.map(_._1), wts.map(_._2), -0.123))
    // EXACT equality: same counts, same weight-order IEEE summation
    df.select(fold.as("a"), one.as("b")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
    // duplicate vocab entries fail loudly instead of silently diverging
    intercept[IllegalArgumentException] {
      LexiconWeightedSum(Bridge.expression(toks),
        Seq("a", "a"), Seq(1.0, 2.0), 0.0)
    }
  }

  test("repetition signals: dup lines and spammed n-grams trip their gates") {
    // doc 1 is long enough to clear the n-gram thresholds (the gate is
    // meaningful only past the min-token rule — see the operator doc)
    val df = Seq(
      (1L, "normal prose with many properly distinct words spread over a " +
        "longer sentence so that no single bigram or trigram can dominate " +
        "the running token count at all"),
      (2L, "header\nsame line\nsame line\nsame line\nfooter"), // 2/5 lines dup
      (3L, "click here click here click here click here")      // one 2-gram spams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withRepetitionSignals(df, col("text"))
      .select("doc_id", "dup_line_frac", "top2gram_frac", "rep_fail")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got(0)._2 == 0.0 && !got(0)._4, "clean prose passes")
    assert(math.abs(got(1)._2 - 0.4) < 1e-12, "2 of 5 lines repeat")
    assert(got(1)._4, "dup-line gate fires above 0.3")
    // "click here" occurs 4 times among 7 bigrams of an 8-token doc:
    // fraction 4*2/8 = 1.0
    assert(got(2)._3 == 1.0 && got(2)._4, s"spammed 2-gram must trip: ${got(2)}")
    // degenerate doc: too short for any n-gram — fraction 0, no fail
    val tiny = TextAnalysis.withRepetitionSignals(Seq("word").toDF("text"), col("text"))
      .select("top2gram_frac", "top3gram_frac", "rep_fail").head
    assert(tiny.getDouble(0) == 0.0 && tiny.getDouble(1) == 0.0 && !tiny.getBoolean(2))
  }

  test("dedupParagraphs keeps first occurrences in order, no shuffle") {
    val df = Seq((1L, "a\nb\na\nc\nb\na"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphs(df, col("doc_id"), col("text"))
    val r = got.collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1)
    assert(r(0) == ((1L, "a\nb\nc", 3L, 3L)), r(0).toString)
    assert(r(1) == ((2L, "x", 1L, 0L)))
    // per-row projection: no exchange may appear in the plan
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"),
      got.queryExecution.executedPlan.toString)
  }

  test("vocabCoverage: cumulative mass in count-desc order, bounded by coverage") {
    // 10 a's, 5 b's, 3 c's, 2 d's = 20 tokens; cum fracs .5, .75, .9, 1.0
    val text = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d")).mkString(" ")
    val df = Seq(text).toDF("text")
    val got = graft.text.Chunking.vocabCoverage(df, tokens(col("text")), 0.9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.sortBy(-_._2).map(_._1).toSeq == Seq("a", "b", "c"),
      s"d (cum 1.0) must fall outside 0.9: ${got.toSeq}")
    assert(got.find(_._1 == "c").exists(_._3 == 0.9))
  }

  test("tfidf: a token present in every doc has idf 0") {
    val df = Seq((1L, "x a"), (2L, "x b")).toDF("doc_id", "text")
    val t = TfIdf.tfidf(df, col("doc_id"), tokens(col("text")))
    assert(t.filter($"token" === "x").select("idf").collect().forall(_.getDouble(0) == 0.0))
  }

  test("tfidf rank-1 token has the max score per doc (E3 invariant)") {
    val top = TfIdf.topKPerDoc(Tables.documents(spark, sfDir), col("doc_id"),
      tokens(col("text")), 5)
    val r1 = top.filter($"rnk" === 1).select($"doc", $"tfidf".as("s1"))
    val mx = TfIdf.tfidf(Tables.documents(spark, sfDir), col("doc_id"), tokens(col("text")))
      .groupBy($"doc").agg(max($"tfidf").as("mx"))
    assert(r1.join(mx, "doc").filter($"s1" < $"mx" - 1e-12).count() == 0)
  }

  test("chunkTokens: windows overlap by size-stride, tail chunk short, ids dense") {
    val df = Seq((1L, (1 to 13).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = graft.text.Chunking.chunkTokens(df, col("doc_id"),
        tokens(col("text")), chunkSize = 5, stride = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0, "t1 t2 t3 t4 t5", 5L),
      (1, "t5 t6 t7 t8 t9", 5L),      // 1-token overlap (size 5, stride 4)
      (2, "t9 t10 t11 t12 t13", 5L),
      (3, "t13", 1L)))                 // short tail kept, len honest
  }

  test("chunkTokens and bigramPmi tolerate empty token arrays") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a", "b", "a", "b", "a", "b")))
      .toDF("doc_id", "tk")
    val chunks = graft.text.Chunking.chunkTokens(df, col("doc_id"), col("tk"), 3, 2)
    assert(chunks.filter($"doc" === 1L).count() == 0)   // no chunks, no crash
    assert(chunks.filter($"doc" === 2L).count() > 0)
    val pmi = graft.text.Collocations.bigramPmi(df, col("tk"), minCount = 2L)
    assert(pmi.count() > 0)                              // empty row didn't kill it
  }

  test("oovRate: tokens outside the top-V vocabulary weigh by occurrence") {
    // corpus: 'a' x6, 'b' x3, 'c' x1 -> top-2 vocab = {a, b}
    val df = Seq((1L, "a a a b c"), (2L, "a a a b b")).toDF("doc_id", "text")
    val got = graft.text.Chunking.oovRate(df, col("doc_id"), tokens(col("text")), 2)
      .orderBy("doc").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 0.2), (2L, 0.0)))
  }

  test("bigramPmi: a fixed collocation scores high, chance adjacency near zero") {
    // "new york" always adjacent; "the" pairs freely with everything
    val docs = (1 to 30).map(i => (i.toLong,
      s"new york is the city the w$i likes the most")).toDF("doc_id", "text")
    val pmi = graft.text.Collocations.bigramPmi(docs, tokens(col("text")), 5L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(pmi(("new", "york")) > pmi(("is", "the")))
    // n_big >= 5 filter: the per-doc-unique bigram ("the w$i") never appears
    assert(!pmi.keySet.exists(_._2.startsWith("w")))
  }

  test("scrubPii redacts each kind and leaves clean text untouched") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@test.org thanks"),
      (2L, "docs at https://ex.org/a?q=1 here"),
      (3L, "call 555-010-1234 or 555 010 9999"),
      (4L, "no pii in this sentence at all")).toDF("doc_id", "text")
    val got = df.select($"doc_id", scrubPii($"text").as("s"), piiCount($"text").as("n"))
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("mail me at <EMAIL> thanks", 1L),
      ("docs at <URL> here", 1L),
      ("call <PHONE> or <PHONE>", 2L),
      ("no pii in this sentence at all", 0L)))
  }

  test("scrubPii: a URL swallows an embedded email (order is the contract)") {
    val df = Seq((1L, "go https://h.io/p?u=a@b.co now")).toDF("doc_id", "text")
    val s = df.select(scrubPii($"text")).head.getString(0)
    assert(s == "go <URL> now")
    // raw-text count sees both patterns — documented overlap semantics
    assert(df.select(piiCount($"text")).head.getLong(0) == 2L)
  }

  test("urlHost extracts the first host; '' when the text has no URL") {
    val df = Seq(
      (1L, "see https://cdn3.example.org/p/9 and http://other.io/x"),
      (2L, "http://h.io?q=1 query stops the host"),
      (3L, "no links at all")).toDF("doc_id", "text")
    val got = df.select($"doc_id", urlHost($"text")).orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("cdn3.example.org", "h.io", ""))
  }

  test("withSafetyGate: hard blocks on any hit, soft blocks on ratio, casing can't dodge") {
    val df = Seq(
      (1L, "a perfectly ordinary clean sentence here"),      // pass
      (2L, "one BADWORD buried in plenty of fine prose"),    // hard (case-folded)
      (3L, "spam spam spam spam"),                           // soft: 4/4 tokens
      (4L, "spam is mentioned once in twenty tokens of normal prose " +
           "that keeps going and going and going on")        // incidental: pass
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withSafetyGate(df, $"text",
        hardWords = Seq("badword"), softWords = Seq("spam"),
        softPermille = 100L)
      .select($"doc_id", $"safety", $"n_hard", $"n_soft")
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, s, h, so) => id -> ((s, h, so)) }.toMap
    assert(got(1L) == (("pass", 0L, 0L)))
    assert(got(2L) == (("blocked_hard", 1L, 0L)))
    assert(got(3L) == (("blocked_ratio", 0L, 4L)))
    assert(got(4L)._1 == "pass" && got(4L)._3 == 1L,
      s"incidental mention must pass: ${got(4L)}")
  }

  test("substringHits: embedded/overlapping-across-pattern counts, border guard throws") {
    val df = Seq(
      (1L, "the start of a part"),        // "art" embedded twice
      (2L, "stream reader"),              // "rea" twice (stream, reader)
      (3L, "xbadwordx and badword"),      // embedded + standalone
      (4L, "naïve café — no hits"),       // multi-byte text, zero hits
      (5L, "overlap: cart and cream"))    // "art" + "rea" cross-pattern
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        substringHits($"text", Seq("art", "rea", "badword")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 0L, 5L -> 2L),
      got.toString)
    // a bordered pattern ("aba": prefix 'a' == suffix 'a') must fail
    // loudly — its self-overlap diverges from the replace-count oracle
    val e = intercept[IllegalArgumentException] {
      substringHits($"text", Seq("aba"))
    }
    assert(e.getMessage.contains("border"), e.getMessage)
  }

  test("deflateRatioMicro: repetitive text compresses far below organic prose; deterministic") {
    val boiler = ("subscribe to our newsletter now " * 40).trim
    val prose = "the quick brown fox inspects a surprisingly intricate " +
      "arrangement of vexed zebras while gusty winds whisk pale jugs of " +
      "mixed juice across the dock and every clause introduces new words"
    val df = Seq((1L, boiler), (2L, prose), (3L, "")).toDF("doc_id", "text")
    val got = df.select($"doc_id", deflateRatioMicro($"text").as("r"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(3L).isEmpty, "empty doc has no ratio")
    val (b, p) = (got(1L).get, got(2L).get)
    assert(b < p / 3,
      s"boilerplate must compress far below prose: boiler=$b prose=$p")
    assert(p > 300000L && p < 1100000L, s"prose ratio sanity: $p")
    // determinism across evaluations (fresh plan, same values)
    val again = df.select($"doc_id", deflateRatioMicro($"text").as("r"))
      .as[(Long, Option[Long])].collect().toMap
    assert(again == got)
  }

  test("withRuleFlags: each rule trips on its designed failure mode") {
    val df = Seq(
      // 30 varied 3-5 char words, stopwords present: passes everything
      (1L, (1 to 30).map(i => if (i % 6 == 0) "the" else s"wd${i % 17}").mkString(" ")),
      (2L, "too short"),                                   // min_tokens
      (3L, (1 to 30).map(_ => "ab").mkString(" ")),        // word_len (mean 2)
      (4L, ("the spam " * 15).trim),                       // repetition (spam 50%)
      (5L, (1 to 30).map(i => s"xq${i % 19}").mkString(" ")) // stopwords (0%)
    ).toDF("doc_id", "text")
    val f = graft.text.TextAnalysis.withRuleFlags(df, $"text")
      .orderBy("doc_id")
      .select("fail_min_tokens", "fail_word_len", "fail_repetition", "fail_stopwords")
      .collect().map(r => (0 to 3).map(r.getBoolean).toSeq).toSeq
    assert(f(0) == Seq(false, false, false, false), s"doc1 should pass: ${f(0)}")
    assert(f(1)(0), "doc2 under min tokens")
    assert(f(2)(1), "doc3 mean word length below 3")
    assert(f(3)(2), "doc4 repetition above 20%")
    assert(f(4)(3), "doc5 zero stopwords")
  }

  test("canonicalize folds ASCII case and whitespace runs, leaves Unicode case alone") {
    val got = Seq("  The\tQuick   BROWN fox\n", "the quick brown fox", "Straße  İstanbul")
      .toDF("t").select(canonicalize(col("t"))).collect().map(_.getString(0)).toSeq
    assert(got(0) == "the quick brown fox")
    assert(got(0) == got(1)) // variants collapse to one canonical form
    assert(got(2) == "straße İstanbul") // non-ASCII untouched (portability contract)
    // idempotent: canonicalize(canonicalize(x)) == canonicalize(x)
    val twice = Seq("  A  B\t C ").toDF("t")
      .select(canonicalize(canonicalize(col("t"))).as("c2"), canonicalize(col("t")).as("c1"))
      .head
    assert(twice.getString(0) == twice.getString(1))
  }

  test("withRuleFlagsByLang selects the stopword lexicon by language") {
    // normal Spanish prose: es stopwords present, zero en stopwords
    val esWords = (1 to 30).map(i => if (i % 5 == 0) "el" else if (i % 7 == 0) "de" else s"pal${i % 13}")
    val enWords = (1 to 30).map(i => if (i % 5 == 0) "the" else s"wd${i % 13}")
    val df = Seq((1L, "es", esWords.mkString(" ")), (2L, "en", enWords.mkString(" ")),
      (3L, "zh", (1 to 30).map(i => s"zi${i % 11}").mkString(" "))).toDF("doc_id", "lang", "text")
    def stopFail(got: org.apache.spark.sql.DataFrame) =
      got.orderBy("doc_id").select("fail_stopwords").collect().map(_.getBoolean(0)).toSeq
    // English-only gate rejects the Spanish doc as "non-prose"...
    assert(stopFail(graft.text.TextAnalysis.withRuleFlags(df, $"text"))
      == Seq(true, false, true))
    // ...the lang-aware gate passes it; zh (no lexicon) falls back to en
    assert(stopFail(graft.text.TextAnalysis.withRuleFlagsByLang(df, $"text", $"lang"))
      == Seq(false, false, true))
  }

  test("TokenCharSum/TokenModeCount match the interpreted HOF forms; gates codegen'd and null-free") {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.expressions.{TokenCharSum, TokenModeCount}
    val docs = Tables.documents(spark, sfDir)
    val toks = tokens($"text")
    val cmp = docs.select(
      Bridge.column(TokenCharSum(Bridge.expression(toks))).as("cs"),
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _).as("cs0"),
      Bridge.column(TokenModeCount(Bridge.expression(toks))).as("mc"),
      array_max(transform(array_distinct(toks),
        w => size(toks) - size(array_remove(toks, w)))).cast("long").as("mc0"))
    assert(cmp.filter($"cs" =!= $"cs0" || $"mc" =!= $"mc0").count() == 0)
    // empty/whitespace docs: every flag is a real boolean, never null
    val edge = Seq((1L, ""), (2L, "   "), (3L, "one two"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val flags = graft.text.TextAnalysis.withRuleFlags(edge, $"text")
      .select("fail_min_tokens", "fail_word_len", "fail_repetition", "fail_stopwords")
      .collect()
    assert(flags.forall(r => (0 to 3).forall(i => !r.isNullAt(i))), flags.mkString(";"))
    // null text = contentless doc: every gate trips, none is null
    val nullRow = graft.text.TextAnalysis.withRuleFlags(edge, $"text")
      .filter($"doc_id" === 4L)
      .select("fail_min_tokens", "fail_word_len", "fail_repetition", "fail_stopwords")
      .head
    assert((0 to 3).forall(i => nullRow.getBoolean(i)), nullRow.toString)
    // the quality-gate path carries no interpreted higher-order functions
    val plan = graft.text.TextAnalysis.withRuleFlags(docs, $"text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("token_char_sum") && plan.contains("token_mode_count"), plan.take(2000))
    // lexiconHits is the one-pass set probe; what must be gone is any
    // interpreted lambda HOF (transform/aggregate/filter)
    assert(plan.contains("lexicon_hit_count"), plan.take(2000))
    assert(!plan.contains("lambdafunction"), plan.take(2000))
  }

  test("LexiconHitCount matches the size−array_remove composition on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val toks = tokens($"text")
    val words = Seq("the", "a", "of", "and", "to", "the") // dup on purpose
    val cmp = docs.select(
      lexiconHits(toks, words).as("h"),
      words.distinct.map(w => size(toks) - size(array_remove(toks, w)))
        .reduce(_ + _).cast("long").as("h0"))
    assert(cmp.filter($"h" =!= $"h0").count() == 0)
    // null array → null; empty lexicon → 0; null tokens never match
    val edge = Seq(Tuple1(null.asInstanceOf[String]), Tuple1("a b the")).toDF("text")
    val got = edge.select(
      lexiconHits(tokens($"text"), words).as("h"),
      lexiconHits(tokens($"text"), Nil).as("z")).collect()
    assert(got(0).isNullAt(0) && got(0).getLong(1) == 0L)
    assert(got(1).getLong(0) == 2L && got(1).getLong(1) == 0L)
  }

  test("unigramSurprisal: an out-of-distribution doc scores highest") {
    val typical = (1 to 20).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran"))
    val odd = Seq((99L, "zyx qwv plk mno zyx qwv plk mno zyx qwv"))
    val df = (typical ++ odd).toDF("doc_id", "text")
    val sp = graft.text.LanguageModel
      .unigramSurprisal(df, $"doc_id", tokens($"text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(sp.values.forall(_ > 0))
    assert(sp(99L) == sp.values.max,
      s"rare-token doc must have max surprisal: $sp")
    // all typical docs identical text -> equal surprisal up to
    // summation-order ULP drift (the shuffle's merge order isn't fixed)
    val vals = typical.map(t => sp(t._1))
    assert(vals.forall(v => math.abs(v - vals.head) < 1e-9))
  }

  test("bigramSurprisal: scrambled word order scores higher than natural order") {
    // same unigram profile, destroyed transitions — the case the unigram
    // model is blind to and the bigram model exists for
    val natural = (1 to 20).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran"))
    val scrambled = Seq((99L, "mat the ran on dog sat the and cat the"))
    val df = (natural ++ scrambled).toDF("doc_id", "text")
    val bi = graft.text.LanguageModel
      .bigramSurprisal(df, $"doc_id", tokens($"text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(bi(99L) == bi.values.max,
      s"scrambled doc must have max bigram surprisal: $bi")
    val uni = graft.text.LanguageModel
      .unigramSurprisal(df, $"doc_id", tokens($"text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // unigram model can't separate them (identical bags of words)
    assert(math.abs(uni(99L) - uni(1L)) < 1e-9,
      s"unigram must be blind to word order: ${uni(99L)} vs ${uni(1L)}")
  }

  test("stripBoilerplateLines drops the hot footer, keeps order, drops empty docs") {
    val df = Seq(
      (1L, "unique first line\nSHARED FOOTER\nunique third line"),
      (2L, "another doc body\nSHARED FOOTER"),
      (3L, "third document text\nSHARED FOOTER"),
      (4L, "SHARED FOOTER") // nothing survives -> doc drops out
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripBoilerplateLines(df, $"doc_id", $"text", 0.5)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // footer df = 4/4 > 0.5 -> stripped everywhere
    assert(got.keySet == Set(1L, 2L, 3L), got.toString)
    assert(got(1L) == (("unique first line\nunique third line", 2L, 1L)))
    assert(got(2L) == (("another doc body", 1L, 1L)))
    assert(got(3L) == (("third document text", 1L, 1L)))
    // unique lines always survive a 0.5 threshold on 4 docs (df 1/4)
  }

  test("NfcNormalize composes canonical equivalents; StripAccents drops marks only") {
    import graft.functions.Native.{nfcNormalize, stripAccents}
    val df = Seq(
      (1L, "caf\u00e9"),          // composed e-acute
      (2L, "cafe\u0301"),         // e + combining acute
      (3L, "plain ascii"),
      (4L, "\u00f8 stays"),       // o-slash has no canonical decomposition
      (5L, "ni\u00f1o \u00fcber \u00e7a")
    ).toDF("id", "t")
    val byId = df.select($"id", nfcNormalize($"t"), stripAccents($"t"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    assert(byId(1L)._1 == byId(2L)._1, "NFC must unify composed/decomposed")
    assert(byId(1L)._1 == "caf\u00e9")
    assert(byId(1L)._2 == "cafe" && byId(2L)._2 == "cafe")
    assert(byId(3L)._1 == "plain ascii" && byId(3L)._2 == "plain ascii")
    assert(byId(4L)._2 == "\u00f8 stays", "no-decomposition chars pass through")
    assert(byId(5L)._2 == "nino uber ca")
    // idempotence over the whole corpus (ascii there, so also passthrough)
    val changed = Tables.documents(spark, sfDir).filter(
      nfcNormalize($"text") =!= nfcNormalize(nfcNormalize($"text"))).count()
    assert(changed == 0)
  }

  test("importanceWeights: target-like docs score above corpus-like docs") {
    // target = docs about "cats"; raw corpus dominated by "widgets"
    val target = (1 to 5).map(i => (i.toLong, "cat sat mat cat purr", true))
    val noise = (10 to 30).map(i => (i.toLong, "widget gear spring bolt flange", false))
    val probe = Seq(
      (100L, "cat purr mat sat cat", false), // target-like, NOT in target set
      (101L, "widget bolt gear flange spring", false)) // corpus-like
    val df = (target ++ noise ++ probe).toDF("doc_id", "text", "tgt")
    val iw = graft.text.LanguageModel
      .importanceWeights(df, $"doc_id", tokens($"text"), $"tgt")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(iw.size == df.count())
    assert(iw.values.forall(w => w > 0 && !w.isNaN && !w.isInfinite))
    assert(iw(100L) > 1.0, s"target-like doc must upweight: ${iw(100L)}")
    assert(iw(101L) < 1.0, s"corpus-like doc must downweight: ${iw(101L)}")
    assert(iw(100L) > iw(101L) * 2,
      s"separation too weak: ${iw(100L)} vs ${iw(101L)}")
  }

  test("bigramSurprisal: docs with fewer than 2 tokens drop out; scores positive") {
    val df = Seq((1L, "one two three four"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = graft.text.LanguageModel
      .bigramSurprisal(df, $"doc_id", tokens($"text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet == Set(1L), s"bigram-less docs must drop out: $got")
    assert(got(1L) > 0)
  }

  test("extractHtmlText strips blocks/tags, decodes entities, never re-parses decoded text") {
    def ext(html: String): String =
      Seq(html).toDF("h").select(extractHtmlText(col("h"))).head.getString(0)
    // script/style/comment content must not leak; tags become spaces
    assert(ext("<p>a</p><script>var x='<b>no</b>';</script><style>p{}</style><!-- hid -->b") == "a b")
    // multi-line script body, case-insensitive tag names
    assert(ext("<SCRIPT type='x'>\nline1();\nline2();\n</SCRIPT>ok") == "ok")
    // entities decode; &amp; last so double-escapes stay literal text
    assert(ext("x &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;&nbsp;y") ==
      "x <tag> &amp; \"q\" 's' y")
    // a decoded &lt;script&gt; is TEXT, not markup — never re-stripped
    assert(ext("&lt;script&gt;alert(1)&lt;/script&gt;") == "<script>alert(1)</script>")
    // whitespace folds across removed block boundaries
    assert(ext("<div>\n  a\n  <br/>\n  b\n</div>") == "a b")
  }

  test("canonicalizeUrl: fragment, tracking params, host case, default ports, trailing slash") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(canonicalizeUrl(col("u"))).head.getString(0)
    assert(canon("HTTPS://Example.COM:443/Path/One?id=3&utm_source=f&utm_campaign=x#frag") ==
      "https://example.com/Path/One?id=3")
    assert(canon("http://A.B.c:80/") == "http://a.b.c")
    // non-default port survives; path case survives
    assert(canon("http://Host:8080/CaseSensitive") == "http://host:8080/CaseSensitive")
    // tracking-only query leaves no dangling '?'
    assert(canon("https://h.io/p?utm_source=x") == "https://h.io/p")
    // tracking param mid-query: separators tidied
    assert(canon("https://h.io/p?a=1&fbclid=zz&b=2") == "https://h.io/p?a=1&b=2")
    assert(canon("https://h.io/p?gclid=1&a=2") == "https://h.io/p?a=2")
    // schemeless input: untouched except the generic cleanups
    assert(canon("not a url#x") == "not a url")
  }

  test("fixMojibake repairs UTF-8-as-cp1252 artifacts and counts them") {
    def onRow(t: String): (String, Long) = {
      val r = Seq(t).toDF("t")
        .select(fixMojibake(col("t")), mojibakeCount(col("t"))).head
      (r.getString(0), r.getLong(1))
    }
    // corrupt REAL text with the actual encoding mistake, then repair
    val clean = "don\u2019t \u201Cquote\u2018 caf\u00E9 na\u00EFve 25\u00B0C \u2026"
    val corrupt = new String(clean.getBytes("UTF-8"), "windows-1252")
    assert(corrupt != clean, "fixture must actually corrupt")
    val (fixed, n) = onRow(corrupt)
    assert(fixed == clean, s"repair must invert the corruption: $fixed")
    assert(n == 7L, s"one count per artifact occurrence: $n")
    // clean text is untouched and counts zero — including plain ASCII
    assert(onRow(clean) == ((clean, 0L)))
    assert(onRow("plain ascii text.") == (("plain ascii text.", 0L)))
    // repair is idempotent
    assert(onRow(fixed)._1 == fixed)
  }

  test("boilerplateNgrams: doc-frequency ranking, per-doc distinct, strings recovered") {
    val docs = Seq(
      (1L, "all your cookies are accepted here once"),
      (2L, "please note all your cookies stay fine"),
      (3L, "site says all your cookies matter greatly"),
      (4L, "all your cookies all your cookies twice"), // repeat in ONE doc
      (5L, "terms of service apply to terms of service"),
      (6L, "terms of service and unrelated filler words"),
      (7L, "totally unique sentence with no shared phrases")
    ).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis
      .boilerplateNgrams(docs, col("doc_id"), col("text"), n = 3, topK = 3)
      .orderBy("rk")
      .select("ngram", "df", "rk")
      .as[(String, Long, Long)].collect()
    assert(got.length === 3)
    // "all your cookies" appears in docs 1-4 (doc 4's double counts ONCE)
    assert(got.head === (("all your cookies", 4L, 1L)))
    // "terms of service" in docs 5-6 (doc 5's double counts once)
    assert(got(1) === (("terms of service", 2L, 2L)))
    // third row is some df-1 trigram: rank present, df exact
    assert(got(2)._2 === 1L && got(2)._3 === 3L)
  }

  test("registeredDomain: eTLD+1 with two-label public suffixes") {
    def rd(h: String): String =
      Seq(h).toDF("h").select(registeredDomain(col("h"))).head.getString(0)
    assert(rd("www.bbc.co.uk") == "bbc.co.uk")
    assert(rd("a.b.news.example.co.jp") == "example.co.jp")
    assert(rd("cdn.example.com") == "example.com")
    assert(rd("example.com") == "example.com")
    assert(rd("shop.site.com.au") == "site.com.au")
    // the public suffix itself (no registrable label) keeps last-3 rule
    // off: 'co.uk' has two labels and no multi-TLD tail longer than itself
    assert(rd("site.org") == "site.org")
    // single label: unextractable -> '' (regexp_extract no-match value)
    assert(rd("localhost") == "")
  }
}
