package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: plain-Scala greedy longest-prefix-first
    * matcher (no Spark, no shared code with the operator). */
  private def refEncode(word: String, vocab: Set[String]): Seq[String] = {
    val maxLen = vocab.map(_.stripPrefix("##").length).max
    var pos = 0
    val out = Seq.newBuilder[String]
    while (pos < word.length) {
      val prefix = if (pos == 0) "" else "##"
      val l = (math.min(maxLen, word.length - pos) to 1 by -1)
        .find(l => vocab.contains(prefix + word.substring(pos, pos + l)))
      l match {
        case Some(n) => out += prefix + word.substring(pos, pos + n); pos += n
        case None => return Seq(WordPiece.Unk)
      }
    }
    out.result()
  }

  test("learnMerges: likelihood argmax on a hand-computed corpus") {
    // corpus: "aa" x4, "ab" x6 -> symbols a:(4*2+6)=14? no: words are
    // distinct vocab entries. counts: aa:4 -> [a,##a]; ab:6 -> [a,##b]
    // c(a)=10, c(##a)=4, c(##b)=6
    // pairs: (a,##a):4 score 4/40=0.1 ; (a,##b):6 score 6/60=0.1
    // tie -> lexicographic (pa, pb): (a,##a) wins ("##a" < "##b")
    val df = (Seq.fill(4)("aa") ++ Seq.fill(6)("ab")).toDF("text")
    val merges = WordPiece.learnMerges(WordPiece.initVocab(df, col("text")), 1)
    assert(merges.map(m => (m.pa, m.pb, m.cnt)) === Seq(("a", "##a", 4L)))
    assert(merges.head.score === 4.0 / (10.0 * 4.0))
    assert(merges.head.merged === "aa")
  }

  test("learnMerges: score prefers co-occurrence over raw frequency") {
    // "xy" x5: pair (x,##y) cnt 5, c(x)=5, c(##y)=5 -> score 0.2
    // "ab" x8 plus "a" x8 and "b" x8 as free symbols: pair (a,##b)
    // cnt 8 (higher!), but c(a)=16, c(##b)=8 -> score 8/128 = 0.0625
    // BPE would merge (a,##b); WordPiece must pick (x,##y)
    val df = (Seq.fill(5)("xy") ++ Seq.fill(8)("ab") ++
      Seq.fill(8)("a") ++ Seq.fill(8)("b")).toDF("text")
    val merges = WordPiece.learnMerges(WordPiece.initVocab(df, col("text")), 1)
    assert(merges.map(m => (m.pa, m.pb)) === Seq(("x", "##y")))
  }

  test("vocabulary: base symbols plus merged pieces, deduped") {
    val df = Seq.fill(3)("abab").toDF("text")
    val v0 = WordPiece.initVocab(df, col("text"))
    val merges = WordPiece.learnMerges(v0, 2)
    val vocab = WordPiece.vocabulary(v0, merges)
    assert(vocab.contains("a") && vocab.contains("##a") && vocab.contains("##b"))
    merges.foreach(m => assert(vocab.contains(m.merged)))
    assert(vocab.distinct === vocab)
  }

  test("encodeWord: greedy longest match, continuation marks, [UNK]") {
    val vocab = Seq("u", "un", "##able", "##n", "##a", "able", "b", "##le")
    val got = Seq("unable", "banana", "quo").toDF("w")
      .select(col("w"), WordPiece.encodeWord(col("w"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got("unable") === Seq("un", "##able"))
    // b -> b; a n a n a have ##a/##n only
    assert(got("banana") === Seq("b", "##a", "##n", "##a", "##n", "##a"))
    // 'q' not in vocab -> whole-word UNK
    assert(got("quo") === Seq(WordPiece.Unk))
  }

  test("empty word: expression and fold agree on an empty array") {
    // the advertised fold == expression contract must hold on the FULL
    // input domain: the fold's sequence(1, 0) is a DESCENDING [1, 0], so
    // without the explicit empty-input short-circuit the fold still ran
    // and emitted [UNK] where the expression returns [] — masked in
    // production only because encode() guards length > 0
    val vocab = Seq("a", "##b")
    val r = Seq("").toDF("w")
      .select(WordPiece.encodeWord(col("w"), vocab).as("p"),
        WordPiece.encodeWordFold(col("w"), vocab).as("pf"))
      .head()
    assert(r.getSeq[String](0).isEmpty, "expression must return [] on ''")
    assert(r.getSeq[String](1).isEmpty, "fold must return [] on ''")
  }

  test("non-string input fails at analysis, not execution") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n")
        .select(WordPiece.encodeWord(col("n"), Seq("a")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("corpus encode: expression == fold == independent reference matcher") {
    val d = Tables.documents(spark, sfDir)
    val v0 = WordPiece.initVocab(d, col("text"))
    val merges = WordPiece.learnMerges(v0, 6)
    val vocab = WordPiece.vocabulary(v0, merges)
    val vset = vocab.toSet

    val words = d.select(explode(
        graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.canonicalize(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
    val got = words.select(col("w"),
        WordPiece.encodeWord(col("w"), vocab).as("p"),
        WordPiece.encodeWordFold(col("w"), vocab).as("pf"))
      .collect().map(r =>
        (r.getString(0), r.getSeq[String](1).toSeq, r.getSeq[String](2).toSeq))
    assert(got.nonEmpty)
    got.foreach { case (w, pieces, foldPieces) =>
      assert(pieces === refEncode(w, vset), s"expression mismatch on '$w'")
      assert(foldPieces === pieces, s"fold/expression disagree on '$w'")
      // losslessness: non-UNK pieces reassemble the word
      if (pieces != Seq(WordPiece.Unk))
        assert(pieces.map(_.stripPrefix("##")).mkString === w)
    }
    // canonicalize restricts words to the trained alphabet, so the whole
    // corpus encodes without [UNK] (the UNK path is pinned by the
    // encodeWord test above); require real coverage
    assert(got.count(_._2 != Seq(WordPiece.Unk)) > 20) // sf0.001 vocab = 31 words
  }

  test("encode is a single codegen'd projection: no shuffle, no UDF") {
    val d = Tables.documents(spark, sfDir)
    val vocab = Seq("a", "##a", "##b", "ab")
    val plan = d.select(WordPiece.encode(col("text"), vocab).as("p"))
      .queryExecution.executedPlan.toString
    // the reader's round-robin balance is fine; the encode itself must
    // not hash/range-shuffle anything
    assert(!plan.contains("hashpartitioning")
      && !plan.contains("rangepartitioning"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("ScalaUDF"), plan)
  }
}
