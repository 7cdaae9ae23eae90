package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent sequential reference BPE (symbol lists, no strings):
    * the classic algorithm as written in the paper, against which the
    * distributed string-replace implementation is checked. */
  private def refBpe(words: Seq[(String, Long)], k: Int,
      symbolize: String => List[String] = _.toList.map(_.toString))
      : Seq[(String, String, Long)] = {
    def mergeSeq(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeSeq(rest, a, b)
      case x :: rest => x :: mergeSeq(rest, a, b)
      case Nil => Nil
    }
    var vocab = words.map { case (w, n) =>
      (symbolize(w) :+ Bpe.EndOfWord, n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) += n)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        vocab = vocab.map { case (syms, n) => (mergeSeq(syms, a, b), n) }
      }
    }
    out.toSeq
  }

  test("learnMerges matches the sequential reference on the Sennrich corpus") {
    // the worked example shape from the BPE paper: low/lower/newest/widest
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val corpus = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val vocab = Bpe.initVocab(corpus, col("text"))
    val got = Bpe.learnMerges(vocab, 6)
    val want = refBpe(words, 6)
    assert(got == want, s"distributed merges must equal the reference:\n$got\nvs\n$want")
    // the known first merge of the example: ('e','s') with count 9
    assert(got.head == (("e", "s", 9L)), got.head)
  }

  test("merge semantics: left-to-right non-overlapping, boundary-safe, chainable") {
    // "aaa": merging (a,a) gives [aa, a], not [a, aa] and not [aa, aa]
    val aaa = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m1 = Bpe.learnMerges(Bpe.initVocab(aaa, col("text")), 1).map(m => (m._1, m._2))
    assert(m1 == Seq(("a", "a")))
    val enc = aaa.select(Bpe.applyMerges(col("text"), m1).as("s"))
      .head.getSeq[String](0)
    assert(enc == Seq("aa", "a", Bpe.EndOfWord), enc.toString)
    // boundary safety: with symbols [ab, c], a merge (b,c) must NOT
    // false-match the tail of "ab"
    val encoded = Seq((1L, "abc")).toDF("doc_id", "text")
      .select(Bpe.applyMerges(col("text"),
        Seq(("a", "b"), ("b", "c"))).as("s"))
      .head.getSeq[String](0)
    assert(encoded == Seq("ab", "c", Bpe.EndOfWord),
      s"(b,c) must not merge across the 'ab' symbol boundary: $encoded")
    // consecutive pairs chain: "abab" with merge (a,b) → [ab, ab]
    val abab = Seq((1L, "abab")).toDF("doc_id", "text")
      .select(Bpe.applyMerges(col("text"), Seq(("a", "b"))).as("s"))
      .head.getSeq[String](0)
    assert(abab == Seq("ab", "ab", Bpe.EndOfWord), abab.toString)
  }

  test("applyMerges round-trips: symbols concatenate back to word + </w>") {
    val docs = Seq((1L, "hello world"), (2L, "The  Quick brown"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Seq(("l", "l"), ("o", Bpe.EndOfWord), ("h", "e"))
    val rows = docs.select(col("doc_id"),
        Bpe.applyMerges(col("text"), merges).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L).mkString == "hello" + Bpe.EndOfWord + "world" + Bpe.EndOfWord)
    // canonicalization applies before encoding (case folds, ws collapses)
    assert(rows(2L).mkString == "the" + Bpe.EndOfWord + "quick" + Bpe.EndOfWord +
      "brown" + Bpe.EndOfWord)
    assert(rows(3L) == Seq.empty, "empty text encodes to no symbols")
    // the learned merges actually fired
    assert(rows(1L).contains("ll"), rows(1L).toString)
    assert(rows(1L).contains("o" + Bpe.EndOfWord), rows(1L).toString)
  }

  /** UTF-8 bytes as uppercase hex-pair symbols — the byte-level base
    * alphabet ([[Bpe.initByteVocab]]'s representation). */
  private def hexSyms(w: String): List[String] =
    w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toList

  test("byte-level trainer matches the sequential reference on a multi-byte corpus") {
    // accents (2-byte), CJK (3-byte), emoji (4-byte) — the words the
    // char-level [a-z]+ trainer drops entirely
    val words = Seq("café" -> 5L, "日本語" -> 3L, "🦀rust" -> 2L, "low" -> 4L)
    val corpus = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Bpe.learnMerges(Bpe.initByteVocab(corpus, col("text")), 8)
    val want = refBpe(words, 8, hexSyms)
    assert(got == want, s"byte-level merges must equal the reference:\n$got\nvs\n$want")
  }

  test("byte-level encode round-trips every script losslessly") {
    val docs = Seq((1L, "café naïve"), (2L, "日本語 データ"),
      (3L, "🦀rust 🚀go"), (4L, "plain ascii words"), (5L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(Bpe.initByteVocab(docs, col("text")), 10)
      .map(m => (m._1, m._2))
    val rows = docs.select(col("doc_id"),
        Bpe.decodeByteSymbols(
          Bpe.applyByteMerges(col("text"), merges)).as("decoded"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // decode concatenates the words (</w> markers drop, whitespace was
    // the tokenizer's separator) — byte-exact for every script
    assert(rows(1L) == "cafénaïve", rows(1L))
    assert(rows(2L) == "日本語データ", rows(2L))
    assert(rows(3L) == "🦀rust🚀go", rows(3L))
    assert(rows(4L) == "plainasciiwords", rows(4L))
    assert(rows(5L) == "", "empty text decodes to empty")
  }

  test("byte fallback: input unseen at training time is never OOV") {
    // train on ASCII only, encode emoji/CJK it has never seen
    val train = Seq((1L, "the the the quick brown fox")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(Bpe.initByteVocab(train, col("text")), 5)
      .map(m => (m._1, m._2))
    val unseen = Seq((1L, "🦀 héllo 世界")).toDF("doc_id", "text")
    val syms = unseen.select(Bpe.applyByteMerges(col("text"), merges).as("s"))
      .head.getSeq[String](0)
    // every symbol is hex pairs optionally fused with the </w> marker —
    // i.e. drawn from the closed byte alphabet + learned merges; the
    // unseen scripts surface as single-byte fallback tokens
    val legal = ("^([0-9A-F]{2})*(" +
      java.util.regex.Pattern.quote(Bpe.EndOfWord) + ")?$").r
    syms.foreach(sym => assert(legal.matches(sym), s"OOV-shaped symbol: $sym"))
    assert(syms.exists(s => s.matches("^[0-9A-F]{2}$")),
      "unseen multi-byte scripts must fall back to single-byte symbols")
    val decoded = unseen.select(Bpe.decodeByteSymbols(
        Bpe.applyByteMerges(col("text"), merges)).as("d"))
      .head.getString(0)
    assert(decoded == "🦀héllo世界", decoded)
  }

  test("early stop: k larger than available pairs returns every merge once") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(Bpe.initVocab(tiny, col("text")), 50)
    // "ab" fully merges in 2 steps: (a,b) then (ab,</w>)
    assert(merges.map(m => (m._1, m._2)) ==
      Seq(("a", "b"), ("ab", Bpe.EndOfWord)), merges.toString)
  }

  test("fertilityCard: exact hand ratios; learned byte-BPE instantiation") {
    import graft.text.TokenizerEval
    // hand fixture: en has 2 docs, 3+1 words, 6+2 tokens, 20+10 chars
    // → fertility 8/4 = 2.000000, chars/token 30/8 = 3.750000
    val df = Seq(
      ("en", 3L, 6L, 20L), ("en", 1L, 2L, 10L), ("xx", 0L, 0L, 0L))
      .toDF("lang", "w", "t", "c")
    val got = TokenizerEval.fertilityCard(df, col("lang"), col("w"),
        col("t"), col("c"))
      .select("lang", "n_docs", "fertility_micro", "chars_per_token_micro")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got("en") == ((2L, Some(2000000L), Some(3750000L))), got.toString)
    // degenerate denominators release NULL, not a fake ratio
    assert(got("xx") == ((1L, None, None)), got.toString)
    // learned byte-BPE instantiation: the card consumes ANY tokenizer's
    // counts — encoded symbol counts from a trained merge table here
    val corpus = Seq((1L, "en", "aa aa bb"), (2L, "en", "aa bb bb"),
      (3L, "zz", "qq rr ss tt")).toDF("doc_id", "lang", "text")
    val merges = Bpe.learnMerges(Bpe.initByteVocab(corpus, col("text")), 8)
      .map(m => (m._1, m._2))
    val card = TokenizerEval.fertilityCard(corpus, col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))),
        size(Bpe.applyByteMerges(col("text"), merges)),
        length(col("text")))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("sum_tokens"), r.getAs[Long]("fertility_micro"))).toMap
    // merges were trained on en-dominated pairs, so en compresses to
    // fewer symbols per word than the unseen-script zz
    assert(card("en")._2 < card("zz")._2,
      s"trained language must show lower fertility: $card")
  }
}
