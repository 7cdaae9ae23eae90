package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-score segmentation, not the greedy one") {
    // "abc": greedy-longest would take "ab"+"c" = -5; but a+bc = -3
    val vocab = Map("ab" -> -3L, "c" -> -2L, "a" -> -1L, "bc" -> -2L, "b" -> -4L)
    assert(UnigramLm.viterbi("abc", vocab, 2) == Seq("a", "bc"))
    // remove the cheap path: now ab+c (-5) beats a+b+c (-7)
    val v2 = vocab - "bc"
    assert(UnigramLm.viterbi("abc", v2, 2) == Seq("ab", "c"))
  }

  test("viterbi tie-break is deterministic: earliest split start wins") {
    // "aa" as a+a (-4) ties nothing; craft an exact tie: aa (-4) vs a+a (-4)
    val vocab = Map("aa" -> -4L, "a" -> -2L)
    // candidates at j=2: i=0 (piece "aa", dp -4) evaluated before
    // i=1 (piece "a", dp -4); strictly-greater keeps the first → "aa"
    assert(UnigramLm.viterbi("aa", vocab, 2) == Seq("aa"))
  }

  test("viterbi never fails on OOV: unknown chars segment as themselves") {
    val vocab = Map("ab" -> -1L)
    assert(UnigramLm.viterbi("axb", vocab, 2) == Seq("a", "x", "b"))
    assert(UnigramLm.viterbi("", vocab, 2) == Nil)
  }

  test("seed vocabulary keeps all single chars and ranks frequent substrings first") {
    val docs = Seq("the cat sat", "the cat ran", "the dog sat")
      .toDF("text")
    val words = UnigramLm.wordCounts(docs, col("text"))
    val seed = UnigramLm.seedVocab(words, maxPieceLen = 3, seedSize = 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "the" appears 3x -> substring "the" weight 3; every char survives
    assert(seed.contains("the") && seed("the") == 3L)
    "thecasrndog".foreach(c =>
      assert(seed.contains(c.toString), s"single char $c must survive seeding"))
    // a tight seedSize still keeps every single char even when outranked
    val tight = UnigramLm.seedVocab(words, maxPieceLen = 3, seedSize = 3)
      .collect().map(_.getString(0)).toSet
    "thecasrndog".foreach(c =>
      assert(tight.contains(c.toString), s"single char $c must survive a tight seed"))
  }

  test("EM training reduces segmentation cost and converges on the planted piece") {
    // corpus dominated by one repeated token: EM must keep "spark" whole
    val docs = (1 to 50).map(_ => "spark spark engine").toDF("text")
    val scores = UnigramLm.train(docs, col("text"),
      maxPieceLen = 6, seedSize = 50, vocabSize = 20, rounds = 2)
    val vocab = scores.as[(String, Long)].collect().toMap
    assert(vocab.contains("spark"), s"planted token must survive: ${vocab.keys}")
    assert(UnigramLm.viterbi("spark", vocab, 6) == Seq("spark"),
      "the dominant token must segment as one piece")
  }

  test("encode round-trips: concatenated pieces rebuild every token") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(100)
    val scores = UnigramLm.train(docs, col("text"),
      maxPieceLen = 4, seedSize = 300, vocabSize = 200, rounds = 1)
    val enc = UnigramLm.encode(docs, col("doc_id"), col("text"), scores,
      maxPieceLen = 4)
    val joined = enc.join(
      docs.select(col("doc_id"),
        concat_ws("", graft.functions.TextFunctions.tokens(col("text"))).as("glued")),
      "doc_id")
    val bad = joined
      .filter(concat_ws("", col("pieces")) =!= col("glued")).count()
    assert(bad == 0, s"$bad docs failed the piece round-trip")
  }

  test("trainFromWords == train over the same corpus (the q228/q229 seam)") {
    val docs = Seq("aa ab ba", "ab ab aa", "ba aa ab").toDF("text")
    val viaDocs = UnigramLm.train(docs, col("text"), maxPieceLen = 2,
      seedSize = 10, vocabSize = 8, rounds = 1)
      .as[(String, Long)].collect().toSet
    val viaWords = UnigramLm.trainFromWords(
        UnigramLm.wordCounts(docs, col("text")), maxPieceLen = 2,
        seedSize = 10, vocabSize = 8, rounds = 1)
      .as[(String, Long)].collect().toSet
    assert(viaDocs == viaWords)
  }

  test("trainFromWords leaves a caller-cached word table cached (no eviction side effect)") {
    import org.apache.spark.storage.StorageLevel
    val docs = Seq("aa ab ba", "ab ab aa").toDF("text")
    val words = UnigramLm.wordCounts(docs, col("text")).cache()
    words.count()
    UnigramLm.trainFromWords(words, maxPieceLen = 2, seedSize = 10,
      vocabSize = 8, rounds = 1).collect()
    assert(words.storageLevel != StorageLevel.NONE,
      "caller's persistence was evicted")
    words.unpersist()
    // and an UNcached input is not left pinned by the call
    val cold = UnigramLm.wordCounts(docs, col("text"))
    UnigramLm.trainFromWords(cold, maxPieceLen = 2, seedSize = 10,
      vocabSize = 8, rounds = 1).collect()
    assert(cold.storageLevel == StorageLevel.NONE,
      "function must release the cache it introduced")
  }

  test("training and encoding are partitioning-invariant") {
    val docs = Seq("aa ab ba", "ab ab aa", "ba aa ab").toDF("text")
    def run(df: org.apache.spark.sql.DataFrame) =
      UnigramLm.train(df, col("text"), maxPieceLen = 2,
        seedSize = 10, vocabSize = 8, rounds = 2)
        .as[(String, Long)].collect().toSet
    assert(run(docs) == run(docs.repartition(7)),
      "trained vocab must not depend on partitioning")
  }
}
