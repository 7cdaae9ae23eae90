package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class MaskingSpec extends SparkSpec {
  import spark.implicits._

  private val SentRe = "<extra_id_(\\d+)>".r

  test("spanCorrupt: input+target reconstruct the corpus exactly, sentinels consistent") {
    val d = Tables.documents(spark, sfDir)
    val got = Masking.spanCorrupt(d, col("doc_id"), col("text"))
      .join(d.select(col("doc_id").as("doc"), col("text")), Seq("doc"))
      .select("doc", "input_text", "target_text", "n_masked", "text")
      .as[(Long, String, String, Long, String)].collect()
    assert(got.nonEmpty)
    assert(got.exists(_._4 > 0), "the corpus must trigger some masking")
    assert(got.exists(_._4 == 0), "and leave some documents untouched")
    got.foreach { case (doc, input, target, nMasked, text) =>
      val inSent = SentRe.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      val tgSent = SentRe.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      // sentinels numbered 0..n-1 in order, identical in input and target
      assert(inSent == (0 until nMasked.toInt), s"doc $doc input sentinels $inSent")
      assert(tgSent == inSent, s"doc $doc target sentinels differ")
      // reconstruction: splice each target span back over its sentinel
      val spans = SentRe.split(target).toSeq.drop(1).map(_.trim) ++
        Seq.fill(nMasked.toInt - SentRe.split(target).length + 1)("")
      val rebuilt = inSent.foldLeft(input) { (acc, k) =>
        acc.replace(s"<extra_id_$k>", spans(k))
      }
      val origToks = text.trim.split("\\s+").toSeq
      val rebuiltToks = rebuilt.split("\\s+").filter(_.nonEmpty).toSeq
      assert(rebuiltToks == origToks,
        s"doc $doc: input⊕target must reproduce the original tokens")
    }
  }

  test("scalar twins: span_corrupt_input/target and fim_text match the DataFrame operators corpus-wide") {
    // the SQL-registered scalars must be the SAME function as the
    // explode-based operator — every (input, target) pair and every
    // fim rendering identical over the whole documents table
    val d = Tables.documents(spark, sfDir)
      .filter(length(trim(col("text"))) > 0) // the operator drops token-less docs
    val viaOp = Masking.spanCorrupt(d, col("doc_id"), col("text"))
      .select(col("doc"), col("input_text"), col("target_text"))
    val viaScalar = d.select(col("doc_id").as("doc"),
      Masking.spanCorruptInput(col("doc_id"), col("text")).as("input_text"),
      Masking.spanCorruptTarget(col("doc_id"), col("text")).as("target_text"))
    assert(viaOp.exceptAll(viaScalar).isEmpty && viaScalar.exceptAll(viaOp).isEmpty,
      "scalar span-corruption twins must equal the operator")
    val fimOp = Masking.fim(d, col("doc_id"), col("text"))
      .select(col("doc"), col("fim_text"))
    val fimScalar = d.select(col("doc_id").as("doc"),
      Masking.fimText(col("doc_id"), col("text")).as("fim_text"))
    assert(fimOp.exceptAll(fimScalar).isEmpty && fimScalar.exceptAll(fimOp).isEmpty,
      "fim_text scalar must equal the operator")
    // non-default knobs stay in lockstep too
    val opK = Masking.spanCorrupt(d, col("doc_id"), col("text"),
        blockTokens = 2, maskEvery = 3)
      .select(col("doc"), col("input_text"), col("target_text"))
    val scK = d.select(col("doc_id").as("doc"),
      Masking.spanCorruptInput(col("doc_id"), col("text"), 2, 3).as("input_text"),
      Masking.spanCorruptTarget(col("doc_id"), col("text"), 2, 3).as("target_text"))
    assert(opK.exceptAll(scK).isEmpty && scK.exceptAll(opK).isEmpty,
      "non-default block/mask knobs must agree")
  }

  test("spanCorrupt: a mask rate of ~never leaves every document untouched") {
    val d = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three")).toDF("doc_id", "text")
    val got = Masking.spanCorrupt(d, col("doc_id"), col("text"),
        maskEvery = 1000003)
      .select("doc", "input_text", "target_text", "n_masked")
      .as[(Long, String, String, Long)].collect().toMap2
    assert(got(1L) == (("alpha beta gamma delta epsilon zeta", "", 0L)))
    assert(got(2L) == (("one two three", "", 0L)))
  }

  implicit class Arr(a: Array[(Long, String, String, Long)]) {
    def toMap2: Map[Long, (String, String, Long)] =
      a.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("fim: parts reassemble the document; split points ordered and in range") {
    val d = Tables.documents(spark, sfDir)
    val got = Masking.fim(d, col("doc_id"), col("text"))
      .join(d.select(col("doc_id").as("doc"), col("text")), Seq("doc"))
      .as[(Long, String, Long, Long, String)].collect()
    assert(got.nonEmpty)
    val FimRe = "(?s)^<PRE>(.*)<SUF>(.*)<MID>(.*)$".r
    got.foreach { case (doc, fim, p1, p2, text) =>
      fim match {
        case FimRe(pre, suf, mid) =>
          assert(pre + mid + suf == text, s"doc $doc: parts must reassemble")
          assert(pre.length == p1 && mid.length == p2 - p1,
            s"doc $doc: split offsets disagree with part lengths")
        case _ => fail(s"doc $doc: bad FIM layout: $fim")
      }
      assert(p1 >= 0 && p1 <= p2 && p2 < math.max(text.length, 1),
        s"doc $doc: p1=$p1 p2=$p2 len=${text.length}")
    }
    // genuinely non-trivial: some documents must have a non-empty middle
    assert(got.count { case (_, _, p1, p2, _) => p2 > p1 } > got.length / 2)
  }

  test("fim: empty document passes through with empty parts") {
    val got = Masking.fim(Seq((9L, "")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, String, Long, Long)].head()
    assert(got == ((9L, "<PRE><SUF><MID>", 0L, 0L)))
  }

  test("cropPairs: both crops straddle the midpoint, match offsets, and differ") {
    val d = Tables.documents(spark, sfDir)
    val got = Masking.cropPairs(d, col("doc_id"), col("text"))
      .join(d.select(col("doc_id").as("doc"), col("text")), Seq("doc"))
      .as[(Long, String, String, Long, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (doc, a, b, as_, ae, bs, be, text) =>
      val n = text.length.toLong
      val half = n / 2
      for ((s, e, crop) <- Seq((as_, ae, a), (bs, be, b))) {
        assert(s >= 0 && s <= half, s"doc $doc: start $s outside [0, $half]")
        assert(e > half && e <= n, s"doc $doc: end $e outside ($half, $n]")
        assert(crop == text.substring(s.toInt, e.toInt),
          s"doc $doc: crop disagrees with its offsets")
      }
      // both crops cover position `half` → they genuinely share content
      assert(a.nonEmpty && b.nonEmpty)
    }
    // the draws are independent: most pairs should NOT be identical views
    assert(got.count { case (_, a, b, _, _, _, _, _) => a != b } > got.length / 2)
  }

  test("cropPairs: degenerate short documents emit the full text twice") {
    val got = Masking.cropPairs(
        Seq((1L, ""), (2L, "x")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, String, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "", "", 0L, 0L, 0L, 0L)))
    assert(got(2L) == ((2L, "x", "x", 0L, 1L, 0L, 1L)))
  }
}
