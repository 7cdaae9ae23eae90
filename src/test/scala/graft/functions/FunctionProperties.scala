package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expressions.HashUtil
import graft.text.Porter

/** ScalaCheck properties for the pure engine functions (SURVEY.md §5.4). */
object FunctionProperties extends Properties("graft.functions") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val anyStr = Gen.asciiPrintableStr

  property("md5Prefix60 equals the hex-prefix reference definition") =
    Prop.forAll(anyStr) { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(UTF8String.fromString(s).getBytes)
        .map("%02x".format(_)).mkString.take(15)
      HashUtil.md5Prefix60(UTF8String.fromString(s)) == java.lang.Long.parseLong(hex, 16)
    }

  property("md5Prefix60 is non-negative (fits 60 bits)") =
    Prop.forAll(anyStr) { s =>
      val v = HashUtil.md5Prefix60(UTF8String.fromString(s))
      v >= 0 && v < (1L << 60)
    }

  property("Porter stem of a lowercase word is nonempty, lowercase, no longer") =
    Prop.forAll(word) { w =>
      val s = Porter.stem(w)
      s.nonEmpty && s == s.toLowerCase && s.length <= w.length + 1
    }

  property("Porter stem is stable for already-short words") =
    Prop.forAll(Gen.oneOf("a", "be", "go", "it")) { w => Porter.stem(w) == w }

  property("TokenStatsImpl: modeCount equals the max multiplicity, charSum is exact") =
    Prop.forAll(Gen.listOf(word)) { ws =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(w => UTF8String.fromString(w): Any).toArray)
      val mode = graft.functions.expressions.TokenStatsImpl.modeCount(arr)
      val cs = graft.functions.expressions.TokenStatsImpl.charSum(arr)
      val wantMode = if (ws.isEmpty) 0L else ws.groupBy(identity).values.map(_.size).max.toLong
      mode == wantMode && cs == ws.map(_.length.toLong).sum
    }

  property("MinHashConfig.fingerprint is deterministic and separates configs") =
    Prop.forAll(Gen.chooseNum(1, 8), Gen.chooseNum(1, 4)) { (r, b) =>
      import graft.dedup.MinHashConfig
      val cfg = MinHashConfig.generated(r * b, b)
      cfg.fingerprint == MinHashConfig.generated(r * b, b).fingerprint &&
        cfg.fingerprint != cfg.copy(portable = false).fingerprint &&
        (b == 1 || cfg.fingerprint != MinHashConfig.generated(r * b, 1).fingerprint)
    }

  property("fingerprint fold stays inside the modulus") = {
    val hashes = Gen.listOf(Gen.chooseNum(0L, TextFunctions.FpTokenMod - 1))
    Prop.forAll(hashes) { hs =>
      val fp = hs.foldLeft(0L)((a, x) => (a * 31 + x) % TextFunctions.FpMod)
      fp >= 0 && fp < TextFunctions.FpMod
    }
  }

  property("MinHashConfig.generated is deterministic with in-range distinct params") =
    Prop.forAll(Gen.chooseNum(1, 16)) { bands =>
      val n = bands * 4
      val c1 = graft.dedup.MinHashConfig.generated(n, bands)
      val c2 = graft.dedup.MinHashConfig.generated(n, bands)
      val P = TextFunctions.MinHashP
      c1.perms == c2.perms && c1.perms.size == n &&
        c1.perms.forall { case (a, b) => a >= 1 && a < P && b >= 0 && b < P } &&
        c1.perms.distinct.size == n
    }

  property("minhash permutation output stays inside P for 60-bit inputs") = {
    val h = Gen.chooseNum(0L, (1L << 60) - 1)
    Prop.forAll(h) { v =>
      TextFunctions.MinHashPerms.forall { case (a, b) =>
        val m = (a * (v % TextFunctions.MinHashP) + b) % TextFunctions.MinHashP
        m >= 0 && m < TextFunctions.MinHashP
      }
    }
  }

  // --- AhoCorasickCounter vs the brute-force all-occurrence count -------
  // Small alphabet ("ab") maximizes collisions/overlaps; border-free
  // filter mirrors the expression's construction contract, under which
  // all-occurrence counting == non-overlapping replace-count.
  private val abText = Gen.listOf(Gen.oneOf('a', 'b')).map(_.mkString)
  private def borderFree(p: String): Boolean = {
    val b = p.getBytes("UTF-8")
    !(1 until b.length).exists(k =>
      java.util.Arrays.equals(b, 0, k, b, b.length - k, b.length))
  }
  private val abPatterns = Gen.nonEmptyListOf(
      Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
    .map(_.distinct.filter(borderFree)).suchThat(_.nonEmpty)

  private def bruteCount(text: String, ps: Seq[String]): Long =
    ps.map { p =>
      var i = 0; var n = 0L
      while ({ i = text.indexOf(p, i); i >= 0 }) { n += 1; i += 1 }
      n
    }.sum

  property("AhoCorasickCounter.countAll equals the brute all-occurrence sum") =
    Prop.forAll(abText, abPatterns) { (text, ps) =>
      val ac = new graft.functions.expressions.AhoCorasickCounter(
        ps.map(_.getBytes("UTF-8")))
      ac.countAll(UTF8String.fromString(text)) == bruteCount(text, ps)
    }

  property("border-free contract: all-occurrence == non-overlapping replace count") =
    Prop.forAll(abText, abPatterns) { (text, ps) =>
      val nonOverlap = ps.map { p =>
        (text.length - text.replace(p, "").length).toLong / p.length
      }.sum
      val ac = new graft.functions.expressions.AhoCorasickCounter(
        ps.map(_.getBytes("UTF-8")))
      ac.countAll(UTF8String.fromString(text)) == nonOverlap
    }
}
