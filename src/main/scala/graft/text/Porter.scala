package graft.text

/** Porter stemming algorithm (Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 — public algorithm). The reference uses Spark NLP's
  * Stemmer annotator (reference: code/nlp/NFL_Processing.py:411-413); this
  * is the engine's self-contained equivalent, exposed to DataFrames via the
  * codegen'd [[graft.functions.expressions.PorterStem]] expression.
  *
  * Steps 1a/1b/1c/2/3/4/5a/5b of the classic definition.
  */
object Porter {

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** Measure m of the [C](VC)^m[V] form. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isCons(w, i))

  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: ends cvc where final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceEnd(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > minM - 1) Some(stem + repl) else Some(w)
    } else None

  private val step2Pairs = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Pairs = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  // Classic step-4 list order (longest-match encoded by ordering, e.g.
  // ement ≺ ment ≺ ent); "ion" carries its *S/*T precondition inline in
  // the match below. At most ONE rule fires per step, per the original
  // algorithm: "affectionate" → "affection", never → "affect".
  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(word: String): String = {
    var w = word.toLowerCase
    if (w.length <= 2) return w

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var step1bFlag = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); step1bFlag = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); step1bFlag = true
    }
    if (step1bFlag) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleCons(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2
    step2Pairs.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      val stem = w.dropRight(s.length)
      if (measure(stem) > 0) w = stem + r
    }

    // Step 3
    step3Pairs.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      val stem = w.dropRight(s.length)
      if (measure(stem) > 0) w = stem + r
    }

    // Step 4 — single longest-match rule application
    val s4 = step4Suffixes.find(s => w.endsWith(s) &&
      (s != "ion" || (w.length > s.length && "st".contains(w.charAt(w.length - s.length - 1)))))
    s4.foreach { s =>
      val stem = w.dropRight(s.length)
      if (measure(stem) > 1) w = stem
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (endsDoubleCons(w) && w.endsWith("l") && measure(w) > 1) w = w.dropRight(1)

    w
  }
}
