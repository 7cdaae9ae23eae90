package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Concat, Expression, ExpressionInfo, Literal, RegExpExtract, RegExpExtractAll, RegExpReplace, Size, StringReplace, StringTranslate, StringTrim}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions
import graft.functions.expressions.{CosineSimilarity, DotProduct, PorterStem}

/** Engine extension point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`):
  *  - the [[RegexAlternationToContains]] and [[HofDotProductToNative]]
  *    optimizer rules;
  *  - SQL bindings for the native expressions (`dot_product`,
  *    `cosine_similarity`, `porter_stem`) so `spark.sql(...)` users get
  *    them too;
  *  - SQL bindings for the pipeline-hygiene column functions
  *    (`scrub_pii`, `url_host`, `pii_count`) — these expand to the same
  *    codegen'd builtin chains the DataFrame API builds, via the
  *    Column→Expression bridge.
  */
object GraftExtensions {

  /** (name, usage, builder) for every SQL function the engine exports —
    * single source of truth for both registration paths. */
  private[plans] val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      "dot_product(a, b) - strict left-to-right dot product of two array<double>",
      args => DotProduct(args(0), args(1))),
    ("cosine_similarity",
      "cosine_similarity(a, b) - single-pass cosine similarity of two array<double>",
      args => CosineSimilarity(args(0), args(1))),
    ("porter_stem",
      "porter_stem(word) - Porter-stemmed form of word",
      args => PorterStem(args.head)),
    // the column-function twins below are rebuilt as catalyst trees
    // (a Column round-trip would hand the registry unresolved nodes)
    ("scrub_pii",
      "scrub_pii(text) - text with URLs/emails/phones replaced by typed placeholders",
      args => TextFunctions.PiiRules.foldLeft(args.head) { case (c, (re, tag)) =>
        RegExpReplace(c, Literal(re), Literal(tag))
      }),
    ("url_host",
      "url_host(text) - host of the first URL in text, '' when none",
      args => RegExpExtract(args.head, Literal(TextFunctions.UrlHostRe), Literal(1))),
    ("pii_count",
      "pii_count(text) - number of URL/email/phone matches in text",
      args => TextFunctions.PiiRules.map { case (re, _) =>
        Cast(Size(RegExpExtractAll(args.head, Literal(re), Literal(0))), LongType): Expression
      }.reduce(Add(_, _))),
    ("canonicalize",
      "canonicalize(text) - ASCII-case-folded, whitespace-collapsed, trimmed text (near-exact dedup key)",
      args => StringTrim(RegExpReplace(
        StringTranslate(args.head,
          Literal(TextFunctions.Uc), Literal(TextFunctions.Lc)),
        Literal(TextFunctions.WsRunRe), Literal(" ")))),
    ("extract_html_text",
      "extract_html_text(html) - plain text of html: script/style/comment blocks out, tags stripped, entities decoded, whitespace collapsed",
      args => {
        val noBlocks = TextFunctions.HtmlBlockRes.foldLeft(args.head)((c, re) =>
          RegExpReplace(c, Literal(re), Literal("")))
        val noTags = RegExpReplace(noBlocks,
          Literal(TextFunctions.HtmlTagRe), Literal(" "))
        val decoded = TextFunctions.HtmlEntities.foldLeft(noTags: Expression) {
          case (c, (ent, v)) => StringReplace(c, Literal(ent), Literal(v))
        }
        StringTrim(RegExpReplace(decoded,
          Literal(TextFunctions.WsRunRe), Literal(" ")))
      }),
    ("canonicalize_url",
      "canonicalize_url(url) - url with fragment/tracking params dropped, scheme+host lowercased, default port and trailing slash removed",
      args => {
        val noFrag = RegExpReplace(args.head, Literal("#.*"), Literal(""))
        val noTrack = RegExpReplace(noFrag,
          Literal(TextFunctions.TrackingParamRe), Literal(""))
        val tidy = RegExpReplace(
          RegExpReplace(noTrack, Literal("\\?&"), Literal("?")),
          Literal("[?&]+$"), Literal(""))
        val head = StringTranslate(
          RegExpExtract(tidy, Literal(TextFunctions.UrlHeadRe), Literal(0)),
          Literal(TextFunctions.Uc), Literal(TextFunctions.Lc))
        val rest = RegExpReplace(tidy, Literal(TextFunctions.UrlHeadRe), Literal(""))
        val headNoPort = RegExpReplace(
          RegExpReplace(head, Literal("^(http://[^/:]*):80$"), Literal("$1")),
          Literal("^(https://[^/:]*):443$"), Literal("$1"))
        RegExpReplace(Concat(Seq(headNoPort, rest)), Literal("/$"), Literal(""))
      }),
    ("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC composition (UAX #15), same as DuckDB's nfc_normalize",
      args => graft.functions.expressions.NfcNormalize(args.head)),
    ("strip_accents",
      "strip_accents(text) - NFD-decompose, drop combining marks, recompose",
      args => graft.functions.expressions.StripAccents(args.head)),
    // the frontier/masking functions below are string-pure column
    // functions (when/regexp/HOF chains); their trees come through the
    // EAGER Column→Expression bridge — the analyzer's own fixed-point
    // resolves the nested UnresolvedFunction/lambda nodes, exactly as it
    // would for SQL-authored text (the LAZY bridge would hand the
    // registry an unplannable ColumnNodeExpression placeholder)
    ("resolve_url",
      "resolve_url(base, href) - href resolved against its page's canonical base URL (RFC 3986 subset)",
      args => Bridge.eagerExpression(graft.operators.Frontier.resolveUrl(
        Bridge.column(args(0)), Bridge.column(args(1))))),
    ("robots_star_disallows",
      "robots_star_disallows(robots_txt) - Disallow path prefixes of the User-agent: * group(s)",
      args => Bridge.eagerExpression(
        graft.operators.Frontier.robotsStarDisallows(Bridge.column(args.head)))),
    ("span_corrupt_input",
      "span_corrupt_input(doc, text[, block_tokens, mask_every]) - T5 span-corruption input: masked blocks collapsed to <extra_id_K> sentinels",
      args => Bridge.eagerExpression(graft.text.Masking.spanCorruptInput(
        Bridge.column(args(0)), Bridge.column(args(1)),
        litInt(args, 2, 3), litInt(args, 3, 5)))),
    ("span_corrupt_target",
      "span_corrupt_target(doc, text[, block_tokens, mask_every]) - T5 span-corruption target: sentinel-delimited masked content",
      args => Bridge.eagerExpression(graft.text.Masking.spanCorruptTarget(
        Bridge.column(args(0)), Bridge.column(args(1)),
        litInt(args, 2, 3), litInt(args, 3, 5)))),
    ("fim_text",
      "fim_text(doc, text) - fill-in-the-middle reorder <PRE>...<SUF>...<MID>... with hash-drawn splits",
      args => Bridge.eagerExpression(graft.text.Masking.fimText(
        Bridge.column(args(0)), Bridge.column(args(1))))),
    // gate-family scalars: the blocklist must be a LITERAL array (it is
    // compiled into the Aho-Corasick DFA at plan time, exactly like the
    // Column API's Seq[String] parameter)
    ("substring_hits",
      "substring_hits(text, array('p1', ...)) - total non-overlapping occurrences of every literal pattern, one Aho-Corasick DFA pass",
      args => graft.functions.expressions.SubstringHitCount(
        args(0), litStrings(args, 1))),
    ("deflate_ratio",
      "deflate_ratio(text[, level]) - micro-int deflate(text)/|text| entropy proxy (deterministic per JVM; see DeflateRatio)",
      args => graft.functions.expressions.DeflateRatio(
        args(0), litInt(args, 1, 6))))

  /** Foldable-int argument at `i`, or `default` when absent — the
    * span-corruption knobs must be literals (they size the block
    * arithmetic baked into the expression tree). */
  private def litInt(args: Seq[Expression], i: Int, default: Int): Int =
    if (args.length <= i) default
    else args(i) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }

  /** Literal string-array argument at `i` — accepts both the pre-folding
    * `array('a','b')` tree and a constant-folded array literal. */
  private def litStrings(args: Seq[Expression], i: Int): Seq[String] = {
    def bad(e: Any) = throw new IllegalArgumentException(
      s"argument ${i + 1} must be a literal string array, got $e")
    args(i) match {
      case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
        children.map {
          case Literal(s, _) if s != null => s.toString
          case other => bad(other)
        }
      case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData, t)
          if t.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
        data.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(v => if (v == null) bad(v) else v.toString).toSeq
      case other => bad(other)
    }
  }

  /** Runtime registration of the same SQL functions on an existing
    * session (extensions configs only apply at session construction). */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RegexAlternationToContains)
    e.injectOptimizerRule(_ => HofDotProductToNative)
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}
