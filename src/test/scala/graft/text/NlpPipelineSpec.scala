package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NlpPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("Porter stemmer handles the classic examples") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
      "troubling" -> "troubl", "sized" -> "size", "hopping" -> "hop",
      "falling" -> "fall", "happy" -> "happi", "relational" -> "relat",
      "conditional" -> "condit", "rational" -> "ration")
    val bad = cases.collect { case (in, want) if Porter.stem(in) != want =>
      s"$in -> ${Porter.stem(in)} (want $want)" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("PorterStem expression matches the Scala function and stays codegen'd") {
    val words = Seq("running", "flies", "happiness", "tables", "query")
    val got = words.toDF("w")
      .select(NlpPipeline.stemToken(col("w")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == words.map(Porter.stem))
    // plan should be a plain project over a LocalTableScan, no UDF nodes
    val plan = words.toDF("w").select(NlpPipeline.stemToken(col("w")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("normalize lowercases, strips punctuation and drops empty tokens") {
    val got = Seq("Hello, WORLD!! ++ 42x").toDF("t")
      .select(NlpPipeline.normalize(NlpPipeline.tokenize(col("t"))).as("tk"))
      .head.getSeq[String](0)
    assert(got == Seq("hello", "world", "42x"))
  }

  test("clean pipeline removes stopwords and stems (NFL_Processing.py:143-183)") {
    val out = NlpPipeline.clean(
      Seq("The Players were running onto the fields").toDF("text"), col("text"))
      .select("tokens").head.getSeq[String](0)
    assert(!out.contains("the") && !out.contains("were"))
    assert(out.contains("player") && out.contains("run") && out.contains("field"))
  }

  test("indexLabel assigns 0.0 to the most frequent value") {
    val df = Seq("a", "a", "a", "b").toDF("lab")
    val out = NlpPipeline.indexLabel(df, "lab", "lab_idx")
    assert(out.filter($"lab" === "a").select("lab_idx").head.getDouble(0) == 0.0)
  }
}
