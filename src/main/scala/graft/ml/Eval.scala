package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling.microRatioSql

/** Classifier evaluation on corpus-scale score columns — the audit
  * behind every "keep if classifier score ≥ τ" curation gate: before a
  * pipeline trusts the quality/safety classifier seam, something must
  * measure whether its scores actually rank positives above negatives.
  * Extension tier (the reference evaluates with MLlib's
  * BinaryClassificationEvaluator, whose area is approximated and
  * float-summed — not replayable across engines).
  */
object Eval {

  /** EXACT ROC-AUC by the Mann–Whitney rank-sum identity, integer end
    * to end: AUC = U/(n⁺·n⁻) with U = Σ_{positives} midrank −
    * n⁺(n⁺+1)/2, ties handled by MID-ranks (the textbook definition —
    * an approximate trapezoid over sampled thresholds is what this
    * replaces). Mid-ranks step by ½, so everything is carried DOUBLED:
    * `two_u = Σ_s pos_s·(2·cumBefore_s + cnt_s + 1) − n⁺(n⁺+1)` is an
    * exact long, and `auc_ppm = 10⁶·two_u/(2·n⁺·n⁻)` stages through
    * [[graft.operators.Sampling.microRatioSql]] — no float anywhere,
    * so any engine reproduces the released number bit-for-bit.
    *
    * Scale shape: scores must be integer-valued (the classifier seam's
    * micro-quantized scores are; real-valued scores quantize first —
    * that is a measurement decision, not a loss). The corpus collapses
    * to a per-distinct-score histogram in ONE map-side-combinable
    * aggregation; the global rank walk is a window over |distinct
    * scores| rows (bounded by the score domain, NOT the corpus — the
    * unpartitioned window is histogram-sized by construction).
    *
    * Output (1 row): (n_pos, n_neg, two_u, auc_ppm); auc_ppm is NULL
    * when either class is absent (AUC is undefined, not 0).
    *
    * SAFE-SCALE BOUND (the mixture-planner discipline: exactness has a
    * documented int64 ceiling, not a silent wrap): `two_u ≤ 2·n⁺·n⁻`
    * grows quadratically, and [[microRatioSql]] stages `two_u·1000`, so
    * the ratio is exact while `2·n⁺·n⁻ < 2⁶³/1000 ≈ 9.2·10¹⁵` —
    * n⁺·n⁻ ≤ 4.6·10¹⁵, i.e. ~1.4·10⁸ rows balanced (more if skewed:
    * the binding product is n⁺·n⁻, not n). Upstream of that, the
    * per-score partial `_tms = pos·(2·cumBefore + cnt + 1) < 2n·n⁺`
    * and its sum stay in-range to n ≈ 2·10⁹ rows. Beyond ~140M
    * balanced evaluation rows, pre-aggregate (sample or stratify the
    * eval set — an EVAL set that size is a measurement-design smell)
    * rather than trusting this ratio. */
  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val h = df.select(scoreCol.cast("long").as("s"),
        labelCol.cast("boolean").as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val before = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("_cb", coalesce(sum("cnt").over(before), lit(0L)))
      .withColumn("_tms",
        col("pos") * (lit(2L) * col("_cb") + col("cnt") + lit(1L)))
      .agg(sum("pos").cast("long").as("n_pos"),
        sum(col("cnt") - col("pos")).cast("long").as("n_neg"),
        sum("_tms").cast("long").as("_trs"))
      .withColumn("two_u",
        col("_trs") - col("n_pos") * (col("n_pos") + lit(1L)))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr(microRatioSql("two_u", "2 * n_pos * n_neg", "div"))))
      .drop("_trs")
  }

  /** EXACT per-class precision/recall/F1 + accuracy from the confusion
    * frame — the released-metrics twin of [[aucExact]]: the reference
    * reads accuracy/F1 off MLlib's `MulticlassMetrics` (float division,
    * not replayable); here every ratio is a staged integer floor-ppm
    * ([[microRatioSql]]), so a released model card's metrics replay
    * bit-for-bit on any engine.
    *
    * Definitions (the standard multiclass one-vs-rest accounting over
    * classes = labels ∪ predictions):
    *   tp_c = n(label=c ∧ pred=c), fp_c = predicted_c − tp_c,
    *   fn_c = support_c − tp_c;
    *   precision_ppm = ⌊10⁶·tp/predicted⌋ (NULL when predicted=0),
    *   recall_ppm    = ⌊10⁶·tp/support⌋ (NULL when support=0),
    *   f1_ppm        = ⌊2·P_ppm·R_ppm/(P_ppm+R_ppm)⌋ (NULL when either
    *                   is NULL or both are 0 — undefined, not fake 0);
    *   accuracy_ppm  = ⌊10⁶·Σtp/total⌋, macro_f1_ppm =
    *   ⌊Σcoalesce(f1,0)/|classes|⌋, and weighted_f1_ppm =
    *   ⌊Σcoalesce(f1,0)·support / Σsupport⌋ ride along as constant
    *   columns (undefined-F1 classes average as 0, the sklearn
    *   convention; weighted F1 is MulticlassClassificationEvaluator's
    *   DEFAULT metric — the one the reference actually reads — so a
    *   parity reader gets it without re-deriving it from the per-class
    *   rows).
    * All inputs to every division are exact longs; P,R ≤ 10⁶ so the F1
    * cross-product ≤ 2·10¹², and the weighted numerator ≤ 10⁶·total
    * (in-range while total < 9.2·10¹² rows) — no staging needed.
    *
    * Null labels or predictions carry no evaluation evidence and are
    * dropped (the calibration-fit discipline).
    *
    * Mixed-type guard: the reference's exact shape is integer-ish
    * labels vs MLlib's DOUBLE predictions; stringifying each column
    * independently renders those as '1' vs '1.0' and every row lands
    * off-diagonal with no error. Numeric columns therefore canonicalize
    * through `double` before `string`, so 1 (int) and 1.0 (double) name
    * the same class; non-numeric columns stringify as-is.
    *
    * Scale shape: ONE corpus-scale map-side-combinable aggregation to
    * the ≤|classes|² confusion frame; every join/window after it is
    * class-domain. Output: one row per class. */
  def confusionMetrics(df: DataFrame, labelCol: Column,
                       predCol: Column,
                       scope: graft.operators.CacheScope =
                         graft.operators.CacheScope.unmanaged): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val raw = df.select(labelCol.as("label"), predCol.as("pred"))
    val canon = raw.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType => col(f.name).cast("double").cast("string").as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    // the ≤|classes|² confusion frame feeds SIX readers (classes ×2,
    // tp, support, predicted, totals) — persisted so the corpus
    // aggregation provably runs once (r19; un-persisted, each reader
    // re-ran the reduce side and the plan carried 19 exchanges)
    val cm = scope.persist(raw.select(canon.toSeq: _*)
      .filter(col("label").isNotNull && col("pred").isNotNull)
      .groupBy("label", "pred").agg(count(lit(1)).as("n")))
    val classes = cm.select(col("label").as("class"))
      .unionByName(cm.select(col("pred").as("class"))).distinct()
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("class"), col("n").as("tp"))
    val sup = cm.groupBy(col("label").as("class"))
      .agg(sum("n").cast("long").as("support"))
    val pr = cm.groupBy(col("pred").as("class"))
      .agg(sum("n").cast("long").as("predicted"))
    val m = classes
      .join(tp, Seq("class"), "left")
      .join(sup, Seq("class"), "left")
      .join(pr, Seq("class"), "left")
      .na.fill(0L, Seq("tp", "support", "predicted"))
      .withColumn("fp", col("predicted") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .withColumn("precision_ppm", when(col("predicted") > 0L,
        expr(microRatioSql("tp", "predicted", "div"))))
      .withColumn("recall_ppm", when(col("support") > 0L,
        expr(microRatioSql("tp", "support", "div"))))
      .withColumn("f1_ppm",
        when(col("precision_ppm") + col("recall_ppm") > 0L,
          expr("(2 * precision_ppm * recall_ppm)" +
            " div (precision_ppm + recall_ppm)")))
    val tot = cm.agg(sum("n").cast("long").as("total"),
        coalesce(sum(when(col("label") === col("pred"), col("n"))), lit(0L))
          .cast("long").as("_correct"))
      .withColumn("accuracy_ppm", when(col("total") > 0L,
        expr(microRatioSql("_correct", "total", "div"))))
      .drop("_correct")
    val macroF1 = m.agg(
      expr("sum(coalesce(f1_ppm, bigint(0))) div count(*)")
        .as("macro_f1_ppm"),
      expr("sum(coalesce(f1_ppm, bigint(0)) * support) div sum(support)")
        .as("weighted_f1_ppm"))
    m.select("class", "tp", "fp", "fn", "support",
        "precision_ppm", "recall_ppm", "f1_ppm")
      .crossJoin(broadcast(tot))   // 1 row
      .crossJoin(broadcast(macroF1)) // 1 row
  }
}
