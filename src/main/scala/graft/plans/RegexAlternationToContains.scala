package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Contains, Expression, Literal, Or, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite `col RLIKE 'lit1|lit2|lit3'` — a pure-literal
  * alternation with no regex metacharacters — into
  * `Contains(col,lit1) OR Contains(col,lit2) OR ...`.
  *
  * Motivation (SURVEY.md §4): the reference leans on literal-alternation
  * rlike for video-url and player-mention predicates
  * (reference: code/eda/project_eda.py:253, code/ml/../Sentiment_Analysis.py:227).
  * Java-regex `find()` walks a DFA per row; Contains lowers to a UTF8String
  * byte scan inside codegen and, unlike RLike, can participate in further
  * pushdown. Sound because Spark's RLIKE is a partial (find) match, which
  * for a metacharacter-free pattern is exactly substring containment.
  */
object RegexAlternationToContains extends Rule[LogicalPlan] {

  /** Only plain literal alternations: word chars / space / dash between
    * single '|' separators — anything else might be a real regex. */
  private val plainAlternation = "^[A-Za-z0-9_ -]+(\\|[A-Za-z0-9_ -]+)+$".r

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case RLike(subject, Literal(p: UTF8String, StringType))
        if plainAlternation.matches(p.toString) =>
      p.toString.split('|')
        .map(lit => Contains(subject, Literal(UTF8String.fromString(lit), StringType)): Expression)
        .reduce(Or(_, _))
  }
}
