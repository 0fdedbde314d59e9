package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data validation — the constraint report (null checks,
  * domain checks, bound checks, referential integrity) a pipeline
  * gates a release on before publish; the deequ-style primitive.
  * Reference analogue: transform.py's drop-invalid thresholds and
  * source.py's completeness checks, generalized to named rules.
  *
  * Scale shape: every column-local rule folds into ONE aggregation
  * pass (a `sum(violated)` per rule — map-side partials, one scan,
  * no per-rule job); a NULL predicate result counts as a violation
  * (SQL three-valued logic must not let unknowns pass a gate). The
  * referential rule is a broadcast/shuffle anti-join on the key —
  * the only rule shape that inherently needs a second input.
  */
object Constraints {

  /** One row per rule: (rule, n_violations), single scan. */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    val aggs: Seq[Column] = rules.map { case (name, pred) =>
      sum((!coalesce(pred, lit(false))).cast("long")).as(s"__$name")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(rules.map { case (name, _) =>
      struct(lit(name).as("rule"),
        coalesce(col(s"__$name"), lit(0L)).as("n_violations")) }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_violations"))
  }

  /** Referential-integrity rule: count of rows whose key has no
    * match in `dim` — an anti-join, the shape FK validation takes
    * when the dimension doesn't fit one executor (Spark broadcasts
    * it when it does).
    */
  def referential(
      df: DataFrame,
      key: String,
      dim: DataFrame,
      dimKey: String,
      name: String): DataFrame =
    df.join(dim, df(key) === dim(dimKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
}
