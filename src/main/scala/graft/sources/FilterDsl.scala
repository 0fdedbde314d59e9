package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** The reference's SQL-style filter mini-language re-expressed as
  * Catalyst `Column` predicates (reference:
  * src/o2agol/pipeline/source.py:74-152 `apply_sql_filter` —
  * supports `col = 'v'` and `col IN ('a','b')`, including nested
  * paths like `categories.primary`).
  *
  * Unlike the reference's row-at-a-time pandas apply, the result is
  * a declarative predicate: Catalyst pushes it into the parquet
  * scan (visible as PushedFilters) and it stays inside
  * whole-stage codegen.
  */
object FilterDsl {

  private val EqRe = """^\s*([\w.]+)\s*=\s*'([^']*)'\s*$""".r
  private val InRe = """^\s*([\w.]+)\s+IN\s+\(([^)]*)\)\s*$""".r

  /** Resolve a possibly-nested column path against a concrete
    * DataFrame schema. A dotted path whose base is a string column
    * is treated as a JSON property access (the testdata analogue of
    * Overture's struct fields); a struct base uses native field
    * access (no parsing cost at all).
    */
  def resolve(df: DataFrame, path: String): Column =
    if (!path.contains(".")) col(path)
    else {
      val base = path.takeWhile(_ != '.')
      val rest = path.drop(base.length + 1)
      df.schema(base).dataType match {
        case StringType   => get_json_object(col(base), s"$$.$rest")
        case _: StructType => col(path)
        case other =>
          throw new IllegalArgumentException(
            s"cannot access nested path '$path' on column of type $other")
      }
    }

  /** Parse a filter expression; None for blank (reference returns
    * the frame unfiltered).
    */
  def parse(df: DataFrame, filter: String): Option[Column] =
    Option(filter).map(_.trim).filter(_.nonEmpty).map {
      case EqRe(path, value) => resolve(df, path) === lit(value)
      case InRe(path, values) =>
        // Prefer explicit quoted tokens: naive comma-splitting would
        // corrupt values containing commas ('food, drink').
        val quoted = "'([^']*)'".r.findAllMatchIn(values).map(_.group(1)).toSeq
        val vs =
          if (quoted.nonEmpty) quoted
          else values.split(",").map(_.trim).toSeq
        resolve(df, path).isin(vs: _*)
      case other =>
        throw new IllegalArgumentException(s"unsupported filter: $other")
    }

  def apply(df: DataFrame, filter: String): DataFrame =
    parse(df, filter).map(df.filter).getOrElse(df)
}
