package graft

/** Typed error taxonomy (reference errors.py:30-84, the O2AGOLError
  * hierarchy): every pipeline error carries a structured context map
  * whose CANONICAL keys are {country, theme, release, stage}, plus
  * any caller-specific extras — the key set is deliberately open
  * (convention, not framework), exactly as the reference keeps its
  * context dict untyped so downstream carriers can add identifiers
  * like `grid_cell` without subclassing. The rendered message embeds
  * the sorted context so a plain log line stays greppable, mirroring
  * the reference's `__str__`.
  *
  * Scala-first deviations: the base is a sealed RuntimeException
  * hierarchy (errors compose with JVM cause chains instead of
  * dataclass fields), and [[GraftError.enrich]] rebuilds an error
  * one call-frame up with MORE context — the idiom the CLI uses to
  * add {country, stage} to an error raised deeper in the engine,
  * where the reference would mutate the dict.
  */
sealed abstract class GraftError(
    val message: String,
    val context: Map[String, String],
    cause: Throwable)
    extends RuntimeException(GraftError.render(message, context), cause)

/** Ingestion/dump failures — S3/lake fetch, dump completeness,
  * schema drift (reference OvertureError).
  */
final class OvertureError(
    message: String,
    context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends GraftError(message, context, cause)

/** Geometry validation / schema transformation failures (reference
  * TransformError).
  */
final class TransformError(
    message: String,
    context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends GraftError(message, context, cause)

/** Feature-service publishing failures — layer state, swap/append
  * jobs (reference PublishError).
  */
final class PublishError(
    message: String,
    context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends GraftError(message, context, cause)

/** File-export failures — format routing, driver errors (reference
  * ExportError).
  */
final class ExportError(
    message: String,
    context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends GraftError(message, context, cause)

/** Configuration / resolution failures — catalog parsing, release
  * resolution, credential-shaped input validation (reference
  * ConfigError).
  */
final class ConfigError(
    message: String,
    context: Map[String, String] = Map.empty,
    cause: Throwable = null)
    extends GraftError(message, context, cause)

object GraftError {

  private[graft] def render(message: String, context: Map[String, String]): String =
    if (context.isEmpty) message
    else
      message + " | context={" +
        context.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ") + "}"

  /** Rebuild `e` with `extra` context merged in (extra wins on key
    * collision), preserving subclass, message, and cause — the
    * call-frame enrichment idiom: the engine raises with what it
    * knows (release, theme, stage), the CLI adds what only it knows
    * (country, command).
    */
  def enrich(e: GraftError, extra: Map[String, String]): GraftError = {
    val ctx = e.context ++ extra
    e match {
      case _: OvertureError  => new OvertureError(e.message, ctx, e.getCause)
      case _: TransformError => new TransformError(e.message, ctx, e.getCause)
      case _: PublishError   => new PublishError(e.message, ctx, e.getCause)
      case _: ExportError    => new ExportError(e.message, ctx, e.getCause)
      case _: ConfigError    => new ConfigError(e.message, ctx, e.getCause)
    }
  }
}
