package graft

import graft.config.{CountryRegistry, QueryConfig}
import graft.`export`.{CacheKey, CountryCache, Exporter, ExportFormat, FeatureService, GeoJson, PublishMode}
import graft.operators.Normalize
import graft.sources.{OvertureReader, ReadRequest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Thin user-facing entry point — the engine-side analogue of the
  * reference's typer CLI (reference: src/o2agol/cli.py — `export`,
  * `arcgis-upload`, `list-queries`, `list-cache`, `clear-cache`,
  * `version`). The CLI only WIRES the library: catalog entry →
  * read → normalize/enrich → export or publish; every step is the
  * same public API the registry queries exercise.
  *
  * Usage (valued flags use `--key=value`):
  * {{{
  *   graft.Cli export   <catalog.json> <query> <sfDir> <outPath> [--country=ISO3] [--geom=xCol,yCol] [--date=ISO]
  *   graft.Cli publish  <catalog.json> <query> <sfDir> <servicePath> [--mode=auto|initial|overwrite|append] [--country=ISO3] [--date=ISO]
  *   graft.Cli run          <registry-query> <sfDir> <outPath.{parquet,csv}>
  *   graft.Cli list-registry
  *   graft.Cli list-queries <catalog.json>
  *   graft.Cli list-cache   <cachePath>
  *   graft.Cli clear-cache  <cachePath> <release> <country> <theme> <type>
  *   graft.Cli cleanup      <servicePath> <keep,names> [--dry-run]
  *   graft.Cli version
  * }}}
  */
object Cli {

  val Version = "0.2.0"

  /** Build (or reuse) the session; factored out so tests drive the
    * verbs against their own session.
    */
  private def session(): SparkSession =
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def flags(args: Seq[String]): (Seq[String], Map[String, String]) = {
    val (f, pos) = args.partition(_.startsWith("--"))
    val kv = f.map { s =>
      val eq = s.indexOf('=')
      if (eq >= 0) s.substring(2, eq) -> s.substring(eq + 1)
      else s.substring(2) -> "true"
    }.toMap
    (pos, kv)
  }

  /** catalog entry → read → sanitize → enrich: the common front half
    * of export and publish (reference process_target, cli.py:416).
    */
  private[graft] def runPipeline(
      spark: SparkSession,
      cfg: QueryConfig,
      sfDir: String,
      countryIso3: String,
      date: String
  ): DataFrame = {
    val t = Tables(spark, sfDir)
    val raw = OvertureReader.read(t, ReadRequest(cfg.theme, filter = cfg.filter))
    val country = CountryRegistry.builtin.get(countryIso3)
      .getOrElse(throw new IllegalArgumentException(s"unknown country: $countryIso3"))
    Normalize.addMetadata(
      Normalize.orderColumnsForPublish(Normalize.clipStrings(raw)),
      country.iso3, country.name, cfg.sectorTitle, date)
  }

  private def loadEntry(spark: SparkSession, catalogPath: String, name: String): QueryConfig = {
    val catalog = QueryConfig.catalogFromJson(spark, catalogPath)
    catalog.getOrElse(name, throw new IllegalArgumentException(
      s"no query '$name' in $catalogPath (have: ${catalog.keys.toSeq.sorted.mkString(", ")})"))
  }

  /** Verb dispatch, separated from main() so specs can call it with a
    * test session and capture behavior without forking a JVM.
    */
  private[graft] def run(spark: SparkSession, args: Seq[String]): Unit = {
    val (pos, opt) = flags(args)
    val date = opt.getOrElse("date", "1970-01-01T00:00:00")
    pos match {
      case Seq("export", catalogPath, name, sfDir, outPath) =>
        val cfg = loadEntry(spark, catalogPath, name)
        val df = runPipeline(spark, cfg, sfDir, opt.getOrElse("country", "AFG"), date)
        val fmt = ExportFormat.fromPath(outPath)
        val geomCols = opt.get("geom").map { g =>
          g.split(",", 2) match {
            case Array(xc, yc) if yc.nonEmpty => (col(xc).cast("double"), col(yc).cast("double"))
            case _ => throw new IllegalArgumentException(
              s"--geom expects xCol,yCol (got '$g')")
          }
        }
        Exporter.write(df, outPath, fmt,
          geometryJson = geomCols.map { case (x, y) => GeoJson.pointGeometry(x, y) },
          target = name, generatedAt = date,
          geometryWkb = geomCols.map { case (x, y) => graft.functions.Wkb.wkbFromXY(x, y) })
        println(s"exported ${cfg.name} -> $outPath ($fmt)")

      case Seq("publish", catalogPath, name, sfDir, servicePath) =>
        val cfg = loadEntry(spark, catalogPath, name)
        val df = runPipeline(spark, cfg, sfDir, opt.getOrElse("country", "AFG"), date)
        val mode = opt.getOrElse("mode", "auto").toLowerCase match {
          case "auto"      => PublishMode.Auto
          case "initial"   => PublishMode.Initial
          case "overwrite" => PublishMode.Overwrite
          case "append"    => PublishMode.Append
          case other       => throw new IllegalArgumentException(s"unknown mode: $other")
        }
        FeatureService.publish(df, servicePath, cfg.name, mode, cfg.upsertKey)
        println(s"published ${cfg.name} -> $servicePath (mode=$mode)")

      // Run any REGISTERED operator query (SURVEY §2 row) over an
      // sf dir and write the result — the one-command path to every
      // engine capability, not just the catalog pipelines.
      case Seq("run", name, sfDir, outPath) =>
        // Validate BOTH inputs before running: some registry queries
        // (streaming rows, checkpointed pipelines) execute eagerly.
        val fmt = ExportFormat.fromPath(outPath) match {
          case f @ (ExportFormat.Parquet | ExportFormat.Csv | ExportFormat.Json) => f
          case other => throw new IllegalArgumentException(
            s"run writes tabular results — use .parquet, .csv or .jsonl (got $other)")
        }
        val fn = SparkEntry.queries.getOrElse(name,
          throw new IllegalArgumentException(
            s"no registered query '$name' (see list-registry)"))
        Exporter.write(fn(spark, sfDir), outPath, fmt)
        println(s"[cli] wrote $name -> $outPath")

      case Seq("list-registry") =>
        SparkEntry.queries.keys.toSeq.sorted.foreach(println)

      case Seq("list-queries", catalogPath) =>
        QueryConfig.catalogFromJson(spark, catalogPath).values.toSeq
          .sortBy(_.name)
          .foreach(q => println(s"${q.name}\ttheme=${q.theme}\ttype=${q.typeName}" +
            q.filter.fold("")(f => s"\tfilter=$f")))

      case Seq("list-cache", cachePath) =>
        new CountryCache(spark, cachePath).list()
          .sortBy(k => (k.release, k.country, k.theme, k.typeName))
          .foreach(k => println(s"${k.release}\t${k.country}\t${k.theme}\t${k.typeName}"))

      case Seq("clear-cache", cachePath, release, country, theme, typeName) =>
        val ok = new CountryCache(spark, cachePath)
          .clear(CacheKey(country, theme, typeName, release))
        println(if (ok) "cleared" else "not found")

      case Seq("cleanup", servicePath, keepList) =>
        val report = FeatureService.cleanup(spark, servicePath,
          keep = keepList.split(",").map(_.trim).filter(_.nonEmpty).toSet,
          dryRun = opt.contains("dry-run"))
        println(s"recovered=${report.recovered.mkString(",")} " +
          s"removed=${report.orphansRemoved.mkString(",")} kept=${report.kept.mkString(",")}")

      case Seq("version") =>
        println(s"graft $Version (spark ${spark.version})")

      case other =>
        throw new IllegalArgumentException(
          s"unknown command: ${other.mkString(" ")} — see Cli scaladoc for usage")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    try run(spark, args.toIndexedSeq)
    finally spark.stop()
  }
}
