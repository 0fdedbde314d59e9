package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Bounding box in the reference's (minx, miny, maxx, maxy) layout
  * (reference: src/o2agol/domain/models.py:20 `Country.bounds`).
  */
final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

/** A declarative read request — the Spark-first analogue of the
  * reference's spatial query builder (reference:
  * src/o2agol/pipeline/source.py:418-507 `_build_spatial_query`).
  *
  * `columns` use the reference's OVERTURE_COLUMNS spelling
  * (source.py:30-71): plain names, `path as alias`, and dotted
  * nested paths (JSON-property access on string columns).
  */
final case class ReadRequest(
    table: String,
    columns: Seq[String] = Seq("*"),
    filter: Option[String] = None,
    bbox: Option[BBoxFilter] = None,
    limit: Option[LimitSpec] = None
)

/** bbox pre-filter bound to concrete x/y columns (the testdata has
  * no geometry struct; reference applies the same 4 range
  * predicates on `bbox.xmin…` — source.py:496-507).
  */
final case class BBoxFilter(xCol: String, yCol: String, box: BBox)

/** Deterministic limit: always sorted before limiting so results are
  * stable across partitionings (the reference's SQL LIMIT rides on
  * DuckDB's preserve_insertion_order=false — i.e., unordered there
  * too; we choose determinism).
  */
final case class LimitSpec(n: Int, orderBy: Seq[String])

object OvertureReader {

  /** Parse one OVERTURE_COLUMNS-style entry into a Column. */
  private def columnOf(df: DataFrame, spec: String): Column = {
    val asSplit = spec.split("(?i)\\s+as\\s+")
    val (path, alias) =
      if (asSplit.length == 2) (asSplit(0).trim, Some(asSplit(1).trim))
      else (spec.trim, None)
    val c =
      if (path == "*") col("*")
      else FilterDsl.resolve(df, path)
    alias.fold(c)(c.as(_))
  }

  /** Read a table from any Spark-supported columnar/text format —
    * the engine is format-agnostic the way the reference's source
    * falls back across cache/dump/S3 (parquet is the fast path;
    * csv/json cover interchange).
    */
  def readFormat(spark: org.apache.spark.sql.SparkSession, path: String, format: String): DataFrame =
    format match {
      case "parquet" => spark.read.parquet(path)
      case "csv"     => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json"    => spark.read.json(path)
      case other     => throw new IllegalArgumentException(s"unsupported source format: $other")
    }

  /** Single-layer read: project → filter → bbox → limit, all
    * declarative so Catalyst pushes predicates and prunes columns at
    * the parquet scan.
    */
  def read(t: Tables, req: ReadRequest): DataFrame = {
    val base = t.table(req.table)
    // Predicates are applied on the raw frame (pre-projection) so
    // they reference source columns and push down cleanly.
    val afterFilter = req.filter.map(FilterDsl(base, _)).getOrElse(base)
    val afterBBox = req.bbox.fold(afterFilter) { bf =>
      afterFilter.filter(
        col(bf.xCol) >= bf.box.xmin && col(bf.xCol) <= bf.box.xmax &&
          col(bf.yCol) >= bf.box.ymin && col(bf.yCol) <= bf.box.ymax)
    }
    val projected = afterBBox.select(req.columns.map(columnOf(afterBBox, _)): _*)
    req.limit.fold(projected) { l =>
      projected.orderBy(l.orderBy.map(col): _*).limit(l.n)
    }
  }

  /** Multilayer read: N layers, each tagged with its `source_type`,
    * unioned by name (reference: source.py:509-586 `_fetch_dual_query`
    * tags places/buildings then publishes as one multi-layer service).
    * Missing columns are null-filled so heterogeneous layers align.
    */
  def readMultilayer(t: Tables, layers: Seq[(String, ReadRequest)]): DataFrame =
    layers
      .map { case (tag, req) =>
        read(t, req).withColumn("source_type", lit(tag))
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Geometry-family classification (reference: source.py:966-1003
    * `_split_geometry_layers` buckets Point/LineString/Polygon and
    * tags the remainder 'other'). `familyOf` maps a type-designator
    * column to the family label.
    */
  def geometrySplit(df: DataFrame, typeCol: String, families: Map[String, Seq[String]]): DataFrame = {
    val fam = families.foldLeft(lit("other")) { case (acc, (family, types)) =>
      when(col(typeCol).isin(types: _*), lit(family)).otherwise(acc)
    }
    df.withColumn("geometry_family", fam)
  }

  /** Hive-partitioned dataset read — the reference's lake layout is
    * exactly this (`theme=…/type=…` directory keys under a release
    * prefix, source.py:418-507 builds reads against it). Partition
    * columns come from directory names, so a filter on them prunes
    * whole directories at PLANNING time (`PartitionFilters` in the
    * scan, zero data-file IO for pruned values) — at 100 TB the
    * difference between scanning one theme and scanning the lake.
    */
  def readHivePartitioned(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      filter: Option[String] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    // An explicit schema serves two purposes at scale: footer
    // inference is skipped entirely, and a layout with zero
    // partition directories (no data published yet) reads as an
    // EMPTY frame instead of UNABLE_TO_INFER_SCHEMA.
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    val base = reader.parquet(root)
    filter.map(FilterDsl(base, _)).getOrElse(base)
  }

  /** Schema-evolution read: union-by-name over parquet files whose
    * schemas drifted across releases (columns added over time — the
    * reference's monthly release layout guarantees this; source.py
    * reads across releases). `mergeSchema` unions footer schemas at
    * PLANNING time; rows from files lacking a column read as null.
    * At scale the cost is one footer read per file (no data pass) —
    * set once here rather than relying on the session default.
    */
  def readMergedSchema(
      spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Divisions-clip analogue: keep only rows whose key falls inside
    * a named region, resolved through the dims (reference:
    * source.py:464-494 clips features by the country polygon from
    * the divisions theme; here containment is a broadcast semi-join
    * against the region→nation keyset — the planner's equivalent of
    * "point in polygon" at dimension-table cost).
    */
  def clipToRegion(t: Tables, facts: DataFrame, factNationKey: String, regionName: String): DataFrame = {
    val nationsInRegion = t.nation
      .join(broadcast(t.region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    facts.join(broadcast(nationsInRegion), col(factNationKey) === col("n_nationkey"), "left_semi")
  }
}
