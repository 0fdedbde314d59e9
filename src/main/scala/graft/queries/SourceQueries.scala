package graft.queries

import graft.Tables
import graft.sources._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-layer operator exercises (SURVEY §2 A) — every query goes
  * through the OvertureReader/FilterDsl public API, not ad-hoc
  * DataFrame code, so the oracle checks the library surface itself.
  */
object SourceQueries {

  /** A1: explicit column selection + aliasing (reference
    * OVERTURE_COLUMNS, source.py:30-71).
    */
  def srcSelectAlias(spark: SparkSession, dir: String): DataFrame =
    OvertureReader.read(
      Tables(spark, dir),
      ReadRequest("events",
        columns = Seq("event_id", "event_type as etype", "user_id", "value")))

  val srcSelectAliasSql: String =
    "SELECT event_id, event_type AS etype, user_id, value FROM events"

  /** A2: nested-field access `names.primary as name` → JSON property
    * extraction on the `props` string column.
    */
  def srcJsonNested(spark: SparkSession, dir: String): DataFrame =
    OvertureReader
      .read(
        Tables(spark, dir),
        ReadRequest("events", columns = Seq("event_id", "props.k as k_raw")))
      .withColumn("k", col("k_raw").cast("int"))
      .drop("k_raw")

  val srcJsonNestedSql: String =
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events"

  /** A3: bbox pre-filter — 2-D range predicate pushed to the scan
    * (reference source.py:496-507).
    */
  def srcBboxFilter(spark: SparkSession, dir: String): DataFrame =
    OvertureReader.read(
      Tables(spark, dir),
      ReadRequest("events",
        columns = Seq("event_id", "value", "user_id"),
        bbox = Some(BBoxFilter("value", "user_id", BBox(50.0, 100.0, 150.0, 900.0)))))

  val srcBboxFilterSql: String =
    """SELECT event_id, value, user_id FROM events
      |WHERE value >= 50.0 AND value <= 150.0
      |  AND user_id >= 100 AND user_id <= 900""".stripMargin

  /** A4: apply_sql_filter equality (source.py:94-115). */
  def srcFilterEq(spark: SparkSession, dir: String): DataFrame =
    OvertureReader.read(
      Tables(spark, dir),
      ReadRequest("documents",
        columns = Seq("doc_id", "lang", "source", "n_chars"),
        filter = Some("lang = 'en'")))

  val srcFilterEqSql: String =
    "SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en'"

  /** A5: apply_sql_filter IN-list (source.py:117-145). */
  def srcFilterIn(spark: SparkSession, dir: String): DataFrame =
    OvertureReader.read(
      Tables(spark, dir),
      ReadRequest("events",
        columns = Seq("event_id", "event_type", "user_id"),
        filter = Some("event_type IN ('click', 'view')")))

  val srcFilterInSql: String =
    "SELECT event_id, event_type, user_id FROM events WHERE event_type IN ('click', 'view')"

  /** A6: deterministic feature limit (reference appends LIMIT n,
    * source.py:459-460; we sort first for stable results).
    */
  def srcLimit(spark: SparkSession, dir: String): DataFrame =
    OvertureReader.read(
      Tables(spark, dir),
      ReadRequest("orders",
        columns = Seq("o_orderkey", "o_custkey", "o_orderstatus"),
        limit = Some(LimitSpec(100, Seq("o_orderkey")))))

  val srcLimitSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |ORDER BY o_orderkey LIMIT 100""".stripMargin

  /** A7: multilayer dual read with source_type tags, unioned by name
    * (reference dual places+buildings query, source.py:509-586).
    */
  def srcMultilayer(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    OvertureReader.readMultilayer(
      t,
      Seq(
        "place" -> ReadRequest("customer",
          columns = Seq("c_custkey as id", "c_name as name"),
          filter = Some("c_mktsegment = 'BUILDING'")),
        "building" -> ReadRequest("supplier",
          columns = Seq("s_suppkey as id", "s_name as name"))
      ))
  }

  val srcMultilayerSql: String =
    """SELECT c_custkey AS id, c_name AS name, 'place' AS source_type
      |FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT s_suppkey AS id, s_name AS name, 'building' AS source_type
      |FROM supplier""".stripMargin

  /** A8: geometry-family split classification (source.py:966-1003);
    * event_type stands in for the geometry-type designator.
    */
  def srcGeometrySplit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    OvertureReader
      .geometrySplit(
        t.events.select("event_id", "event_type"),
        "event_type",
        Map(
          "points"   -> Seq("click", "view"),
          "lines"    -> Seq("purchase"),
          "polygons" -> Seq("signup")))
      .groupBy(col("geometry_family"))
      .agg(count(lit(1)).as("n_features"))
  }

  val srcGeometrySplitSql: String =
    """SELECT CASE
      |    WHEN event_type IN ('click', 'view') THEN 'points'
      |    WHEN event_type = 'purchase' THEN 'lines'
      |    WHEN event_type = 'signup' THEN 'polygons'
      |    ELSE 'other' END AS geometry_family,
      |  count(*) AS n_features
      |FROM events
      |GROUP BY 1""".stripMargin

  /** A10: regex extraction (reference uses regexp_extract for
    * theme/type discovery from S3 paths, source.py:1330): numeric
    * suffix of the document source id.
    */
  def srcRegexExtract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("source_num"))
  }

  val srcRegexExtractSql: String =
    """SELECT doc_id,
      |  CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS source_num
      |FROM documents""".stripMargin

  /** A11: INTERSECT — customer keys present in both the BUILDING
    * segment and the urgent-order population (set semantics).
    */
  def srcIntersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .intersect(
        t.orders.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")))
  }

  val srcIntersectSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  /** A12: EXCEPT — part brands never ordered in large quantity. */
  def srcExcept(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part.select(col("p_brand"))
      .except(
        t.part.join(t.lineitem, col("p_partkey") === col("l_partkey"))
          .filter(col("l_quantity") >= 45)
          .select(col("p_brand")))
  }

  val srcExceptSql: String =
    """SELECT DISTINCT p_brand FROM part
      |EXCEPT
      |SELECT DISTINCT p_brand FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE l_quantity >= 45""".stripMargin

  /** A9: divisions-clip analogue — broadcast semi-join containment
    * (source.py:464-494 country-polygon clip, at dim-join cost).
    */
  def srcDivisionsClip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    OvertureReader
      .clipToRegion(t, t.customer, "c_nationkey", "ASIA")
      .select(col("c_custkey"), col("c_nationkey"), round(col("c_acctbal"), 4).as("acctbal"))
  }

  val srcDivisionsClipSql: String =
    """SELECT c_custkey, c_nationkey, round(c_acctbal, 4) + 0 AS acctbal
      |FROM customer
      |WHERE c_nationkey IN (
      |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')""".stripMargin

  // Hive stage dirs, one partitioned copy of events per sf dir per
  // JVM (the write is setup, not the operator under test; caching it
  // keeps bench min-of-two timings honest about the READ).
  private val hiveStage = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A13: hive-partitioned lake read — the reference's actual S3
    * layout (`theme=…/type=…` directory keys, source.py:418-507).
    * Events are staged once as `event_type=<v>/…parquet`; the read
    * filters on the partition column, which prunes whole directories
    * at planning time (PartitionFilters — asserted in
    * HivePartitionSpec) instead of scanning and discarding rows.
    */
  def srcHivePartitioned(spark: SparkSession, dir: String): DataFrame = {
    val root = hiveStage.computeIfAbsent(dir, d => {
      val stage = java.nio.file.Files.createTempDirectory("graft_hive_events_")
      Tables(spark, d).events
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.partitionBy("event_type").mode("overwrite").parquet(stage.toString)
      stage.toString
    })
    // Explicit schema: no footer inference, and a zero-partition
    // layout (nothing published yet) reads as empty rather than
    // failing schema discovery.
    val layout = org.apache.spark.sql.types.StructType(
      Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .schema.fields.filterNot(_.name == "event_type") :+
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType))
    OvertureReader
      .readHivePartitioned(spark, root,
        Some("event_type IN ('click', 'error')"), Some(layout))
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
  }

  // Parquet round-trips doubles bit-for-bit, so no 4-dp edge rounding
  // is needed on the raw column.
  val srcHivePartitionedSql: String =
    """SELECT event_id, user_id, value, event_type
      |FROM events WHERE event_type IN ('click', 'error')""".stripMargin

  private val evoStage = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A14: schema-evolution read — two release generations of the
    * events table, the older one written BEFORE `event_type` existed
    * (even event_ids), the newer one with it (odd event_ids), read
    * back as one dataset via merge-by-name. Old-generation rows
    * surface `event_type` as null; the merge is footer-only work at
    * planning time.
    */
  def srcSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = evoStage.computeIfAbsent(dir, d => {
      val stage = java.nio.file.Files.createTempDirectory("graft_evo_events_")
      val events = Tables(spark, d).events
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      events.filter(col("event_id") % 2 === 0)
        .drop("event_type")
        .write.mode("overwrite").parquet(s"$stage/release_a")
      events.filter(col("event_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$stage/release_b")
      stage.toString
    })
    OvertureReader
      .readMergedSchema(spark, Seq(s"$root/release_a", s"$root/release_b"))
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
  }

  val srcSchemaEvolutionSql: String =
    """SELECT event_id, user_id, value,
      |  CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type
      |FROM events""".stripMargin

  // ----------------------------------------------------------------
  // A10: TRUE polygon clip — ray-casting containment, not a bbox or
  // keyed analogue (source.py:464-494 clips by actual country
  // polygon geometry; this is that math over coordinate rings).
  // ----------------------------------------------------------------

  // Literal clip polygons. Coordinates sit on the quarter grid so the
  // Scala double literal and its decimal rendering in the oracle SQL
  // are the SAME binary64 value — the cross-product edge tests then
  // agree bit-for-bit across engines.
  private val Wedge: Seq[(Double, Double)] =
    Seq((10.0, 20.0), (120.0, 20.0), (120.0, 80.0), (65.5, 45.25), (10.0, 80.0))
  private val FrameOuter: Seq[(Double, Double)] =
    Seq((30.0, 30.0), (90.0, 30.0), (90.0, 70.0), (30.0, 70.0))
  private val FrameHole: Seq[(Double, Double)] =
    Seq((50.0, 42.5), (72.5, 42.5), (72.5, 60.0), (50.0, 60.0))

  /** A10: clip event points by real polygons — a concave ring and a
    * ring with an interior hole. The polygon's bounding box is ANDed
    * in front as the cheap prefilter that reaches the parquet scan
    * (PushedFilters); the ray cast is the exact test behind it —
    * the same prefilter-then-exact shape `gridJoin` uses at the
    * many-polygons scale.
    */
  def srcPolygonClip(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Geo
    val pts = Tables(spark, dir).events.select(
      col("event_id"),
      col("value").as("x"),
      get_json_object(col("props"), "$.k").cast("double").as("y"))
    def bbox(rings: Seq[(Double, Double)]) = Geo.inBBox(col("x"), col("y"),
      rings.map(_._1).min, rings.map(_._2).min, rings.map(_._1).max, rings.map(_._2).max)
    val inWedge = bbox(Wedge) &&
      Geo.pointInPolygon(col("x"), col("y"), Geo.ringLit(Wedge))
    val inFrame = bbox(FrameOuter) &&
      Geo.pointInPolygon(col("x"), col("y"), Geo.ringLit(FrameOuter), Seq(Geo.ringLit(FrameHole)))
    // ONE scan (one JSON parse per row). The y coordinate is
    // JSON-derived (never pushable), so the pushable part is the
    // x-envelope over all rings — a pure source-column range that
    // reaches the parquet scan (PushedFilters → row-group pruning at
    // scale); the exact per-polygon bboxes prune the rest before any
    // ray casting. Then each surviving point emits the names of the
    // polygons containing it and explodes — equivalent to a union of
    // per-polygon filters without the second pass.
    val allX = (Wedge ++ FrameOuter).map(_._1)
    pts
      .filter(col("x") >= allX.min && col("x") <= allX.max &&
        (bbox(Wedge) || bbox(FrameOuter)))
      .select(col("event_id"), col("x"), col("y"),
        explode(filter(
          array(when(inWedge, "wedge"), when(inFrame, "frame")),
          p => p.isNotNull)).as("poly"))
  }

  /** Ray-casting containment as oracle SQL: the same division-free
    * PNPOLY edge test over the same literal ring (`rv` must name a
    * list<struct(x,y)> column in scope).
    */
  private def inRingSql(n: Int, rv: String, xE: String, yE: String): String =
    s"""(list_sum(list_transform(range(1, ${n + 1}), i ->
       |  CASE WHEN (($rv[i].y > $yE) != ($rv[1 + i % $n].y > $yE))
       |        AND (CASE WHEN $rv[1 + i % $n].y > $rv[i].y
       |             THEN ($xE - $rv[i].x) * ($rv[1 + i % $n].y - $rv[i].y)
       |                < ($rv[1 + i % $n].x - $rv[i].x) * ($yE - $rv[i].y)
       |             ELSE ($xE - $rv[i].x) * ($rv[1 + i % $n].y - $rv[i].y)
       |                > ($rv[1 + i % $n].x - $rv[i].x) * ($yE - $rv[i].y) END)
       |  THEN 1 ELSE 0 END)) % 2 = 1)""".stripMargin

  private def ringSqlLit(pts: Seq[(Double, Double)]): String =
    pts.map { case (x, y) => s"{'x': $x, 'y': $y}" }.mkString("[", ", ", "]")

  val srcPolygonClipSql: String = {
    val pointsSql =
      """SELECT event_id, value AS x,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS y FROM events""".stripMargin
    s"""WITH pts AS ($pointsSql),
       |wr AS (SELECT ${ringSqlLit(Wedge)} AS r),
       |fo AS (SELECT ${ringSqlLit(FrameOuter)} AS r),
       |fh AS (SELECT ${ringSqlLit(FrameHole)} AS r)
       |SELECT event_id, x, y, 'wedge' AS poly
       |FROM pts, wr WHERE ${inRingSql(Wedge.size, "wr.r", "x", "y")}
       |UNION ALL
       |SELECT event_id, x, y, 'frame' AS poly
       |FROM pts, fo, fh
       |WHERE ${inRingSql(FrameOuter.size, "fo.r", "x", "y")}
       |  AND NOT ${inRingSql(FrameHole.size, "fh.r", "x", "y")}""".stripMargin
  }

  /** Text-format round trips are staged once per (session, dir):
    * the fixture is an immutable projection of the events table, so
    * bench/verify re-runs measure the READ path, not fixture writes.
    */
  private val textStageCache = new graft.util.Memo[(SparkSession, String, String), String]

  private def textStage(spark: SparkSession, dir: String, fmt: String): String =
    textStageCache.getOrElseUpdate((spark, dir, fmt), {
      val out = java.nio.file.Files.createTempDirectory(s"graft_src_$fmt").toString
      val slim = Tables(spark, dir).events
        .select(col("event_id"), col("event_type"), col("value"))
      fmt match {
        case "csv"  => slim.write.mode("overwrite").option("header", "true").csv(out)
        case "json" => slim.write.mode("overwrite").json(out)
        case "orc"  => slim.write.mode("overwrite").orc(out)
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(out))))
      out
    })

  private val textSchema = "event_id BIGINT, event_type STRING, value DOUBLE"

  /** A16: CSV source path — read a headered CSV lake with an
    * EXPLICIT schema (never inferSchema: inference is a full extra
    * pass over the data at scale) and aggregate. Doubles survive the
    * text round trip exactly (shortest-representation printing), so
    * the oracle runs on the ORIGINAL parquet.
    */
  private def textAgg(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))

  def srcCsvRead(spark: SparkSession, dir: String): DataFrame =
    textAgg(spark.read.schema(textSchema).option("header", "true")
      .csv(textStage(spark, dir, "csv")))

  val srcCsvReadSql: String =
    """SELECT event_type, count(*) AS n,
      |  round(sum(value), 4) + 0 AS total_value
      |FROM events GROUP BY event_type""".stripMargin

  /** A17: JSON-lines source path — same contract as A16 over the
    * newline-delimited JSON the dump/export tooling emits. */
  def srcJsonlRead(spark: SparkSession, dir: String): DataFrame =
    textAgg(spark.read.schema(textSchema)
      .json(textStage(spark, dir, "json")))

  val srcJsonlReadSql: String = srcCsvReadSql

  /** A21: ORC source path — the remaining Spark-native columnar
    * format (a lake this engine must read alongside parquet/CSV/
    * JSONL). Binary round trip, so the oracle runs on the ORIGINAL
    * parquet; schema passed explicitly like A16/A17.
    */
  def srcOrcRead(spark: SparkSession, dir: String): DataFrame =
    textAgg(spark.read.schema(textSchema)
      .orc(textStage(spark, dir, "orc")))

  val srcOrcReadSql: String = srcCsvReadSql
}
