package graft.queries

import graft.Tables
import graft.functions.{TopKAgg, WordBigrams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension batch 32: HITS hubs/authorities and KMV-sketch
  * source overlap.
  */
object Pipeline37 {

  /** D94: HITS hubs & authorities (two mutual-reinforcement
    * iterations, Kleinberg) over the customer→part purchase
    * bipartite graph — the link-analysis complement to D44
    * PageRank: PageRank ranks within one node set, HITS splits
    * "big buyers" (hubs) from "widely bought parts" (authorities).
    * Exact ×10⁶ fixed point with max-normalization after every
    * half-step (floor division, D79 convention) keeps the chain
    * integer-exact and engine-reproducible; top-10 per side by
    * (score desc, id) closes the output deterministically.
    *
    * Scale shape: the graph collapses once to the DISTINCT edge
    * list (the only corpus-sized exchange, map-side combined),
    * served session-shared through [[GraphBase.purchaseEdges]] so
    * no rerun re-pays it; each half-step is an edge⋈score keyed
    * join + map-side-combined sum materialized ONCE as the RAW
    * per-node sums — the max-normalization is a driver scalar
    * (node-count-bounded agg, exact long) applied as a lazy map, so
    * there is no per-half-step crossJoin/broadcast build and no
    * second materialization barrier; no N² anywhere; the top-10s
    * are TakeOrdered (heap per partition), never a global window.
    */
  def qHits(spark: SparkSession, dir: String): DataFrame = {
    val edges = GraphBase.purchaseEdges(spark, dir)
    // Half-step: authorities from hub scores (or hubs from authority
    // scores): join edges to the opposite side's normalized scores,
    // sum per node, renormalize. The checkpoint sits on the RAW sums;
    // the ×10⁶ floor-division renormalization is a driver-scalar map
    // its consumers (next half-step, final top-10) re-derive for the
    // cost of one projection over the checkpointed aggregate.
    def halfStep(prev: DataFrame, joinOn: String, outId: String): DataFrame = {
      val raw = edges.join(prev, Seq(joinOn))
        .groupBy(col(outId)).agg(sum(col("sn")).as("s"))
        .localCheckpoint(true)
      val mx = raw.agg(max(col("s"))).first().getLong(0)
      raw.select(col(outId), expr(s"(s * 1000000) div ${mx}L").as("sn"))
    }
    // First half-step shortcut (r14): h0 assigns sn = 10⁶ to EVERY
    // distinct u in the edge list, so edges⋈h0 keeps every edge and
    // sum(sn) per p is exactly 10⁶·degree(p) — the distinct() and the
    // join are loop-invariant dead weight (the SQL oracle has always
    // stated a1r this way: count(*)·10⁶ per p). Identical integers,
    // two fewer exchanges per run.
    val raw1 = edges.groupBy(col("p"))
      .agg((count(lit(1)) * 1000000L).as("s"))
      .localCheckpoint(true)
    val mx1 = raw1.agg(max(col("s"))).first().getLong(0)
    val a1 = raw1.select(col("p"), expr(s"(s * 1000000) div ${mx1}L").as("sn"))
    val h1 = halfStep(a1, "p", "u")
    val a2 = halfStep(h1, "u", "p")
    val h2 = halfStep(a2, "p", "u")
    val topAuth = a2.orderBy(col("sn").desc, col("p").asc).limit(10)
      .select(lit("authority").as("side"), col("p").as("node_id"),
        col("sn").as("score_ppm"))
    val topHub = h2.orderBy(col("sn").desc, col("u").asc).limit(10)
      .select(lit("hub").as("side"), col("u").as("node_id"),
        col("sn").as("score_ppm"))
    topAuth.unionAll(topHub)
  }

  val qHitsSql: String =
    """WITH e AS (
      |  SELECT DISTINCT o_custkey AS u, l_partkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |a1r AS (SELECT p, CAST(count(*) AS BIGINT) * 1000000 AS s FROM e GROUP BY 1),
      |a1 AS (SELECT p, CAST((s * 1000000) // (SELECT max(s) FROM a1r) AS BIGINT)
      |         AS sn FROM a1r),
      |h1r AS (SELECT e.u, CAST(sum(a1.sn) AS BIGINT) AS s
      |        FROM e JOIN a1 ON a1.p = e.p GROUP BY 1),
      |h1 AS (SELECT u, CAST((s * 1000000) // (SELECT max(s) FROM h1r) AS BIGINT)
      |         AS sn FROM h1r),
      |a2r AS (SELECT e.p, CAST(sum(h1.sn) AS BIGINT) AS s
      |        FROM e JOIN h1 ON h1.u = e.u GROUP BY 1),
      |a2 AS (SELECT p, CAST((s * 1000000) // (SELECT max(s) FROM a2r) AS BIGINT)
      |         AS sn FROM a2r),
      |h2r AS (SELECT e.u, CAST(sum(a2.sn) AS BIGINT) AS s
      |        FROM e JOIN a2 ON a2.p = e.p GROUP BY 1),
      |h2 AS (SELECT u, CAST((s * 1000000) // (SELECT max(s) FROM h2r) AS BIGINT)
      |         AS sn FROM h2r)
      |SELECT * FROM (
      |  SELECT 'authority' AS side, p AS node_id, sn AS score_ppm
      |  FROM a2 ORDER BY sn DESC, p LIMIT 10)
      |UNION ALL
      |SELECT * FROM (
      |  SELECT 'hub' AS side, u AS node_id, sn AS score_ppm
      |  FROM h2 ORDER BY sn DESC, u LIMIT 10)""".stripMargin

  /** D95: the D14 as-of join executed by the NATIVE whole-operator
    * plan node ([[graft.plans.AsOfJoinNode]] → `AsOfJoinStrategy` →
    * `AsOfJoinExec`): identical semantics and oracle to
    * `q_asof_join`, different physical algorithm — a single
    * streaming merge scan per co-partition (O(1) probe state, no
    * union row inflation, no window state), the rung-(c) custom-
    * operator path demonstrated end-to-end. Times travel as exact
    * epoch micros so both sides share one orderable type.
    */
  def qAsofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ordersByDay = t.orders
      .groupBy(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("odate_us"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    graft.plans.AsOfJoinNative
      .lastBefore(
        t.events.select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("ts_us")),
        ordersByDay,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts_us", rightTime = "odate_us",
        payloadCols = Seq("last_orderkey"))
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
  }

  val qAsofJoinNativeSql: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, r.last_orderkey
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin

  /** E27: KMV (k-minimum-values) sketched source-overlap matrix —
    * the sketch path for E19's exact bigram contamination matrix:
    * per source, keep the k = 256 smallest values of a cross-engine
    * polynomial content hash (char-fold mod P, LCG-scrambled) over
    * the E19 word bigrams; a pair's Jaccard estimate is the shared
    * fraction of the UNION's k smallest values. The declared 100 TB
    * path when 20 sources become 20 000: sketch size is k per
    * source regardless of corpus, and sketches merge.
    *
    * Scale shape: one distinct pass over (source, key) — map-side
    * combined — then the per-source k-smallest runs as [[TopKAgg]]
    * (size-k heap partials merged map-side, never a per-source
    * sort); everything after operates on sources×k rows. The
    * estimator is exact-deterministic (hash, not sampled), so the
    * oracle reproduces it bit-for-bit; the spec bounds its error
    * against the E19 exact matrix.
    */
  def ddKmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val k = 256
    val keyExpr =
      """(aggregate(transform(split(bigram, ''), c -> CAST(ascii(c) AS BIGINT)),
        |  CAST(7 AS BIGINT), (acc, c) -> (acc * 31 + c) % 1000000007)
        |  * 2654435761 + 1013904223) % 1000000007""".stripMargin
    val keys = t.documents
      .select(col("source"), explode(WordBigrams(col("text"))).as("bigram"))
      .select(col("source"), expr(keyExpr).as("key"))
      .distinct()
    val kmv = keys.groupBy(col("source"))
      .agg(TopKAgg(-col("key").cast("double"), col("key"), k).as("top"))
      .select(col("source"), explode(col("top.payload")).as("key"))
      .localCheckpoint(true)
    val srcs = kmv.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .join(srcs.select(col("source").as("src_b")), col("src_a") < col("src_b"))
    val withA = pairs.join(kmv.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("key"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val withB = pairs.join(kmv.withColumnRenamed("source", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("key"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val merged = withA.unionAll(withB)
      .groupBy(col("src_a"), col("src_b"), col("key"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("key"))
    merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(expr("in_a * in_b")).as("inter"))
      .select(col("src_a"), col("src_b"), col("k_used"),
        expr("(inter * 1000000) div k_used").as("kmv_jaccard_ppm"))
  }

  val ddKmvOverlapSql: String =
    """WITH toks AS (
      |  SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT DISTINCT source, bigram FROM (
      |    SELECT source, unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
      |      i -> concat_ws(' ', t[i], t[i+1]))) AS bigram
      |    FROM toks) x),
      |keys AS (
      |  SELECT DISTINCT source,
      |    (list_reduce(
      |       list_prepend(CAST(7 AS BIGINT),
      |         list_transform(split(bigram, ''), c -> CAST(ord(c) AS BIGINT))),
      |       (acc, c) -> (acc * 31 + c) % 1000000007)
      |     * 2654435761 + 1013904223) % 1000000007 AS key
      |  FROM bg),
      |kmv AS (
      |  SELECT source, key FROM (
      |    SELECT source, key,
      |      row_number() OVER (PARTITION BY source ORDER BY key) AS rn
      |    FROM keys) x
      |  WHERE rn <= 256),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b
      |  FROM (SELECT DISTINCT source FROM kmv) a
      |  JOIN (SELECT DISTINCT source FROM kmv) b ON a.source < b.source),
      |merged AS (
      |  SELECT p.src_a, p.src_b, k.key,
      |    max(CASE WHEN k.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
      |    max(CASE WHEN k.source = p.src_b THEN 1 ELSE 0 END) AS in_b
      |  FROM pairs p JOIN kmv k ON k.source IN (p.src_a, p.src_b)
      |  GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT src_a, src_b, in_a, in_b,
      |    row_number() OVER (PARTITION BY src_a, src_b ORDER BY key) AS rn
      |  FROM merged)
      |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS k_used,
      |  CAST((sum(in_a * in_b) * 1000000) // count(*) AS BIGINT) AS kmv_jaccard_ppm
      |FROM ranked WHERE rn <= 256
      |GROUP BY 1, 2""".stripMargin
}
