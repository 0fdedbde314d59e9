package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines. Everything keys off arithmetic over a stable id — no
  * RNG state, so assignments are reproducible across runs, engines,
  * and cluster sizes, and a re-run of an incremental pipeline puts
  * every row in the same split it was in yesterday.
  */
object Sampling {

  /** Pseudo-random but deterministic bucket in [0, buckets) from a
    * stable id: splitmix64-style mix, closed-form (reproducible in
    * any engine with 64-bit integer arithmetic).
    */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(
      // Multiplicative mix keeps neighboring ids uncorrelated; plain
      // `id % buckets` would stripe sequential ids. The id is reduced
      // mod P FIRST so the product stays below 2^63 (raw id·constant
      // overflows Long for ids ≳3.5e9 — an ANSI-mode crash and an
      // engine-divergence hazard otherwise).
      (pmod(id, lit(1000000007L)) * lit(2654435761L) + lit(1013904223L)) % lit(1000000007L),
      lit(buckets))

  /** Deterministic k-fold assignment: fold = mixed-id bucket in
    * [0, k). Same closed-form mix as [[idBucket]], so any engine
    * reproduces the folds; map-only (no shuffle) and stable across
    * runs/partitionings — the cross-validation analogue of
    * [[splitAssign]].
    */
  def kfold(id: Column, k: Int): Column = idBucket(id, k)

  /** Train/val/test assignment by id bucket percentage:
    * [0, trainPct) → train, [trainPct, trainPct+valPct) → val,
    * rest → test.
    */
  def splitAssign(id: Column, trainPct: Int, valPct: Int): Column = {
    val b = idBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Concat-and-chunk sequence packing: within each shard (partition
    * key), documents are laid end-to-end in stable id order and cut
    * into fixed token budgets — the standard pretraining packing
    * scheme. A doc's pack is where its FIRST token lands
    * (floor(preceding_tokens / budget)); `straddles` marks docs
    * crossing a pack boundary (they contribute to two packs'
    * attention masks). Closed-form over a running sum — one shuffle
    * on the shard key, no iteration; shards bound window width so
    * no global sort exists at scale.
    */
  def packSequences(
      df: DataFrame,
      shardCol: String,
      idCol: String,
      tokensCol: String,
      budget: Int
  ): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id", ((col("_cum") - col(tokensCol)) / budget).cast("long"))
      .withColumn("straddles",
        ((col("_cum") - 1) / budget).cast("long") > col("pack_id"))
      .drop("_cum")
  }

  /** Deterministic temperature sampling across sources: keep rate per
    * source ∝ mass^(α−1), so the KEPT mass comes out ∝ mass^α — the
    * multilingual-rebalancing scheme (α<1 flattens source skew).
    * Keep-only sampling can't exceed rate 1, so rates are normalized
    * at the LIGHTEST source (whose mass^(α−1) is largest): it keeps
    * everything, the heaviest source is cut hardest. Row keep/drop is
    * the same id-bucket arithmetic as [[splitAssign]]: reproducible
    * across runs, engines, partitionings. Rates are rounded to 4 dp
    * BEFORE thresholding so an external engine computing pow() with
    * a different libm makes identical keep decisions.
    *
    * `masses`: (source → token mass) — aggregate-sized, collected and
    * broadcast as a literal map; the data pass is map-only.
    */
  def temperatureKeep(
      id: Column,
      source: Column,
      masses: Map[String, Long],
      alpha: Double
  ): Column = {
    // No sources at all (empty corpus): nothing can be kept. A
    // column-level API cannot return "empty frame", so the keep
    // predicate is constant-false and the caller's aggregation
    // produces zero rows naturally.
    if (masses.isEmpty) return lit(false)
    require(masses.values.forall(_ > 0),
      s"temperatureKeep: every source mass must be > 0 (zero mass makes pow(m, alpha-1) " +
        s"degenerate): ${masses.filter(_._2 <= 0).keys.mkString(", ")}")
    val maxW = masses.values.map(m => math.pow(m.toDouble, alpha - 1)).max
    // Integer thresholds out of the 4-dp rates (0.8187 → 818700):
    // double·1e6 is not exact, so the comparison is long vs long.
    val thresh = masses.map { case (s, m) =>
      s -> BigDecimal(math.pow(m.toDouble, alpha - 1) / maxW)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    }
    val threshCol = thresh.foldLeft(lit(0L)) { case (acc, (s, t)) =>
      when(source === s, lit(t)).otherwise(acc)
    }
    idBucket(id, 1000000) < threshCol
  }

  /** Per-group cap: keep the top `k` rows of each group ranked by
    * `scoreCol` descending (ties broken by id ascending — fully
    * deterministic). The per-domain / per-source document cap a
    * pretraining mix applies so one crawl domain can't dominate.
    * One shuffle on the group key; the rank window never sees more
    * than a group's rows, and a group that would overflow an
    * executor is exactly the domain the cap exists to cut.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= k)
  }

  /** Deterministic stratified sample: keep ceil(fraction · n) rows
    * per stratum, chosen by bucket-then-id rank (stable under
    * re-partitioning). One shuffle on the stratum key.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fraction: Double
  ): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(idBucket(col(idCol), 1000000), col(idCol))
    val n = Window.partitionBy(col(stratumCol))
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .filter(col("_rk") <= ceil(col("_n") * fraction))
      .drop("_rk", "_n")
  }
}
