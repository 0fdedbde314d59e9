package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join via unit-cell binning — the scale path for
  * `fact.v BETWEEN range.lo AND range.hi` predicates.
  *
  * A naive inequality join is a broadcast-nested-loop: every fact row
  * is tested against every range (O(N·R)). Binning turns it into an
  * equi-join: each range explodes to the integer cells it covers
  * (bounded by its width / binWidth — range-table-sized, never
  * fact-sized), each fact row maps to exactly ONE cell, and the join
  * keys on the cell with an exact residual predicate after the match.
  * Shuffle volume is ~|facts| once (or zero when the exploded range
  * side broadcasts); no pair blow-up because a fact meets only the
  * ranges whose cells it lands in.
  *
  * Same cell-decomposition idea as [[Geo.gridJoin]] in one dimension;
  * the pattern DuckDB/Trino implement natively as IEJoin/range join.
  */
object RangeJoin {

  /** Join `facts` to `ranges` on `lo <= value < hi` (half-open).
    *
    * @param binWidth cell width in value units; ranges explode to
    *   ceil(width/binWidth)+1 cells, so size it near the MEDIAN range
    *   width — wide outlier ranges only add cells proportional to
    *   their own width.
    */
  def binned(
      facts: DataFrame,
      value: Column,
      ranges: DataFrame,
      lo: Column,
      hi: Column,
      binWidth: Double = 1.0
  ): DataFrame = {
    require(binWidth > 0, s"RangeJoin.binned: binWidth must be > 0, got $binWidth")
    val cellOfValue = floor(value / binWidth).cast("long")
    // sequence() is inclusive on both ends; hi exactly on a cell
    // boundary still needs that cell (values just below hi live there).
    val cells = sequence(
      floor(lo / binWidth).cast("long"),
      floor(hi / binWidth).cast("long"))
    val burst = ranges.withColumn("_cell", explode(cells))
    facts
      .withColumn("_cell", cellOfValue)
      .join(burst, Seq("_cell"))
      .filter(value >= lo && value < hi)
      .drop("_cell")
  }
}
