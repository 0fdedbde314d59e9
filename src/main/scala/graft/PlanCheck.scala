package graft

import graft.queries.Registry

// Diagnostic main: prints condensed executed-plan facts per query
// (broadcast usage, pushed filters, shuffle count).
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"entry rows (sf0.001): ${SparkEntry.entry(spark).count()}")
    Registry.all.foreach { q =>
      try {
        val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
        val shuffles = "Exchange".r.findAllIn(plan).length -
          "ReusedExchange".r.findAllIn(plan).length -
          "BroadcastExchange".r.findAllIn(plan).length
        val bcasts = "BroadcastExchange|BroadcastQueryStage".r.findAllIn(plan).size
        val pushed = plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")
        // Spark 4 executedPlan.toString marks codegen stages as
        // "*(n) Operator"; count distinct stage ids.
        val wsc = """\*\((\d+)\)""".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(f"${q.name}%-22s shuffles=$shuffles%-3d bcast=$bcasts%-3d pushedFilters=$pushed%-5s codegenSpans=$wsc")
      } catch { case e: Throwable => println(s"${q.name} EXPLAIN FAILED: ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
