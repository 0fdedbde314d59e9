package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local-session fixture; small SF dir for fast specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
  def tables: Tables = Tables(spark, sfDir)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession
      .builder(master = "local[4]", shufflePartitions = 4, appName = "graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
