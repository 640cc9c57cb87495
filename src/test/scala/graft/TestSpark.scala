package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sf0.001 inputs). */
object TestSpark {
  val sf: String = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession("graft-test", cores = 4)
}
