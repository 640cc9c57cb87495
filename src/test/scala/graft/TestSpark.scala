package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sf0.001 inputs). */
object TestSpark {
  val sf: String = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    // fresh warehouse per JVM: saveAsTable locations must not outlive
    // the in-memory catalog that knows about them
    System.setProperty("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    GraftSession("graft-test", cores = 4)
  }
}
