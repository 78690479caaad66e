package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs — small core count keeps test JVMs
  * snappy; the code under test carries no parallelism assumptions.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    // GraftSession.builder, NOT a hand-rolled one: specs must pin the SAME
    // session config (AQE, nanosAsLong, agg fallback threshold, UTC) that
    // Verify/Bench run, or plan assertions silently assert a config that
    // never ships
    val s = GraftSession.builder("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
