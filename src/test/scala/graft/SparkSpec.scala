package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide instance). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", s"/tmp/graft-test-warehouse-${java.util.UUID.randomUUID()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // Attach the codegen-fallback sentinel AFTER session creation:
    // Spark's Logging init reconfigures log4j2 (loading its defaults),
    // which would wipe an appender installed earlier.
    CodegenFallbackGuard.install()
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark

  override protected def afterAll(): Unit = {
    // Fail THIS suite if any of its queries fell back to interpreted
    // projection/predicate evaluation (drains, so one bug = one suite).
    CodegenFallbackGuard.assertClean(getClass.getSimpleName)
    super.afterAll()
  }
}
