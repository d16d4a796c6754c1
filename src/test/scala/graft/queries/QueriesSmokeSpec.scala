package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and returns rows. Value-level
  * correctness is checked against DuckDB by the driver (and by
  * tools/oracle_check.py locally) — this suite guards execution. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  Registry.all.foreach { q =>
    test(s"${q.name} executes and returns rows") {
      val n = q.fn(spark, TestSpark.sf0001).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
