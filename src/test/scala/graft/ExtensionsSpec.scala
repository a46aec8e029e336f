package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make dot_product / l2_norm callable from SQL
  * in any session configured with spark.sql.extensions.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("dot_product and l2_norm are SQL-callable via GraftExtensions") {
    TestSpark.spark // ensure the shared context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.local(2)
      val r = s.sql(
        "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
          "l2_norm(array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS n").head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 5.0)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
