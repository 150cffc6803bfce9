package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` packaging: a session built with
  * [[GraftExtensions]] (sharing the JVM-wide SparkContext) resolves
  * the custom functions from plain SQL with no registration call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions serves the kernels from SQL") {
    val shared = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[8]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        val norm = ext.sql("SELECT normalize_text('  The,  QUICK  fox!! ') AS n")
          .collect().head.getString(0)
        assert(norm == "the quick fox")
        val cos = ext.sql(
          "SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
            "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
          .collect().head.getDouble(0)
        assert(math.abs(cos - 1.0) < 1e-12)
        // every builder resolves (names registered at session build)
        graft.functions.GraftFunctions.builders.foreach { case (name, _) =>
          assert(ext.catalog.functionExists(name), name)
        }
      } finally {
        // the extension session shares the context; just drop refs
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
