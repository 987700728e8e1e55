package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType, StructField}
import org.scalatest.funsuite.AnyFunSuite

/** Registration-time guard for the oracle gate: every query with an
  * `oracleSql` entry must emit a scalar-only top-level schema. The
  * driver's comparator sorts rows by all columns in pandas, and an
  * array/map/struct column crashes it (`unhashable type:
  * numpy.ndarray`) before any comparison runs — which silently turns
  * a green operator into a red row (this is exactly what happened to
  * d_inverted / d_winnow / e_doc_pool in round 8). Array-valued
  * results must be stringified (`array_join`) or exploded to one row
  * per element before registration.
  */
class RegistrySchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle-checked query has a scalar-only top-level schema") {
    val bad = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sfDir).schema
      val nonScalar = schema.fields.collect {
        case StructField(f, _: ArrayType, _, _)  => s"$f: array"
        case StructField(f, _: MapType, _, _)    => s"$f: map"
        case StructField(f, _: StructType, _, _) => s"$f: struct"
      }
      if (nonScalar.isEmpty) None else Some(s"$name -> ${nonScalar.mkString(", ")}")
    }
    assert(bad.isEmpty,
      s"non-scalar top-level columns in oracle-checked queries (the driver " +
        s"comparator cannot sort these):\n  ${bad.mkString("\n  ")}")
  }

  test("every oracle-checked query is registered in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql entries with no query: $missing")
  }
}
