package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** STANDING RULE (round-9 verdict #1): gated outputs carry SCALAR
  * columns only. The driver's comparator sorts raw pandas cells before
  * hashing, and array/map/struct cells are unhashable there — a gate
  * returning one is silently correct locally (the builder's stand-in
  * stringifies first) and RED at the driver, which is exactly how
  * q_bpe_encode shipped broken in round 9. This spec fails the build
  * instead: every registered query's result schema must be flat atomic
  * columns. Schema derivation is plan-only for the lazy majority;
  * queries with eager driver-side construction run tiny sf0.001 jobs.
  */
class GateSchemaSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("every gated query returns only atomic scalar columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"gated queries must return scalar columns only (driver comparator " +
        s"cannot sort/hash nested cells):\n  ${offenders.mkString("\n  ")}")
  }
}
