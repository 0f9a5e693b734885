package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one Spark-internal call a V1 streaming Source cannot avoid:
  * `Source.getBatch` must return a frame whose logical plan has
  * `isStreaming = true`, and the only constructor for that —
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)`, the
  * call `FileStreamSource` itself makes — is `private[sql]`. This shim
  * lives in a subpackage of `org.apache.spark.sql` purely to satisfy
  * that access qualifier (the standard third-party-connector pattern);
  * it adds no behavior and nothing else in the codebase may import
  * Spark internals through it.
  */
object StreamingFrame {
  def streaming(spark: SparkSession, rows: RDD[InternalRow],
                schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}
