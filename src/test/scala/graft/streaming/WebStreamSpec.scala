package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** The streamed web flagship (q_web_pipeline_stream: file-source
  * arrivals, foreachBatch over webStoreStage, span-store state) must be
  * row-identical to the batch continuous composition
  * (q_web_pipeline_continuous: the same three doc_id % 3 arrivals
  * composed by hand). This pins the two properties the oracle alone
  * cannot localize: the file source admits arrivals oldest-mtime-first
  * (commit order = modulus order), and foreachBatch's sequential
  * micro-batches preserve the commit-before-probe store contract. */
class WebStreamSpec extends AnyFunSuite {

  test("streamed flagship == batch continuous composition, row for row") {
    val s = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    def rows(q: String): Set[String] =
      SparkEntry.queries(q)(s, dir).collect()
        .map(_.toSeq.mkString("|")).toSet
    val streamed = rows("q_web_pipeline_stream")
    val batch = rows("q_web_pipeline_continuous")
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }
}
