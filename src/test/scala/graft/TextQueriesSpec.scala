package graft

import graft.operators.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Construction-cost contract for the LM-scoring queries: composing the
  * plan must be free. Round-6 finding: t06/t09 fired corpus jobs from
  * `.head()` scalars DURING DataFrame construction — a caller composing
  * plans paid scans it never asked to run, and every retry re-paid them.
  * Both scalars are now 1-row broadcast crossJoins (the q33
  * scalar-subquery shape). */
class TextQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("t06/t09 perplexity DataFrames launch zero jobs at construction") {
    val t = tables
    t.documents.schema // relation creation (schema read) outside the probe
    val sc = spark.sparkContext
    sc.setJobGroup("tq-construct", "construction probe")
    val d1 = TextQueries.t06UnigramPpl(t)
    val d2 = TextQueries.t09BigramPpl(t)
    // marker action in a DIFFERENT group: the listener bus is ordered, so
    // once the marker job is visible, any construction-time job would be
    // visible too — no sleep-and-hope
    sc.setJobGroup("tq-marker", "construction probe marker")
    spark.range(1).count()
    sc.clearJobGroup()
    val deadline = System.currentTimeMillis() + 30000
    while (sc.statusTracker.getJobIdsForGroup("tq-marker").isEmpty &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(sc.statusTracker.getJobIdsForGroup("tq-marker").nonEmpty,
      "marker job never observed")
    assert(sc.statusTracker.getJobIdsForGroup("tq-construct").isEmpty,
      "constructing t06/t09 must launch zero jobs")
    // the folded scalars still compute the same surface
    assert(d1.count() > 0 && d2.count() > 0)
  }
}
