package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline instrumentation via `observe()` — accumulator-backed metrics
  * computed inside the same pass as the query (no second scan, no
  * driver-side data). The 100 TB analog of pyPiper's progress callback
  * (SURVEY.md §2.A op #13): you don't re-count a corpus to know how many
  * rows a quality gate dropped; the gate reports it as it runs. */
class ObserveSpec extends SparkSpec {

  test("observe reports gate selectivity in-flight, same pass, exact") {
    val obs = Observation("quality_gate")
    val docs = Tables(spark, sf).documents
    val gated = docs
      .observe(obs, count(lit(1)).as("n_in"),
        sum(when(col("n_chars").between(100, 1000), 1L).otherwise(0L))
          .as("n_pass"))
      .filter(col("n_chars").between(100, 1000))
    val kept = gated.count()
    val m = obs.get
    assert(m("n_in") == docs.count())
    assert(m("n_pass") == kept, s"observed ${m("n_pass")} != counted $kept")
  }

  test("observe composes with aggregation without changing results") {
    val obs = Observation("li_scan")
    val base = Tables(spark, sf).lineitem
      .observe(obs, count(lit(1)).as("rows_scanned"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val grouped = base.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(obs.get("rows_scanned") == grouped.values.sum)
  }
}
