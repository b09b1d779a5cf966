package graft

import graft.queries.Registry

/** Every catalog query must run at sf0.001 without throwing — the analog
  * of the reference's golden-pipeline smoke tests, plus the driver's t1
  * contract on `entry`. */
class RegistrySmokeSpec extends SparkSpec {

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique and oracles refer to defined queries") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      // force full execution, not just planning
      df.count()
      assert(df.columns.nonEmpty)
    }
  }
}
