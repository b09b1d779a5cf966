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

  test("Graft.register exposes every graft SQL function (extensions parity)") {
    // registration has two paths — GraftExtensions (session builder) and
    // Graft.register (attach to an existing session); a function added to
    // one but not the other breaks pure-SQL users on the other path
    Graft.register(spark)
    val probes = Seq(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f))",
      "SELECT graft_lsh_bucket(array(1.0f, 0.0f), 6)",
      "SELECT graft_minhash(array('a b c'), 4)",
      "SELECT graft_shingle_hashes('a b c d', 3)",
      "SELECT graft_gram_hashes('a b c d', 3)",
      "SELECT graft_fingerprint('a b c')")
    probes.foreach(sql => assert(spark.sql(sql).collect().length == 1, sql))
  }

  test("SQL builders accept foldable integral args, not only int literals") {
    // a BIGINT literal or a constant expression (1 + 3) must resolve the
    // same as a plain int literal — builders run post-analysis, so any
    // foldable integral child is a legitimate constant
    Graft.register(spark)
    val equalPairs = Seq(
      ("SELECT graft_minhash(array('a b c'), 1 + 3)",
        "SELECT graft_minhash(array('a b c'), 4)"),
      ("SELECT graft_shingle_hashes('a b c d', CAST(2 AS BIGINT))",
        "SELECT graft_shingle_hashes('a b c d', 2)"),
      ("SELECT graft_lsh_bucket(array(1.0f, 0.5f), 2 * 3)",
        "SELECT graft_lsh_bucket(array(1.0f, 0.5f), 6)"))
    for ((fancy, plain) <- equalPairs)
      assert(spark.sql(fancy).collect().toSeq ==
        spark.sql(plain).collect().toSeq, fancy)
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
