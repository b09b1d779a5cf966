package graft.tools

import graft.queries.Registry

/** SCALE.md instrumentation (dev main, not driver surface): decomposes
  * each streaming query's HARNESS FLOOR — the wall-clock it costs with
  * (essentially) no data — into two structural components:
  *
  *   - `empty` pass: a ZERO-ROW mirror of the sf tables. The file source
  *     discovers no files, so Trigger.AvailableNow runs ZERO
  *     micro-batches — this isolates stream planning + sink
  *     setup/teardown alone.
  *   - `onerow` pass: a ONE-ROW events mirror. AvailableNow now runs its
  *     real cycle (the data batch, state-store init on every shuffle
  *     partition, checkpoint commits, the no-data batch that advances
  *     the watermark) over a single row — the full per-batch machinery
  *     with nil data volume. onerow − empty ≈ the micro-batch machinery
  *     floor.
  *
  * Round-over-round streaming deltas in BENCH_FULL.json should be read
  * NET of these floors — the floor is structural: at production scale it
  * amortizes over arbitrarily many micro-batches; in a per-round
  * 130-query bench it never does. Re-run after any streaming-harness
  * change and refresh the SCALE.md table:
  *
  *   sbt "runMain graft.tools.StreamFloor /root/testdata/sf0.001"
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mirrors: same schemas, zero (resp. one) event rows — streaming
    // queries also read static side tables, so every table is mirrored
    def mirror(tag: String, eventRows: Int): String = {
      graft.Staging.buildOnce(
          graft.Staging.path(s"graft_sf_$tag", sfDir), "_SUCCESS") { tmp =>
        new java.io.File(sfDir).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).foreach { t =>
            val n = if (t == "events.parquet") eventRows else 0
            spark.read.parquet(s"$sfDir/$t").limit(n)
              .coalesce(1).write.mode("overwrite")
              .parquet(tmp.resolve(t).toString)
          }
      }.toString
    }
    val empty = mirror("empty", 0)
    val onerow = mirror("onerow", 1)
    def f(d: Double) = BigDecimal(d).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    def timed(q: graft.queries.QueryDef, dir: String): Double = {
      val t0 = System.nanoTime()
      try { q.run(spark, dir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[floor] ${q.name}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val floors = Registry.all.filter(_.name.startsWith("q_stream_"))
      .map { q =>
        val e = Seq(timed(q, empty), timed(q, empty))
        val o = Seq(timed(q, onerow), timed(q, onerow))
        // min of two runs: the floor is a lower bound by definition, so
        // the quieter measurement is the truer one
        q.name -> ((f(e.min), f(o.min)))
      }
    val js = floors.map { case (n, (e, o)) =>
      s""""$n":{"empty":$e,"onerow":$o}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_floor","sf":"$sfDir","floors":$js}""")
    spark.stop()
  }
}
