package graft

/** One-off: time the two streaming queries and a control query in a
  * fresh session, twice each, to separate query cost from suite-state
  * and machine noise. */
object AuditStream {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, 32, "audit-stream")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Seq("q1_agg", "stream_events_hourly", "stream_sessionize").foreach { q =>
      time(s"$q run1")(SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save())
      time(s"$q run2")(SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
