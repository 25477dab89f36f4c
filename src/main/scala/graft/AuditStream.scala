package graft

/** Attribution harness for the stream-stream join family (round-12
  * verdict ask #2): the r11 driver artifact read `stream_join_outer`
  * at 3.8× its quiet median with ALL passes high — a host phase owned
  * the whole sample window. This main separates the candidate terms by
  * measuring the pair over a 2×2 grid:
  *
  *   scratch placement  ×  induced disk load
  *   (/tmp disk vs /dev/shm tmpfs)  (quiet vs a concurrent fsync writer)
  *
  * The state store writes one delta file per partition per micro-batch
  * and the staged source stages its parts as parquet — both land on
  * [[graft.util.Scratch]]. If disk-cell-under-load inflates while the
  * tmpfs cell stays flat, the phase term is state-store/staging disk
  * I/O and tmpfs placement is the fix; if both inflate, the term is
  * CPU/scheduler contention and placement is irrelevant. A CPU-bound
  * control (q6_filter) runs in every cell to confirm the load
  * generator targets I/O, not cores.
  *
  * Run: `runMain graft.AuditStream [sfDir]`. Each cell uses a fresh
  * session, untimed warmup execution, then 3 timed samples.
  */
object AuditStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = Seq("stream_join", "stream_join_outer", "q6_filter")

    def cell(label: String, scratch: Option[String], load: Boolean): Unit = {
      scratch match {
        case Some(s) => sys.props("graft.scratch") = s
        case None => sys.props.remove("graft.scratch")
      }
      val spark = GraftSession.local(32, 32, s"audit-stream-$label")
      spark.sparkContext.setLogLevel("WARN")
      io.Tables.all.foreach(t => io.Tables(spark, dir, t).count())
      @volatile var stop = false
      // induced load: sequential 8 MiB writes + fsync against /tmp's
      // backing disk — the contention shape of a neighbor's heavy write
      // phase, deliberately NOT CPU-heavy
      val loader =
        if (!load) None
        else Some(new Thread(() => {
          val buf = new Array[Byte](8 << 20)
          java.util.Arrays.fill(buf, 0x5a.toByte)
          while (!stop) {
            val p = java.nio.file.Files.createTempFile(
              java.nio.file.Paths.get("/tmp"), "audit_load", ".bin")
            val ch = java.nio.channels.FileChannel.open(
              p, java.nio.file.StandardOpenOption.WRITE)
            try {
              var i = 0
              while (i < 32 && !stop) {
                ch.write(java.nio.ByteBuffer.wrap(buf))
                ch.force(false)
                i += 1
              }
            } finally {
              ch.close()
              java.nio.file.Files.deleteIfExists(p)
            }
          }
        }))
      loader.foreach { t => t.setDaemon(true); t.start() }
      def scrub(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      for (q <- queries) {
        def once(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val s = (System.nanoTime() - t0) / 1e9
          scrub()
          s
        }
        once() // untimed warm
        val xs = Seq(once(), once(), once())
        println(f"[audit] $label%-10s $q%-18s " +
          xs.map(x => f"$x%6.2f").mkString(" ") +
          f"  median=${xs.sorted.apply(1)}%.2f")
      }
      stop = true
      loader.foreach(_.join(2000))
      spark.stop()
    }

    cell("tmp-quiet", None, load = false)
    cell("shm-quiet", Some("/dev/shm/graft_scratch"), load = false)
    cell("tmp-load", None, load = true)
    cell("shm-load", Some("/dev/shm/graft_scratch"), load = true)
  }
}
