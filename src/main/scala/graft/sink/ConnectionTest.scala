package graft.sink

/** Connection-test utility (reference `connectiontest` mode,
  * ConnectionTestDefinition.java:1-92, SURVEY §3.3): N iterations with a
  * sleep, each opening a connection and running a check statement;
  * returns per-iteration success/latency.
  */
object ConnectionTest {

  case class Attempt(iteration: Int, ok: Boolean, millis: Long, error: Option[String])

  def run(url: String, iterations: Int = 1, sleepMillis: Long = 0,
          checkStatement: Option[String] = None): Seq[Attempt] =
    (0 until iterations).map { i =>
      if (i > 0 && sleepMillis > 0) Thread.sleep(sleepMillis)
      val t0 = System.nanoTime()
      try {
        JdbcSink.withConnection(url) { c =>
          checkStatement.foreach { sql =>
            val st = c.createStatement()
            try st.execute(sql) finally st.close()
          }
        }
        Attempt(i, ok = true, (System.nanoTime() - t0) / 1000000, None)
      } catch {
        case e: Exception =>
          Attempt(i, ok = false, (System.nanoTime() - t0) / 1000000, Some(e.getMessage))
      }
    }
}
