package graft.connect

/** X9 — bounded retry with delay for the HTTP stages
  * (reference: per-task `retries=0..3`, `retry_delay`,
  * dags/ConsultationNoteWritebackX.py:46-47,402-403,415,470,486).
  * Used inside mapPartitions/foreachPartition bodies; stream restart
  * covers anything beyond the bound.
  */
object Retry {
  def withRetry[T](retries: Int, delayMs: Long = 0)(f: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try return f
      catch {
        case e: Exception =>
          last = e
          attempt += 1
          if (attempt <= retries && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw last
  }
}
