package graft

/** Local replica of the driver's t1 smoke: SparkEntry.entry(spark) rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(appName = "graft-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
