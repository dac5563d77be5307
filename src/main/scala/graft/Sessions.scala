package graft

import org.apache.spark.sql.SparkSession

/** The blessed SparkSession recipe — one place for the scale knobs
  * (SURVEY §4): AQE + skew-join splitting on, shuffle partitions sized to
  * the deployment (32 locally ≙ cores; thousands on a real cluster), 128 MB
  * scan partitions, UTC for oracle parity, Kryo, and the graft SQL
  * functions injected via the public extensions point.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
}
