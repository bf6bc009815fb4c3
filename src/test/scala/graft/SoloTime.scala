package graft

/** Test-classpath alias for [[graft.Solo]] (the clean-room solo timer
  * now lives in main so [[Bench]] can fork it at round close — see
  * Solo's scaladoc). Kept so the historical invocation
  * `sbt 'Test/runMain graft.SoloTime <names> <reps>'` keeps working.
  */
object SoloTime {
  def main(args: Array[String]): Unit = Solo.main(args)
}
