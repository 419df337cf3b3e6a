ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "llmmapreducesummarizerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// CkptCanarySpec measures the persisted-RDD delta its mini-session leaves
// in the WHOLE shared SparkContext. In the one forked test JVM that
// measurement is suite-order-dependent (other suites' (session, dir)
// memo checkpoints, the framework's first-checkpoint pin) — it flaked
// red in the round-16 driver run under a different suite ordering.
// Isolate it in its own JVM: the canary then measures exactly what the
// mini-session leaves, deterministically.
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val (canary, rest) = (Test / definedTests).value
    .partition(_.name == "graft.CkptCanarySpec")
  Seq(
    Tests.Group("ckpt-canary", canary, Tests.SubProcess(forkOpts)),
    Tests.Group("main", rest, Tests.SubProcess(forkOpts))
  ).filter(_.tests.nonEmpty)
}
