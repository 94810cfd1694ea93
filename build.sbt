ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkfitsspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as the bench summary JSON. Two sbt behaviors defeated that for seven
// rounds: every forked-child line was re-logged with an `[info] `
// prefix, and a `[success] Total time: ...` trailer landed after it.
// StdoutOutput passes the child's stdout through unprefixed, and
// showSuccess drops the trailer — so the bare JSON line printed by
// Bench/Verify really is the final stdout line.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
// Fork-JVM heap: explicit SPARK_DRIVER_MEM always wins; otherwise size
// from the bench corpus (SPARK_GRAFT_SF_DIR). The 100x canary's
// streaming memory sinks peak ~7.5 GiB — right at the old fixed 8g
// default's OOM edge (one run died there). Heuristic: ~16 GiB heap per
// GiB of on-disk parquet (snappy decompresses ~6-8x, plus memory-sink
// retention, shuffle, and the REPS=2 memo churn — the r9 100x run
// OOM'd in dedup_survivors at the earlier 10x-per-GiB guess), +6 GiB
// fixed, floored at 8g, capped at 48g. Gives ~26g for the ~1.2 GiB
// 100x corpus and stays at 8g for the graded SFs. Unset => 8g floor.
def graftDirBytes(d: java.io.File): Long =
  if (d.isFile) d.length
  else Option(d.listFiles).map(_.map(graftDirBytes).sum).getOrElse(0L)
def graftDriverMem: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val corpusGiB = sys.env.get("SPARK_GRAFT_SF_DIR")
    .map(p => graftDirBytes(new java.io.File(p)).toDouble / (1L << 30))
    .getOrElse(0.0)
  s"${math.max(8L, math.min(48L, 6L + math.ceil(corpusGiB * 16).toLong))}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftDriverMem",
)
