ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "webscrapyspark"
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
  // Shuffle-writer selection (measured, OPTIMIZATION_r06.md §frontier_schedule):
  // the bypass-merge writer opens one block file PER REDUCE PARTITION per map
  // task; at the session's 128 shuffle partitions a 128-task stage creates
  // 16k tiny files and their open/init/commit cost measured 34.7 s of a
  // 36.7 s stage (95% of task runtime — shuffle WRITE time on tmpfs) while
  // the same stage's compute was 4 s. Above this threshold Spark uses the
  // sort-based writer (ONE file per map task), which took the identical
  // stage to 0.3 s of write time. 64 keeps bypass for narrow (≤64-way)
  // shuffles where its per-file cost is trivial and it avoids the sort.
  // At cluster scale wide shuffles use the sort path by default anyway
  // (bypass only ever applies ≤200 partitions), so this default is not a
  // local-only tune; override via SPARK_GRAFT_BYPASS_THRESHOLD.
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "64")}",
  // Round-robin repartition pre-sorts its input so retried tasks reproduce
  // the same row→partition assignment (SPARK-23207) — in LOCAL mode there
  // are no shuffle-fetch retries, and the sort serializes a single-row-group
  // scan's only task for ~0.5 s per 600k-row repartition (the bench's
  // lineitem staging). Off locally; MUST stay true on a multi-node cluster
  // (set SPARK_GRAFT_SORT_BEFORE_REPARTITION=true). Results are unaffected
  // either way: every declared query is partition-order independent
  // (oracle-verified after this change).
  s"-Dspark.sql.execution.sortBeforeRepartition=${sys.env.getOrElse("SPARK_GRAFT_SORT_BEFORE_REPARTITION", "false")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// optional GC experiment knob: SPARK_GC=Parallel|G1|Z
javaOptions ++= sys.env.get("SPARK_GC").map(g => s"-XX:+Use${g}GC").toSeq
