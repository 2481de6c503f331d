ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "satprocspark"
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
// Forked run output is inherited raw (no "[info] " logger prefix) so the
// bench driver can machine-parse the JSON result line from stdout.
run / outputStrategy := Some(StdoutOutput)
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
  // Shuffle writer: below this reduce-partition count Spark's
  // BypassMergeSortShuffleWriter opens ONE FILE PER REDUCE PARTITION per
  // map task (32 partitions -> 1024 file creates per exchange here);
  // thread dumps of the hot dedup stages showed most of their "CPU" in
  // FileOutputStream.open0 / File.exists from exactly that. Threshold 1
  // routes small shuffles through the serialized single-file-per-map-task
  // writer — the SAME path any >200-partition production shuffle already
  // takes, so this aligns small shuffles with the at-scale behavior
  // rather than tuning for this box. Measured at sf0.1/local[32]:
  // dedup_simhash_pairs 2.57->1.51 s, dedup_minhash_lsh 2.26->1.27 s,
  // knn_large 1.60->1.00 s (min-of-5). Override via env.
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1")}",
) ++ (if (sys.env.get("SPARK_GC").contains("parallel"))
        Seq("-XX:+UseParallelGC") else Seq.empty) ++
  // Shuffle/spill scratch on RAM-backed storage when the box has it —
  // the standard "spark.local.dir should be on a fast local disk"
  // deployment setting (tmpfs here; a cluster uses local NVMe). Worth a
  // further ~8% on the shuffle-heavy queries. Override via env.
  (sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
    case Some(d) => Seq(s"-Dspark.local.dir=$d")
    case None if file("/dev/shm").isDirectory =>
      Seq("-Dspark.local.dir=/dev/shm/graft-spark-local")
    case None => Seq.empty
  }) ++
  // ad-hoc spark-conf injection for A/B measurement (same mechanism a
  // deployment's spark-defaults.conf provides), e.g.
  // SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.shuffle.sort.bypassMergeThreshold=1"
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
