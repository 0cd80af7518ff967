package graft.util

import org.apache.spark.sql.SparkSession

/** Master selection shared by the harness mains ([[graft.Verify]],
  * [[graft.Bench]], [[graft.tools.TimeQuery]]).
  *
  * `SPARK_GRAFT_MASTER` overrides the default `local[cpus]` — the
  * designed use is `local-cluster[N,cores,memMB]` (r11 verdict item 1):
  * every number this engine ever produced came from ONE JVM, where
  * broadcasts, typed-Aggregator buffers, custom-Expression closures and
  * kryo paths never cross a process boundary — exactly where cluster
  * deployments break first. local-cluster forks REAL executor JVMs
  * (separate processes, real serialization, real RPC) on this machine,
  * the cheapest honest multi-JVM evidence short of a cluster.
  *
  * local-cluster executors are launched by the standalone backend from
  * `SPARK_HOME` with only the Spark distribution on their classpath, so
  * the engine classes and the JDK-17 module opens (build.sbt forks them
  * into the DRIVER only) must be forwarded explicitly.
  */
object Sessions {

  /** The same list as build.sbt's jdk17AddOpens — executors need them
    * for the identical reason the forked driver does (kryo/unsafe).
    */
  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  def withMaster(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // ad-hoc conf overrides for scale experiments
    // (`SPARK_GRAFT_EXTRA_CONF="k=v;k=v"`): A/B-ing a partitioning or
    // AQE setting at a big SF must not require a recompile
    val withExtra = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(';').filter(_.contains('=')))
      .getOrElse(Array.empty)
      .foldLeft(b) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2)
        bb.config(k.trim, v.trim)
      }
    val withM = withExtra.master(master)
    if (master.startsWith("local-cluster")) {
      // Resolve the engine classes from where THIS class was loaded, not
      // from the CWD (r12 ADVICE: a CWD-relative path makes executors
      // fail with ClassNotFoundException only at first task
      // deserialization when the harness is launched from any other
      // directory). SPARK_GRAFT_CLASSPATH overrides for packaged-jar
      // runs; either way a missing path fails fast HERE with a clear
      // message instead of at task-deserialize time.
      val classes = sys.env.getOrElse("SPARK_GRAFT_CLASSPATH", {
        val src = Sessions.getClass.getProtectionDomain.getCodeSource
        require(src != null && src.getLocation != null,
          "local-cluster master needs the engine classpath, but the " +
            "Sessions class has no code-source location — set " +
            "SPARK_GRAFT_CLASSPATH to the classes dir or jar")
        new java.io.File(src.getLocation.toURI).getAbsolutePath
      })
      require(new java.io.File(classes).exists(),
        s"local-cluster executor classpath does not exist: $classes " +
          "(set SPARK_GRAFT_CLASSPATH or build first)")
      withM
        .config("spark.executor.extraClassPath", classes)
        .config("spark.executor.extraJavaOptions", AddOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "7g"))
    } else withM
  }
}
