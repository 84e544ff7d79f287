package graft

import org.apache.spark.sql.SparkSession

/** SPARK_GRAFT_MASTER support for the measurement mains (Bench,
  * StreamLatency): an env override swaps the in-process `local[N]`
  * master for a REAL process-boundary topology, e.g.
  * `local-cluster[4,8,6144]` — 4 executor JVMs x 8 cores x 6 g — which
  * exercises serialized shuffle fetch, broadcast transport and
  * task-dispatch RPC that local[N] short-circuits (SCALE.md §r18).
  * Needs SPARK_HOME in the environment (the standalone worker builds
  * the executor launch command from it).
  */
object BenchMaster {
  def resolve(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", default)

  /** Executor-side configs a local-cluster master needs: the driver's
    * full classpath (so graft classes resolve in executor JVMs) and the
    * JDK-17 module opens the forked driver gets from build.sbt (without
    * them Spark falls back to slow non-Unsafe paths and some reflective
    * accesses throw). No-op for in-process masters.
    */
  def configure(b: SparkSession.Builder,
                master: String): SparkSession.Builder =
    if (!master.startsWith("local-cluster")) b
    else b
      .config("spark.executor.extraClassPath",
        sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions",
        Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
          "java.io", "java.net", "java.nio", "java.util",
          "java.util.concurrent", "java.util.concurrent.atomic",
          "sun.nio.ch", "sun.nio.cs", "sun.security.action",
          "sun.util.calendar")
          .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
          .mkString(" "))
}
