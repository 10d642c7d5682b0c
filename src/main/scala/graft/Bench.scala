package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the SF dir given by
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop sink
  * (a bare count() would let Catalyst prune the expression work away).
  * Prints ONE JSON line: {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}.
  *
  * Every query is executed once on the smallest available SF BEFORE the
  * timed loop, so the timed numbers measure plans — not first-execution
  * JIT, codegen compilation, and classloading. (Round 2 lost ~35s to
  * cold-JIT landing inside the timed region; warm steady-state was fine.) */
object Bench {

  /** Smallest sibling sf* dir of sfDir (falls back to sfDir itself) — the
    * cheapest data that still compiles and JITs every plan. */
  private def warmupDir(sfDir: String): String = {
    val parent = new java.io.File(sfDir).getParentFile
    val sfs = Option(if (parent == null) null else parent.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("sf").toDouble -> f.getPath).toOption)
    if (sfs.isEmpty) sfDir else sfs.minBy(_._1)._2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup: run EVERY query once at the smallest SF so each
    // plan's codegen is compiled and JIT'd before its timed run.
    val wDir = warmupDir(sfDir)
    SparkEntry.all.foreach { q =>
      try q.fn(spark, wDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup ${q.name} failed: ${e.getMessage}")
      }
    }
    // Streaming machinery warmup (state store, microbatch planner, sink
    // codegen) — the streaming queries get the same JIT treatment as batch.
    try {
      val wq = streaming.EventStream.runOnce(spark, wDir,
        "bench_stream_warmup", statePartitions = Some(2))
      wq.awaitTermination(60000)
      if (wq.isActive) wq.stop()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming warmup skipped: ${e.getMessage}")
    }
    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
