package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}

/** WHY does an operator under-scale 4→16 cores? This probe separates the
  * two possible answers by measuring, per run:
  *
  *   - `util` = Σ task run time / (wall × cores): how busy the cores were.
  *     util ≈ 1 at both levels but eff < 1 → tasks themselves got slower
  *     with more cores = shared-resource bound (memory bus / page cache on
  *     one box — the resource that scales WITH executors on a real cluster).
  *     util low at 16 but fine at 4 → not enough parallel work (partition
  *     count, serial stages, stage barriers) = a genuine plan problem worth
  *     fixing.
  *   - `cpu/run` = Σ task CPU time / Σ task run time: how much of the busy
  *     time was on-CPU. Falling cpu/run at higher core counts = stalls
  *     (bandwidth, lock contention, spill I/O).
  *   - `maxConc`: peak concurrently-running tasks (did the plan ever offer
  *     `cores` tasks at once?).
  *
  * Usage: runMain graft.tools.CoreScaleProbe <opName> <cores> [reps=2] [parts=<n>]
  * `parts` overrides spark.sql.shuffle.partitions (default = cores) — for
  * testing whether a low-util op is starved by task count vs stalled.
  * (op names and top-rung sizes from TrainingScaleBench.ops; one JVM per
  * core level — run levels in separate invocations like the core-pair
  * bench, never concurrently.)
  */
object CoreScaleProbe {

  private final class TaskMetricsListener extends SparkListener {
    val runMs   = new AtomicLong(0)
    val cpuNs   = new AtomicLong(0)
    val tasks   = new AtomicLong(0)
    val shufRd  = new AtomicLong(0)
    val shufWr  = new AtomicLong(0)
    val spill   = new AtomicLong(0)
    val running = new AtomicInteger(0)
    val maxConc = new AtomicInteger(0)
    override def onTaskStart(t: SparkListenerTaskStart): Unit = {
      val c = running.incrementAndGet()
      maxConc.updateAndGet(m => math.max(m, c)); ()
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      running.decrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        shufRd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
        tasks.incrementAndGet()
      }
      ()
    }
    def reset(): Unit = {
      runMs.set(0); cpuNs.set(0); tasks.set(0)
      shufRd.set(0); shufWr.set(0); spill.set(0); maxConc.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 2,
      "usage: CoreScaleProbe <opName> <cores> [reps] [parts=<n>] " +
        "(reps positional or reps=<n>; unrecognized args are an error, " +
        "never silently ignored)")
    val opName = args(0)
    val cores  = args(1).toInt
    val (kvArgs, posArgs) = args.drop(2).partition(_.contains("="))
    val kv = kvArgs.map { a =>
      val Array(k, v) = a.split("=", 2); k -> v.toInt
    }.toMap
    require((kv.keySet -- Set("parts", "reps")).isEmpty,
      s"unknown key=value arg(s): ${(kv.keySet -- Set("parts", "reps")).mkString(", ")}")
    require(posArgs.length <= 1, s"at most one positional [reps] arg, got: ${posArgs.mkString(" ")}")
    require(posArgs.isEmpty || !kv.contains("reps"), "reps given both positionally and as reps=")
    val reps  = posArgs.headOption.map(_.toInt).orElse(kv.get("reps")).getOrElse(2)
    val parts = kv.getOrElse("parts", cores)
    val op = TrainingScaleBench.ops.find(_.name == opName)
      .getOrElse(sys.error(s"unknown op '$opName' (see TrainingScaleBench.ops)"))
    val n = op.sizes.last

    // the probe's validity depends on running under the SAME session configs
    // as the core-pair bench — shared builder, not copied literals
    val spark = TrainingScaleBench.session(cores,
      appName = s"graft-corescale-$opName-$cores", shuffleParts = parts)
    if (parts != cores) println(s"[corescale] parts override: $parts")
    val l = new TaskMetricsListener
    spark.sparkContext.addSparkListener(l)

    op.run(spark, n) // warmup (JIT + page cache), unmeasured
    for (rep <- 1 to reps) {
      // listenerBus.waitUntilEmpty is private[spark]; a short sleep drains
      // the async bus (events lag task end by ms, the runs last seconds)
      Thread.sleep(1500)
      l.reset()
      val (rows, wall) = graft.Bench.time(op.run(spark, n))
      Thread.sleep(1500)
      val runS = l.runMs.get() / 1e3
      val cpuS = l.cpuNs.get() / 1e9
      println(f"[corescale] $opName%-20s cores=$cores%-2d rep$rep n=$n%d rows=$rows%d " +
        f"wall=$wall%6.2f s util=${runS / (wall * cores)}%4.2f cpu/run=${cpuS / math.max(runS, 1e-9)}%4.2f " +
        f"tasks=${l.tasks.get()}%d maxConc=${l.maxConc.get()}%d " +
        f"shufRd=${l.shufRd.get() >> 20}%d MB shufWr=${l.shufWr.get() >> 20}%d MB " +
        f"spill=${l.spill.get() >> 20}%d MB")
    }
    spark.stop()
  }
}
