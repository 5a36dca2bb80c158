package graft.dev

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.{Sessions, SparkEntry}

/** TimeQ's co-tenant-immune sibling: besides wall-clock, report the sum of
  * task `executorCpuTime` (CPU-clock nanoseconds actually charged to this
  * JVM's tasks) and `executorRunTime` per rep. On a host whose wall-clock
  * carries a fluctuating external load factor (the r14/r15 reconciliation
  * evidence), CPU-seconds is the honest A/B comparator for code changes
  * whose effect is per-row work, not plan shape: external contention
  * stretches wall time but barely changes the CPU cycles a task burns.
  *
  *   SPARK_GRAFT_SF_DIR=… sbt "runMain graft.dev.CpuTimeQ <query> [runs]"
  */
object CpuTimeQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: CpuTimeQ <query> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val s = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
    val cpuNs = new LongAdder
    val runMs = new LongAdder
    val spillMem = new LongAdder
    val spillDisk = new LongAdder
    val gcMs = new LongAdder
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          cpuNs.add(m.executorCpuTime); runMs.add(m.executorRunTime)
          spillMem.add(m.memoryBytesSpilled); spillDisk.add(m.diskBytesSpilled)
          gcMs.add(m.jvmGCTime)
        }
      }
    })
    (1 to runs).foreach { i =>
      cpuNs.reset(); runMs.reset(); spillMem.reset(); spillDisk.reset(); gcMs.reset()
      val t0 = System.nanoTime()
      fn(s, d).write.format("noop").mode("overwrite").save()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a moment so
      // the rep's counters are complete before printing
      Thread.sleep(1500)
      println(f"[cputimeq] $name run $i: wall=$wall%.3f s  cpu=${cpuNs.sum / 1e9}%.3f s  taskrun=${runMs.sum / 1e3}%.3f s  gc=${gcMs.sum / 1e3}%.3f s  spillMem=${spillMem.sum / 1e9}%.3f GB  spillDisk=${spillDisk.sum / 1e9}%.3f GB  heap=${Runtime.getRuntime.totalMemory / 1e9}%.2f GB")
    }
    s.stop()
  }
}
