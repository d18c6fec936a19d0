package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe32 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/spark-tmp")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val raw = s.read.parquet("data/scaling_tokens")
    raw.count()
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def cpuMs: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime / 1000000
    for (i <- 1 to 4) {
      val (g0, c0, t0) = (gcMs, cpuMs, System.nanoTime())
      graft.operators.TopK.tokensArray(raw, col("tokens"), graft.Bench.cfgLight).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[p32] sketch run $i: wall $wall%6.2f s  gc ${(gcMs - g0) / 1000.0}%6.2f s  cpu ${(cpuMs - c0) / 1000.0}%7.1f s (${(cpuMs - c0) / 1000.0 / wall}%4.1f cores)")
    }
    val t0 = System.nanoTime()
    raw.select(explode(col("tokens")).as("t")).groupBy("t").count().orderBy(desc("count")).limit(5).collect()
    println(f"[p32] native groupBy: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    s.stop()
  }
}
