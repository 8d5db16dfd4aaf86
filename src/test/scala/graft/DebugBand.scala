package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{NativeKernels, TextKernels}
import graft.operators.Dedup

/** Scratch A/B: composed vs native band-key computation. Test-scoped —
  * run with `sbt "Test/runMain graft.DebugBand"`; paths assume the build
  * container. */
object DebugBand {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32)
      .select(col("doc_id"),
        TextKernels.wordShingles2(TextKernels.wordTokens(col("text"))).as("g"))
      .cache()
    sh.count() // materialize
    // the composed baseline mirrors the OLD production shape exactly:
    // hv projected ONCE in its own select, signatures derived from it
    def composedCount(): Long = {
      val hv = sh.select(col("doc_id"),
        TextKernels.shingleHashes(col("g")).as("hv"))
      val sigs = (0 until Dedup.NumHashes).map(i => TextKernels.minhashSig(col("hv"), i))
      val bands = (0 until Dedup.NumBands).map(b => TextKernels.bandKey(sigs, b, Dedup.RowsPerBand))
      hv.select(posexplode(array(bands: _*))).count()
    }
    def nativeCount(): Long = sh.select(posexplode(NativeKernels.bandKeys(
      col("g"), Dedup.NumHashes, Dedup.NumBands, Dedup.RowsPerBand))).count()
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      composedCount()
      val tc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      nativeCount()
      val tn = (System.nanoTime() - t0) / 1e9
      println(f"[band] rep$i composed: $tc%.3f s  native: $tn%.3f s")
    }
    spark.stop()
  }
}
