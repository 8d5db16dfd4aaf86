package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming throughput probe: micro-batch rows/s of the two stateful
  * flagship streams — minhashDedupStream (watermarked band-key dedup) and
  * sessionizeStream (flatMapGroupsWithState) — at 1x/4x/16x input volume,
  * feeding MemoryStream from the sf0.1 parquet tables in fixed-size chunks.
  * Results land in SCALING.md's streaming table. Run:
  * `sbt "Test/runMain graft.DebugStream"`. */
object DebugStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // ---- corpus: documents with synthetic monotone timestamps
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text").orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // ---- events: real (ts, user) pairs for sessionization
    val events = spark.read
      .option("mergeSchema", "false")
      .parquet("/root/testdata/sf0.1/events.parquet")
      .selectExpr("cast(ts div 1000000000 as timestamp) ts", "cast(user_id as string) u")
      .orderBy("ts").limit(100000)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)))

    for (mult <- Seq(1, 4, 16)) {
      // --- minhash dedup stream: mult x 5000 docs, id-shifted copies
      val docRows = (0 until mult).flatMap { m =>
        docs.map { case (id, tx) =>
          (new Timestamp(1700000000000L + id * 10 + m), id + m * 100000L, tx)
        }
      }
      val in1 = MemoryStream[(Timestamp, Long, String)]
      val out1 = StreamOps.minhashDedupStream(
        in1.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text", "10 minutes")
      val q1 = out1.writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      docRows.grouped(2500).foreach { chunk => in1.addData(chunk); q1.processAllAvailable() }
      val dt1 = (System.nanoTime() - t0) / 1e9
      q1.stop()
      println(f"[stream] minhashDedup ${mult}x: ${docRows.size} docs in $dt1%.2f s = ${docRows.size / dt1}%.0f docs/s")

      // --- sessionize stream: mult x 100k events, user-shifted copies
      val evRows = (0 until mult).flatMap { m =>
        events.map { case (ts, u) => (ts, s"$u-$m") }
      }
      val in2 = MemoryStream[(Timestamp, String)]
      val out2 = StreamOps.sessionizeStream(
        in2.toDF().toDF("ts", "u"), "ts", "u", 30 * 60 * 1000L, "10 minutes")
      val q2 = out2.writeStream.format("noop").outputMode("append").start()
      val t1 = System.nanoTime()
      evRows.grouped(25000).foreach { chunk => in2.addData(chunk); q2.processAllAvailable() }
      val dt2 = (System.nanoTime() - t1) / 1e9
      q2.stop()
      println(f"[stream] sessionize   ${mult}x: ${evRows.size} events in $dt2%.2f s = ${evRows.size / dt2}%.0f events/s")
    }
    spark.stop()
  }
}
