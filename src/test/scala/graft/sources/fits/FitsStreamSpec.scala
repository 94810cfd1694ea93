package graft.sources.fits

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Micro-batch streaming over an append-only FITS directory: each file
  * is read exactly once, across restarts, from the checkpointed offset
  * alone. (The reference has no streaming surface — alert-stream
  * ingestion is a beyond-reference capability.) */
class FitsStreamSpec extends SparkTestBase {

  // each generated file: 1-col E bintable, x = i%1000 → sum(100 rows) = 4950
  private val rowsPerFile = 100L
  private val sumPerFile = 4950.0

  test("streaming FITS source reads each file exactly once across restarts") {
    val dir = Files.createTempDirectory("fits-stream").toString
    val ckpt = Files.createTempDirectory("fits-stream-ckpt").toString
    graft.examples.FitsBench.generate(s"$dir/a.fits", rowsPerFile)

    val batches = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("fits").option("hdu", 1).load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val agg = df.agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum("x")).collect().head
          if (agg.getLong(0) > 0)
            batches.synchronized {
              batches += ((agg.getLong(0), agg.getDouble(1)))
            }
          ()
        }
        .start()
      q.awaitTermination()
    }

    runOnce()
    assert(batches.toList == List((rowsPerFile, sumPerFile)),
      s"first run must read exactly file a: $batches")

    // two more files land; restart from the same checkpoint
    graft.examples.FitsBench.generate(s"$dir/b.fits", rowsPerFile)
    graft.examples.FitsBench.generate(s"$dir/c.fits", rowsPerFile)
    runOnce()
    assert(batches.map(_._1).sum == 3 * rowsPerFile,
      s"restart must read only the two new files: $batches")
    assert(batches.map(_._2).sum == 3 * sumPerFile)

    // third run with nothing new: no rows
    runOnce()
    assert(batches.map(_._1).sum == 3 * rowsPerFile,
      s"no-new-data run must emit nothing: $batches")
  }
}
