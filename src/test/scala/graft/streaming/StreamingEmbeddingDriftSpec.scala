package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the online embedding-drift monitor: the final
  * per-dim reading must equal
  * [[graft.similarity.EmbeddingDrift.perDim]]'s mean_b / mean_shift
  * bit-exactly — in one trigger and split across three — which
  * transitively puts the monitor under d110's DuckDB oracle. */
class StreamingEmbeddingDriftSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val baseSnap =
    emb.filter(pmod(col("vec_id"), lit(2L)) === 0)
  private lazy val currRows =
    emb.filter(pmod(col("vec_id"), lit(2L)) === 1)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") + lit(0.05))
          .as("embedding"))

  private def run(chunks: Seq[Seq[Long]]): Map[Long, (Long, Double, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val baseline =
      StreamingEmbeddingDrift.fitBaseline(baseSnap, "embedding")
    val rows = currRows.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    val input = MemoryStream[(Long, Seq[Double])]
    val name = "embdrift_sink_" + chunks.size
    val q = StreamingEmbeddingDrift.monitor(
      input.toDF().toDF("vec_id", "embedding"), "embedding", baseline)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { ids =>
      input.addData(ids.map(id => id -> rows(id)))
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name).collect()
      .groupBy(_.getLong(0))
      .map { case (i, rs) =>
        val last = rs.maxBy(_.getLong(1))
        i -> (last.getLong(1), last.getDouble(2), last.getDouble(3))
      }
  }

  test("final reading ≡ batch perDim bit-exactly, across trigger splits") {
    val batch = graft.similarity.EmbeddingDrift
      .perDim(baseSnap, currRows, "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(4), r.getDouble(5), r.getDouble(7))).toMap
    val ids = currRows.select("vec_id").collect().map(_.getLong(0)).toSeq
    val one = run(Seq(ids))
    assert(one === batch,
      "single-trigger stream must equal the batch operator to the bit")
    val (a, rest) = ids.splitAt(ids.length / 3)
    val (b, c) = rest.splitAt(rest.length / 2)
    val three = run(Seq(a, b, c))
    assert(three === batch,
      "trigger splits must not change the final reading")
  }
}
