package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.nio.file.{Files, Paths}

class BinaryIngestSpec extends SparkSpec {

  import spark.implicits._

  private def writePng(dir: String, name: String, w: Int, h: Int,
                       rgb: Int): Unit = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    javax.imageio.ImageIO.write(img, "png",
      new java.io.File(s"$dir/$name"))
  }

  test("binaryFile ingest: bytes round-trip and feed the image decoder") {
    val dir = Files.createTempDirectory("assets").toString
    writePng(dir, "red.png", 3, 2, 0xFF0000)
    writePng(dir, "blue.png", 4, 4, 0x0000FF)
    Files.writeString(Paths.get(s"$dir/notes.txt"), "not an image")

    // glob prunes by name at the source — the txt never reaches Spark
    val assets = BinaryIngest.assetTable(spark, dir, "*.png")
    val rows = assets.orderBy("asset_name").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("blue.png", "red.png"))
    // content is the EXACT on-disk bytes
    rows.foreach { r =>
      val disk = Files.readAllBytes(Paths.get(s"$dir/${r.getString(0)}"))
      assert(r.getAs[Array[Byte]]("content").toSeq === disk.toSeq)
      assert(r.getLong(1) === disk.length.toLong)
    }
    // and the existing decoder consumes them
    val decoded = rows.map { r =>
      r.getString(0) ->
        graft.multimodal.Multimodal.decodeImage(
          r.getAs[Array[Byte]]("content")).get
    }.toMap
    assert(decoded("red.png").width === 3 && decoded("red.png").height === 2)
    assert(decoded("blue.png").width === 4 && decoded("blue.png").height === 4)
  }

  test("ORC round-trip is bit-identical and pushes filters to the scan") {
    val dir = Files.createTempDirectory("orc").toString + "/lineitem"
    val li = graft.Tables.lineitem(spark, sf0001)
    BinaryIngest.writeOrc(li, dir)
    val back = BinaryIngest.readOrc(spark, dir)
    assert(back.count() === li.count())
    // bit-identical content: same row multiset (md5 over all columns)
    def digest(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      df.select(md5(concat_ws("|", cols: _*)).as("h"))
        .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("decimal(38,0)"))
          .as("sum"), count(lit(1)).as("n")).collect()
    }
    assert(digest(back).toSeq === digest(li).toSeq)
    // pushdown surface matches parquet's
    val q = back.filter(col("l_quantity") > 30).select("l_orderkey")
    q.collect()
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      "ORC scan did not receive the pushed filter:\n" + p.take(1200))
  }
}
