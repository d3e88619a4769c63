package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

class SourceProviderSpec extends AnyFunSuite with SparkSpec {

  test("parquet source loads fixtures with lowercase columns") {
    val df = ParquetSource.load(spark, s"$sf0001/lineitem.parquet")
    assert(df.columns.forall(c => c == c.toLowerCase))
    assert(df.count() == 6000)
  }

  test("csv source round-trips with header + inferSchema options") {
    val dir = Files.createTempDirectory("graft_csv").toString
    spark.read.parquet(s"$sf0001/region.parquet")
      .toDF("R_REGIONKEY", "R_NAME") // force mixed case to prove normalization
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = CsvSource.load(spark, dir, Map("header" -> "true", "inferSchema" -> "true"))
    assert(back.columns.toSeq == Seq("r_regionkey", "r_name"))
    assert(back.count() == 5)
  }

  test("json source reads json-lines") {
    val dir = Files.createTempDirectory("graft_json").toString
    spark.read.parquet(s"$sf0001/region.parquet").write.mode("overwrite").json(dir)
    val back = JsonSource.load(spark, dir)
    assert(back.count() == 5)
    assert(back.columns.contains("r_name"))
  }

  test("orc source round-trips the typed schema losslessly") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    src.toDF("R_REGIONKEY", "R_NAME").write.mode("overwrite").orc(dir)
    val back = OrcSource.load(spark, dir)
    assert(back.columns.toSeq == Seq("r_regionkey", "r_name"))
    // ORC keeps the types (unlike CSV, which needs a cast-back).
    assert(back.schema.map(_.dataType) == src.schema.map(_.dataType))
    assert(back.count() == 5)
  }

  test("fixedwidth: substring parse, rtrim, lower-cased names, bad specs rejected") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_fw").toString
    // 4-wide id, 8-wide name (left-aligned, space-padded), 3-wide code
    Files.write(java.nio.file.Paths.get(dir, "a.txt"), java.util.Arrays.asList(
      "1   alpha   x  ",
      "22  beta withx7 ",
      "333 gamma   yz9"))
    val df = FixedWidthSource.load(spark, dir,
      Map("fields" -> "ID:4, Name:8, code:3"))
    assert(df.columns.toSeq == Seq("id", "name", "code"))
    val rows = df.orderBy(org.apache.spark.sql.functions.col("id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("1", "alpha", "x"),
      ("22", "beta wit", "hx7"),   // widths cut, never shift
      ("333", "gamma", "yz9")))
    intercept[IllegalArgumentException](
      FixedWidthSource.load(spark, dir, Map.empty))
    intercept[IllegalArgumentException](
      FixedWidthSource.load(spark, dir, Map("fields" -> "id:0")))
    intercept[IllegalArgumentException](
      FixedWidthSource.load(spark, dir, Map("fields" -> "id")))
  }

  test("registry dispatch + reference aliases") {
    assert(SourceRegistry("csv") eq CsvSource)
    assert(SourceRegistry("fixedwidth") eq FixedWidthSource)
    assert(SourceRegistry("orc") eq OrcSource)
    assert(SourceRegistry("s3") eq ParquetSource)      // config.ini 's3' section
    assert(SourceRegistry("s3_csv") eq CsvSource)
    assert(SourceRegistry("pg") eq JdbcSource)         // declared-but-stubbed in reference
    intercept[IllegalArgumentException](SourceRegistry("nope"))
  }
}
